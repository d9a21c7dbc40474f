"""Point-to-polyline proximity join (r7): blocking (with segment
subdivision) must never lose a pair — pinned against numpy brute force,
distances bit-compared (the refine is libm-free by design)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyramidscheme_jl_spark.operators.lines import points_near_lines


def _seg_dist(px, py, x1, y1, x2, y2):
    dx, dy = x2 - x1, y2 - y1
    l2 = dx * dx + dy * dy
    if l2 == 0:
        t = 0.0
    else:
        t = min(1.0, max(0.0, ((px - x1) * dx + (py - y1) * dy) / l2))
    ex, ey = px - (x1 + t * dx), py - (y1 + t * dy)
    return math.sqrt(ex * ex + ey * ey)


def test_points_near_lines_matches_brute_force(spark):
    rng = np.random.RandomState(31)
    segs = []
    for i in range(60):
        x1, y1 = rng.uniform(0, 1000, 2)
        ang, ln = rng.uniform(0, 2 * math.pi), rng.uniform(5, 400)
        segs.append((i, float(x1), float(y1),
                     float(x1 + ln * math.cos(ang)), float(y1 + ln * math.sin(ang))))
    segs.append((60, 100.0, 100.0, 100.0, 100.0))  # degenerate point-segment
    segs.append((61, 0.0, 0.0, 999.0, 999.0))  # long diagonal: subdivision path
    pts = [(j, float(x), float(y))
           for j, (x, y) in enumerate(rng.uniform(-50, 1050, size=(500, 2)))]
    sdf = spark.createDataFrame(segs, "seg_id long, x1 double, y1 double, x2 double, y2 double")
    pdf = spark.createDataFrame(pts, "point_id long, x double, y double")

    for radius in (10.0, 60.0):
        expect = {}
        for pid, px, py in pts:
            for sid, x1, y1, x2, y2 in segs:
                d = _seg_dist(px, py, x1, y1, x2, y2)
                if d <= radius:
                    expect[(pid, sid)] = d
        got = {
            (r["point_id"], r["seg_id"]): r["dist"]
            for r in points_near_lines(sdf, pdf, radius).collect()
        }
        assert set(got) == set(expect), f"radius={radius}"
        for k, v in got.items():
            assert v == expect[k], (k, v, expect[k])  # bit-equal, no libm

        # nearest_only: argmin with (dist, seg_id) tie order
        near = {
            r["point_id"]: (r["seg_id"], r["dist"])
            for r in points_near_lines(sdf, pdf, radius, nearest_only=True).collect()
        }
        exp_near = {}
        for (pid, sid), d in expect.items():
            cur = exp_near.get(pid)
            if cur is None or (d, sid) < cur[::-1]:
                exp_near[pid] = (sid, d)
        assert near == exp_near


def test_points_near_lines_validates(spark):
    sdf = spark.createDataFrame(
        [(0, 0.0, 0.0, 1.0, 0.0)], "seg_id long, x1 double, y1 double, x2 double, y2 double")
    pdf = spark.createDataFrame([(0, 0.0, 0.0)], "point_id long, x double, y double")
    with pytest.raises(ValueError, match="radius"):
        points_near_lines(sdf, pdf, 0)
