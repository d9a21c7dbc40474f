"""Spherical radius join (r7): blocking must never lose a pair — pinned
against a numpy brute-force haversine over random points including
near-cap latitudes."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyramidscheme_jl_spark.operators.geo import (
    EARTH_RADIUS_M,
    radius_join,
)


def _brute_pairs(qs, ps, radius_m):
    out = set()
    for qid, qla, qlo in qs:
        for pid, pla, plo in ps:
            p1, p2 = math.radians(qla), math.radians(pla)
            dp, dl = p2 - p1, math.radians(plo) - math.radians(qlo)
            a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
            if 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a)) <= radius_m:
                out.add((qid, pid))
    return out


@pytest.mark.parametrize("radius_m", [5_000.0, 150_000.0])
def test_radius_join_matches_brute_force(spark, radius_m):
    rng = np.random.RandomState(23)
    # clustered around a few sites, spread across latitudes incl. near
    # the 75-degree cap and negative longitudes near grid-cell edges
    sites = [(-74.0, -150.0), (-10.0, 0.0), (40.0, 120.0), (74.5, 179.0)]
    ps = []
    for i in range(400):
        sla, slo = sites[i % len(sites)]
        la = min(74.9, max(-74.9, sla + rng.randn() * 1.2))
        lo = min(179.9, max(-179.9, slo + rng.randn() * 1.2))
        ps.append((i, float(la), float(lo)))
    qs = [(100 + j, ps[j * 37][1], ps[j * 37][2] + 0.01) for j in range(10)]
    points = spark.createDataFrame(ps, "point_id long, lat double, lon double")
    queries = spark.createDataFrame(qs, "query_id long, lat double, lon double")

    expect = _brute_pairs(qs, ps, radius_m)
    got = {
        (r["query_id"], r["point_id"])
        for r in radius_join(points, queries, radius_m).collect()
    }
    assert got == expect
    # shuffle-hash arm: identical pairs
    sh = {
        (r["query_id"], r["point_id"])
        for r in radius_join(
            points, queries, radius_m, broadcast_queries=False
        ).collect()
    }
    assert sh == expect
    # distances agree with the python replay to float tolerance
    for r in radius_join(points, queries, radius_m).collect():
        qla, qlo = next((q[1], q[2]) for q in qs if q[0] == r["query_id"])
        pla, plo = ps[r["point_id"]][1], ps[r["point_id"]][2]
        p1, p2 = math.radians(qla), math.radians(pla)
        dp, dl = p2 - p1, math.radians(plo) - math.radians(qlo)
        a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        d = 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))
        assert abs(r["dist_m"] - d) < 1e-6 * max(1.0, d)


def test_radius_join_guards(spark):
    ok = spark.createDataFrame([(1, 10.0, 10.0)], "point_id long, lat double, lon double")
    bad = spark.createDataFrame([(2, 80.0, 0.0)], "query_id long, lat double, lon double")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException), match="max_abs_lat"):
        radius_join(
            ok, bad.withColumnRenamed("query_id", "query_id"), 1000.0
        ).collect()
    with pytest.raises(ValueError, match="positive"):
        radius_join(ok, ok.withColumnRenamed("point_id", "query_id"), -5)
    with pytest.raises(ValueError, match="too large"):
        radius_join(
            ok, ok.withColumnRenamed("point_id", "query_id"),
            9_000_000.0, max_abs_lat=89.0,
        )
    # dist_col=None: pairs-only projection (the oracle-stable shape)
    out = radius_join(
        ok, ok.withColumnRenamed("point_id", "query_id"), 1000.0, dist_col=None
    )
    assert out.columns == ["query_id", "point_id"]


def test_radius_join_nearest_only(spark):
    """Snap-to-nearest within radius: argmin over the same pair set,
    ties by lowest point_id — pinned against the brute-force replay."""
    rng = np.random.RandomState(7)
    ps = [(i, float(10 + rng.randn() * 0.5), float(20 + rng.randn() * 0.5))
          for i in range(200)]
    qs = [(500 + j, ps[j * 19][1] + 0.001, ps[j * 19][2]) for j in range(8)]
    points = spark.createDataFrame(ps, "point_id long, lat double, lon double")
    queries = spark.createDataFrame(qs, "query_id long, lat double, lon double")
    radius = 30_000.0
    pairs = {}
    for qid, qla, qlo in qs:
        for pid, pla, plo in ps:
            p1, p2 = math.radians(qla), math.radians(pla)
            dp, dl = p2 - p1, math.radians(plo) - math.radians(qlo)
            a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
            d = 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))
            if d <= radius:
                cur = pairs.get(qid)
                if cur is None or (d, pid) < (cur[1], cur[0]):
                    pairs[qid] = (pid, d)
    got = {
        r["query_id"]: (r["point_id"], r["dist_m"])
        for r in radius_join(
            points, queries, radius, nearest_only=True
        ).collect()
    }
    assert set(got) == set(pairs)
    for qid, (pid, d) in pairs.items():
        assert got[qid][0] == pid
        assert abs(got[qid][1] - d) < 1e-6 * max(1.0, d)
    # pairs-only projection still drops the distance
    cols = radius_join(
        points, queries, radius, nearest_only=True, dist_col=None
    ).columns
    assert cols == ["query_id", "point_id"]


def test_radius_join_wraps_antimeridian(spark):
    """Pairs straddling +-180 must be found (r8: ring-grid lon cells)."""
    ps = [
        (0, 10.0, 179.95), (1, 10.0, -179.95), (2, -30.0, 179.99),
        (3, -30.0, -179.85), (4, 10.0, 170.0),  # same lat, far in lon
        (5, 60.0, 179.9), (6, 60.0, -179.9),
    ]
    qs = [(100, 10.0, -179.99), (101, -30.0, 179.9), (102, 60.0, 179.99)]
    points = spark.createDataFrame(ps, "point_id long, lat double, lon double")
    queries = spark.createDataFrame(qs, "query_id long, lat double, lon double")
    for radius in (25_000.0, 40_000.0):
        expect = _brute_pairs(qs, ps, radius)
        assert any(  # the fixture genuinely crosses the seam
            (q[0], p[0]) in expect and (q[2] > 170) != (p[2] > 170)
            for q in qs for p in ps if abs(q[2]) > 170 and abs(p[2]) > 170
        )
        got = {
            (r["query_id"], r["point_id"])
            for r in radius_join(points, queries, radius).collect()
        }
        assert got == expect


def test_radius_join_normalizes_lon_conventions(spark):
    """lon given as [0, 360) or unbounded turns joins identically to
    [-180, 180] — and NO duplicate pairs from the modulo probes."""
    ps180 = [(0, 5.0, -179.9), (1, 5.0, 179.9), (2, 5.0, -90.0)]
    ps360 = [(0, 5.0, 180.1), (1, 5.0, 179.9 + 720.0), (2, 5.0, 270.0)]
    qs = [(100, 5.0, 180.0), (101, 5.0, -90.05)]
    radius = 30_000.0
    expect = _brute_pairs(qs, ps180, radius)
    points = spark.createDataFrame(ps360, "point_id long, lat double, lon double")
    queries = spark.createDataFrame(qs, "query_id long, lat double, lon double")
    rows = radius_join(points, queries, radius).collect()
    got = [(r["query_id"], r["point_id"]) for r in rows]
    assert set(got) == expect
    assert len(got) == len(set(got))  # modulo probes emit each pair once


def test_radius_join_huge_radius_single_ring_cell(spark):
    """Radius large enough that n_lon < 3 collapses to one all-longitudes
    cell: correct pairs, no duplicates (the -1/0/+1 probes would collide
    mod 2)."""
    rng = np.random.RandomState(7)
    ps = [
        (i, float(rng.uniform(-74, 74)), float(rng.uniform(-180, 180)))
        for i in range(60)
    ]
    qs = [(100, 10.0, 179.0), (101, -60.0, -1.0)]
    points = spark.createDataFrame(ps, "point_id long, lat double, lon double")
    queries = spark.createDataFrame(qs, "query_id long, lat double, lon double")
    radius = 3_000_000.0  # s_lon ~129 deg -> n_lon = 2 -> collapse to 1
    expect = _brute_pairs(qs, ps, radius)
    rows = radius_join(points, queries, radius).collect()
    got = [(r["query_id"], r["point_id"]) for r in rows]
    assert set(got) == expect
    assert len(got) == len(set(got))


def test_geo_knn_matches_brute_force(spark):
    """radius-doubling spherical kNN: exact sets vs brute force, k=3,
    radius0 deliberately tiny so several expansions are required."""
    rng = np.random.RandomState(9)
    ps = [
        (i, float(rng.uniform(-70, 70)), float(rng.uniform(-179, 179)))
        for i in range(300)
    ]
    qs = [(100 + j, ps[j * 29][1] + 0.3, ps[j * 29][2] - 0.2) for j in range(8)]
    points = spark.createDataFrame(ps, "point_id long, lat double, lon double")
    queries = spark.createDataFrame(qs, "query_id long, lat double, lon double")
    from pyramidscheme_jl_spark.operators.geo import geo_knn

    got = {}
    for r in geo_knn(points, queries, k=3, radius0_m=2_000.0).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["point_id"], r["dist_m"]))
    for qid, qla, qlo in qs:
        dists = []
        for pid, pla, plo in ps:
            p1, p2 = math.radians(qla), math.radians(pla)
            dp, dl = p2 - p1, math.radians(plo) - math.radians(qlo)
            a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
            dists.append((2 * EARTH_RADIUS_M * math.asin(math.sqrt(a)), pid))
        dists.sort()
        want = [pid for _, pid in dists[:3]]
        rows = sorted(got[qid])
        assert [pid for _, pid, _ in rows] == want, qid
        # returned distances match the replay
        for (_, pid, d), (wd, wpid) in zip(rows, dists[:3]):
            assert abs(d - wd) < 1e-6 * max(1.0, wd)


def test_geo_knn_small_corpus_returns_what_exists(spark):
    ps = [(0, 10.0, 10.0), (1, 10.2, 10.2)]
    qs = [(100, 10.1, 10.1)]
    points = spark.createDataFrame(ps, "point_id long, lat double, lon double")
    queries = spark.createDataFrame(qs, "query_id long, lat double, lon double")
    from pyramidscheme_jl_spark.operators.geo import geo_knn

    rows = geo_knn(points, queries, k=5, radius0_m=1_000.0).collect()
    assert sorted(r["point_id"] for r in rows) == [0, 1]  # all that exist


def test_geo_knn_validation(spark):
    ps = [(0, 10.0, 10.0)]
    points = spark.createDataFrame(ps, "point_id long, lat double, lon double")
    queries = spark.createDataFrame([(1, 0.0, 0.0)], "query_id long, lat double, lon double")
    from pyramidscheme_jl_spark.operators.geo import geo_knn

    with pytest.raises(ValueError, match="k must"):
        geo_knn(points, queries, k=0)
    with pytest.raises(ValueError, match="too large"):
        geo_knn(points, queries, k=1, radius0_m=50_000_000.0)
