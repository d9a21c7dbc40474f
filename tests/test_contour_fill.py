"""contour_segments (marching squares over the radius-1 halo) and
fillnodata (nearest-valid fill via the value-carrying separable EDT).
Oracles: independent scalar/offset-loop numpy replays — the contour
replay classifies every 2x2 cell with plain Python, the fill replay
brute-forces the lexicographic (d^2, value) argmin over ALL offsets
(O(r^2), not the engine's separable two-pass).
"""

import numpy as np
import pytest

from pyramidscheme_jl_spark.functions.codec import decode_tile
from pyramidscheme_jl_spark.operators.build import (
    PyramidSpec,
    _rows_to_pdf,
    _tile_row,
)
from pyramidscheme_jl_spark.operators.raster import contour_segments, fillnodata
from pyramidscheme_jl_spark.sources.catalog import (
    write_level_driver,
    write_multiscales,
)

TS = 32


def _write_plane(spark, a, path):
    h, w = a.shape
    spec = PyramidSpec(w, h, TS)
    rows = []
    for ty in range(-(-h // TS)):
        for tx in range(-(-w // TS)):
            rows.append(_tile_row(
                spec, 0, tx, ty, a[ty*TS:(ty+1)*TS, tx*TS:(tx+1)*TS]))
    write_level_driver(_rows_to_pdf(rows).to_dict("records"), path, 0)
    write_multiscales(path, 0, TS, w, h, "none", "-")


def _brute_contour(a, levels):
    """Scalar marching squares: one tuple per segment, canonical edge
    order (top, right, bottom, left), center-mean saddle rule."""
    h, w = a.shape
    segs = []
    for L in levels:
        for cy in range(h - 1):
            for cx in range(w - 1):
                cs = [a[cy, cx], a[cy, cx+1], a[cy+1, cx+1], a[cy+1, cx]]
                if any(np.isnan(v) for v in cs):
                    continue
                tl, tr, br, bl = cs
                ab = [v >= L for v in cs]
                pts = [None] * 4
                if ab[0] != ab[1]:
                    pts[0] = (cx + (L - tl) / (tr - tl), float(cy))
                if ab[1] != ab[2]:
                    pts[1] = (cx + 1.0, cy + (L - tr) / (br - tr))
                if ab[3] != ab[2]:
                    pts[2] = (cx + (L - bl) / (br - bl), cy + 1.0)
                if ab[0] != ab[3]:
                    pts[3] = (float(cx), cy + (L - tl) / (bl - tl))
                crossed = [i for i in range(4) if pts[i] is not None]
                if not crossed:
                    continue
                if len(crossed) == 2:
                    p, q = pts[crossed[0]], pts[crossed[1]]
                    segs.append((L, cx, cy, p[0], p[1], q[0], q[1]))
                else:  # saddle
                    ctr_above = (tl + tr + bl + br) / 4.0 >= L
                    if ctr_above == ab[0]:
                        pairs = [(0, 1), (2, 3)]
                    else:
                        pairs = [(0, 3), (2, 1)]
                    for i, j in pairs:
                        p, q = pts[i], pts[j]
                        segs.append((L, cx, cy, p[0], p[1], q[0], q[1]))
    return sorted(segs)


def _brute_fill(a, nodata, r):
    """Offset-loop lexicographic (d^2, value) argmin — independent of
    the engine's separable composition."""
    h, w = a.shape
    valid = np.isfinite(a) & (a != nodata)
    out = a.copy()
    for y in range(h):
        for x in range(w):
            if valid[y, x]:
                continue
            best = None
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    dd = dy*dy + dx*dx
                    ny, nx = y + dy, x + dx
                    if dd > r*r or not (0 <= ny < h and 0 <= nx < w):
                        continue
                    if not valid[ny, nx]:
                        continue
                    cand = (dd, a[ny, nx])
                    if best is None or cand < best:
                        best = cand
            if best is not None:
                out[y, x] = best[1]
    return out


@pytest.fixture(scope="module")
def plane():
    """96x96 integer terrain with plateaus (corner == level ties), a NaN
    hole, and structure crossing the 32px tile grid."""
    rng = np.random.RandomState(11)
    a = rng.randint(0, 9, size=(96, 96)).astype(np.float64)
    yy, xx = np.mgrid[0:96, 0:96]
    a += ((xx + yy) // 24).astype(np.float64)  # ramp -> long contours
    a[40:44, 60:63] = np.nan
    a[20:28, 20:28] = 4.0                       # plateau at a test level
    return a


@pytest.fixture(scope="module")
def plane_path(spark, plane, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cont") / "pyr")
    _write_plane(spark, plane, path)
    return path


def test_contour_matches_scalar_replay(spark, plane, plane_path):
    levels = [4.0, 7.5]
    got = sorted(
        tuple(r) for r in contour_segments(spark, plane_path, levels)
        .select("level", "cx", "cy", "x0", "y0", "x1", "y1").collect()
    )
    want = _brute_contour(plane, levels)
    assert len(got) == len(want)
    for g, wv in zip(got, want):
        assert g[:3] == wv[:3]
        # same IEEE ops in the same order -> endpoints bit-identical
        np.testing.assert_array_equal(np.asarray(g[3:]), np.asarray(wv[3:]))


def test_contour_seam_endpoints_stitch(spark, plane, plane_path):
    """Segments whose endpoints sit ON a tile seam must be emitted with
    bit-identical coordinates by both adjacent tiles' cells (both
    interpolate the same two corner values)."""
    segs = contour_segments(spark, plane_path, [7.5]).collect()
    on_seam = {}
    for s in segs:
        for (x, y) in ((s.x0, s.y0), (s.x1, s.y1)):
            on_seam.setdefault((x, y), 0)
            on_seam[(x, y)] += 1
    # interior endpoints are shared by exactly two cells (chain), except
    # raster/NaN-hole borders; just assert a healthy share of matches
    shared = sum(1 for v in on_seam.values() if v == 2)
    assert shared > len(on_seam) * 0.8


def test_contour_saddle_center_rule(spark, tmp_path):
    a = np.array([[10.0, 0.0], [0.0, 10.0]])
    plane = np.zeros((4, 4)); plane[1:3, 1:3] = a
    path = str(tmp_path / "pyr")
    _write_plane(spark, plane, path)
    # L=5: center mean 5 >= 5 sides with the tl diagonal -> wraps
    # (top,right) + (bottom,left) around the two below-corners
    segs = sorted(tuple(r) for r in contour_segments(spark, path, [5.0])
                  .where("cx = 1 and cy = 1")
                  .select("level", "cx", "cy", "x0", "y0", "x1", "y1").collect())
    want = _brute_contour(plane, [5.0])
    want = [s for s in want if s[1] == 1 and s[2] == 1]
    assert segs == sorted(want)
    assert len(segs) == 2
    # L=6: center mean 5 < 6 -> tl/br isolated: (top,left)+(bottom,right)
    segs6 = sorted(tuple(r) for r in contour_segments(spark, path, [6.0])
                   .where("cx = 1 and cy = 1")
                   .select("level", "cx", "cy", "x0", "y0", "x1", "y1").collect())
    want6 = [s for s in _brute_contour(plane, [6.0]) if s[1] == 1 and s[2] == 1]
    assert segs6 == sorted(want6)


def test_contour_validation(spark, plane_path):
    with pytest.raises(ValueError, match="non-empty"):
        contour_segments(spark, plane_path, [])


@pytest.mark.parametrize("r", [2, 5])
def test_fill_matches_brute(spark, plane_path, plane, r):
    nd = 4.0  # the plateau value -> an 8x8 nodata block, ties galore
    got_df = fillnodata(spark, plane_path, nd, r).collect()
    got = np.full((96, 96), np.nan)
    for row in got_df:
        t = decode_tile(row.bytes, row.h, row.w, row.dtype, row.c)
        got[row.ty*TS:row.ty*TS+row.h, row.tx*TS:row.tx*TS+row.w] = t
    want = _brute_fill(plane, nd, r)
    np.testing.assert_array_equal(got, want)


def test_fill_dtype_preserved_and_unreachable(spark, tmp_path):
    a = np.full((64, 64), 200, dtype=np.float64)
    a[10:30, 10:30] = 7.0  # 20x20 nodata block, radius 2 can't reach core
    path = str(tmp_path / "pyr")
    _write_plane(spark, a, path)
    rows = fillnodata(spark, path, 7.0, 2).collect()
    got = np.zeros((64, 64))
    for row in rows:
        assert row.dtype == "float64"
        got[row.ty*TS:row.ty*TS+row.h,
            row.tx*TS:row.tx*TS+row.w] = decode_tile(
                row.bytes, row.h, row.w, row.dtype, row.c)
    assert got[20, 20] == 7.0          # core out of reach
    assert got[10, 10] == 200.0        # corner reached (d^2 = 2)
    assert (got[0, 0], got[63, 63]) == (200.0, 200.0)


def test_fillnodata_nan_pixels_are_targets(spark, tmp_path):
    """ADVICE r8: NaN pixels follow the engine's NaN-is-missing
    convention — they are fill TARGETS exactly like the explicit nodata
    value, and never fill SOURCES. Pins the documented contract."""
    a = np.full((64, 64), 50.0, dtype=np.float64)
    a[5, 5] = np.nan          # NaN target, valid neighbors at d^2 = 1
    a[40, 40] = 7.0           # explicit-nodata target
    a[40, 41] = np.nan        # NaN beside it must NOT act as a source
    a[40, 42] = 9.0           # nearest VALID source for both targets
    path = str(tmp_path / "pyr")
    _write_plane(spark, a, path)
    rows = fillnodata(spark, path, 7.0, 3).collect()
    got = np.zeros((64, 64))
    for row in rows:
        got[row.ty*TS:row.ty*TS+row.h,
            row.tx*TS:row.tx*TS+row.w] = decode_tile(
                row.bytes, row.h, row.w, row.dtype, row.c)
    assert got[5, 5] == 50.0                 # NaN filled from valid ring
    assert got[40, 41] == 9.0                # NaN target filled, d^2 = 1
    # explicit nodata target: nearest valid is (40,42) at d^2=4 but
    # (39,41)/(41,41) at d^2 = 2 are valid 50.0 pixels -> fills to 50
    assert got[40, 40] == 50.0
    assert not np.isnan(got).any()


def test_fill_validation(spark, plane_path):
    with pytest.raises(ValueError, match="max_radius"):
        fillnodata(spark, plane_path, 4.0, 0)


# ---------------------------------------------------------------------------
# contour_polylines: stitch segments into chains (CC over exact endpoints)
# ---------------------------------------------------------------------------


def _stitch_brute(segs):
    """Union-find over exact endpoint sharing; returns (partition, closed)
    as {frozenset(endpoint-pairs): closed_bool}."""
    parent = list(range(len(segs)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    eps = {}
    for i, s in enumerate(segs):
        for p in ((s[0], s[4], s[5]), (s[0], s[6], s[7])):
            eps.setdefault(p, []).append(i)
    for ids in eps.values():
        assert len(ids) <= 2
        if len(ids) == 2:
            a, b = find(ids[0]), find(ids[1])
            if a != b:
                parent[max(a, b)] = min(a, b)
    comps = {}
    for i in range(len(segs)):
        comps.setdefault(find(i), []).append(i)
    out = {}
    for ids in comps.values():
        open_pts = sum(1 for p, ss in eps.items()
                       if len(ss) == 1 and find(ss[0]) == find(ids[0]))
        key = frozenset((segs[i][4], segs[i][5], segs[i][6], segs[i][7])
                        for i in ids)
        out[key] = open_pts == 0
    return out


def _poly_rows(spark, path, levels):
    from pyramidscheme_jl_spark.operators.raster import contour_polylines

    rows = contour_polylines(spark, path, levels).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r.polyline_id, []).append(r)
    out = {}
    for rs in comps.values():
        key = frozenset((r.x0, r.y0, r.x1, r.y1) for r in rs)
        assert len({r.closed for r in rs}) == 1
        out[key] = rs[0].closed
    return out


def test_polylines_closed_ring(spark, tmp_path):
    yy, xx = np.mgrid[0:64, 0:64]
    a = ((xx - 32.0) ** 2 + (yy - 32.0) ** 2).astype(np.float64)
    path = str(tmp_path / "disk")
    _write_plane(spark, a, path)
    got = _poly_rows(spark, path, [300.5])
    assert len(got) == 1 and all(got.values())  # one CLOSED ring


def test_polylines_open_line(spark, tmp_path):
    a = np.tile(np.arange(64, dtype=np.float64), (64, 1))
    path = str(tmp_path / "ramp")
    _write_plane(spark, a, path)
    got = _poly_rows(spark, path, [10.5])
    assert len(got) == 1 and not any(got.values())  # one OPEN line


def test_polylines_match_brute_partition(spark, plane, plane_path):
    from pyramidscheme_jl_spark.operators.raster import contour_segments

    got = _poly_rows(spark, plane_path, [7.5, 5.25])
    segs = [tuple(r) for r in contour_segments(
        spark, plane_path, [7.5, 5.25]).collect()]
    want = _stitch_brute(segs)
    assert got == want
    assert len(got) > 2  # the NaN hole + two levels force several chains


def test_polylines_degenerate_level_raises(spark, plane_path):
    """A level EQUAL to a pixel value (the 4.0 plateau) puts endpoints on
    cell corners (degree up to 8) — stitching must refuse loudly, not
    mis-chain silently."""
    from pyramidscheme_jl_spark.operators.raster import contour_polylines

    with pytest.raises(AssertionError, match="degree"):
        contour_polylines(spark, plane_path, [4.0])


def test_contour_duplicate_levels_rejected(spark, plane_path):
    with pytest.raises(ValueError, match="duplicates"):
        contour_segments(spark, plane_path, [7.5, 7.5])
