"""grid_points (gdal_grid analog, lattice-snapped) and raster_crosstab.
Oracles: independent scalar replays — the gridding brute bins points to
pixels then loops the disc offsets per pixel (same accumulation order
as the engine, so float methods compare bit-identical); the crosstab
brute zips two planes and counts pairs with a dict.
"""

import numpy as np
import pytest

from pyramidscheme_jl_spark.functions.codec import decode_tile
from pyramidscheme_jl_spark.operators.build import (
    PyramidSpec,
    _rows_to_pdf,
    _tile_row,
)
from pyramidscheme_jl_spark.operators.gridding import GRID_METHODS, grid_points
from pyramidscheme_jl_spark.operators.raster import raster_crosstab
from pyramidscheme_jl_spark.sources.catalog import (
    write_level_driver,
    write_multiscales,
)

TS = 32
W = H = 64
R = 3


def _pts(n=300, seed=5):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-4, W + 4, n)          # some out of bounds
    y = rng.uniform(-4, H + 4, n)
    v = rng.randint(0, 50, n).astype(np.float64)
    return x, y, v


def _pts_df(spark, x, y, v):
    return spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, v)],
        "x double, y double, value double",
    )


def _collect_plane(rows, fill=np.nan):
    got = np.full((H, W), fill)
    for row in rows:
        t = decode_tile(row.bytes, row.h, row.w, row.dtype, row.c)
        got[row.ty * TS:row.ty * TS + row.h,
            row.tx * TS:row.tx * TS + row.w] = t
    return got


def _bins(x, y, v):
    b = {}
    for xi, yi, vi in zip(x, y, v):
        px, py = int(np.floor(xi)), int(np.floor(yi))
        if 0 <= px < W and 0 <= py < H:
            b.setdefault((px, py), []).append(vi)
    return b


def _offs(r):
    return [(dy, dx, dy * dy + dx * dx)
            for dy in range(-r, r + 1) for dx in range(-r, r + 1)
            if dy * dy + dx * dx <= r * r]


def _brute(x, y, v, method, r):
    """Same accumulation ORDER as the engine kernel (offset loop outer,
    within-pixel values exactly summable ints) -> bit-identical floats."""
    b = _bins(x, y, v)
    agg = {
        k: (len(vs), float(np.sum(vs)), min(vs), max(vs)) for k, vs in b.items()
    }
    out = np.full((H, W), np.nan)
    touched = np.zeros((H, W), dtype=bool)
    for py in range(H):
        for px in range(W):
            cnt = 0
            s = 0.0
            mn, mx = np.inf, -np.inf
            num = den = 0.0
            best = None
            for dy, dx, dd in _offs(r):
                k = (px + dx, py + dy)
                if k not in agg:
                    continue
                c_, s_, mn_, mx_ = agg[k]
                cnt += c_
                s += s_
                mn, mx = min(mn, mn_), max(mx, mx_)
                if dd > 0:
                    num += s_ * (1.0 / dd)
                    den += c_ * (1.0 / dd)
                cand = (dd, mn_)
                if best is None or cand < best:
                    best = cand
            touched[py, px] = cnt > 0
            if method == "count":
                out[py, px] = float(cnt)
            elif cnt == 0 and method != "nearest":
                continue
            elif method == "sum":
                out[py, px] = s
            elif method == "mean":
                out[py, px] = s / cnt
            elif method == "min":
                out[py, px] = mn
            elif method == "max":
                out[py, px] = mx
            elif method == "invdist":
                k0 = (px, py)
                if k0 in agg:
                    c0, s0, _, _ = agg[k0]
                    out[py, px] = s0 / c0
                elif den > 0:
                    out[py, px] = num / den
            elif method == "nearest" and best is not None:
                out[py, px] = best[1]
    # engine drops tiles with zero touched pixels entirely
    for ty in range(H // TS):
        for tx in range(W // TS):
            sl = np.s_[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]
            if not touched[sl].any():
                out[sl] = np.nan
    return out


@pytest.fixture(scope="module")
def pts(spark):
    x, y, v = _pts()
    return x, y, v, _pts_df(spark, x, y, v)


@pytest.mark.parametrize("method", GRID_METHODS)
def test_grid_matches_brute(spark, pts, method):
    x, y, v, df = pts
    rows = grid_points(spark, df, (W, H), method=method, radius=R,
                       tilesize=TS).collect()
    got = _collect_plane(rows)
    want = _brute(x, y, v, method, R)
    if method == "count":
        # count tiles fill 0.0 where touched-tile pixels have no reach
        got = np.where(np.isnan(got), np.nan, got)
    np.testing.assert_array_equal(got, want)


def test_grid_empty_tiles_dropped(spark):
    df = _pts_df(spark, [1.5], [1.5], [9.0])
    rows = grid_points(spark, df, (W, H), method="count", radius=2,
                       tilesize=TS).collect()
    assert {(r.tx, r.ty) for r in rows} == {(0, 0)}


def test_grid_radius_zero(spark, pts):
    x, y, v, df = pts
    rows = grid_points(spark, df, (W, H), method="mean", radius=0,
                       tilesize=TS).collect()
    got = _collect_plane(rows)
    b = _bins(x, y, v)
    for (px, py), vs in b.items():
        assert got[py, px] == float(np.sum(vs)) / len(vs)


def test_grid_validation(spark, pts):
    *_, df = pts
    with pytest.raises(ValueError, match="method"):
        grid_points(spark, df, (W, H), method="median")
    with pytest.raises(ValueError, match="radius"):
        grid_points(spark, df, (W, H), radius=-1)
    with pytest.raises(ValueError, match="tilesize"):
        grid_points(spark, df, (W, H), radius=40, tilesize=TS)


# --- crosstab ---------------------------------------------------------------


def _write_plane(a, path):
    h, w = a.shape
    spec = PyramidSpec(w, h, TS)
    rows = []
    for ty in range(-(-h // TS)):
        for tx in range(-(-w // TS)):
            rows.append(_tile_row(
                spec, 0, tx, ty, a[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]))
    write_level_driver(_rows_to_pdf(rows).to_dict("records"), path, 0)
    write_multiscales(path, 0, TS, w, h, "none", "-")


@pytest.fixture(scope="module")
def xt_paths(tmp_path_factory):
    rng = np.random.RandomState(3)
    a = rng.randint(0, 9, size=(96, 96)).astype(np.float64)
    b = ((a + np.add.outer(np.arange(96), np.arange(96))) % 5).astype(np.float64)
    a[10:14, 40:44] = np.nan     # excluded either side
    b[60:63, 5:9] = np.nan
    pa = str(tmp_path_factory.mktemp("xt") / "a")
    pb = str(tmp_path_factory.mktemp("xt") / "b")
    _write_plane(a, pa)
    _write_plane(b, pb)
    return a, b, pa, pb


def test_crosstab_matches_brute(spark, xt_paths):
    a, b, pa, pb = xt_paths
    got = {(r.va, r.vb): r.n
           for r in raster_crosstab(spark, pa, pb).collect()}
    want = {}
    m = np.isfinite(a) & np.isfinite(b)
    for va, vb in zip(a[m].astype(int), b[m].astype(int)):
        want[(va, vb)] = want.get((va, vb), 0) + 1
    assert got == want
    assert sum(got.values()) == int(m.sum())


def test_crosstab_non_integer_raises(spark, xt_paths, tmp_path):
    a, _, pa, _ = xt_paths
    frac = a / 2.0 + 0.25
    pf = str(tmp_path / "frac")
    _write_plane(frac, pf)
    with pytest.raises(Exception, match="integer-valued"):
        raster_crosstab(spark, pa, pf).collect()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_grid_fuzz_small_configs(spark, seed):
    """Seeded fuzz: random method/radius/points on a 64x64 grid vs the
    order-matched brute — catches halo-ownership and boundary slips the
    fixed fixture could miss."""
    rng = np.random.RandomState(100 + seed)
    method = GRID_METHODS[int(rng.randint(len(GRID_METHODS)))]
    r = int(rng.randint(0, 6))
    n = int(rng.randint(5, 120))
    x = rng.uniform(-3, W + 3, n)
    y = rng.uniform(-3, H + 3, n)
    v = rng.randint(0, 30, n).astype(np.float64)
    rows = grid_points(spark, _pts_df(spark, x, y, v), (W, H),
                       method=method, radius=r, tilesize=TS).collect()
    got = _collect_plane(rows)
    want = _brute(x, y, v, method, r)
    np.testing.assert_array_equal(got, want, err_msg=f"{method} r={r} n={n}")
