"""warp_affine (raster.warp_affine): axis-aligned rational-scale NN regrid
over a stored pyramid — exact integer center-rule mapping, auto pyramid-level
selection, dtype preservation on full coverage, NaN nodata otherwise.
Oracle: numpy replay of the same integer mapping over the mosaic (base
formula for z=0; decoded stored-level mosaic for overview levels).
"""

import numpy as np
import pytest

from pyramidscheme_jl_spark.functions.codec import decode_tile
from pyramidscheme_jl_spark.operators.build import build_pyramid
from pyramidscheme_jl_spark.operators.raster import warp_affine
from pyramidscheme_jl_spark.sources.catalog import read_level
from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, image_pixels, synth_images

G, SIZE = 4, 64  # 256x256 uint8 base, tiles of 64; levels z1 (f64), z2 (f64)
BASE = G * SIZE


@pytest.fixture(scope="module")
def pyr_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("warp") / "pyr")
    images = spark.createDataFrame(synth_images(G=G, size=SIZE), IMAGES_DDL)
    build_pyramid(spark, images, path, G=G, reducer="mean", tilesize=SIZE, run_id="t")
    return path


def _base() -> np.ndarray:
    b = np.zeros((BASE, BASE), dtype=np.float64)
    for gy in range(G):
        for gx in range(G):
            b[gy * SIZE : (gy + 1) * SIZE, gx * SIZE : (gx + 1) * SIZE] = image_pixels(gx, gy, SIZE)
    return b


def _level_mosaic(spark, path: str, z: int) -> np.ndarray:
    rows = read_level(spark, path, z).collect()
    n = BASE >> z
    out = np.full((n, n), np.nan, dtype=np.float64)
    for r in rows:
        a = decode_tile(r.bytes, r.h, r.w, r.dtype, r.c)
        out[r.ty * SIZE : r.ty * SIZE + r.h, r.tx * SIZE : r.tx * SIZE + r.w] = a
    assert not np.isnan(out).any()
    return out


def _collect_warp(df, out_w: int, out_h: int, ts: int) -> tuple[np.ndarray, set]:
    """Reassemble warp output rows into one (out_h, out_w) plane."""
    out = np.full((out_h, out_w), np.nan, dtype=np.float64)
    dtypes = set()
    for r in df.collect():
        assert r.z == 0
        a = decode_tile(r.bytes, r.h, r.w, r.dtype, r.c).astype(np.float64)
        out[r.ty * ts : r.ty * ts + r.h, r.tx * ts : r.tx * ts + r.w] = a
        dtypes.add(r.dtype)
    return out, dtypes


def _replay(src: np.ndarray, out_w, out_h, nx, dx, ny, dy, ox, oy, L) -> np.ndarray:
    """The exact integer mapping in numpy over a level-L plane ``src``."""
    X = np.arange(out_w, dtype=np.int64)
    Y = np.arange(out_h, dtype=np.int64)
    bx = ((2 * X + 1) * nx) // (2 * dx) + ox
    by = ((2 * Y + 1) * ny) // (2 * dy) + oy
    out = np.full((out_h, out_w), np.nan)
    vx = (bx >= 0) & (bx < BASE)
    vy = (by >= 0) & (by < BASE)
    ix, iy = np.where(vx)[0], np.where(vy)[0]
    out[np.ix_(iy, ix)] = src[(by[iy] >> L)[:, None], (bx[ix] >> L)[None, :]]
    return out


def test_identity_preserves_base_exactly(spark, pyr_path):
    df = warp_affine(spark, pyr_path, (BASE, BASE), (1, 1), z=0, tilesize=64)
    got, dtypes = _collect_warp(df, BASE, BASE, 64)
    assert dtypes == {"uint8"}  # fully covered -> source dtype preserved
    np.testing.assert_array_equal(got, _base())


def test_rational_downscale_with_nodata_edges(spark, pyr_path):
    # x: scale 8/5 with off -3 -> two left columns out of range; y: 7/4 off +5
    out_w, out_h = 160, 140
    df = warp_affine(
        spark, pyr_path, (out_w, out_h), (8, 5), (7, 4), offset=(-3, 5), z=0, tilesize=64
    )
    got, dtypes = _collect_warp(df, out_w, out_h, 64)
    assert dtypes == {"float64"}  # not fully covered -> float64 + NaN
    want = _replay(_base(), out_w, out_h, 8, 5, 7, 4, -3, 5, 0)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_array_equal(got[m], want[m])


def test_auto_level_selection_reads_overview(spark, pyr_path):
    # scale 4 -> auto picks level 2 (2^2 <= 4): values are the STORED level-2
    # pixels (mean cascade), not base NN samples
    out = BASE // 4
    df = warp_affine(spark, pyr_path, (out, out), 4, tilesize=64)
    got, dtypes = _collect_warp(df, out, out, 64)
    assert dtypes == {"float64"}  # level 2 is the f64 mean overview
    want = _replay(_level_mosaic(spark, pyr_path, 2), out, out, 4, 1, 4, 1, 0, 0, 2)
    np.testing.assert_array_equal(got, want)


def test_auto_level_anisotropic_uses_min_scale(spark, pyr_path):
    # scales (4, 5/2): min is 2.5 -> level 1 (2^1 <= 2.5 < 2^2)
    out_w, out_h = BASE // 4, 102  # 102 px at 5/2 spans 255 base px
    df = warp_affine(spark, pyr_path, (out_w, out_h), 4, (5, 2), tilesize=64)
    got, _ = _collect_warp(df, out_w, out_h, 64)
    want = _replay(_level_mosaic(spark, pyr_path, 1), out_w, out_h, 4, 1, 5, 2, 0, 0, 1)
    np.testing.assert_array_equal(got, want)


def test_upscale_zoom_in_window(spark, pyr_path):
    # 2x zoom into an interior window: scale 1/2, offset translates the view
    out_w, out_h = 100, 90
    df = warp_affine(spark, pyr_path, (out_w, out_h), (1, 2), offset=(37, 53), z=0, tilesize=64)
    got, dtypes = _collect_warp(df, out_w, out_h, 64)
    assert dtypes == {"uint8"}
    want = _replay(_base(), out_w, out_h, 1, 2, 1, 2, 37, 53, 0)
    np.testing.assert_array_equal(got, want)


def test_fully_outside_yields_no_rows(spark, pyr_path):
    df = warp_affine(spark, pyr_path, (32, 32), (1, 1), offset=(10_000, 10_000), z=0)
    assert df.count() == 0


def test_validation_errors(spark, pyr_path):
    with pytest.raises(ValueError, match="positive rational"):
        warp_affine(spark, pyr_path, (8, 8), (0, 1))
    with pytest.raises(ValueError, match="positive rational"):
        warp_affine(spark, pyr_path, (8, 8), (-2, 1))
    with pytest.raises(ValueError, match="out of range"):
        warp_affine(spark, pyr_path, (8, 8), (1, 1), z=9)
    with pytest.raises(ValueError, match="out_shape"):
        warp_affine(spark, pyr_path, (0, 8), (1, 1))


def test_warp_randomized_configs_match_replay(spark, pyr_path):
    """Property sweep: random out-shapes, rational scales, offsets, and
    pinned levels all reproduce the integer-mapping replay exactly
    (covers ragged tiles, partial coverage, empty intersections)."""
    rng = np.random.RandomState(1234)
    for trial in range(8):
        out_w = int(rng.randint(5, 400))
        out_h = int(rng.randint(5, 400))
        nx, dx = int(rng.randint(1, 9)), int(rng.randint(1, 9))
        ny, dy = int(rng.randint(1, 9)), int(rng.randint(1, 9))
        ox = int(rng.randint(-60, 60))
        oy = int(rng.randint(-60, 60))
        L = int(rng.choice([0, 0, 1, 2]))
        src = _base() if L == 0 else _level_mosaic(spark, pyr_path, L)
        want = _replay(src, out_w, out_h, nx, dx, ny, dy, ox, oy, L)
        df = warp_affine(
            spark, pyr_path, (out_w, out_h), (nx, dx), (ny, dy),
            offset=(ox, oy), z=L, tilesize=64,
        )
        got, _ = _collect_warp(df, out_w, out_h, 64)
        m = ~np.isnan(want)
        np.testing.assert_array_equal(np.isnan(got), ~m, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(got[m], want[m], err_msg=f"trial {trial}")


def test_render_viewport_zoomed_out_reads_overview(spark, pyr_path):
    """render_viewport: a 4x zoomed-out viewport of an interior extent
    serves level-2 pixels on the exact requested grid."""
    from pyramidscheme_jl_spark.operators.raster import render_viewport

    ext = (32, 16, 160, 144)  # 128x128 world px
    ow = oh = 32              # 4x zoom out -> auto level 2
    df = render_viewport(spark, pyr_path, ext, (ow, oh), tilesize=64)
    got, _ = _collect_warp(df, ow, oh, 64)
    want = _replay(_level_mosaic(spark, pyr_path, 2), ow, oh, 128, 32, 128, 32, 32, 16, 2)
    np.testing.assert_array_equal(got, want)


def test_render_viewport_native_scale_equals_crop(spark, pyr_path):
    from pyramidscheme_jl_spark.operators.raster import render_viewport

    ext = (10, 20, 74, 84)
    df = render_viewport(spark, pyr_path, ext, (64, 64), tilesize=64)
    got, dtypes = _collect_warp(df, 64, 64, 64)
    assert dtypes == {"uint8"}
    np.testing.assert_array_equal(got, _base()[20:84, 10:74])


def test_render_viewport_validation(spark, pyr_path):
    from pyramidscheme_jl_spark.operators.raster import render_viewport

    with pytest.raises(ValueError, match="empty extent"):
        render_viewport(spark, pyr_path, (10, 10, 10, 40), (8, 8))


# ---------------------------------------------------------------------------
# bilinear resampling (r8): 4-neighbor blend at the center-rule sample
# position, exact rational weights, edge clamp, NN validity footprint
# ---------------------------------------------------------------------------


def _replay_bilinear(src, out_w, out_h, nx, dx, ny, dy, ox, oy, L):
    """Independent float replay of the documented bilinear contract over a
    level-L plane ``src``. Test configs keep sample positions off float
    rounding hazards (dyadic or knot-free rationals), so float floor ==
    exact-int floor."""
    lh, lw = src.shape
    X = np.arange(out_w, dtype=np.float64)
    Y = np.arange(out_h, dtype=np.float64)
    gx = (X + 0.5) * (nx / dx) + ox
    gy = (Y + 0.5) * (ny / dy) + oy
    fx = gx / (1 << L) - 0.5
    fy = gy / (1 << L) - 0.5
    i0x = np.floor(fx).astype(np.int64)
    i0y = np.floor(fy).astype(np.int64)
    rx = fx - i0x
    ry = fy - i0y
    jx0 = np.clip(i0x, 0, lw - 1)
    jx1 = np.clip(i0x + 1, 0, lw - 1)
    jy0 = np.clip(i0y, 0, lh - 1)
    jy1 = np.clip(i0y + 1, 0, lh - 1)
    v00 = src[jy0[:, None], jx0[None, :]]
    v10 = src[jy0[:, None], jx1[None, :]]
    v01 = src[jy1[:, None], jx0[None, :]]
    v11 = src[jy1[:, None], jx1[None, :]]
    out = ((1 - ry)[:, None] * ((1 - rx)[None, :] * v00 + rx[None, :] * v10)
           + ry[:, None] * ((1 - rx)[None, :] * v01 + rx[None, :] * v11))
    vx = (np.floor(gx) >= 0) & (np.floor(gx) < BASE)  # NN validity rule
    vy = (np.floor(gy) >= 0) & (np.floor(gy) < BASE)
    out[:, ~vx] = np.nan
    out[~vy, :] = np.nan
    return out


def test_bilinear_identity_equals_base(spark, pyr_path):
    # scale 1: sample positions land ON pixel centers -> zero-weight
    # neighbors, output == base values exactly, but dtype float64
    df = warp_affine(
        spark, pyr_path, (BASE, BASE), (1, 1), z=0, tilesize=64,
        resampling="bilinear",
    )
    got, dtypes = _collect_warp(df, BASE, BASE, 64)
    assert dtypes == {"float64"}
    np.testing.assert_array_equal(got, _base())


def test_bilinear_matches_replay_with_nodata_edges(spark, pyr_path):
    out_w, out_h = 160, 140
    df = warp_affine(
        spark, pyr_path, (out_w, out_h), (8, 5), (7, 4), offset=(-3, 5),
        z=0, tilesize=64, resampling="bilinear",
    )
    got, dtypes = _collect_warp(df, out_w, out_h, 64)
    assert dtypes == {"float64"}
    want = _replay_bilinear(_base(), out_w, out_h, 8, 5, 7, 4, -3, 5, 0)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_allclose(got[m], want[m], rtol=0, atol=1e-9)


def test_bilinear_values_are_exact_rationals(spark, pyr_path):
    # the int64-numerator contract: out * Qx * Qy must be exact integers
    out_w, out_h = 64, 64
    nx, dx, ny, dy = 8, 5, 7, 4
    df = warp_affine(
        spark, pyr_path, (out_w, out_h), (nx, dx), (ny, dy), offset=(3, 2),
        z=0, tilesize=64, resampling="bilinear",
    )
    got, _ = _collect_warp(df, out_w, out_h, 64)
    q = got[~np.isnan(got)] * (2 * dx) * (2 * dy)
    np.testing.assert_array_equal(q, np.rint(q))


def test_bilinear_from_overview_level(spark, pyr_path):
    # dyadic config (all float ops exact): scale 4, z=1, odd offset
    out = BASE // 4
    df = warp_affine(
        spark, pyr_path, (out, out), (4, 1), offset=(3, 5), z=1,
        tilesize=64, resampling="bilinear",
    )
    got, _ = _collect_warp(df, out, out, 64)
    want = _replay_bilinear(
        _level_mosaic(spark, pyr_path, 1), out, out, 4, 1, 4, 1, 3, 5, 1
    )
    m = ~np.isnan(want)
    np.testing.assert_array_equal(np.isnan(got), ~m)
    np.testing.assert_allclose(got[m], want[m], rtol=0, atol=1e-9)


def test_bilinear_upscale_interpolates_between_centers(spark, pyr_path):
    # 4x zoom-in: 3 of 4 output pixels between source centers get blends
    out_w, out_h = 128, 128
    df = warp_affine(
        spark, pyr_path, (out_w, out_h), (1, 4), offset=(40, 40), z=0,
        tilesize=64, resampling="bilinear",
    )
    got, _ = _collect_warp(df, out_w, out_h, 64)
    want = _replay_bilinear(_base(), out_w, out_h, 1, 4, 1, 4, 40, 40, 0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
    # and it genuinely interpolates: fractional values exist
    assert np.any(got != np.rint(got))


def test_bilinear_validation(spark, pyr_path):
    with pytest.raises(ValueError, match="resampling"):
        warp_affine(spark, pyr_path, (8, 8), (1, 1), resampling="cubic")


def test_render_viewport_bilinear_passthrough(spark, pyr_path):
    from pyramidscheme_jl_spark.operators.raster import render_viewport

    ext = (10, 20, 74, 84)  # native scale -> bilinear == crop exactly
    df = render_viewport(
        spark, pyr_path, ext, (64, 64), tilesize=64, resampling="bilinear"
    )
    got, dtypes = _collect_warp(df, 64, 64, 64)
    assert dtypes == {"float64"}
    np.testing.assert_array_equal(got, _base()[20:84, 10:74])
