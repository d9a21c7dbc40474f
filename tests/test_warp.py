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
