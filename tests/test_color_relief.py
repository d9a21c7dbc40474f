"""color_relief (gdaldem color-relief analog): scalar per-pixel replay
of the interpolate/nearest LUT rules, NaN-black, clamping, tie pins."""

import numpy as np
import pytest

from pyramidscheme_jl_spark.functions.codec import decode_tile
from pyramidscheme_jl_spark.operators.build import (
    PyramidSpec,
    _rows_to_pdf,
    _tile_row,
)
from pyramidscheme_jl_spark.operators.raster import color_relief
from pyramidscheme_jl_spark.sources.catalog import (
    write_level_driver,
    write_multiscales,
)

TS = 32
RAMP = [(0.0, (0, 0, 128)), (100.0, (255, 255, 0)), (200.0, (255, 0, 0))]


def _write_plane(a, path):
    h, w = a.shape
    spec = PyramidSpec(w, h, TS)
    rows = []
    for ty in range(-(-h // TS)):
        for tx in range(-(-w // TS)):
            rows.append(_tile_row(
                spec, 0, tx, ty, a[ty*TS:(ty+1)*TS, tx*TS:(tx+1)*TS]))
    write_level_driver(_rows_to_pdf(rows).to_dict("records"), path, 0)
    write_multiscales(path, 0, TS, w, h, "none", "-")


def _brute(a, ramp, nearest):
    bv = [v for v, _ in ramp]
    bc = [c for _, c in ramp]
    h, w = a.shape
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            v = a[y, x]
            if not np.isfinite(v):
                continue
            v = min(max(v, bv[0]), bv[-1])
            i = 0
            while i < len(bv) - 2 and v >= bv[i + 1]:
                i += 1
            if nearest:
                pick = i if (v - bv[i]) <= (bv[i + 1] - v) else i + 1
                out[y, x] = bc[pick]
            else:
                for ch in range(3):
                    c0, c1 = bc[i][ch], bc[i + 1][ch]
                    frac = ((v - bv[i]) * (c1 - c0)) / (bv[i + 1] - bv[i])
                    out[y, x, ch] = int(np.floor(c0 + frac + 0.5))
    return out


@pytest.fixture(scope="module")
def plane():
    rng = np.random.RandomState(7)
    a = rng.randint(-20, 240, size=(64, 64)).astype(np.float64)  # clamps both ends
    a[5:9, 5:9] = np.nan
    a[0, 0] = 100.0   # exact middle breakpoint
    a[0, 1] = 50.0    # exact nearest-tie midpoint -> lower breakpoint
    return a


@pytest.fixture(scope="module")
def plane_path(spark, plane, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cr") / "pyr")
    _write_plane(plane, path)
    return path


@pytest.mark.parametrize("nearest", [False, True])
def test_color_relief_matches_brute(spark, plane, plane_path, nearest):
    rows = color_relief(spark, plane_path, RAMP, nearest=nearest).collect()
    got = np.zeros((64, 64, 3), dtype=np.uint8)
    for r in rows:
        assert r.c == 3 and r.dtype == "uint8"
        t = decode_tile(r.bytes, r.h, r.w, r.dtype, r.c)
        got[r.ty*TS:r.ty*TS+r.h, r.tx*TS:r.tx*TS+r.w] = t
    want = _brute(plane, RAMP, nearest)
    np.testing.assert_array_equal(got, want)
    assert (got[5, 5] == 0).all()                 # NaN -> black
    if not nearest:
        assert tuple(got[0, 0]) == (255, 255, 0)  # exact breakpoint
    else:
        assert tuple(got[0, 1]) == (0, 0, 128)    # midpoint tie -> lower


def test_color_relief_validation(spark, plane_path):
    with pytest.raises(ValueError, match="at least 2"):
        color_relief(spark, plane_path, [(0.0, (0, 0, 0))])
    with pytest.raises(ValueError, match="duplicate"):
        color_relief(spark, plane_path, [(1.0, (0, 0, 0)), (1.0, (1, 1, 1))])
    with pytest.raises(ValueError, match="0..255"):
        color_relief(spark, plane_path, [(0.0, (0, 0, 300)), (1.0, (0, 0, 0))])


def test_color_relief_warp_identity_rgb(spark, plane, plane_path, tmp_path):
    """Serving the colored raster: identity-scale warp_affine over the
    c=3 relief level reproduces every RGB pixel exactly (the warp gather
    is channel-aware)."""
    from pyramidscheme_jl_spark.operators.raster import warp_affine
    from pyramidscheme_jl_spark.sources.catalog import (
        write_level,
        write_multiscales,
    )

    relief = str(tmp_path / "relief")
    write_level(color_relief(spark, plane_path, RAMP), relief, 0)
    write_multiscales(relief, 0, TS, 64, 64, "relief", "-")
    rows = warp_affine(spark, relief, (64, 64), (1, 1), z=0,
                       tilesize=TS).collect()
    got = np.zeros((64, 64, 3), dtype=np.uint8)
    for r in rows:
        assert r.c == 3
        got[r.ty*TS:r.ty*TS+r.h, r.tx*TS:r.tx*TS+r.w] = decode_tile(
            r.bytes, r.h, r.w, r.dtype, r.c)
    np.testing.assert_array_equal(got, _brute(plane, RAMP, False))
