"""L3 CRS bbox transforms (reference trans_bounds, src/PyramidScheme.jl:491-503)."""

import numpy as np
import pytest

from pyramidscheme_jl_spark.functions.crs import (
    LAT_MAX,
    MERC_MAX,
    affine_transform,
    bbox_transform,
    lonlat_to_mercator,
    mercator_to_lonlat,
    trans_bounds,
)


def test_mercator_pinned_values():
    x, y = lonlat_to_mercator([0.0, 180.0, -180.0], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(x, [0.0, MERC_MAX, -MERC_MAX])
    np.testing.assert_allclose(y, [0.0, 0.0, 0.0], atol=1e-9)
    # canonical pinned pair: (lon 10, lat 53) -> EPSG:3857
    x, y = lonlat_to_mercator(10.0, 53.0)
    assert float(x) == pytest.approx(1113194.9079327357)
    assert float(y) == pytest.approx(6982997.920389788, rel=1e-12)
    # poleward clamp at the mercator cutoff
    _, ytop = lonlat_to_mercator(0.0, 90.0)
    assert float(ytop) == pytest.approx(MERC_MAX, rel=1e-9)


def test_mercator_roundtrip():
    rng = np.random.RandomState(0)
    lon = rng.uniform(-179, 179, 100)
    lat = rng.uniform(-LAT_MAX, LAT_MAX, 100)
    lon2, lat2 = mercator_to_lonlat(*lonlat_to_mercator(lon, lat))
    np.testing.assert_allclose(lon2, lon, rtol=1e-12)
    np.testing.assert_allclose(lat2, lat, rtol=1e-9)


def test_trans_bounds_densify_beats_corners():
    # a nonlinear map whose edge extremum is interior: y' = y + 4(x-0.5)^2 —
    # the bottom edge's minimum (y'=0 at x=0.5) is invisible to corner-only
    # sampling (corners give y'=1), the exact failure densification fixes
    def fn(x, y):
        x = np.asarray(x, dtype=np.float64)
        return x, np.asarray(y, dtype=np.float64) + 4.0 * (x - 0.5) ** 2

    bbox = (0.0, 0.0, 1.0, 1.0)
    corners_only = trans_bounds(fn, bbox, densify_pts=2)
    densified = trans_bounds(fn, bbox, densify_pts=21)
    assert corners_only[1] == pytest.approx(1.0)
    assert densified[1] == pytest.approx(0.0)


def test_affine_and_read_window_hook(spark, tmp_path):
    from pyramidscheme_jl_spark.api import PyramidDataset
    from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, synth_images

    images = spark.createDataFrame(synth_images(G=4), IMAGES_DDL)
    p = PyramidDataset.build(spark, images, str(tmp_path / "c"), G=4, run_id="crs")
    # world CRS = pixel/2 units offset by 100: affine back into pixel space
    to_px = affine_transform(2.0, 0.0, -200.0, 0.0, 2.0, -200.0)
    w = p.read_window((100.0, 100.0, 612.0, 612.0), (256, 256), bbox_transform=bbox_transform(to_px))
    wd = p.read_window((0.0, 0.0, 1024.0, 1024.0), (256, 256))
    assert w["z"] == wd["z"] == 2
    np.testing.assert_array_equal(w["data"], wd["data"])
