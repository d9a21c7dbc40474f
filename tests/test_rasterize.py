"""Vector->raster burn (raster.rasterize_polygons): paint-order pixel
semantics vs a numpy oracle, sparse-tile output, and the round trip into
the rest of the engine (write_level -> raster_extract / zonal_raster).
"""

import numpy as np
import pytest

from pyramidscheme_jl_spark.functions.cells import points_in_polygon
from pyramidscheme_jl_spark.functions.codec import decode_tile
from pyramidscheme_jl_spark.operators.raster import rasterize_polygons

W = 256  # 2x2 tiles of 128

POLYS = [
    # p2 overlaps p1; paint order must let p2 win on the overlap
    {"polygon_id": "p1", "ring": [[20.0, 20.0], [200.0, 30.0], [180.0, 210.0], [30.0, 190.0]], "value": 10.0},
    {"polygon_id": "p2", "ring": [[100.0, 100.0], [240.0, 110.0], [230.0, 230.0], [110.0, 220.0]], "value": 20.0},
]


def _plane() -> np.ndarray:
    plane = np.full((W, W), np.nan)
    ys, xs = np.mgrid[0:W, 0:W]
    for p in POLYS:
        m = points_in_polygon(
            xs.ravel() + 0.5, ys.ravel() + 0.5, np.asarray(p["ring"])
        ).reshape(W, W)
        plane[m] = p["value"]
    return plane


def test_rasterize_matches_paint_oracle(spark):
    tiles = rasterize_polygons(spark, POLYS, (W, W), tilesize=128).collect()
    plane = _plane()
    seen = np.zeros((W, W), dtype=bool)
    for r in tiles:
        assert r["z"] == 0
        arr = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"], r["c"])
        x0, y0 = r["tx"] * 128, r["ty"] * 128
        want = plane[y0 : y0 + r["h"], x0 : x0 + r["w"]]
        assert ((arr == want) | (np.isnan(arr) & np.isnan(want))).all(), (r["tx"], r["ty"])
        seen[y0 : y0 + r["h"], x0 : x0 + r["w"]] = True
    # sparse contract: every burned pixel lives in an emitted tile, and
    # every emitted tile has at least one burned pixel
    assert not ((~np.isnan(plane)) & (~seen)).any()
    for r in tiles:
        arr = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"], r["c"])
        assert np.isfinite(arr).any()
    # the overlap region took p2's value (paint order, last wins)
    assert plane[150, 150] == 20.0


def test_rasterize_fill_and_dtype(spark):
    tiles = rasterize_polygons(
        spark, POLYS, (W, W), tilesize=128, fill=0.0, dtype="uint8"
    ).collect()
    plane = _plane()
    for r in tiles:
        assert r["dtype"] == "uint8"
        arr = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"], r["c"])
        x0, y0 = r["tx"] * 128, r["ty"] * 128
        want = plane[y0 : y0 + r["h"], x0 : x0 + r["w"]].copy()
        want[np.isnan(want)] = 0.0
        assert (arr == want.astype(np.uint8)).all()


def test_rasterize_duplicate_id_raises(spark):
    with pytest.raises(ValueError, match="duplicate"):
        rasterize_polygons(spark, [POLYS[0], POLYS[0]], (W, W))


def test_rasterize_empty_and_offworld(spark):
    assert rasterize_polygons(spark, [], (W, W)).count() == 0


def test_rasterize_roundtrip_into_engine(spark, tmp_path):
    """The burned tiles are first-class: write_level + multiscales makes a
    pyramid base that raster_extract and zonal_raster consume unchanged."""
    from pyramidscheme_jl_spark.operators.joins import raster_extract, zonal_raster
    from pyramidscheme_jl_spark.sources.catalog import write_level, write_multiscales

    path = str(tmp_path / "burned")
    tiles = rasterize_polygons(spark, POLYS, (W, W), tilesize=128)
    write_level(tiles, path, 0)
    write_multiscales(path, 0, 128, W, W, "rasterize", "none")
    plane = _plane()

    pts = [("in1", 50.0, 60.0), ("in2", 150.0, 150.0), ("nod", 5.0, 250.0)]
    df = spark.createDataFrame(pts, "point_id string, x double, y double")
    got = {r["point_id"]: r["value"] for r in raster_extract(spark, path, df, z=0).collect()}
    assert got["in1"] == plane[60, 50] == 10.0
    assert got["in2"] == plane[150, 150] == 20.0
    # the nodata point lands on a stored tile but a NaN pixel: value is
    # NaN (Arrow surfaces it as null on collect)
    assert "nod" not in got or got["nod"] is None or np.isnan(got["nod"])

    ring = [[10.0, 10.0], [240.0, 12.0], [235.0, 240.0], [12.0, 235.0]]
    zr = zonal_raster(spark, path, [{"polygon_id": "all", "ring": ring}], z=0).collect()
    m = points_in_polygon(
        (np.mgrid[0:W, 0:W][1].ravel() + 0.5),
        (np.mgrid[0:W, 0:W][0].ravel() + 0.5),
        np.asarray(ring),
    ).reshape(W, W)
    v = plane[m & ~np.isnan(plane)]
    assert zr[0]["n_px"] == len(v) and zr[0]["sum_px"] == v.sum()
