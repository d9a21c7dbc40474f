"""export_xyz (sources.export): slippy-map {z}/{x}/{y}.png directory from
a stored pyramid — executor-side atomic writes through the fsio seam,
PNG round-trip pinned with the repo's own decoder."""

import json
import os

import numpy as np
import pytest

from pyramidscheme_jl_spark.functions.codec import decode_tile
from pyramidscheme_jl_spark.functions.media_codecs import decode_png
from pyramidscheme_jl_spark.operators.build import build_pyramid
from pyramidscheme_jl_spark.sources.catalog import read_level
from pyramidscheme_jl_spark.sources.export import export_xyz
from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, synth_images

G, SIZE = 4, 64  # 256x256 uint8 base, tiles 64; levels 0..2


@pytest.fixture(scope="module")
def pyr_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xyz") / "pyr")
    images = spark.createDataFrame(synth_images(G=G, size=SIZE), IMAGES_DDL)
    build_pyramid(spark, images, path, G=G, reducer="mean", tilesize=SIZE, run_id="t")
    return path


def test_export_xyz_layout_and_roundtrip(spark, pyr_path, tmp_path):
    out = str(tmp_path / "tiles")
    res = export_xyz(spark, pyr_path, out, vmin=0.0, vmax=255.0)
    # 4x4 base + 2x2 + 1 = 21 tiles; base z=0 -> xyz z=2
    assert res == {"tiles": 21, "bytes": res["bytes"], "max_zoom": 2}
    assert res["bytes"] > 0
    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta["max_zoom"] == 2 and meta["tilesize"] == SIZE
    # layout: {z}/{x}/{y}.png with y DOWN from the top (XYZ)
    assert sorted(os.listdir(out)) == ["0", "1", "2", "metadata.json"]
    assert os.path.exists(os.path.join(out, "0", "0", "0.png"))
    assert os.path.exists(os.path.join(out, "2", "3", "3.png"))
    # uint8 base passes through EXACTLY (vmin/vmax ignored for uint8)
    for r in read_level(spark, pyr_path, 0).collect():
        buf = open(os.path.join(out, "2", str(r.tx), f"{r.ty}.png"), "rb").read()
        img = decode_png(buf)
        src = decode_tile(r.bytes, r.h, r.w, r.dtype, r.c)
        np.testing.assert_array_equal(img.squeeze(), src)


def test_export_xyz_float_levels_stretched(spark, pyr_path, tmp_path):
    out = str(tmp_path / "tiles")
    export_xyz(spark, pyr_path, out, vmin=0.0, vmax=255.0)
    # level 1 is the float64 mean overview: stretched by the exact
    # round-half-up rule
    r = read_level(spark, pyr_path, 1).collect()[0]
    src = decode_tile(r.bytes, r.h, r.w, r.dtype, r.c).astype(np.float64)
    want = np.floor(np.clip(src, 0, 255) * 255.0 / 255.0 + 0.5).astype(np.uint8)
    img = decode_png(
        open(os.path.join(out, "1", str(r.tx), f"{r.ty}.png"), "rb").read()
    )
    np.testing.assert_array_equal(img.squeeze(), want)


def test_export_xyz_float_without_range_raises(spark, pyr_path, tmp_path):
    import re

    from py4j.protocol import Py4JJavaError

    out = str(tmp_path / "tiles")
    with pytest.raises(Exception, match="display range|vmin"):
        export_xyz(spark, pyr_path, out)  # float overviews need vmin/vmax


def test_export_xyz_validation(spark, pyr_path, tmp_path):
    with pytest.raises(ValueError, match="vmin < vmax"):
        export_xyz(spark, pyr_path, str(tmp_path / "x"), vmin=5.0, vmax=5.0)
    with pytest.raises(ValueError, match="vmin < vmax"):
        export_xyz(spark, pyr_path, str(tmp_path / "y"), vmin=1.0)


def test_export_xyz_ragged_edges_zero_padded(spark, tmp_path):
    """A 96x80 base (ragged right/bottom tiles) exports full-size tiles
    with zero padding outside the raster."""
    from pyramidscheme_jl_spark.operators.build import PyramidSpec, _rows_to_pdf, _tile_row
    from pyramidscheme_jl_spark.sources.catalog import (
        TILE_SCHEMA, write_level, write_multiscales,
    )

    w, h, ts = 96, 80, 64
    a = (np.arange(h * w, dtype=np.int64).reshape(h, w) % 251).astype(np.uint8)
    spec = PyramidSpec(w, h, ts)
    rows = []
    for ty in range(2):
        for tx in range(2):
            blk = a[ty * ts : (ty + 1) * ts, tx * ts : (tx + 1) * ts]
            if blk.size:
                rows.append(_tile_row(spec, 0, tx, ty, blk))
    path = str(tmp_path / "ragged")
    write_level(spark.createDataFrame(_rows_to_pdf(rows), TILE_SCHEMA), path, 0)
    write_multiscales(path, 0, ts, w, h, "m", "-")
    out = str(tmp_path / "tiles")
    export_xyz(spark, path, out)
    img = decode_png(open(os.path.join(out, "0", "1", "1.png"), "rb").read()).squeeze()
    assert img.shape == (ts, ts)
    np.testing.assert_array_equal(img[:16, :32], a[64:80, 64:96])
    assert (img[16:, :] == 0).all() and (img[:, 32:] == 0).all()


def test_export_xyz_rgb_color_relief_roundtrip(spark, pyr_path, tmp_path):
    """The colored web-map composition: color_relief (c=3 uint8) ->
    write_level -> export_xyz -> decode one PNG back, pixel-exact. RGB
    tiles need no display stretch (already uint8)."""
    from pyramidscheme_jl_spark.operators.raster import color_relief
    from pyramidscheme_jl_spark.sources.catalog import (
        write_level,
        write_multiscales,
    )

    ramp = [(0.0, (0, 0, 128)), (128.0, (0, 255, 0)), (255.0, (255, 0, 0))]
    relief = str(tmp_path / "relief")
    write_level(color_relief(spark, pyr_path, ramp, z=0), relief, 0)
    write_multiscales(relief, 0, SIZE, G * SIZE, G * SIZE, "relief", "-")
    out = str(tmp_path / "tiles")
    res = export_xyz(spark, relief, out)
    assert res["tiles"] == G * G
    png = decode_png(open(os.path.join(out, "0", "1", "2.png"), "rb").read())
    assert png.shape == (SIZE, SIZE, 3)
    row = [r for r in read_level(spark, relief, 0).collect()
           if r.tx == 1 and r.ty == 2][0]
    want = decode_tile(row.bytes, row.h, row.w, row.dtype, row.c)
    np.testing.assert_array_equal(png, want)
