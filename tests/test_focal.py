"""Focal statistics (r7): halo-exchange neighborhood stats pinned
against a numpy replay over the full assembled mosaic (the ground truth
with no tile boundaries at all)."""

from __future__ import annotations

import numpy as np
import pytest

from pyramidscheme_jl_spark.operators.raster import focal_stats


@pytest.fixture(scope="module")
def pyr(spark, tmp_path_factory):
    from pyramidscheme_jl_spark.operators.build import build_pyramid
    from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, synth_images

    root = str(tmp_path_factory.mktemp("focal") / "pyr")
    images = spark.createDataFrame(synth_images(G=4, size=32), IMAGES_DDL)
    build_pyramid(spark, images, root, G=4, reducer="mean", tilesize=32,
                  run_id="focal-test")
    # the known closed-form mosaic: v = (16*((px//32)+(py//32)) ^ ... ) —
    # regenerate from the synth formula by decoding the built base
    from pyramidscheme_jl_spark.functions.codec import decode_tile
    from pyramidscheme_jl_spark.sources.catalog import read_level

    full = np.zeros((128, 128), dtype=np.uint8)
    for r in read_level(spark, root, 0).collect():
        a = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"])
        full[r["ty"] * 32:(r["ty"] + 1) * 32, r["tx"] * 32:(r["tx"] + 1) * 32] = a
    return root, full


def _replay(full, stat, r):
    H, W = full.shape
    out = np.zeros((H, W), dtype=np.float64)
    for y in range(H):
        for x in range(W):
            win = full[max(0, y - r):y + r + 1, max(0, x - r):x + r + 1]
            out[y, x] = {
                "mean": win.mean(), "sum": win.sum(), "count": win.size,
                "min": win.min(), "max": win.max(),
            }[stat]
    return out


@pytest.mark.parametrize("stat", ["mean", "sum", "count", "min", "max"])
def test_focal_matches_full_mosaic_replay(spark, pyr, stat):
    root, full = pyr
    from pyramidscheme_jl_spark.functions.codec import decode_tile

    rows = focal_stats(spark, root, z=0, stat=stat).collect()
    assert len(rows) == 16
    got = np.zeros((128, 128), dtype=np.float64)
    for r in rows:
        a = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"])
        got[r["ty"] * 32:(r["ty"] + 1) * 32, r["tx"] * 32:(r["tx"] + 1) * 32] = a
    expect = _replay(full, stat, 1)
    if stat == "mean":
        assert np.array_equal(got, expect)  # bit-exact: int sums / IEEE div
    else:
        assert np.array_equal(got, expect)


def test_focal_radius2_and_errors(spark, pyr):
    root, full = pyr
    from pyramidscheme_jl_spark.functions.codec import decode_tile

    rows = focal_stats(spark, root, z=0, stat="sum", radius=2).collect()
    got = np.zeros((128, 128), dtype=np.float64)
    for r in rows:
        a = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"])
        got[r["ty"] * 32:(r["ty"] + 1) * 32, r["tx"] * 32:(r["tx"] + 1) * 32] = a
    assert np.array_equal(got, _replay(full, "sum", 2))
    with pytest.raises(ValueError, match="stat"):
        focal_stats(spark, root, stat="median")
    with pytest.raises(ValueError, match="radius"):
        focal_stats(spark, root, radius=0)
