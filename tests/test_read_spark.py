"""Read-path operators: windowed reads, subsetting, broadcast math, equality,
concat — reproducing reference test items 2, 5, 7, 8, 9 (SURVEY.md §5)."""

import numpy as np
import pytest

from pyramidscheme_jl_spark.operators.build import PyramidSpec, build_pyramid
from pyramidscheme_jl_spark.operators.read import (
    cat_tiles_x,
    check_level_compat,
    map_tiles,
    pyramids_equal,
    read_window,
    stack_bands,
    subset_tiles,
    zip_tiles,
)
from pyramidscheme_jl_spark.plans.grid import level_shape
from pyramidscheme_jl_spark.sources.catalog import read_tiles
from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, mosaic_pixels, synth_images
from tests.test_build_spark import oracle_levels


@pytest.fixture(scope="module")
def pyr(spark, tmp_path_factory):
    """One shared G=4 mean pyramid on disk."""
    path = str(tmp_path_factory.mktemp("readpyr") / "p")
    images = spark.createDataFrame(synth_images(G=4), IMAGES_DDL)
    spec = build_pyramid(spark, images, path, G=4, reducer="mean", run_id="read")
    return path, spec


def test_read_window_full_extent_small_target(spark, pyr):
    path, spec = pyr
    arr, ax, ay, z = read_window(spark, path, spec, (0, 0, 1024, 1024), (256, 256))
    assert z == 2 and arr.shape == (256, 256)
    oracle = oracle_levels(mosaic_pixels(G=4), "mean", 2)[2]
    np.testing.assert_allclose(arr, oracle, rtol=1e-12)
    # selectlevel invariant: result within [target/2, target]
    assert 128 <= arr.shape[0] <= 256
    # midpoint axes: level-2 pixel centers at 2^z-block midpoints
    assert ax[0] == pytest.approx(2.0) and ax[1] - ax[0] == pytest.approx(4.0)


def test_read_window_zoomed_hits_base(spark, pyr):
    path, spec = pyr
    arr, ax, ay, z = read_window(spark, path, spec, (100, 200, 300, 350), (256, 256))
    assert z == 0
    np.testing.assert_array_equal(arr, mosaic_pixels(G=4)[200:350, 100:300])
    assert ax[0] == pytest.approx(100.5)


def test_read_window_partial_level(spark, pyr):
    path, spec = pyr
    # 512-px extent at 256 target -> level 1, crop of the level-1 plane
    arr, *_, z = read_window(spark, path, spec, (0, 0, 512, 512), (256, 256))
    assert z == 1
    oracle = oracle_levels(mosaic_pixels(G=4), "mean", 1)[1][0:256, 0:256]
    np.testing.assert_allclose(arr, oracle, rtol=1e-12)


def test_read_window_empty_extent(spark, pyr):
    path, spec = pyr
    arr, *_ = read_window(spark, path, spec, (5000, 5000, 6000, 6000), (256, 256))
    assert arr.size == 0  # short-circuit (ref :456)


def test_subset_prunes_tiles(spark, pyr):
    path, spec = pyr
    tiles = read_tiles(spark, path)
    sub = subset_tiles(tiles, 0, 512, 0, 512)
    counts = {r["z"]: r["count"] for r in sub.groupBy("z").count().collect()}
    # base: 2x2 tiles; level1: 1 tile (512px -> 256px window); level2: 1
    assert counts == {0: 4, 1: 1, 2: 1}
    # plan must show pushed filters on tx/ty (scan-level pruning)
    plan = sub.where("z = 0")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "tx" in plan


def test_map_tiles_threshold_and_abs(spark, pyr):
    path, spec = pyr
    tiles = read_tiles(spark, path).where("z = 2")
    lt = map_tiles(tiles, "lt", scalar=100.0).collect()[0]
    oracle = oracle_levels(mosaic_pixels(G=4), "mean", 2)[2]
    from pyramidscheme_jl_spark.functions.codec import decode_tile

    got = decode_tile(lt["bytes"], lt["h"], lt["w"], lt["dtype"])
    np.testing.assert_array_equal(got, (oracle < 100.0).astype(np.uint8))
    with pytest.raises(KeyError):
        map_tiles(tiles, "nope")
    with pytest.raises(ValueError):
        map_tiles(tiles, "add")  # binary op needs scalar


def test_zip_sub_self_is_zero_everywhere(spark, pyr):
    # p .- p == 0 on every level (reference test/broadcast.jl:9-17)
    path, spec = pyr
    tiles = read_tiles(spark, path)
    diff = zip_tiles(tiles, tiles, "sub")
    assert diff.count() == 16 + 4 + 1
    stats = diff.agg({"vmin": "min", "vmax": "max"}).collect()[0]
    assert stats["min(vmin)"] == 0.0 and stats["max(vmax)"] == 0.0
    # (p-p)+1 sums to the element count per level
    plus1 = map_tiles(diff, "add", scalar=1.0)
    import pyspark.sql.functions as F

    sums = {
        r["z"]: r["s"]
        for r in plus1.groupBy("z")
        .agg(F.sum(F.col("vmean") * F.col("w") * F.col("h") * F.col("c")).alias("s"))
        .collect()
    }
    for z in (0, 1, 2):
        w, h = level_shape((1024, 1024), z)
        assert sums[z] == pytest.approx(w * h)


def test_level_compat_mismatch_raises(spark, pyr, tmp_path):
    # level-count mismatch errors (reference src/broadcast.jl:59-67)
    path, spec = pyr
    images8 = spark.createDataFrame(synth_images(G=8), IMAGES_DDL)
    p8 = str(tmp_path / "p8")
    build_pyramid(spark, images8, p8, G=8, reducer="mean", run_id="c8")
    a = read_tiles(spark, path)
    b = read_tiles(spark, p8)
    with pytest.raises(ValueError, match="different level counts"):
        check_level_compat(a, b)
    with pytest.raises(ValueError):
        zip_tiles(a, b, "sub")


def test_pyramids_equal_semantics(spark, pyr, tmp_path):
    path, spec = pyr
    a = read_tiles(spark, path)
    assert pyramids_equal(a, a)
    assert pyramids_equal(a, a, rtol=1e-9)
    # pyramid differing only in reducer is NOT equal (ref test/runtests.jl:201-220)
    images = spark.createDataFrame(synth_images(G=4), IMAGES_DDL)
    pmin = str(tmp_path / "pmin")
    build_pyramid(spark, images, pmin, G=4, reducer="min", run_id="eq2")
    assert not pyramids_equal(a, read_tiles(spark, pmin))


def test_cat_x_levelwise_equals_cat_of_levels(spark, pyr):
    # cat along X: level-by-level equal to cat of levels (ref test/runtests.jl:130-143)
    path, spec = pyr
    a = read_tiles(spark, path)
    wide = cat_tiles_x(a, a, spec)
    assert wide.count() == 2 * (16 + 4 + 1)
    # assembled level 1 equals hstack of the level-1 oracle with itself
    rows = wide.where("z = 1").collect()
    l1 = oracle_levels(mosaic_pixels(G=4), "mean", 1)[1]
    want = np.hstack([l1, l1])
    from pyramidscheme_jl_spark.functions.codec import decode_tile

    got = np.zeros_like(want)
    for r in rows:
        a_ = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"])
        got[r["ty"] * 256 : r["ty"] * 256 + r["h"], r["tx"] * 256 : r["tx"] * 256 + r["w"]] = a_
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # extents shifted
    assert wide.agg({"xmax": "max"}).collect()[0][0] == 2048.0


def test_stack_bands(spark, pyr):
    path, spec = pyr
    a = read_tiles(spark, path).where("z = 2")
    two = stack_bands(a, a)
    r = two.collect()[0]
    assert r["c"] == 2
    from pyramidscheme_jl_spark.functions.codec import decode_tile

    arr = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"], 2)
    np.testing.assert_array_equal(arr[:, :, 0], arr[:, :, 1])


def test_cat_y_and_nary(spark, pyr):
    """VERDICT r1 #5: cat along Y and 3-way cat along a new dim, mirroring
    the reference's 3-pyramid cat test level-by-level
    (test/runtests.jl:130-143)."""
    from pyramidscheme_jl_spark.functions.codec import decode_tile
    from pyramidscheme_jl_spark.operators.read import cat_bands, cat_tiles

    path, spec = pyr
    a = read_tiles(spark, path)
    # --- cat along Y ---
    tall = cat_tiles([(a, spec), (a, spec)], axis="y")
    assert tall.count() == 2 * (16 + 4 + 1)
    l1 = oracle_levels(mosaic_pixels(G=4), "mean", 1)[1]
    want = np.vstack([l1, l1])
    got = np.zeros_like(want)
    for r in tall.where("z = 1").collect():
        a_ = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"])
        got[r["ty"] * 256 : r["ty"] * 256 + r["h"], r["tx"] * 256 : r["tx"] * 256 + r["w"]] = a_
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert tall.agg({"ymax": "max"}).collect()[0][0] == 2048.0
    # --- 3-ary cat along X (variadic like Base.cat(A1, As...)) ---
    wide3 = cat_tiles([(a, spec), (a, spec), (a, spec)], axis="x")
    assert wide3.count() == 3 * 21
    assert wide3.agg({"xmax": "max"}).collect()[0][0] == 3072.0
    # --- 3-ary cat along a NEW dim (the reference's pyrcat3) ---
    three = cat_bands([a, a, a])
    rows = {(r["z"], r["tx"], r["ty"]): r for r in three.collect()}
    assert len(rows) == 21 and all(r["c"] == 3 for r in rows.values())
    r = rows[(2, 0, 0)]
    arr = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"], 3)
    oracle2 = oracle_levels(mosaic_pixels(G=4), "mean", 2)[2]
    for band in range(3):
        np.testing.assert_allclose(arr[:, :, band], oracle2, rtol=1e-12)


def test_api_read_and_materialize(spark, pyr):
    """P3 modify/read analog (reference src/PyramidScheme.jl:109-116)."""
    from pyramidscheme_jl_spark.api import PyramidDataset

    path, spec = pyr
    p = PyramidDataset.open(spark, path)
    full = p.read()
    assert set(full) == {0, 1, 2}
    oracle = oracle_levels(mosaic_pixels(G=4), "mean", 2)
    np.testing.assert_allclose(full[2], oracle[2], rtol=1e-12)
    np.testing.assert_array_equal(full[0], mosaic_pixels(G=4))
    # materialize pins levels; results unchanged, storage marked cached
    p.materialize()
    assert p.levels().storageLevel.useMemory
    np.testing.assert_allclose(p.read(2), oracle[2], rtol=1e-12)
    p.unpersist()
    assert not p.levels().storageLevel.useMemory


def _one_tile_df(spark, arr, z=0, tx=0, ty=0):
    from pyramidscheme_jl_spark.functions.codec import encode_tile
    from pyramidscheme_jl_spark.sources.catalog import TILE_SCHEMA

    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    af = arr.astype(np.float64)
    row = (
        z, tx, ty, encode_tile(arr), w, h, c, str(arr.dtype.name),
        float(af.min()), float(af.max()), float(af.mean()),
        0, 0.0, 0.0, float(w), float(h),
    )
    return spark.createDataFrame([row], TILE_SCHEMA)


def test_cat_bands_promotes_dtype(spark):
    """ADVICE r2: stacking a float pyramid onto a uint8 base must promote
    (Base.cat semantics), not wrap/truncate into the first dtype."""
    from pyramidscheme_jl_spark.functions.codec import decode_tile
    from pyramidscheme_jl_spark.operators.read import cat_bands

    u8 = np.full((4, 4), 200, dtype=np.uint8)
    f64 = np.full((4, 4), 300.5, dtype=np.float64)
    a = _one_tile_df(spark, u8)
    b = _one_tile_df(spark, f64)
    r = cat_bands([a, b]).collect()[0]
    assert r["dtype"] == "float64" and r["c"] == 2
    arr = decode_tile(r["bytes"], r["h"], r["w"], r["dtype"], 2)
    np.testing.assert_array_equal(arr[:, :, 0], 200.0)
    np.testing.assert_array_equal(arr[:, :, 1], 300.5)  # not wrapped to 44

    r2 = stack_bands(a, b).collect()[0]
    assert r2["dtype"] == "float64"
    arr2 = decode_tile(r2["bytes"], r2["h"], r2["w"], r2["dtype"], 2)
    np.testing.assert_array_equal(arr2[:, :, 1], 300.5)


def test_equals_is_reducer_aware(spark, tmp_path):
    """VERDICT r2 #5: identical PIXELS but a different reducer must compare
    unequal at the dataset level (lineage reducer_hash consulted before
    bytes, reference 'different resampling => not equal' semantics)."""
    from pyramidscheme_jl_spark.api import PyramidDataset
    from pyramidscheme_jl_spark.functions.codec import encode_tile

    # constant mosaic: min-, and max-downsampled levels are pixel-identical
    const = np.full((256, 256), 42, dtype=np.uint8)
    rows = [
        {
            "image_id": f"img-{i:08d}", "bytes": encode_tile(const),
            "w": 256, "h": 256, "fmt": "raw",
            "caption": "const", "phash": 0,
        }
        for i in range(4)
    ]
    images = spark.createDataFrame(rows, IMAGES_DDL)
    pa_ = PyramidDataset.build(spark, images, str(tmp_path / "pmin"), G=2,
                               reducer="min", run_id="eqr1")
    pb = PyramidDataset.build(spark, images, str(tmp_path / "pmax"), G=2,
                              reducer="max", run_id="eqr2")
    pc = PyramidDataset.build(spark, images, str(tmp_path / "pmin2"), G=2,
                              reducer="min", run_id="eqr3")
    # raw tiles are byte-identical...
    assert pyramids_equal(pa_.levels(), pb.levels())
    # ...but the dataset-level isequal consults lineage: reducer differs
    assert not pa_.equals(pb)
    assert pa_.equals(pc)  # same reducer, same pixels


def test_threshold_query_skips_tiles_via_stats(spark, pyr):
    """F4 tile skipping (VERDICT r3 #7): the vmin/vmax stats predicate is
    pushed into the parquet scan, provably prunes tiles, and the pruned-
    then-masked result equals the full mask restricted to non-empty
    tiles (skipped tiles are guaranteed all-zero masks)."""
    from pyramidscheme_jl_spark.functions.codec import decode_tile
    from pyramidscheme_jl_spark.operators.read import prune_tiles_by_stats

    # dedicated fixture: constant-valued tiles so per-tile maxima differ
    # (the shared mosaic's tiles all span 0-255 — nothing could prune)
    import numpy as _np

    from pyramidscheme_jl_spark.operators.build import build_pyramid
    from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL

    G = 4
    rows = [
        {
            "image_id": f"img-{i:08d}",
            "bytes": _np.full((256, 256), 10 * i, dtype=_np.uint8).tobytes(),
            "w": 256, "h": 256, "fmt": "raw", "caption": "c", "phash": 0,
        }
        for i in range(G * G)
    ]
    import tempfile as _tf

    path = _tf.mkdtemp(prefix="statspyr_")
    build_pyramid(
        spark, spark.createDataFrame(rows, IMAGES_DDL), path, G=G,
        reducer="mean", run_id="stats",
    )
    tiles = read_tiles(spark, path).where("z = 0")
    maxes = sorted(r["vmax"] for r in tiles.select("vmax").collect())
    thr = (maxes[0] + maxes[-1]) / 2.0  # between the distinct tile maxima
    pruned = prune_tiles_by_stats(tiles, "gt", thr)
    n_all, n_kept = tiles.count(), pruned.count()
    assert 0 < n_kept < n_all  # real skipping, not a no-op

    # the predicate reaches the scan: pushed on the plain vmax column
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "vmax" in plan

    # exactness: every tile with any hit survives the prune, with the
    # identical mask; every skipped tile's mask is all-zero
    full = {
        (r["tx"], r["ty"]): decode_tile(r["bytes"], r["h"], r["w"], r["dtype"], r["c"])
        for r in map_tiles(tiles, "gt", scalar=thr).collect()
    }
    kept = {
        (r["tx"], r["ty"]): decode_tile(r["bytes"], r["h"], r["w"], r["dtype"], r["c"])
        for r in map_tiles(pruned, "gt", scalar=thr).collect()
    }
    for key, mask in full.items():
        if mask.any():
            np.testing.assert_array_equal(kept[key], mask)
        else:
            assert key not in kept or not kept[key].any()

    with pytest.raises(KeyError):
        prune_tiles_by_stats(tiles, "add", 1.0)
