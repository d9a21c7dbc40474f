"""streaming.points: point-feed ingest -> additive binned state ->
grid_from_state, pinned bit-identical to the batch grid_points over the
union of all ingested points (batching-independence is the contract),
plus the crash-safe compaction manifest protocol."""

import os

import numpy as np
import pytest

from pyramidscheme_jl_spark.functions.codec import decode_tile
from pyramidscheme_jl_spark.operators.gridding import grid_points
from pyramidscheme_jl_spark.streaming.points import (
    POINTS_DDL,
    compact_grid_state,
    grid_from_state,
    ingest_points,
    read_grid_state,
)

W = H = 64
TS = 32
R = 2


def _pts(seed, n=120):
    rng = np.random.RandomState(seed)
    return [
        (float(x), float(y), float(v))
        for x, y, v in zip(
            rng.uniform(-2, W + 2, n),
            rng.uniform(-2, H + 2, n),
            rng.randint(0, 40, n).astype(float),
        )
    ]


def _plane(rows):
    got = np.full((H, W), np.nan)
    for r in rows:
        t = decode_tile(r.bytes, r.h, r.w, r.dtype, r.c)
        got[r.ty * TS:r.ty * TS + r.h, r.tx * TS:r.tx * TS + r.w] = t
    return got


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("gridstream")
    src = str(root / "src")
    state = str(root / "state")
    os.makedirs(src)
    batches = [_pts(1), _pts(2), _pts(3)]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, POINTS_DDL).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
    q = ingest_points(spark, f"{src}/*", state, (W, H),
                      max_files_per_trigger=1)
    q.awaitTermination(300)
    all_pts = [p for b in batches for p in b]
    return src, state, all_pts


def test_streamed_grid_matches_batch(spark, streamed):
    _, state, all_pts = streamed
    bins = os.path.join(state, "bins")
    assert len([d for d in os.listdir(bins) if d.startswith("batch=")]) >= 2
    got = _plane(grid_from_state(spark, state, method="mean", radius=R,
                                 tilesize=TS).collect())
    want = _plane(grid_points(
        spark, spark.createDataFrame(all_pts, POINTS_DDL), (W, H),
        method="mean", radius=R, tilesize=TS).collect())
    np.testing.assert_array_equal(got, want)


def test_compaction_preserves_state_and_counts(spark, streamed):
    _, state, all_pts = streamed
    before = {(r.px, r.py): (r.cnt, r.s, r.mn, r.mx)
              for r in read_grid_state(spark, state).collect()}
    folded = compact_grid_state(spark, state)
    assert folded >= 2
    after = {(r.px, r.py): (r.cnt, r.s, r.mn, r.mx)
             for r in read_grid_state(spark, state).collect()}
    assert before == after
    assert compact_grid_state(spark, state) == 0  # single rollup left
    # ingest more -> new partial lands NEXT to the rollup; fold again
    # (exercises the max+1 rollup naming against pruned manifests)
    src, _, _ = streamed
    extra = _pts(9)
    spark.createDataFrame(extra, POINTS_DDL).coalesce(1).write.parquet(
        f"{src}/b9")
    q = ingest_points(spark, f"{src}/*", state, (W, H))
    q.awaitTermination(300)
    assert compact_grid_state(spark, state) == 2
    got = _plane(grid_from_state(spark, state, method="count", radius=0,
                                 tilesize=TS).collect())
    want = _plane(grid_points(
        spark, spark.createDataFrame(all_pts + extra, POINTS_DDL), (W, H),
        method="count", radius=0, tilesize=TS).collect())
    np.testing.assert_array_equal(got, want)


def test_compaction_gc_superseded_rollups(spark, tmp_path):
    """ADVICE r8: a rollup folded during a cleanup=False round must be
    garbage-collected by a LATER cleanup=True pass (tracked via the
    manifest's 'stale' list) — previously it leaked forever. Values stay
    identical throughout."""
    import json as _json

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    os.makedirs(src)
    for b, pts in enumerate([_pts(1), _pts(2), _pts(3), _pts(4)]):
        spark.createDataFrame(pts, POINTS_DDL).coalesce(1).write.parquet(
            f"{src}/b{b}")
    q = ingest_points(spark, f"{src}/*", state, (W, H),
                      max_files_per_trigger=1)
    q.awaitTermination(300)
    bins = os.path.join(state, "bins")
    before = {(r.px, r.py): (r.cnt, r.s) for r in read_grid_state(spark, state).collect()}
    assert compact_grid_state(spark, state, cleanup=False) >= 2
    # second no-cleanup fold: folds compacted-0 + any remaining partials
    spark.createDataFrame(_pts(5), POINTS_DDL).coalesce(1).write.parquet(f"{src}/b9")
    q = ingest_points(spark, f"{src}/*", state, (W, H))
    q.awaitTermination(300)
    assert compact_grid_state(spark, state, cleanup=False) >= 2
    m = _json.load(open(os.path.join(bins, "_state.json")))
    assert "compacted-0" in m.get("stale", []), m
    assert os.path.isdir(os.path.join(bins, "compacted-0"))  # still on disk
    # a cleanup round (after one more partial lands so there is work)
    spark.createDataFrame(_pts(6), POINTS_DDL).coalesce(1).write.parquet(f"{src}/b10")
    q = ingest_points(spark, f"{src}/*", state, (W, H))
    q.awaitTermination(300)
    assert compact_grid_state(spark, state, cleanup=True) >= 2
    assert not os.path.isdir(os.path.join(bins, "compacted-0"))  # GC'd
    # stale entries whose dirs are gone self-prune on the NEXT fold (the
    # manifest publish is the commit point and precedes cleanup)
    after = {(r.px, r.py): (r.cnt, r.s) for r in read_grid_state(spark, state).collect()}
    for k, (cnt, s_) in before.items():
        a = after[k]
        assert a[0] >= cnt and (a[0] > cnt or a == (cnt, s_))


def test_read_empty_state_raises(spark, tmp_path):
    with pytest.raises(Exception):
        read_grid_state(spark, str(tmp_path / "nostate"))


def test_inflight_batch_dir_invisible_until_success(spark, streamed):
    """A batch dir without _SUCCESS (job not yet committed) must be
    neither read nor folded — folding it would permanently exclude the
    batch id before its data lands (review r8-s3 #1)."""
    from pyramidscheme_jl_spark.streaming.points import _active_bin_dirs

    _, state, _ = streamed
    bins = os.path.join(state, "bins")
    inflight = os.path.join(bins, "batch=999")
    os.makedirs(inflight, exist_ok=True)
    try:
        assert inflight not in _active_bin_dirs(bins)
    finally:
        os.rmdir(inflight)


def test_nan_points_are_nodata(spark):
    from pyramidscheme_jl_spark.operators.gridding import bin_points

    df = spark.createDataFrame(
        [(1.5, 1.5, 7.0), (1.5, 1.5, float("nan"))], POINTS_DDL)
    rows = bin_points(df, (8, 8)).collect()
    assert len(rows) == 1 and rows[0].cnt == 1 and rows[0].s == 7.0
