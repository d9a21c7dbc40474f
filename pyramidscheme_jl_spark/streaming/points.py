"""Streaming point ingest -> queryable grid (the live-heatmap shape).

``gdal_grid`` is a batch tool; a production telemetry/sensor pipeline
gets POINTS continuously and wants the gridded raster queryable while
ingest runs. The state design makes this trivial rather than clever:

- ``bin_points`` per-pixel aggregates (cnt, s, mn, mx) are ADDITIVE —
  cnt/s fold by sum, mn/mx by min/max. So the micro-batch sink just
  APPENDS each batch's binned partials as parquet under
  ``state_dir/bins/``; no read-modify-write, no last-writer-wins
  ordinals, no merge conflicts — commutative, idempotent under Spark's
  per-batch exactly-once file sink (each batch writes one deterministic
  file name).
- reads (``read_grid_state``) re-aggregate the partials with ONE hash
  aggregate (``merge_binned``) — the result is independent of how the
  stream was batched, which is what makes the streamed grid EXACTLY
  oracle-checkable (same closed form as the batch ``grid_points``).
- state growth is bounded by occupied pixels x appended batches;
  ``compact_grid_state`` folds all partials into one file atomically
  (write-new + swap, the ``compact_pyramid`` discipline) when the
  partial count grows past taste.
- ``grid_from_state`` feeds the merged state straight into the shared
  ``grid_from_binned`` kernel tail — every method (disc stats, IDW,
  nearest-EDT) works on streamed state unchanged.

At 100 TB: the sink shuffles each batch once (the binning aggregate,
map-side combined), appends O(occupied pixels) skinny rows, and never
touches prior state; the read-side merge is one aggregate over
(partials x occupied pixels) rows — compaction keeps that factor ~1.

Reference parity: none (PyramidScheme.jl has no streaming); north-rule
streaming surface alongside ``streaming.ingest``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.gridding import bin_points, grid_from_binned, merge_binned
from ..sources.fsio import DEFAULT_FS, LocalFS

#: the point feed schema (x/y in grid pixel units, value double)
POINTS_DDL = "x double, y double, value double"

_BINS_DDL = "px long, py long, cnt long, s double, mn double, mx double"


def _state_meta_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_grid_state.json")


def _commit_meta(state_dir: str, shape, fs: LocalFS) -> None:
    meta = {"width": int(shape[0]), "height": int(shape[1]), "v": 1}
    fs.makedirs(state_dir)
    fs.publish_file(
        state_dir, "_grid_state.json",
        lambda p: open(p, "w").write(json.dumps(meta, sort_keys=True)),
    )


def _read_meta(state_dir: str) -> tuple[int, int]:
    with open(_state_meta_path(state_dir)) as f:
        m = json.load(f)
    return int(m["width"]), int(m["height"])


def ingest_points(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    shape: tuple[int, int],
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    files_per_batch: int | None = None,
    fs: LocalFS = DEFAULT_FS,
):
    """Start the point-grid ingest stream; returns the StreamingQuery.

    ``source_dir`` is a parquet file-stream of ``POINTS_DDL`` rows (in
    production a Kafka/file feed — the foreachBatch body is
    source-agnostic). Each micro-batch is binned (one shuffle,
    map-side combined) and appended as ONE partial parquet file named
    by batch id — deterministic, so a replayed batch overwrites itself
    (idempotent under checkpoint recovery)."""
    w, h = int(shape[0]), int(shape[1])
    if w <= 0 or h <= 0:
        raise ValueError(f"shape must be positive, got {shape}")
    bins_dir = os.path.join(state_dir, "bins")
    # shape is known before the stream starts — commit the meta doc NOW,
    # so a crash inside the first batch can never leave partials without
    # a readable shape (review r8-s3 #7)
    _commit_meta(state_dir, (w, h), fs)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        binned = bin_points(batch_df, (w, h))
        # one DIR per batch (mode=overwrite => a checkpoint-replayed
        # batch replaces the whole dir — idempotence is dir-grained),
        # MULTIPLE files inside: the binned partial can be occupied-
        # pixel-sized (a dense batch barely reduces), so a single-file
        # write is a serial stage — measured on the saturated-grid
        # fixture: 8-core wall 31.3 s -> 18.9 s from parallelizing it
        # (BENCH/INGEST_SCALING.md r8 points section). repartition, not
        # coalesce: coalesce back-propagates into the aggregate.
        k = files_per_batch or max(2, spark.sparkContext.defaultParallelism)
        (
            binned.repartition(k)
            .write.mode("overwrite")
            .parquet(os.path.join(bins_dir, f"batch={int(batch_id)}"))
        )

    reader = spark.readStream.schema(POINTS_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(state_dir, "_stream_checkpoint"),
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _bins_manifest(bins_dir: str) -> dict:
    p = os.path.join(bins_dir, "_state.json")
    if not os.path.exists(p):
        return {"compacted": [], "folded": []}
    with open(p) as f:
        return json.load(f)


def _active_bin_dirs(bins_dir: str) -> list[str]:
    """Readable partials: every live ``batch=*`` dir not folded away,
    plus the manifest-listed compacted rollups. The manifest rename is
    the compaction commit point, so this set is consistent at every
    crash instant (a compacted dir is invisible until the same atomic
    write that folds its sources)."""
    m = _bins_manifest(bins_dir)
    folded = set(m["folded"])
    live = [
        d for d in sorted(os.listdir(bins_dir))
        if d.startswith("batch=") and d not in folded
        # _SUCCESS gates visibility: an IN-FLIGHT batch dir (created
        # before its job commits) must be neither read (it would look
        # empty) nor folded (folding would permanently exclude the
        # batch id once the write lands) — review r8-s3 #1
        and os.path.exists(os.path.join(bins_dir, d, "_SUCCESS"))
    ]
    comp = [d for d in m["compacted"] if os.path.isdir(os.path.join(bins_dir, d))]
    return [os.path.join(bins_dir, d) for d in comp + live]


def read_grid_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merged per-pixel state: one row per occupied pixel regardless of
    how many batches landed (the additive fold)."""
    dirs = _active_bin_dirs(os.path.join(state_dir, "bins"))
    if not dirs:
        raise ValueError(f"no grid state under {state_dir} (stream not started?)")
    return merge_binned(spark.read.schema(_BINS_DDL).parquet(*dirs))


def grid_from_state(
    spark: SparkSession,
    state_dir: str,
    method: str = "mean",
    radius: int = 3,
    tilesize: int = 256,
) -> DataFrame:
    """The streamed grid: merged state through the shared kernel tail.
    Identical output to batch ``grid_points`` over the union of every
    ingested point — batching-independent by construction."""
    shape = _read_meta(state_dir)
    return grid_from_binned(
        read_grid_state(spark, state_dir), shape, method, radius, tilesize
    )


def compact_grid_state(
    spark: SparkSession,
    state_dir: str,
    fs: LocalFS = DEFAULT_FS,
    cleanup: bool = True,
    files: int = 8,
) -> int:
    """Fold the active partials into one ``compacted-N`` rollup.
    Returns the number of partials folded (0 = nothing to do).

    Crash-safe by the manifest rule in ``_active_bin_dirs``: the rollup
    is written to a dir the read side does NOT consult until the single
    atomic ``_state.json`` rename both registers it and marks its
    sources folded — every crash instant reads a consistent (and, by
    additivity, correct) partial set. Folded source dirs are then
    removed best-effort (idempotent; an interrupted cleanup leaves
    excluded-and-harmless dirs for the next round). Safe between
    micro-batches: an in-flight batch appends a NEW partial that is
    simply not folded this round (its dir has no ``_SUCCESS`` yet).

    Caveat for LIVE readers: a query PLANNED against the pre-fold dir
    list can still be executing when cleanup deletes those dirs —
    pass ``cleanup=False`` when serving concurrent traffic (folded
    dirs stay on disk, excluded by the manifest; a later call with
    ``cleanup=True`` garbage-collects them — batch partials AND
    superseded rollups, via the manifest's ``stale`` list — once
    in-flight reads have drained).

    Compaction is SINGLE-WRITER (ADVICE r8): two concurrent calls can
    compute the same ``compacted-N`` name, clobber each other's rename
    and last-write-wins the manifest, dropping or double-folding
    partials. Serialize compaction (it is a maintenance pass, typically
    the ingest driver's own loop); concurrent READERS are safe."""
    import shutil

    bins_dir = os.path.join(state_dir, "bins")
    m = _bins_manifest(bins_dir)
    active = _active_bin_dirs(bins_dir)
    if len(active) <= 1:
        return 0
    merged = merge_binned(spark.read.schema(_BINS_DDL).parquet(*active))
    # max+1, not len(): pruning keeps the list short while names count up
    n = 1 + max([int(c.rsplit("-", 1)[1]) for c in m["compacted"]] + [-1])
    new_name = f"compacted-{n}"
    tmp = os.path.join(bins_dir, "_compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    # repartition (parallel encode; coalesce would collapse the merge
    # aggregate to the writer count — the ingest lesson)
    merged.repartition(max(1, int(files))).write.mode("overwrite").parquet(tmp)
    # a crash between a previous rename and its manifest publish leaves
    # an UNREGISTERED (hence invisible) rollup under this name — safe to
    # clobber, and required: POSIX rename cannot replace a non-empty dir
    shutil.rmtree(os.path.join(bins_dir, new_name), ignore_errors=True)
    os.rename(tmp, os.path.join(bins_dir, new_name))
    names = [os.path.basename(d) for d in active]
    # superseded rollups must be TRACKED, not just delisted (ADVICE r8):
    # a compacted-K folded during a cleanup=False round appears in no
    # list ("folded" holds batch=* names only, for the read-side batch
    # filter) and earlier code never deleted it afterwards — a disk
    # leak. "stale" records them until some cleanup pass removes the
    # dir; entries self-prune once their dir is gone.
    stale = sorted(
        s
        for s in set(m.get("stale") or []) | {x for x in names if not x.startswith("batch=")}
        if os.path.isdir(os.path.join(bins_dir, s))
    )
    new_m = {
        # prune rollups this fold subsumes; keep only the new one plus
        # any rollup that (unexpectedly) was not active
        "compacted": [c for c in m["compacted"] if c not in names] + [new_name],
        "folded": sorted(set(m["folded"]) | {x for x in names if x.startswith("batch=")}),
        "stale": stale,
    }
    fs.publish_file(  # atomic rename = the commit point
        bins_dir, "_state.json",
        lambda p: open(p, "w").write(json.dumps(new_m, sort_keys=True)),
    )
    if cleanup:
        for d in active:
            shutil.rmtree(d, ignore_errors=True)
        # also GC dirs folded in earlier cleanup=False rounds — batch
        # partials AND superseded rollups
        for d in new_m["folded"] + new_m["stale"]:
            shutil.rmtree(os.path.join(bins_dir, d), ignore_errors=True)
    return len(active)
