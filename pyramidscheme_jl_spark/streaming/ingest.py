"""Structured Streaming ingestion: append base tiles, patch ancestors.

The reference has no streaming (SURVEY.md §2.10) — its interactivity is a
serving-time query loop. The graft adds true ingestion: a ``readStream`` of
image rows feeds ``foreachBatch``; each micro-batch

1. appends the batch's base tiles (z=0), one parquet file per tile, and
2. recomputes exactly the ancestor tiles whose child sets changed, level by
   level, rewriting each affected tile's file.

File-per-tile layout is what makes incremental updates idempotent on plain
parquet (no Iceberg row-level ops in the sandbox): a tile's filename is a
deterministic function of (tx, ty), so retried batches and late arrivals
simply overwrite with last-writer-wins, and ``read_level`` needs no dedup.
On a real deployment the same logic maps to Iceberg ``MERGE``/dynamic
partition overwrite.

**Restriction (enforced):** streaming may only patch pyramids whose levels
use the file-per-tile layout — i.e. pyramids created entirely via streaming
ingestion. Patching a level written by ``build_pyramid`` (bulk ``part-*``
files) would leave the old row in place next to the new tile file and
``read_level`` would return duplicates, so ``_write_tiles_filewise`` refuses
with a clear error instead (convert with ``PyramidDataset.write_to`` +
re-ingest, or use ``build_pyramid(resume=True)`` for bulk backfill).

Scale shape (per micro-batch, O(batch) work and O(1) Spark jobs):

- the child lookups filter on **plain tx/ty IN-lists** — source-pushable
  predicates (`PushedFilters: In(tx, ...), In(ty, ...)`) so parquet min/max
  stats skip every row group outside the touched neighborhood; the exact
  parent-pair membership test runs JVM-side on the surviving rows;
- the ancestor recompute is a GROUPED CASCADE (``_patch_ancestors``): one
  pruned union scan of the 4-sibling sets at levels 0..K-1, one
  ``applyInPandas`` grouped by the level-K ancestor recomputing the whole
  subtree locally, one multi-level executor-side write, then a driver
  tail over the geometric tip — replacing the former per-level job loop
  (its round-trips were the ingest scaling floor, BENCH/INGEST_SCALING.md);
- ALL tile bytes are written from executors (``_write_tiles_distributed``,
  ``_write_tiles_multilevel``); only integer key lists reach the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codec import decode_tile
from ..functions.reducers import block_reduce
from ..operators.build import (
    PyramidSpec,
    _grid_dims,
    _rows_to_pdf,
    _tile_row,
    base_tiles_from_images,
)
from ..sources.catalog import TILE_DATA_COLS, TILE_SCHEMA, level_path, read_level
from ..sources.synth import IMAGES_DDL


_TILE_ARROW_TYPES_CACHE: dict[bool, dict] = {}


def _tile_arrow_types(with_t: bool = False):
    """Arrow schema for one tile row, memoized — rebuilt-per-row dicts on
    the executor write hot path are pure waste."""
    cached = _TILE_ARROW_TYPES_CACHE.get(with_t)
    if cached is not None:
        return cached
    import pyarrow as pa

    arrow_types = {
        "tx": pa.int32(), "ty": pa.int32(), "bytes": pa.binary(),
        "w": pa.int32(), "h": pa.int32(), "c": pa.int32(), "dtype": pa.string(),
        "vmin": pa.float64(), "vmax": pa.float64(), "vmean": pa.float64(),
        "cell": pa.int64(),
        "xmin": pa.float64(), "ymin": pa.float64(),
        "xmax": pa.float64(), "ymax": pa.float64(),
    }
    assert list(arrow_types) == TILE_DATA_COLS
    if with_t:
        arrow_types = {"t": pa.int32(), **arrow_types}
    _TILE_ARROW_TYPES_CACHE[with_t] = arrow_types
    return arrow_types


def _write_one_tile(d: str, r: dict, fname: str, with_t: bool = False) -> None:
    """Atomic idempotent single-tile write: temp file + rename. A retried
    task overwrites with identical content (deterministic name,
    deterministic tile bytes) — last-writer-wins, no torn reads."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    types = _tile_arrow_types(with_t)
    t = pa.table({c: pa.array([r[c]], ty) for c, ty in types.items()})
    tmp = os.path.join(d, f".{fname}.inprogress-{os.getpid()}")
    pq.write_table(t, tmp, compression="zstd")
    os.replace(tmp, os.path.join(d, fname))


def _assert_filewise_layout(path: str, z: int) -> str:
    """Refuse to patch bulk (build_pyramid) levels; returns the level dir."""
    d = level_path(path, z)
    os.makedirs(d, exist_ok=True)
    bulk = [f for f in os.listdir(d) if f.startswith("part-") and f.endswith(".parquet")]
    if bulk:
        raise ValueError(
            f"level {z} at {path} contains bulk files ({bulk[0]}, ...) from "
            "build_pyramid; streaming patch requires the file-per-tile layout "
            "(pyramids created entirely via streaming ingestion) — rewriting a "
            "tile here would leave the stale bulk row in place and read_level "
            "would return duplicates. Bulk-backfill with build_pyramid(resume="
            "True) or copy out via PyramidDataset.write_to before streaming."
        )
    return d


def _tile_fname(r: dict, with_t: bool = False) -> str:
    """THE deterministic tile filename — single source of truth for the
    idempotent last-writer-wins upsert contract."""
    parts = ([f"t{int(r['t']):06d}"] if with_t else []) + [
        f"{int(r['tx']):06d}", f"{int(r['ty']):06d}"
    ]
    return "tile-" + "-".join(parts) + ".parquet"


def _write_tiles_filewise(rows: list[dict], path: str, z: int, with_t: bool = False) -> None:
    """Driver-side file-per-tile write (small tile sets only; the streaming
    hot path uses ``_write_tiles_distributed``)."""
    d = _assert_filewise_layout(path, z)
    for r in rows:
        _write_one_tile(d, r, _tile_fname(r, with_t), with_t=with_t)


def _write_tiles_distributed(
    tiles: DataFrame, path: str, z: int, t_col: str | None = None
) -> list[tuple[int, ...]]:
    """Executor-side file-per-tile write; only the (small, integer) touched
    keys return to the driver — decoded tile BYTES never do (VERDICT r3 #1:
    the driver funnel was the last scale-killer pattern).

    Each executor task writes its rows' files directly (atomic temp+rename,
    deterministic names => idempotent under task retry/speculation) and
    yields just the key columns. In local mode the driver and executors
    share the filesystem; on a cluster the same code targets shared storage
    (s3a/HDFS via pyarrow.fs — deterministic object names make retried PUTs
    last-writer-wins).
    """
    d = _assert_filewise_layout(path, z)
    key_cols = ([t_col] if t_col else []) + ["tx", "ty"]

    def write_partition(batches):
        for pdf in batches:
            for r in pdf.to_dict("records"):
                _write_one_tile(d, r, _tile_fname(r, bool(t_col)), with_t=bool(t_col))
            yield pdf[key_cols]

    schema = ", ".join(f"{c} int" for c in key_cols)
    keys = tiles.mapInPandas(write_partition, schema).collect()
    return sorted({tuple(int(getattr(k, c)) for c in key_cols) for k in keys})


def _children_of(level_df: DataFrame, parents: list[tuple[int, int]]) -> DataFrame:
    """Child tiles of the given parents, with *source-pushable* predicates.

    The coarse filter is two IN-lists on the plain ``tx``/``ty`` columns —
    Catalyst pushes them into the parquet scan (min/max row-group skipping),
    unlike a derived ``shiftright(tx,1)==px`` expression which forces a full
    level scan. The coarse cross-product may admit a few extra tiles; the
    exact parent-pair membership (packed ``(tx>>1)<<32 | ty>>1``) filters
    them JVM-side on the already-tiny survivor set.
    """
    txs = sorted({2 * px + dx for px, _ in parents for dx in (0, 1)})
    tys = sorted({2 * py + dy for _, py in parents for dy in (0, 1)})
    packed = [(px << 32) | py for px, py in parents]
    pushable = F.col("tx").isin(txs) & F.col("ty").isin(tys)
    pair = F.shiftleft(F.shiftright("tx", 1).cast("long"), 32).bitwiseOR(
        F.shiftright("ty", 1).cast("long")
    )
    return level_df.where(pushable).where(pair.isin(packed))


def _assemble_from_quarters(quarters, half):
    """[(qx, qy, quarter_array)] -> assembled parent array (ragged-edge
    aware: extent is the max covered, missing quarters stay zero)."""
    W = max(qx * half + q.shape[1] for qx, _, q in quarters)
    H = max(qy * half + q.shape[0] for _, qy, q in quarters)
    c = quarters[0][2].shape[2] if quarters[0][2].ndim == 3 else 1
    shape = (H, W, c) if c > 1 else (H, W)
    arr = np.zeros(shape, dtype=quarters[0][2].dtype)
    for qx, qy, q in quarters:
        arr[qy * half : qy * half + q.shape[0], qx * half : qx * half + q.shape[1]] = q
    return arr


#: cascade pass depth: each pass recomputes K levels inside ONE
#: applyInPandas job, grouped by the pass-top ancestor. 4^K base
#: descendants bound the group (K=3 -> <=64 base + 21 ancestor tiles
#: ~ <=15-40 MB/group); deeper pyramids take ceil(nlevels/K) passes.
_CASCADE_LEVELS = 3

LEVELED_TILE_SCHEMA = T.StructType(
    [T.StructField("lvl", T.IntegerType())] + list(TILE_SCHEMA.fields)
)
CUBE_LEVELED_TILE_SCHEMA = T.StructType(
    [T.StructField("lvl", T.IntegerType()), T.StructField("t", T.IntegerType())]
    + list(TILE_SCHEMA.fields)
)


def _read_level_or_empty(
    spark: SparkSession, path: str, z: int, with_t: bool = False
) -> DataFrame:
    """``read_level`` that tolerates a level whose directory doesn't exist
    yet (first micro-batch: the cascade reads levels 1..K-1 as sibling
    sources before any tile has ever been written there). Explicit schema
    — an empty dir must scan as zero rows, not fail inference. ``with_t``
    reads a streamed-cube level (t key column first)."""
    d = _assert_filewise_layout(path, z)  # creates the dir; guards layout
    fields = [f for f in TILE_SCHEMA.fields if f.name != "z"]
    if with_t:
        fields = [T.StructField("t", T.IntegerType())] + fields
    return (
        spark.read.schema(T.StructType(fields))
        .parquet(d)
        .withColumn("z", F.lit(z).cast("int"))
    )


def _changed_keys_by_level(base_keys, nlevels: int):
    """changed[z] = the level-z tiles whose value this batch affects.
    Keys are ``(tx, ty)`` or ``(t, tx, ty)`` — any leading dims pass
    through the halving untouched (the cube pass-through semantics)."""
    changed = [set(base_keys)]
    for _ in range(nlevels):
        changed.append(
            {k[:-2] + (k[-2] >> 1, k[-1] >> 1) for k in changed[-1]}
        )
    return changed


def _cascade_repair(
    spec: PyramidSpec, reducer: str, z_lo: int, z_hi: int, changed, with_t=False
):
    """Per-group bottom-up recompute of levels z_lo..z_hi.

    The group holds every input tile this pass needs (4-sibling sets at
    each level, pruned scan); changed tiles at intermediate levels are
    recomputed in-group (never trusted from disk), unchanged siblings come
    from the scanned disk rows. Emits only the recomputed tiles.
    ``with_t``: keys and group keys carry the leading cube t dim."""
    half = spec.tilesize // 2

    # driver-precomputed per-group work lists: each task touches ONLY its
    # own changed tuples (iterating the global changed sets per group is
    # O(|changed| x n_groups) — quadratic across the stage; review r4)
    group_work: dict[tuple, list[tuple]] = {}
    for z in range(z_lo, z_hi + 1):
        shift = z_hi - z
        for key in sorted(changed[z]):
            gkey = key[:-2] + (key[-2] >> shift, key[-1] >> shift)
            group_work.setdefault(gkey, []).append((z,) + key)

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gkey = tuple(int(v) for v in key)  # (t?, gx, gy)
        disk: dict[tuple, np.ndarray] = {}
        for r in pdf.to_dict("records"):
            dk = (int(r["lvl"]),) + ((int(r["t"]),) if with_t else ()) + (
                int(r["tx"]), int(r["ty"]),
            )
            disk[dk] = decode_tile(
                r["bytes"], int(r["h"]), int(r["w"]), r["dtype"], int(r["c"])
            )
        computed: dict[tuple, np.ndarray] = {}
        out_rows = []
        for work in group_work.get(gkey, ()):  # level-ascending
            z, lead, (ptx, pty) = work[0], work[1:-2], work[-2:]
            quarters = []
            for dy in (0, 1):
                for dx in (0, 1):
                    ck = (z - 1,) + lead + (2 * ptx + dx, 2 * pty + dy)
                    child = computed.get(ck)
                    if child is None:
                        child = disk.get(ck)
                    if child is None:
                        continue  # ragged edge: tile doesn't exist
                    quarters.append((dx, dy, block_reduce(child, reducer)))
            if not quarters:
                continue
            arr = _assemble_from_quarters(quarters, half)
            computed[(z,) + lead + (ptx, pty)] = arr
            row = dict(_tile_row(spec, z, ptx, pty, arr), lvl=z)
            if with_t:
                row["t"] = lead[0]
            out_rows.append(row)
        schema = CUBE_LEVELED_TILE_SCHEMA if with_t else LEVELED_TILE_SCHEMA
        if not out_rows:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        pdf_out = _rows_to_pdf(
            [{k: v for k, v in r.items() if k not in ("lvl", "t")} for r in out_rows]
        )
        if with_t:
            pdf_out.insert(0, "t", pd.array([r["t"] for r in out_rows], dtype="int32"))
        pdf_out.insert(0, "lvl", pd.array([r["lvl"] for r in out_rows], dtype="int32"))
        return pdf_out

    return fn


def _patch_ancestors(
    spark: SparkSession, path: str, spec: PyramidSpec, reducer: str, base_keys
) -> None:
    """Recompute the ancestor tiles of the given base-tile keys, bottom-up.

    Grouped-cascade passes, O(nlevels / K) Spark jobs per micro-batch
    instead of O(nlevels) (the per-level round-trip was the ingest scaling
    floor). Each pass covers K levels: one pruned UNION scan collects,
    per level, the 4-sibling sets of the changed tiles; grouped by the
    pass's top-level ancestor, one ``applyInPandas`` recomputes the whole
    subtree locally (changed tiles in-group, unchanged siblings from the
    scan) and ONE distributed multi-level write lands the results. Tile
    bytes NEVER touch the driver — for flat pyramids and cubes alike
    (``base_keys`` of ``(t, tx, ty)`` switch on the cube path; a driver
    tail here would multiply by the unbounded touched-slice count)."""
    if not base_keys or spec.nlevels < 1:
        return
    with_t = len(base_keys[0]) == 3
    changed = _changed_keys_by_level(base_keys, spec.nlevels)
    lo = 1
    while lo <= spec.nlevels:
        hi = min(lo + _CASCADE_LEVELS - 1, spec.nlevels)
        union = _sibling_union_scan(spark, path, changed, lo, hi, with_t)
        # tiles at level l belong to ancestor key >> (hi - l); the shift
        # count is a column, which F.shiftright's int-only arg can't express
        gcols = (["t"] if with_t else []) + [
            F.expr(f"shiftright(tx, {hi} - lvl)").alias("gx"),
            F.expr(f"shiftright(ty, {hi} - lvl)").alias("gy"),
        ]
        grouped = union.groupBy(*gcols).applyInPandas(
            _cascade_repair(spec, reducer, lo, hi, changed, with_t),
            CUBE_LEVELED_TILE_SCHEMA if with_t else LEVELED_TILE_SCHEMA,
        )
        _write_tiles_multilevel(grouped, path, lo, hi, with_t)
        lo = hi + 1


def _sibling_union_scan(
    spark: SparkSession, path: str, changed, z_lo: int, z_hi: int, with_t: bool
):
    """Union of per-level pruned scans of the 4-sibling child sets of
    ``changed[z]`` for z in [z_lo, z_hi], each tagged with ``lvl``.

    Flat path: ``_children_of`` (pushable IN-lists + packed-int64 exact
    membership). Cube path: IN-lists on t/tx/ty + ONE broadcast left-semi
    join on (lvl, t, parent) after the union — packed int64 would
    overflow for epoch-scale t (review r4)."""
    scans = []
    for z in range(z_lo, z_hi + 1):
        lvl = _read_level_or_empty(spark, path, z - 1, with_t)
        if with_t:
            keys = sorted(changed[z])
            ts = sorted({t for t, _, _ in keys})
            xs = sorted({2 * px + dx for _, px, _ in keys for dx in (0, 1)})
            ys = sorted({2 * py + dy for _, _, py in keys for dy in (0, 1)})
            src = lvl.where(
                F.col("t").isin(ts) & F.col("tx").isin(xs) & F.col("ty").isin(ys)
            )
        else:
            src = _children_of(lvl, sorted(changed[z]))
        scans.append(src.withColumn("lvl", F.lit(z - 1).cast("int")).select(
            "lvl",
            *((["t"] if with_t else [])
              + [f.name for f in TILE_SCHEMA.fields if f.name != "z"]),
        ))
    union = scans[0]
    for sc in scans[1:]:
        union = union.unionByName(sc)
    if with_t:
        par_rows = [
            (z - 1, t, px, py)
            for z in range(z_lo, z_hi + 1)
            for t, px, py in changed[z]
        ]
        pdf = spark.createDataFrame(par_rows, "lvl int, t int, _px int, _py int")
        union = (
            union.withColumn("_px", F.shiftright("tx", 1))
            .withColumn("_py", F.shiftright("ty", 1))
            .join(F.broadcast(pdf), ["lvl", "t", "_px", "_py"], "left_semi")
            .drop("_px", "_py")
        )
    return union


def _write_tiles_multilevel(
    tiles: DataFrame, path: str, z_lo: int, z_hi: int, with_t: bool = False
) -> None:
    """Executor-side file-per-tile write across levels z_lo..z_hi in one
    job; the ``lvl`` column routes each row to its level directory."""
    dirs = {z: _assert_filewise_layout(path, z) for z in range(z_lo, z_hi + 1)}

    def write_partition(batches):
        for pdf in batches:
            for r in pdf.to_dict("records"):
                _write_one_tile(
                    dirs[int(r["lvl"])], r, _tile_fname(r, with_t), with_t=with_t
                )
            yield pdf[["lvl", "tx", "ty"]]

    tiles.mapInPandas(write_partition, "lvl int, tx int, ty int").write.format(
        "noop"
    ).mode("overwrite").save()


def ingest_cube_images(
    spark: SparkSession,
    source_dir: str,
    path: str,
    G,
    reducer: str = "mean",
    tilesize: int = 256,
    t_col: str = "t",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Streaming build of an (x, y, t) cube (VERDICT r3 #8): the batch
    path's ``build_cube`` semantics, incrementally — each micro-batch of
    image rows (input_hint schema + integer ``t_col``) appends its base
    tiles and patches exactly the ancestors of the touched
    ``(t, tx, ty)`` keys through the same grouped cascade as the flat
    path (groups keyed by (t, level-K ancestor); exact membership is a
    broadcast semi-join — packed int64 would overflow at epoch-scale t).
    All tile writes happen on executors."""
    from ..functions.reducers import is_decomposable, reducer_name
    from ..operators.cube import base_cube_tiles

    if not is_decomposable(reducer):
        raise ValueError(
            f"streaming cube ingest is recursive; reducer "
            f"{reducer_name(reducer)!r} is not decomposable"
        )
    gx, gy = _grid_dims(G)
    spec = PyramidSpec(gx * tilesize, gy * tilesize, tilesize)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        keys0 = _write_tiles_distributed(
            base_cube_tiles(batch_df, G, spec, t_col), path, 0, t_col="t"
        )
        if not keys0:
            return
        _patch_ancestors(spark, path, spec, reducer, keys0)
        _commit_multiscales_once(path, spec, tilesize, reducer)

    stream = spark.readStream.schema(IMAGES_DDL + f", {t_col} int").parquet(source_dir)
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir or f"{path}/_stream_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _commit_multiscales_once(
    path: str, spec: PyramidSpec, tilesize: int, reducer: str
) -> None:
    """Write the interchange doc after the first successful micro-batch —
    streamed pyramids get the same document built pyramids get, so
    maintenance jobs (compact_pyramid) and foreign readers recover the
    reducer from the pyramid itself instead of guessing."""
    if os.path.exists(os.path.join(path, "_multiscales.json")):
        return
    from ..functions.reducers import reducer_hash
    from ..sources.catalog import write_multiscales

    write_multiscales(
        path, spec.nlevels, tilesize, spec.base_w, spec.base_h,
        reducer, reducer_hash(reducer),
    )


def ingest_images(
    spark: SparkSession,
    source_dir: str,
    path: str,
    G,
    reducer: str = "mean",
    tilesize: int = 256,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start the streaming build. Returns the StreamingQuery.

    ``source_dir`` is a parquet file-stream of image rows (input_hint
    schema); in production this is a Kafka/file feed — the foreachBatch
    body is source-agnostic. ``G`` accepts int or (gx, gy) like
    ``build_pyramid``.
    """
    gx, gy = _grid_dims(G)
    spec = PyramidSpec(gx * tilesize, gy * tilesize, tilesize)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        keys0 = _write_tiles_distributed(
            base_tiles_from_images(batch_df, G, spec), path, 0
        )
        if not keys0:
            return
        _patch_ancestors(spark, path, spec, reducer, keys0)
        # the interchange doc is committed only once >=1 micro-batch has
        # actually landed tiles — open() on a just-started or first-batch-
        # failed stream target must fail loudly, not advertise a level
        # stack whose paths don't exist (ADVICE r3)
        _commit_multiscales_once(path, spec, tilesize, reducer)

    stream = spark.readStream.schema(IMAGES_DDL).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir or f"{path}/_stream_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_pyramid(
    spark: SparkSession,
    path: str,
    reducer: str | None = None,
    run_id: str = "compact-0",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[int, int]:
    """Convert file-per-tile levels back to bulk layout (VERDICT r2 #3).

    A long-running stream accumulates one parquet file per tile; at 10^8+
    tiles the directory listing itself becomes the bottleneck. This
    maintenance job (run while the stream is stopped) rewrites each
    file-per-tile level as a normal bulk level — a distributed Spark
    read -> coalesced parquet write sized to ``target_file_bytes`` — then
    commits manifest lineage rows so ``build_pyramid(resume=True)`` and
    every batch reader treat the result exactly like a built pyramid.
    It is the inverse of the bulk-layout refusal in
    ``_write_tiles_filewise``: after compaction the pyramid is a bulk
    pyramid (further streaming patches are refused by that guard; backfill
    continues via ``build_pyramid(resume=True)``).

    Levels already in bulk layout are skipped. The per-level swap is
    rename-based: the new bulk directory is written beside the old one and
    swapped in two renames, so readers never observe a half-written level;
    if the job dies between the renames, the ``_compact_old_z{z}`` backup
    directory is still on disk — rename it back to recover.

    Returns ``{z: n_files_after}`` for the levels it compacted.
    """
    import math
    import shutil

    from ..functions.reducers import reducer_hash
    from ..sources.catalog import (
        append_manifest,
        manifest_lineage,
        read_manifest,
        read_multiscales,
    )

    tiles_root = f"{path}/tiles"
    zs = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(tiles_root)
        if d.startswith("z=")
    )
    if reducer is None:
        # maintenance jobs must not guess lineage: recover the reducer (and
        # its exact hash) from what actually built this pyramid
        row = None
        try:
            row = (
                read_manifest(spark, path)
                .orderBy(F.col("committed_at_ordinal").desc())
                .select("reducer", "reducer_hash")
                .first()
            )
        except Exception:
            pass
        if row is not None:
            reducer, rhash = row["reducer"], row["reducer_hash"]
        else:
            ms = read_multiscales(path)
            if ms and ms.get("resampling_method"):
                reducer = ms["resampling_method"]
                rhash = ms.get("reducer_hash") or reducer_hash(reducer)
            else:
                raise ValueError(
                    f"{path}: no manifest or multiscales to infer the reducer "
                    "from — pass reducer= explicitly"
                )
    else:
        rhash = reducer_hash(reducer)
    compacted: dict[int, int] = {}
    for z in zs:
        d = level_path(path, z)
        names = [f for f in os.listdir(d) if f.endswith(".parquet")]
        filewise = [f for f in names if f.startswith("tile-")]
        if not filewise:
            continue  # already bulk (or empty) — nothing to do
        if len(filewise) != len(names):
            raise ValueError(
                f"level {z} at {path} mixes bulk and file-per-tile files — "
                "refusing to compact an inconsistent level"
            )
        total = sum(os.path.getsize(os.path.join(d, f)) for f in filewise)
        nfiles = max(1, math.ceil(total / target_file_bytes))
        tmp = f"{tiles_root}/_compact_tmp_z{z}"
        bak = f"{tiles_root}/_compact_old_z{z}"
        shutil.rmtree(tmp, ignore_errors=True)
        lvl = read_level(spark, path, z)
        # streamed CUBES carry a t key column: dropping it would merge
        # every slice into duplicate (tx, ty) rows — preserve it
        keep = (["t"] if "t" in lvl.columns else []) + TILE_DATA_COLS
        (
            lvl.select(*keep)
            .repartition(nfiles)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.rename(d, bak)
        os.rename(tmp, d)
        shutil.rmtree(bak)
        append_manifest(
            spark, path, manifest_lineage(path, z, run_id, reducer, rhash, z)
        )
        compacted[z] = len(
            [f for f in os.listdir(d) if f.endswith(".parquet")]
        )
    return compacted
