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

Scale note: per micro-batch the touched-ancestor count is bounded by the
batch's base-tile count (each level divides it by 4), so patch work is
O(batch), not O(dataset). The patch recompute runs driver-side on collected
child tiles — micro-batches are small by definition; bulk loads should use
``build_pyramid``.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import decode_tile
from ..functions.reducers import block_reduce
from ..operators.build import PyramidSpec, _tile_row, base_tiles_from_images
from ..sources.catalog import TILE_DATA_COLS, level_path, read_level
from ..sources.synth import IMAGES_DDL


def _write_tiles_filewise(rows: list[dict], path: str, z: int) -> None:
    """One parquet file per tile — deterministic name => idempotent upsert."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = level_path(path, z)
    os.makedirs(d, exist_ok=True)
    arrow_types = {
        "tx": pa.int32(), "ty": pa.int32(), "bytes": pa.binary(),
        "w": pa.int32(), "h": pa.int32(), "c": pa.int32(), "dtype": pa.string(),
        "vmin": pa.float64(), "vmax": pa.float64(), "vmean": pa.float64(),
        "cell": pa.int64(),
        "xmin": pa.float64(), "ymin": pa.float64(),
        "xmax": pa.float64(), "ymax": pa.float64(),
    }
    assert list(arrow_types) == TILE_DATA_COLS
    for r in rows:
        t = pa.table({c: pa.array([r[c]], ty) for c, ty in arrow_types.items()})
        pq.write_table(
            t, os.path.join(d, f"tile-{r['tx']:06d}-{r['ty']:06d}.parquet"),
            compression="zstd",
        )


def _patch_ancestors(
    spark: SparkSession, path: str, spec: PyramidSpec, reducer: str, base_keys: list[tuple[int, int]]
) -> None:
    """Recompute the ancestor tiles of the given base-tile keys, bottom-up."""
    T_ = spec.tilesize
    keys = base_keys
    for z in range(1, spec.nlevels + 1):
        parents = sorted({(tx >> 1, ty >> 1) for tx, ty in keys})
        if not parents:
            return
        cond = None
        for px, py in parents:
            c = (F.shiftright("tx", 1) == px) & (F.shiftright("ty", 1) == py)
            cond = c if cond is None else (cond | c)
        children = read_level(spark, path, z - 1).where(cond).collect()
        by_parent: dict[tuple[int, int], list] = {}
        for r in children:
            by_parent.setdefault((r["tx"] >> 1, r["ty"] >> 1), []).append(r)
        rows = []
        for (px, py), kids in sorted(by_parent.items()):
            c = int(kids[0]["c"])
            half = T_ // 2
            red0 = block_reduce(
                decode_tile(kids[0]["bytes"], kids[0]["h"], kids[0]["w"], kids[0]["dtype"], c),
                reducer,
            )
            W = max(((k["tx"] & 1) * half) + -(-k["w"] // 2) for k in kids)
            H = max(((k["ty"] & 1) * half) + -(-k["h"] // 2) for k in kids)
            shape = (H, W, c) if c > 1 else (H, W)
            arr = np.zeros(shape, dtype=red0.dtype)
            for k in kids:
                q = block_reduce(decode_tile(k["bytes"], k["h"], k["w"], k["dtype"], c), reducer)
                x0, y0 = (k["tx"] & 1) * half, (k["ty"] & 1) * half
                arr[y0 : y0 + q.shape[0], x0 : x0 + q.shape[1]] = q
            rows.append(_tile_row(spec, z, px, py, arr))
        _write_tiles_filewise(rows, path, z)
        keys = parents


def ingest_images(
    spark: SparkSession,
    source_dir: str,
    path: str,
    G: int,
    reducer: str = "mean",
    tilesize: int = 256,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start the streaming build. Returns the StreamingQuery.

    ``source_dir`` is a parquet file-stream of image rows (input_hint
    schema); in production this is a Kafka/file feed — the foreachBatch
    body is source-agnostic.
    """
    spec = PyramidSpec(G * tilesize, G * tilesize, tilesize)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        tiles0 = base_tiles_from_images(batch_df, G, spec).collect()
        if not tiles0:
            return
        _write_tiles_filewise([r.asDict() for r in tiles0], path, 0)
        _patch_ancestors(
            spark, path, spec, reducer, [(r["tx"], r["ty"]) for r in tiles0]
        )

    stream = spark.readStream.schema(IMAGES_DDL).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir or f"{path}/_stream_checkpoint"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
