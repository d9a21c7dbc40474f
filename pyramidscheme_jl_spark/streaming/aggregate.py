"""Streaming aggregation surfaces (SURVEY.md §2.10, graft-mandated).

Two operators beyond the ingest path in ``ingest.py``:

- ``stream_windowed_rollup`` — the hypertable rollup as a Structured
  Streaming job: event-time window aggregation with a watermark, so late
  rows inside the watermark still fold into their window and rows later
  than the watermark are dropped deterministically. Append output mode:
  a window emits exactly once, when the watermark passes it — the
  streaming twin of ``q_rollup_multilevel``'s batch semantics.

- ``stream_dedup_stateful`` — streaming exact dedup with
  ``applyInPandasWithState``: per content-hash state remembers the first
  (keeper) id across micro-batches, emitting one row per *newly seen* hash
  per batch. This is the custom-stateful-operator pattern the batch
  ``exact_dedup`` can't express incrementally (a groupBy over the full
  history rescans everything; state makes it O(new rows) per batch).

Scale notes: both operators shuffle once per micro-batch on their key
(window bucket / content hash) — the same partial-aggregation shape as
their batch twins; state is per-key-partitioned in the state store, so a
1000-executor cluster shards it horizontally. Watermarks bound state size
for the rollup; the dedup state grows with distinct corpus size (production
would add a TTL or an approximate filter tier in front).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("window_end", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)


def stream_windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time window rollup over a *streaming* events frame.

    ``events`` must be a streaming DataFrame with ``ts timestamp`` and
    ``value double`` (the fixture schema). Returns the aggregated streaming
    frame; callers attach the sink (append mode — finalized windows only).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_cents",
        )
    )


DEDUP_OUT_SCHEMA = "text_hash string, keep_id long, first_batch boolean"
DEDUP_STATE_SCHEMA = "keep_id long"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the keeper row the first time a content hash is seen; later
    occurrences (same or later batches) update nothing and emit nothing."""
    min_id = None
    for pdf in pdfs:
        m = int(pdf["doc_id"].min())
        min_id = m if min_id is None else min(min_id, m)
    if state.exists:
        return iter(())  # seen in an earlier batch -> duplicate, drop
    state.update((min_id,))
    return iter([pd.DataFrame({"text_hash": [key[0]], "keep_id": [min_id], "first_batch": [True]})])


def stream_dedup_stateful(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup: one output row per first-ever-seen text hash.

    ``docs`` is a streaming frame with ``doc_id long, text string``. Uses
    ``applyInPandasWithState`` keyed by the content hash; the keeper id is
    the min doc_id *within the first batch that saw the hash* (cross-batch
    the first batch wins — streaming semantics; the batch twin's global min
    would require reprocessing history).
    """
    keyed = docs.select(
        F.md5(F.col("text")).alias("text_hash"), F.col("doc_id")
    ).groupBy("text_hash")
    return keyed.applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
