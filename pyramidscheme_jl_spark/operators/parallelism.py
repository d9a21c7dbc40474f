"""Minimum-parallelism guard for fan-out stages.

AQE sizes post-shuffle partitions by SHUFFLE bytes and scans split by
file bytes — neither sees the downstream work. A sub-MB fingerprint
table (or a single-row-group parquet file) therefore plans 1-4
partitions even when the stage built on top of it fans out to tens of
millions of rows (band-join pair emitters, candidate scoring joins,
interval explodes): at sf1.0 the hamming band join emitted 27.4M pairs
on 4 of 32 cores (13.1 s vs 2.0 s repartitioned).

``ensure_min_parallelism`` repartitions up to the session's default
parallelism ONLY when the plan's partition count is below it — inputs
that already plan enough partitions (any at-scale table) pass through
untouched, so the guard never adds a shuffle where the cluster is
already busy. When both sides of a self-join derive from the guarded
node, the exchange is reused and the upstream pipeline runs once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(p) if n < p else df
