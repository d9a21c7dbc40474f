"""Tile-pyramid table catalog: Iceberg-style layout emulated on parquet.

No Iceberg jars exist in the sandbox (SURVEY.md §7.0), so a pyramid dataset
is a directory:

    <path>/tiles/z=<level>/part-*.parquet   -- tile rows, partitioned by z
    <path>/_manifest/*.parquet              -- append-only lineage/commit rows

The manifest plays the role of Iceberg snapshots (north rule: per-partition
lineage rows — tile counts, bytes, reducer hash — and resume-from-checkpoint:
a level is committed iff its manifest rows exist, and manifest rows are only
written *after* the level's parquet lands, so a crashed build resumes at the
first level without manifest rows). Swapping in a real Iceberg catalog means
replacing read/write here with ``spark.read.format("iceberg")`` /
``writeTo(...).append()`` — nothing above this module changes.

Scan-side design for scale: ``z`` is a physical partition column (partition
pruning), and ``tx``/``ty``/``cell``/extents are top-level scalar columns so
parquet min/max stats skip row groups for window/bbox predicates — the Spark
analogue of the reference's chunk-pruned ``selectlevel`` read
(src/PyramidScheme.jl:454-467).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TILE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("tx", T.IntegerType()),
        T.StructField("ty", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("c", T.IntegerType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("vmin", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
        T.StructField("vmean", T.DoubleType()),
        T.StructField("cell", T.LongType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)

#: tile columns minus the partition column (layout on disk)
TILE_DATA_COLS = [f.name for f in TILE_SCHEMA.fields if f.name != "z"]

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("z", T.IntegerType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("tile_count", T.LongType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("reducer", T.StringType()),
        T.StructField("reducer_hash", T.StringType()),
        T.StructField("committed_at_ordinal", T.LongType()),
    ]
)


def level_path(path: str, z: int) -> str:
    return f"{path}/tiles/z={z}"


def write_level(df: DataFrame, path: str, z: int) -> None:
    """Checkpoint one pyramid level (idempotent: overwrite its partition)."""
    df.select(*TILE_DATA_COLS).write.mode("overwrite").parquet(level_path(path, z))


def read_level(spark: SparkSession, path: str, z: int) -> DataFrame:
    return spark.read.parquet(level_path(path, z)).withColumn("z", F.lit(z).cast("int"))


def read_tiles(spark: SparkSession, path: str) -> DataFrame:
    """All levels; ``z`` recovered as a partition column (pruning-friendly)."""
    df = spark.read.parquet(f"{path}/tiles")
    return df.withColumn("z", F.col("z").cast("int")).select(*[f.name for f in TILE_SCHEMA.fields])


def append_manifest(spark: SparkSession, path: str, rows: list[dict]) -> None:
    spark.createDataFrame(rows, MANIFEST_SCHEMA).coalesce(1).write.mode("append").parquet(
        f"{path}/_manifest"
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/_manifest")


def committed_levels(spark: SparkSession, path: str, run_id: str | None = None) -> list[int]:
    """Levels whose manifest rows exist == committed checkpoints (resume)."""
    try:
        m = read_manifest(spark, path)
    except Exception:
        return []
    if run_id is not None:
        m = m.where(F.col("run_id") == run_id)
    return sorted(r[0] for r in m.select("z").distinct().collect())


def manifest_lineage(df: DataFrame, run_id: str, z: int, reducer: str, rhash: str, ordinal: int) -> list[dict]:
    """Per-(Spark-)partition lineage rows for a level about to be committed."""
    agg = (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("tile_count"),
            F.sum(F.length("bytes")).alias("bytes"),
        )
        .collect()
    )
    return [
        {
            "run_id": run_id,
            "z": int(z),
            "partition_id": int(r["partition_id"]),
            "tile_count": int(r["tile_count"]),
            "bytes": int(r["bytes"]),
            "reducer": reducer,
            "reducer_hash": rhash,
            "committed_at_ordinal": int(ordinal),
        }
        for r in agg
    ]
