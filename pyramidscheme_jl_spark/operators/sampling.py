"""Deterministic content-hash sampling for training-data pipelines.

At 10^12 rows a training corpus is sampled, stratified, and split into
train/eval many times over its life; `df.sample()` (RNG per task) is
non-reproducible across reruns, partitionings, and engines. These
operators decide keep/drop from a CONTENT hash instead: the row's key
column(s) through md5, first 15 hex chars as a 60-bit integer, compared
against `fraction * 2^60`. The decision is a property of the row alone —
no RNG state, no shuffle, no driver coordination, stable under
repartitioning, resumable, and reproducible bit-for-bit in any engine
with md5 (the DuckDB oracle rows pin this: Spark
``conv(substr(md5(x),1,15),16,10)`` == DuckDB
``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``, the repo-wide portability
rule from the dedup family).

Scale shape: every operator here is a pure map-side filter/projection —
the 100 TB plan is a scan with a codegen'd predicate, nothing else. The
md5 itself is not scan-pushable (computed column), but column pruning
still reaches the parquet reader and no exchange is introduced.

Reference analog: none (the reference has no sampling surface) — this is
north-rule/pipeline surface, like the dedup and ANN families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60  # 15 hex chars: fits int64 in Spark AND DuckDB
_HASH_SPACE = 1 << _HASH_BITS


def _key_hash(key_col: str | Column, seed: int) -> Column:
    """60-bit uniform hash of (key, seed) — the engine-portable grid.

    The seed is concatenated INTO the hashed text (not xor'd after), so
    distinct seeds give independent samples and the DuckDB twin is the
    same string expression.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    txt = F.concat(key.cast("string"), F.lit(f"|{int(seed)}"))
    return F.conv(F.substring(F.md5(txt), 1, 15), 16, 10).cast("long")


def _threshold(fraction: float) -> int:
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # floor keeps P(keep) <= fraction exactly; fraction=1.0 keeps all
    return min(_HASH_SPACE, int(fraction * _HASH_SPACE))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by content hash.

    ``P(keep) = floor(fraction * 2^60) / 2^60`` per row, independent
    rows. The same (key, seed) always lands on the same side — rerunning
    on a re-partitioned, re-ordered, or incrementally-grown corpus keeps
    exactly the surviving subset of before (the property that makes
    hash sampling the production corpus-sampling primitive: a grown
    corpus's sample is a superset refresh, not a reshuffle)."""
    return df.where(_key_hash(key_col, seed) < F.lit(_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. downsample web crawl to 10%, keep books at 100%).

    ``fractions`` maps stratum value -> keep fraction; strata absent
    from the map use ``default_fraction``. The threshold is a dims-sized
    CASE chain (broadcast-free, codegen'd); the hash ignores the stratum
    so a row keeps its fate if it is later re-labeled into a stratum
    with an equal-or-higher fraction (nested-sample property per seed)."""
    thr = F.lit(_threshold(default_fraction))
    # key=str: the order only needs to be deterministic for a stable plan;
    # semantic sort would TypeError on mixed-type strata (int + str codes)
    for value, frac in sorted(fractions.items(), key=lambda kv: str(kv[0])):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_threshold(frac))
        ).otherwise(thr)
    return df.where(_key_hash(key_col, seed) < thr)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint splits (train/eval/test) as a labeled
    column. ``weights`` maps split name -> weight; weights are
    normalized and laid out as contiguous half-open hash ranges in
    sorted-name order (deterministic layout — dict order is not part of
    the contract). Every row gets exactly one label; growing the corpus
    never moves an existing row between splits."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    names = sorted(weights)
    # cumulative integer bounds; the last bound is forced to 2^60 so the
    # full space is covered despite float rounding
    bounds, acc = [], 0.0
    for name in names:
        acc += float(weights[name]) / total
        bounds.append(min(_HASH_SPACE, int(acc * _HASH_SPACE)))
    bounds[-1] = _HASH_SPACE
    h = _key_hash(key_col, seed)
    label = F.lit(names[-1])
    for name, hi in zip(reversed(names[:-1]), reversed(bounds[:-1])):
        label = F.when(h < F.lit(hi), F.lit(name)).otherwise(label)
    return df.withColumn(split_col, label)
