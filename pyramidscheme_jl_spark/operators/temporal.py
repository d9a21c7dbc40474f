"""Temporal joins the DataFrame API lacks natively (BASELINE task list:
"an operator Spark lacks (e.g., as-of join, range join, ...)").

``asof_join`` is the nearest-predecessor join: for every left row, the
latest right row with ``right.on <= left.on`` within the same ``by`` group
(optionally within ``tolerance``). pandas has ``merge_asof``; DuckDB has a
native ``ASOF JOIN``; Spark has neither — the common workarounds are a
range-bucketed theta join (quadratic in bucket occupancy) or a per-group
pandas UDF (python in the hot path).

This implementation is pure JVM relational algebra, ONE shuffle:

1. tag both sides and UNION them (left payload nulls on right rows and
   vice versa — a union is shuffle-free);
2. one window per ``by`` group ordered by ``(on, side, tiebreak)`` with
   ``last(right_payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, current)`` — every left row sees
   exactly the latest right row at-or-before its timestamp (right rows
   sort BEFORE left rows at equal ``on``, so the match is inclusive;
   equal-timestamp right duplicates resolve to the highest tiebreak —
   a total, engine-portable order);
3. keep the left rows, apply the tolerance filter.

At scale this is one hash exchange on ``by`` plus a per-partition sort —
the same physical shape as a sort-merge join, with no python stage and no
range explosion. Skewed ``by`` keys (one hot user) are bounded by the
window sort, and AQE's skew handling applies to the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


#: grain -> seconds; ordered finest-first so each coarser grain can be
#: produced from the previous grain's partials
_GRAIN_SECONDS = {"minute": 60, "hour": 3600, "day": 86400}


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts_s",
    value_col: str | None = None,
    grains: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy (BASELINE task
    list's "hypertable rollup"): counts (+ optional sums) per minute /
    hour / day bucket, where every COARSER grain is re-aggregated from
    the previous grain's partial rows — the same decomposable-reducer
    cascade the pyramid build uses on space, applied to time. An hour
    row reads <= 60 minute partials instead of the raw events, so the
    full hierarchy costs O(events) + O(minute rows) instead of
    len(grains) x O(events) — at 10^12 events that is the difference
    between one scan and three.

    ``ts_col`` is epoch SECONDS (bigint) — convert timestamps upstream
    so bucket arithmetic is exact integer math (engine-portable).
    ``value_col`` must likewise be pre-quantized to an integer unit
    (e.g. cents) by the caller; sums stay exact int64. Returns
    ``(grain string, bucket_s long, n long[, sum_v long])``.
    """
    gs = [g for g in _GRAIN_SECONDS if g in grains]  # canonical fine->coarse
    if gs != list(grains):
        raise ValueError(f"grains must be finest-first from {list(_GRAIN_SECONDS)}")
    aggs = [F.count("*").cast("long").alias("n")]
    if value_col:
        aggs.append(F.sum(F.col(value_col)).cast("long").alias("sum_v"))
    sec0 = _GRAIN_SECONDS[gs[0]]
    # floor semantics, not double-divide + cast (which truncates toward
    # zero and diverges from integer floor for pre-1970 epochs; ADVICE r5).
    # t - pmod(t, sec) is pure int64 arithmetic — exact and engine-portable.
    ts = F.col(ts_col).cast("long")
    level = (
        df.groupBy((ts - F.pmod(ts, F.lit(sec0))).alias("bucket_s"))
        .agg(*aggs)
    )
    out = level.select(F.lit(gs[0]).alias("grain"), "*")
    for g in gs[1:]:
        sec = _GRAIN_SECONDS[g]
        re_aggs = [F.sum("n").cast("long").alias("n")]
        if value_col:
            re_aggs.append(F.sum("sum_v").cast("long").alias("sum_v"))
        b = F.col("bucket_s")
        level = (
            level.groupBy((b - F.pmod(b, F.lit(sec))).alias("bucket_s"))
            .agg(*re_aggs)
        )
        out = out.unionByName(level.select(F.lit(g).alias("grain"), "*"))
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """Nearest-predecessor (backward) as-of join.

    For each ``left`` row: the single ``right`` row of the same ``by``
    group with the greatest ``on`` satisfying ``right.on <= left.on``
    (ties on ``on`` broken by the greatest ``tiebreak``). Rows with no
    predecessor (or outside ``tolerance``, expressed in the units of
    ``on`` after cast-to-long — e.g. microseconds for ``unix_micros``
    columns) are dropped (inner as-of semantics, deterministic hashes —
    use a left-join wrapper if nulls are wanted).

    ``right_cols``: right payload columns to carry (default: all minus
    ``on``/``by``), emitted with ``suffix``.
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]
    payload = F.struct(
        F.col(on).alias("__on"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("__tb"),
        payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns if c not in by],
    )
    l = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in by],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where((F.col("__side") == 1) & F.col("__m").isNotNull())
    )
    if tolerance is not None:
        matched = matched.where(
            F.col("__t").cast("long") - F.col("__m.__on").cast("long")
            <= F.lit(tolerance).cast("long")
        )
    out_cols = (
        [F.col(c) for c in by]
        + [F.col(f"__l_{c}").alias(c) for c in left.columns if c not in by]
        + [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols]
        + [F.col("__m.__on").alias(f"{on}{suffix}")]
    )
    return matched.select(*out_cols)
