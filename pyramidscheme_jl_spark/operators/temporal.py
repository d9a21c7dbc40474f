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
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType
from pyspark.sql.window import Window


def _ordinal_long(col, dtype):
    """``on`` as an exact int64 ordinal: native units for integral
    columns, MICROSECONDS for timestamp / timestamp_ntz (the session tz
    is pinned UTC in session.get_spark, so the ntz cast is a pure UTC
    reinterpretation), DAYS for date. A bare ``cast("long")`` is not
    enough — Spark refuses TIMESTAMP_NTZ -> BIGINT (caught driving
    events.ts through the bucketed path)."""
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dtype, DateType):
        return F.datediff(col, F.to_date(F.lit("1970-01-01"))).cast("long")
    return col.cast("long")


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
    bucket_width=None,
    auto_budget: int = 1 << 20,
) -> DataFrame:
    """Nearest-predecessor (backward) as-of join.

    For each ``left`` row: the single ``right`` row of the same ``by``
    group with the greatest ``on`` satisfying ``right.on <= left.on``
    (ties on ``on`` broken by the greatest ``tiebreak``). Rows with no
    predecessor (or outside ``tolerance``) are dropped (inner as-of
    semantics, deterministic hashes — use a left-join wrapper if nulls
    are wanted). ``tolerance`` and ``bucket_width`` are expressed in the
    ordinal units of ``on``: native integer units for numeric columns,
    MICROSECONDS for timestamp/timestamp_ntz, days for date.

    ``right_cols``: right payload columns to carry (default: all minus
    ``on``/``by``), emitted with ``suffix``.

    ``bucket_width`` (skew control, VERDICT r5 #5): the default window
    serializes each ``by`` group into one task — one hot key holding half
    the rows caps the job at that task (measured 3.91x uniform at 50%
    hot; the bucketed variant restores it to 1.76x <= the 2x criterion
    with identical checksums — tools/asof_skew_ab.py, BENCH/ASOF_SKEW.md;
    on UNIFORM keys bucketing costs 1.6x plain, hence opt-in). With
    ``bucket_width`` set, the window partitions by ``(by, floor(on /
    width))`` so a hot group spreads across its time range, and a second
    pass fixes the bucket boundaries: per-(group, bucket) the last right
    payload is aggregated (``max_by``), a tiny per-bucket window computes
    the carry-in from STRICTLY earlier buckets, and rows whose in-bucket
    window found no predecessor coalesce to the carry. Still pure JVM —
    two extra bounded shuffles, no python, no range explosion; identical
    output (exact-equality test). Leave ``None`` for uniform keys.

    ``bucket_width="auto"`` (VERDICT r6 #6): a caller who doesn't know
    their keys are hot shouldn't eat the serialized-window breach. One
    scalars-only count job (the J4 hot-salt pattern) sizes the largest
    ``by`` group across both sides; at or under ``auto_budget`` rows
    (default 2^20 — a comfortably single-task window sort) the plain
    one-shuffle path runs unchanged. Above it the hot group's time range
    is split into ``nb`` buckets where ``nb`` honours BOTH constraints a
    hot window has: memory (``>= mx/auto_budget`` so no bucket outgrows
    a task) and latency (``>= 4x defaultParallelism`` so the formerly
    serialized group actually saturates the cluster), capped at one
    bucket per 64k rows so buckets never shrink below the carry-pass
    overhead. Cost on uniform keys: the count job only (measured 1.05x
    plain — BENCH/ASOF_SKEW.md); the bucketed plan is bit-identical to
    manual at the same width."""
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
    u = r.unionByName(l)
    order = [F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc()]
    if bucket_width == "auto":
        import math

        tl0 = _ordinal_long(F.col("__t"), left.schema[on].dataType)
        stats = (
            u.groupBy(*by)
            .agg(F.count("*").alias("c"), F.min(tl0).alias("lo"), F.max(tl0).alias("hi"))
            .agg(
                F.max("c").alias("mx"),
                F.max_by(F.struct("lo", "hi"), "c").alias("rng"),
            )
            .collect()[0]
        )
        mx = int(stats["mx"] or 0)
        if mx <= int(auto_budget):
            bucket_width = None  # largest group is single-task-sized
        else:
            lo, hi = int(stats["rng"]["lo"]), int(stats["rng"]["hi"])
            par = left.sparkSession.sparkContext.defaultParallelism
            nb = max(
                math.ceil(mx / int(auto_budget)),  # memory: bucket fits a task
                min(4 * par, math.ceil(mx / 65536)),  # latency: spread the group
            )
            bucket_width = max(1, math.ceil((hi - lo + 1) / nb))
    if bucket_width is None:
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    else:
        tl = _ordinal_long(F.col("__t"), left.schema[on].dataType)
        # `div` keeps everything in int64 — Spark's `/` is double division,
        # which rounds ordinals >= 2^53 (ns-scale ints) to the wrong bucket
        # (ADVICE r6). pmod first keeps floor semantics for negatives.
        u = u.withColumn("__tl", tl).withColumn(
            "__bk",
            F.expr(
                f"(__tl - pmod(__tl, {int(bucket_width)}L)) "
                f"div {int(bucket_width)}L"
            ),
        ).drop("__tl")
        w = (
            Window.partitionBy(*by, "__bk")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # carry-in per (group, bucket): the last right payload of STRICTLY
        # earlier buckets. Buckets with no right rows still need a carry,
        # so the bucket list comes from both sides.
        rb = (
            u.where(F.col("__side") == 0)
            .groupBy(*by, "__bk")
            .agg(F.max_by("__r", F.struct("__t", "__tb")).alias("__last"))
        )
        cw = (
            Window.partitionBy(*by)
            .orderBy("__bk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            u.select(*by, "__bk")
            .distinct()
            .join(rb, [*by, "__bk"], "left")
            .withColumn("__c", F.last("__last", ignorenulls=True).over(cw))
            .select(*by, "__bk", "__c")
        )
        matched = (
            u.withColumn("__m0", F.last("__r", ignorenulls=True).over(w))
            .join(carry, [*by, "__bk"], "left")
            .withColumn("__m", F.coalesce("__m0", "__c"))
        )
    matched = matched.where((F.col("__side") == 1) & F.col("__m").isNotNull())
    if tolerance is not None:
        dt = left.schema[on].dataType
        matched = matched.where(
            _ordinal_long(F.col("__t"), dt)
            - _ordinal_long(F.col("__m.__on"), dt)
            <= F.lit(tolerance).cast("long")
        )
    out_cols = (
        [F.col(c) for c in by]
        + [F.col(f"__l_{c}").alias(c) for c in left.columns if c not in by]
        + [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols]
        + [F.col("__m.__on").alias(f"{on}{suffix}")]
    )
    return matched.select(*out_cols)
