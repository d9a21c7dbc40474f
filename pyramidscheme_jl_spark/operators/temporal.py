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
