"""Planar line-proximity joins — the map-matching primitive.

Roads, rivers, and trajectories arrive as segment lists; "points within
r of a segment" (and its argmin form, snap-to-nearest-road) is the
workhorse join GIS stacks run at fleet scale. `points_near_lines` is the
blocking + refine shape for it in pure JVM relational algebra:

1. **Segment side**: each segment is parametrically SUBDIVIDED into
   chunks no longer than the cell size (``explode(sequence(0, k-1))``,
   k = ceil(len_inf / s)) — the step that keeps blocking linear in
   segment length. A long diagonal segment's raw bbox covers O((L/s)^2)
   cells; each chunk's r-inflated bbox covers at most 4x4. Chunk cell
   covers come from a tiny 2D ``sequence x sequence`` explode, then
   (cell, seg) pairs dedup.
2. **Point side**: one cell key per point, no probe ring — the segment
   side already carries the r-inflation.
3. **Refine**: exact point-to-segment distance on the FULL segment
   (clamped projection), every step +-*/ and ``least/greatest`` on
   doubles — no libm calls, so the refine is bit-reproducible across
   engines (IEEE ops and sqrt are correctly rounded everywhere; sin/cos
   are not, which is why the spherical join's oracle is pairs-only
   while this one pins distances too). One ``min_by`` per (point, seg)
   collapses multi-cell meetings.

Scale shape: one distinct + one equi-join + one hash agg, all keyed by
bounded-fanout cells; no cross join, no python stage. Skew: a cell
crossed by thousands of segments (an interchange) bounds each point
row's fan-in by segments-per-cell — the same occupancy story as every
cell join here; salt the agg key if a corpus measures hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def points_near_lines(
    segments: DataFrame,
    points: DataFrame,
    radius: float,
    seg_id_col: str = "seg_id",
    point_id_col: str = "point_id",
    nearest_only: bool = False,
) -> DataFrame:
    """All (point, segment) pairs with point-to-segment distance <=
    ``radius`` (planar / projected coordinates).

    ``segments``: (seg_id, x1, y1, x2, y2); ``points``: (point_id, x,
    y). Output: (point_id, seg_id, dist) with the exact euclidean
    distance; ``nearest_only=True`` keeps each point's nearest segment
    within the radius (ties by lowest seg_id — deterministic snap).
    """
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    s = float(radius)  # cell size = radius: r-inflated chunk -> <=4x4 cells

    # -- segment side: subdivide, then cover each chunk's inflated bbox
    seg = segments.select(
        F.col(seg_id_col).alias("__sid"),
        F.col("x1").cast("double"), F.col("y1").cast("double"),
        F.col("x2").cast("double"), F.col("y2").cast("double"),
    )
    k = F.greatest(
        F.lit(1),
        F.ceil(
            F.greatest(F.abs(F.col("x2") - F.col("x1")),
                       F.abs(F.col("y2") - F.col("y1"))) / F.lit(s)
        ).cast("long"),
    )
    chunks = seg.withColumn("__k", k).select(
        "__sid", "x1", "y1", "x2", "y2", "__k",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("__k") - 1)).alias("__i"),
    )
    t0 = F.col("__i") / F.col("__k")
    t1 = (F.col("__i") + 1) / F.col("__k")
    cx0 = F.col("x1") + t0 * (F.col("x2") - F.col("x1"))
    cy0 = F.col("y1") + t0 * (F.col("y2") - F.col("y1"))
    cx1 = F.col("x1") + t1 * (F.col("x2") - F.col("x1"))
    cy1 = F.col("y1") + t1 * (F.col("y2") - F.col("y1"))
    gx0 = F.floor((F.least(cx0, cx1) - F.lit(s)) / F.lit(s)).cast("long")
    gx1 = F.floor((F.greatest(cx0, cx1) + F.lit(s)) / F.lit(s)).cast("long")
    gy0 = F.floor((F.least(cy0, cy1) - F.lit(s)) / F.lit(s)).cast("long")
    gy1 = F.floor((F.greatest(cy0, cy1) + F.lit(s)) / F.lit(s)).cast("long")
    covers = (
        chunks.select(
            "__sid", "x1", "y1", "x2", "y2",
            gx0.alias("__gx0"), gx1.alias("__gx1"),
            gy0.alias("__gy0"), gy1.alias("__gy1"),
        )
        .select(
            "__sid", "x1", "y1", "x2", "y2", "__gy0", "__gy1",
            F.explode(F.sequence("__gx0", "__gx1")).alias("__gx"),
        )
        .select(
            "__sid", "x1", "y1", "x2", "y2", "__gx",
            F.explode(F.sequence("__gy0", "__gy1")).alias("__gy"),
        )
        .select(
            "__sid", "x1", "y1", "x2", "y2",
            ((F.col("__gx") + F.lit(1 << 30)) * F.lit(1 << 31)
             + (F.col("__gy") + F.lit(1 << 30))).alias("__cell"),
        )
        .dropDuplicates(["__sid", "__cell"])
    )

    # -- point side: one key, no probe ring. The point scan is the STREAM
    # side of the broadcast candidate join — a single-row-group points
    # file otherwise runs the whole ~45M-candidate refine on one core
    # (operators/parallelism.py; at-scale inputs pass through untouched)
    from .parallelism import ensure_min_parallelism

    pts = ensure_min_parallelism(points).select(
        F.col(point_id_col).alias("__pid"),
        F.col("x").cast("double").alias("__px"),
        F.col("y").cast("double").alias("__py"),
        ((F.floor(F.col("x") / F.lit(s)).cast("long") + F.lit(1 << 30))
         * F.lit(1 << 31)
         + (F.floor(F.col("y") / F.lit(s)).cast("long") + F.lit(1 << 30))
         ).alias("__cell"),
    )

    # -- refine: exact clamped-projection distance on the full segment
    j = covers.join(pts, "__cell")
    dx, dy = F.col("x2") - F.col("x1"), F.col("y2") - F.col("y1")
    l2 = dx * dx + dy * dy
    tproj = ((F.col("__px") - F.col("x1")) * dx
             + (F.col("__py") - F.col("y1")) * dy) / l2
    t = F.when(l2 == 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), tproj))
    )
    ex = F.col("__px") - (F.col("x1") + t * dx)
    ey = F.col("__py") - (F.col("y1") + t * dy)
    d2 = ex * ex + ey * ey
    pairs = (
        j.withColumn("__d2", d2)
        .where(F.col("__d2") <= F.lit(s * s))
        # exactly-once by construction (r9): a point carries ONE cell key
        # and the cover side is deduped on (sid, cell), so each (point,
        # segment) pair meets in at most one cell — the old
        # groupBy(pid, sid).min dedup was a pass-through that shuffled
        # every surviving pair (15.3M rows at sf1.0) for nothing; the
        # oracle's exact pair COUNTS pin the property
        .select("__pid", "__sid", "__d2")
    )
    if nearest_only:
        pairs = pairs.groupBy("__pid").agg(
            F.min_by(F.struct("__sid", "__d2"), F.struct("__d2", "__sid")).alias("__m")
        ).select("__pid", F.col("__m.__sid").alias("__sid"), F.col("__m.__d2").alias("__d2"))
    return pairs.select(
        F.col("__pid").alias(point_id_col),
        F.col("__sid").alias(seg_id_col),
        F.sqrt("__d2").alias("dist"),
    )
