"""Spherical (lat/lon) proximity joins.

The planar spatial family (`operators/joins.py`) works in the pyramid's
projected extent; real point datasets arrive as WGS84 lat/lon where
"within R meters" is a great-circle predicate. `radius_join` is the
blocking + refine shape for it: degree-grid cells sized so any pair
within ``radius_m`` lands in the same or an adjacent cell (an equi-join,
never a cross join), then an exact haversine filter — every trig step a
built-in `pyspark.sql.functions` call, so the whole refine stays inside
whole-stage codegen. No geodesy library, no python in the hot path.

Scale shape: one equi-join on (lat_cell, lon_cell) with a 3x3 probe
explode on the QUERY side only (9 keys/query — the data side is hashed
once and never expanded). Dense cities are bounded by cell occupancy ~
(pi*R_earth/180 * s_deg)^2 area, the same skew story as the Morton cell
joins; `broadcast_queries=False` switches to a shuffle-hash equi-join
for corpus-sized query sets (the `lsh_topk` split).

Longitude wraps at the antimeridian (r8): lon cells live on a uniform
``n_lon = floor(360 / s_lon)`` ring grid — cells are *widened* to
``360 / n_lon`` (never narrowed: a sub-width seam cell would let a
qualifying pair sit 2 cells apart and be silently missed) — and the
query probes step modulo ``n_lon``, so a Fiji/Chukotka pair lands in
adjacent ring cells like any other. Input longitudes are normalized
from any convention ([-180, 180], [0, 360], unbounded) to one turn;
the haversine refine is wrap-correct by construction (``sin^2(dl/2)``
is periodic — 359.8 degrees apart IS 0.2 degrees apart).

Honest limit (documented, not silently wrong): the blocking width uses
one global ``cos(max |lat|)`` — a row with |lat| above ``max_abs_lat``
raises inside the scan (it would silently miss neighbors otherwise),
and high-latitude corpora pay wider lon cells (more candidates,
identical results). A production S2-style cell covering removes the
cap; the refine is unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: IUGG mean Earth radius, meters — the DuckDB oracle inlines the same
#: literal so both engines evaluate the identical formula.
EARTH_RADIUS_M = 6371008.8

_M_PER_DEG_LAT = math.pi * EARTH_RADIUS_M / 180.0


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters as a codegen'd Column expression
    (all built-ins: radians/sin/cos/asin/sqrt)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2) - F.radians(lat1)
    dl = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dp / 2) * F.sin(dp / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def radius_join(
    points: DataFrame,
    queries: DataFrame,
    radius_m: float,
    id_col: str = "point_id",
    query_id_col: str = "query_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 75.0,
    broadcast_queries: bool = True,
    dist_col: str | None = "dist_m",
    nearest_only: bool = False,
) -> DataFrame:
    """All (query, point) pairs within ``radius_m`` meters great-circle.

    Blocking cell: ``s_lat = radius_m`` in latitude degrees and the
    exact haversine-derived longitude bound at the latitude cap (see
    body), so for any qualifying pair the cell indices differ by at
    most 1 on each axis — the query side probes its 3x3 neighborhood
    (JVM explode of a constant 9-element array) and the join is a plain
    equi-join on the packed cell. Refine is the exact haversine; emit
    order and content are deterministic.

    ``dist_col=None`` omits the distance column (pairs only — the
    oracle-stable projection; trig last-ulp parity across engines is
    not a contract anyone should build on).
    """
    if radius_m <= 0:
        raise ValueError(f"radius_m must be positive, got {radius_m}")
    if not (0 < max_abs_lat < 90):
        raise ValueError(f"max_abs_lat must be in (0, 90), got {max_abs_lat}")
    s_lat = float(radius_m) / _M_PER_DEG_LAT
    # exact longitude bound from the haversine identity: for any pair
    # within r with |lat| <= cap, sin(dlon/2) <= sin(r/2R)/cos(cap)
    # (NOT the linear r/(R cos cap), which under-covers for large r
    # near the cap — the arcsin inflation is real there)
    y = math.sin(float(radius_m) / (2 * EARTH_RADIUS_M)) / math.cos(
        math.radians(max_abs_lat)
    )
    if y >= 1.0:
        raise ValueError(
            f"radius_m={radius_m} is too large to block at "
            f"max_abs_lat={max_abs_lat} (a pair could span any longitude)"
        )
    s_lon = math.degrees(2 * math.asin(y))
    # ring grid: UNIFORM cells of >= s_lon width that tile the full turn.
    # floor (not ceil): widening keeps the invariant "wrapped dlon <= s_lon
    # -> cell indices adjacent mod n_lon"; a ceil grid's cells would be
    # NARROWER than s_lon and a pair could span two boundaries. n_lon < 3
    # cannot host distinct -1/0/+1 probes (they'd collide and duplicate
    # pairs), so degrade to ONE all-longitudes cell — blocking then prunes
    # on latitude alone, which at such radii (>1/3 of the turn) is what a
    # cell grid does anyway.
    n_lon = max(1, int(360.0 / s_lon))
    if n_lon < 3:
        n_lon = 1

    def guard(df: DataFrame, side: str) -> DataFrame:
        # contract enforcement in the scan itself: a row past the cap
        # would silently miss neighbors, so it must fail loudly instead
        msg = f"radius_join({side}): |{lat_col}| exceeds max_abs_lat"
        return df.where(
            F.when(
                F.abs(F.col(lat_col)) <= F.lit(float(max_abs_lat)), F.lit(True)
            ).otherwise(F.raise_error(F.lit(msg)))
        )

    la = F.floor(F.col(lat_col) / F.lit(s_lat)).cast("long")
    # normalize ANY longitude convention to [0, 360), then ring index;
    # the trailing % n_lon only fires on the 360.0 float edge
    lon_w = ((F.col(lon_col) % 360.0) + 360.0) % 360.0
    lo = F.floor(lon_w / F.lit(360.0 / n_lon)).cast("long") % F.lit(n_lon)
    # pack lat band and ring index into one int64 join key; 2^31 lat bands
    # cover cell sizes down to ~2 cm, far below any meaningful radius
    cell = (la + F.lit(1 << 30)) * F.lit(1 << 31) + lo

    d = guard(points, "points").select(
        F.col(id_col).alias("__pid"),
        F.col(lat_col).alias("__plat"),
        F.col(lon_col).alias("__plon"),
        cell.alias("__cell"),
    )
    dxs = (-1, 0, 1) if n_lon >= 3 else (0,)
    offs = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in dxs
    ])
    q = guard(queries, "queries").select(
        F.col(query_id_col).alias("__qid"),
        F.col(lat_col).alias("__qlat"),
        F.col(lon_col).alias("__qlon"),
        (la + F.lit(1 << 30)).alias("__la"),
        lo.alias("__lo"),
        F.explode(offs).alias("__off"),  # generators can't nest in exprs
    ).select(
        "__qid", "__qlat", "__qlon",
        (
            (F.col("__la") + F.col("__off.dy")) * F.lit(1 << 31)
            + (F.col("__lo") + F.col("__off.dx") + F.lit(n_lon)) % F.lit(n_lon)
        ).alias("__cell"),
    )
    joined = (
        d.join(F.broadcast(q), "__cell")
        if broadcast_queries
        else d.hint("shuffle_hash").join(q, "__cell")
    )
    dist = haversine_m(
        F.col("__qlat"), F.col("__qlon"), F.col("__plat"), F.col("__plon")
    )
    out = joined.where(dist <= F.lit(float(radius_m))).select(
        F.col("__qid").alias(query_id_col),
        F.col("__pid").alias(id_col),
        dist.alias("__d"),
    )
    if nearest_only:
        # snap each query to its nearest point within the radius (ties
        # by lowest point id). The argmin ranks by a trig double, so
        # unlike the planar lines join this form is NOT offered an
        # engine-exact oracle — near-equal distances could rank
        # differently across libms; within one engine it is
        # deterministic.
        out = (
            out.groupBy(query_id_col)
            .agg(
                F.min_by(
                    F.struct(F.col(id_col), F.col("__d")),
                    F.struct(F.col("__d"), F.col(id_col)),
                ).alias("__m")
            )
            .select(
                query_id_col,
                F.col(f"__m.{id_col}").alias(id_col),
                F.col("__m.__d").alias("__d"),
            )
        )
    if dist_col is None:
        return out.drop("__d")
    return out.withColumnRenamed("__d", dist_col)


def geo_knn(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    radius0_m: float = 1_000.0,
    max_expansions: int = 12,
    id_col: str = "point_id",
    query_id_col: str = "query_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 75.0,
    dist_col: str = "dist_m",
) -> DataFrame:
    """k nearest points per query by great-circle distance — the
    spherical twin of ``knn_join`` (same radius-doubling exactness
    argument): run ``radius_join`` at ``radius0_m * 2^i`` until every
    query holds >= k candidates, then rank. Candidates within r are
    COMPLETE (the ring-grid blocking never loses a pair), so once a
    query has k of them its true kNN set is inside them — no boundary
    case exists. Queries that never reach k (corpus smaller than k, or
    the radius cap where blocking stays valid at ``max_abs_lat`` is
    hit) return the neighbors found under the largest valid radius —
    the same everything-within-reach contract as ``knn_join``'s
    exhausted-grid arm. The driver loop sees per-round deficit COUNTS
    only.

    Ranking is by a trig double (ties broken by lowest point id), so —
    like ``radius_join(nearest_only=True)`` — no engine-exact oracle is
    offered; determinism within one engine is pinned by test.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if radius0_m <= 0:
        raise ValueError(f"radius0_m must be positive, got {radius0_m}")
    from pyspark.sql import Window

    n_q = queries.select(query_id_col).distinct().count()
    r = float(radius0_m)
    best = None
    for _ in range(max_expansions):
        try:
            cand = radius_join(
                points, queries, r,
                id_col=id_col, query_id_col=query_id_col,
                lat_col=lat_col, lon_col=lon_col,
                max_abs_lat=max_abs_lat, dist_col="__d",
            )
        except ValueError:
            break  # radius grew past the blocking cap: keep the last arm
        best = (cand, r)
        sat = (
            cand.groupBy(query_id_col).count()
            .where(F.col("count") >= k).count()
        )
        if sat >= n_q:
            break
        r *= 2.0
    if best is None:  # radius0 already past the cap
        raise ValueError(
            f"radius0_m={radius0_m} is too large to block at "
            f"max_abs_lat={max_abs_lat}"
        )
    cand, _ = best
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__d").asc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select(
            query_id_col, id_col,
            F.col("__d").alias(dist_col), F.col("__rk").alias("rank"),
        )
    )
