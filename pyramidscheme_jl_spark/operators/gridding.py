"""Scattered points -> raster gridding (GDAL ``gdal_grid`` analog).

The vector->raster arrow for POINT data, completing the family
(``rasterize_polygons`` burns areas; this interpolates scatter):
sensor readings, lidar returns, or geocoded observations gridded onto
the engine's tile layout, which every downstream operator (focal,
zonal, build levels, serve) consumes unchanged.

Semantics are LATTICE-SNAPPED: a point at (x, y) lands in pixel
(floor(x), floor(y)) and all distances are measured center-to-center
in squared pixel units — a deliberate divergence from GDAL's exact
point distances that buys engine-portable integer metrics (the
``fillnodata``/``raster_proximity`` contract) and makes the per-pixel
point aggregation a plain hash aggregate. At the 100 TB target the
pixel bin IS the resolution; sub-pixel distance is below the grid's
own quantization.

Spark-first plan, two shuffles total regardless of point count:

1. pixel binning: ``floor``/filter/``groupBy(px, py)`` — JVM hash
   aggregate with map-side partials; 10^12 points collapse to at most
   W*H skinny rows (cnt, sum, min, max) before anything else moves;
2. halo ownership: each binned pixel row is exploded to every tile
   whose ``radius``-padded window contains it (<= 4 owners via two
   tiny ``sequence`` explodes — the skinny-row twin of the focal halo
   exchange: O(r * perimeter) duplication, no dense tile bytes);
3. one ``applyInPandas`` per output tile scatters the rows into
   padded planes and runs the method kernel vectorized.

Methods (``GRID_METHODS``): disc-masked ``count``/``sum``/``min``/
``max``/``mean`` (the exact d^2 <= r^2 neighborhood, GDAL's circular
window — NOT the square focal window), ``invdist`` (IDW power=2 on
lattice d^2: weight = 1/dd exactly, coincident-pixel points take the
pixel mean — the GDAL singularity rule), and ``nearest`` (the
value-carrying separable EDT shared with ``fillnodata``,
smaller-value tiebreak). Empty-neighborhood pixels: ``count`` -> 0,
everything else NaN (SUM-over-empty-is-NULL convention). Tiles whose
window contains no point within reach are dropped (sparse-raster
semantics, like ``rasterize_polygons``).

Reference parity: none — PyramidScheme.jl has no vector->raster ops;
north-rule gridding surface. GDAL analog: ``gdal_grid`` with
``nearest`` / ``average`` / ``invdist`` algorithms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.build import PyramidSpec, _rows_to_pdf, _tile_row
from ..operators.raster import _lex_edt
from ..plans.grid import tile_pixel_window
from ..sources.catalog import TILE_SCHEMA

GRID_METHODS = ("count", "sum", "min", "max", "mean", "invdist", "nearest")


def grid_points(
    spark: SparkSession,
    points: DataFrame,
    shape: tuple[int, int],
    method: str = "mean",
    radius: int = 3,
    tilesize: int = 256,
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
) -> DataFrame:
    """Grid ``points`` (columns ``x_col``, ``y_col``, ``value_col``)
    onto a ``shape = (width, height)`` raster; returns TILE_SCHEMA rows
    (z=0, float64). See the module docstring for semantics and plan."""
    binned = bin_points(points, shape, x_col, y_col, value_col)
    return grid_from_binned(binned, shape, method, radius, tilesize)


def bin_points(
    points: DataFrame,
    shape: tuple[int, int],
    x_col: str = "x",
    y_col: str = "y",
    value_col: str = "value",
) -> DataFrame:
    """Lattice binning front half: points -> one row per occupied pixel
    ``(px, py, cnt, s, mn, mx)`` via a single JVM hash aggregate.
    Exposed because the per-pixel aggregates are ADDITIVE (cnt/s sum,
    mn/mx fold), which is what makes the streaming state in
    ``streaming.points`` a plain append + re-aggregate."""
    w, h = int(shape[0]), int(shape[1])
    return (
        points.select(
            F.floor(F.col(x_col)).cast("long").alias("px"),
            F.floor(F.col(y_col)).cast("long").alias("py"),
            F.col(value_col).cast("double").alias("v"),
        )
        .where(
            (F.col("px") >= 0) & (F.col("px") < w)
            & (F.col("py") >= 0) & (F.col("py") < h)
            & F.col("v").isNotNull()
            & ~F.isnan("v")  # NaN is nodata engine-wide, and NaN != NULL
        )
        .groupBy("px", "py")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
    )


def merge_binned(binned: DataFrame) -> DataFrame:
    """Fold multiple binned partials (e.g. appended micro-batch state)
    back to one row per pixel — the additive merge."""
    return binned.groupBy("px", "py").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def grid_from_binned(
    binned: DataFrame,
    shape: tuple[int, int],
    method: str = "mean",
    radius: int = 3,
    tilesize: int = 256,
) -> DataFrame:
    """Kernel tail: binned pixel rows -> TILE_SCHEMA tiles (the halo
    ownership explode + per-tile disc/EDT kernel). ``binned`` must be
    one row per pixel (``bin_points`` output or ``merge_binned`` of
    appended partials)."""
    if method not in GRID_METHODS:
        raise ValueError(f"method must be one of {GRID_METHODS}, got {method!r}")
    if radius < 0:
        # radius 0 is well-defined for every method (pixel-bin only)
        raise ValueError(f"radius must be >= 0, got {radius}")
    w, h = int(shape[0]), int(shape[1])
    ts = int(tilesize)
    if radius > ts:
        raise ValueError(
            f"radius {radius} exceeds tilesize {ts}: one-strip halo "
            "ownership no longer covers the window — grid coarser or "
            "raise tilesize"
        )
    r = int(radius)

    owned = binned.select(
        "px", "py", "cnt", "s", "mn", "mx",
        F.expr(
            f"explode(sequence(greatest(px - {r}, 0) div {ts},"
            f" least(px + {r}, {w - 1}) div {ts}))"
        ).alias("tx"),
    ).select(
        "px", "py", "cnt", "s", "mn", "mx", "tx",
        F.expr(
            f"explode(sequence(greatest(py - {r}, 0) div {ts},"
            f" least(py + {r}, {h - 1}) div {ts}))"
        ).alias("ty"),
    )

    return owned.groupBy("tx", "ty").applyInPandas(
        _grid_assemble(method, r, (w, h), ts), TILE_SCHEMA
    )


def _grid_assemble(method: str, r: int, shape: tuple[int, int], ts: int):
    bw, bh = shape
    spec = PyramidSpec(bw, bh, ts)
    # complete disc offset set: d^2 <= r^2 implies Chebyshev <= r
    offs = [
        (dy, dx, dy * dy + dx * dx)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
        if dy * dy + dx * dx <= r * r
    ]

    def fn(key, pdf):
        tx, ty = int(key[0]), int(key[1])
        x0, y0, tw, th = tile_pixel_window((bw, bh), 0, tx, ty, ts)
        if tw <= 0 or th <= 0:
            return _rows_to_pdf([])
        ph, pw = th + 2 * r, tw + 2 * r
        ly = (pdf["py"].to_numpy() - y0 + r).astype(np.int64)
        lx = (pdf["px"].to_numpy() - x0 + r).astype(np.int64)
        keep = (ly >= 0) & (ly < ph) & (lx >= 0) & (lx < pw)
        ly, lx = ly[keep], lx[keep]
        cnt = np.zeros((ph, pw), dtype=np.int64)
        s = np.zeros((ph, pw), dtype=np.float64)
        mn = np.full((ph, pw), np.inf, dtype=np.float64)
        mx = np.full((ph, pw), -np.inf, dtype=np.float64)
        cnt[ly, lx] = pdf["cnt"].to_numpy()[keep]
        s[ly, lx] = pdf["s"].to_numpy()[keep]
        mn[ly, lx] = pdf["mn"].to_numpy()[keep]
        mx[ly, lx] = pdf["mx"].to_numpy()[keep]

        def sh(a, dy, dx):
            return a[r + dy:r + dy + th, r + dx:r + dx + tw]

        if method == "nearest":
            vm = cnt > 0
            bd, bv = _lex_edt(vm, mn, th, tw, r)
            reach = bd <= r * r  # disc metric, not the 2r^2 EDT bound
            if not reach.any():
                return _rows_to_pdf([])
            out = np.where(reach, bv, np.nan)
            return _rows_to_pdf([_tile_row(spec, 0, tx, ty, out)])

        dc = np.zeros((th, tw), dtype=np.int64)
        ds = np.zeros((th, tw), dtype=np.float64)
        dmn = np.full((th, tw), np.inf, dtype=np.float64)
        dmx = np.full((th, tw), -np.inf, dtype=np.float64)
        num = np.zeros((th, tw), dtype=np.float64)
        den = np.zeros((th, tw), dtype=np.float64)
        for dy, dx, dd in offs:
            c_ = sh(cnt, dy, dx)
            dc += c_
            if method in ("sum", "mean"):
                ds += sh(s, dy, dx)
            elif method == "min":
                np.minimum(dmn, sh(mn, dy, dx), out=dmn)
            elif method == "max":
                np.maximum(dmx, sh(mx, dy, dx), out=dmx)
            elif method == "invdist" and dd > 0:
                iw = 1.0 / dd
                num += sh(s, dy, dx) * iw
                den += c_ * iw
        if not dc.any():
            return _rows_to_pdf([])
        has = dc > 0
        if method == "count":
            out = dc.astype(np.float64)
        elif method == "sum":
            out = np.where(has, ds, np.nan)
        elif method == "mean":
            with np.errstate(invalid="ignore"):
                out = np.where(has, ds / np.maximum(dc, 1), np.nan)
        elif method == "min":
            out = np.where(np.isfinite(dmn), dmn, np.nan)
        elif method == "max":
            out = np.where(np.isfinite(dmx), dmx, np.nan)
        else:  # invdist
            c0 = sh(cnt, 0, 0)
            s0 = sh(s, 0, 0)
            exact = c0 > 0
            with np.errstate(invalid="ignore", divide="ignore"):
                idw = np.where(den > 0, num / den, np.nan)
                px_mean = np.where(exact, s0 / np.maximum(c0, 1), np.nan)
            out = np.where(exact, px_mean, idw)
        return _rows_to_pdf([_tile_row(spec, 0, tx, ty, out)])

    return fn
