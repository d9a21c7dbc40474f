"""Vector -> raster: burn polygons into pyramid-layout tiles.

The reference builds pyramids over existing rasters; a production
raster<->vector engine also needs the opposite arrow (GDAL's
``rasterize``): polygons burned into a tiled raster that the rest of the
engine (zonal_raster, raster_extract, build levels, streaming patches)
consumes unchanged. Spark-first shape:

- driver-side planning is dims-sized: each polygon's compact cover
  (``polygon_to_cells_classified``) becomes (polygon_id, paint_ord,
  is_full, leaf_lo, leaf_hi) rows, where the leaf range is the cover
  cell's Morton descendant interval at the TILE resolution;
- leaf expansion happens JVM-side (``explode(sequence(lo, hi))``) — a
  continent-sized polygon fans out on executors, never on the driver;
- one hash aggregate groups the (cell, polygon...) pairs to a single row
  per output tile, so each tile renders ONCE with its full paint list;
- the Arrow render stage fills interior covers wholesale and ray-casts
  only boundary-cover pixels, in ascending paint order (LAST polygon
  wins, GDAL semantics); tiles with zero burned pixels are dropped
  (sparse-raster semantics — at 10^12-tile scale materializing empty
  tiles is the bug, not the feature).

Output rows use the engine's TILE_SCHEMA (bytes + stats + extents via
``build._tile_row``), so ``catalog.write_level`` + ``write_multiscales``
turn the result into an openable pyramid base.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cells import (
    cell_range,
    cell_to_xy,
    points_in_polygon,
    polygon_to_cells_classified,
)
from ..operators.build import PyramidSpec, _rows_to_pdf, _tile_row
from ..plans.grid import tile_pixel_window
from ..sources.catalog import TILE_SCHEMA


def rasterize_polygons(
    spark: SparkSession,
    polygons: list[dict],
    base_shape: tuple[int, int],
    tilesize: int = 256,
    value_key: str = "value",
    fill: float = np.nan,
    dtype: str = "float64",
) -> DataFrame:
    """Burn ``polygons`` (dicts with ``polygon_id``, ``ring`` — any
    ``as_rings`` shape: single ring, ``[outer, hole, ...]``, or a
    multipolygon (r7) — and an optional ``value_key`` burn value, default
    1.0) into base-level tiles of a ``base_shape`` raster. Returns a
    TILE_SCHEMA DataFrame (z=0), one row per tile containing at least one
    burned pixel; unburned pixels hold ``fill`` (NaN by default, so tile
    stats are skipmissing-correct like every other tile in the engine).
    Hole pixels are NOT burned (even-odd), matching GDAL's rasterize
    semantics for interior rings.
    """
    from ..functions.cells import as_rings

    if np.isnan(fill) and not np.issubdtype(np.dtype(dtype), np.floating):
        raise ValueError(
            f"dtype {dtype!r} cannot represent the default NaN fill — pass an "
            "explicit integer fill (astype on NaN is undefined, not a nodata)"
        )
    spec = PyramidSpec(base_shape[0], base_shape[1], tilesize)
    res0 = spec.res0
    rings: dict[str, list[np.ndarray]] = {}
    values: dict[str, float] = {}
    rows = []
    for ordinal, p in enumerate(polygons):
        pid = p["polygon_id"]
        if pid in rings:
            raise ValueError(f"duplicate polygon_id {pid!r}")
        rings[pid] = as_rings(p.get("rings", p.get("ring")))
        values[pid] = float(p.get(value_key, 1.0))
        cells, is_full = polygon_to_cells_classified(rings[pid], res0, spec.world)
        for c, full in zip(cells.tolist(), is_full.tolist()):
            lo, hi = cell_range(np.int64(c), res0)
            # chunk the leaf interval: explode(sequence(lo, hi)) builds the
            # whole array in ONE task row — Spark caps arrays near 2^31 and
            # a 4^12-leaf array would blow task memory long before that.
            # 2^16 leaves/chunk keeps every sequence tiny while the chunk
            # rows stay a driver-side list (a res-k full cover yields
            # 4^(res0-k)/2^16 rows — dims-sized for any realistic polygon).
            lo, hi = int(lo), int(hi)
            step = 1 << 16
            for s in range(lo, hi + 1, step):
                rows.append((pid, ordinal, bool(full), s, min(s + step - 1, hi)))
    if not rows:
        return spark.createDataFrame([], TILE_SCHEMA)
    covers = spark.createDataFrame(
        rows, "polygon_id string, ord int, is_full boolean, lo long, hi long"
    )

    per_tile = (
        covers.select(
            "polygon_id", "ord", "is_full",
            F.explode(F.sequence("lo", "hi")).alias("cell"),
        )
        .groupBy("cell")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ord", "polygon_id", "is_full"))
            ).alias("paints")
        )
    )

    # the grouped rows are a few KB (cell + paint list) but each carries a
    # whole-tile render: AQE's byte-sized coalescing fuses them into ONE
    # task and serializes the CPU (measured: 8 and 32 cores identical at
    # ~21 s). Rows are independent, so spread them ROUND-ROBIN — measured
    # as the only repartition AQE respects here (repartition(n, col) was
    # still coalesced to 1; repartition(n) and repartitionByRange survive).
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    per_tile = per_tile.repartition(n_parts)

    ring_items = sorted(rings.items())
    value_items = sorted(values.items())
    bw, bh = base_shape

    def render(batches):
        ringmap = dict(ring_items)
        valmap = dict(value_items)
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                tx, ty, _ = cell_to_xy(np.int64(row.cell))
                tx, ty = int(tx), int(ty)
                x0, y0, w, h = tile_pixel_window((bw, bh), 0, tx, ty, tilesize)
                if w <= 0 or h <= 0:  # cover cell in the padded world margin
                    continue
                arr = np.full((h, w), np.nan, dtype=np.float64)
                cx = x0 + np.arange(w) + 0.5
                cy = y0 + np.arange(h) + 0.5
                gx, gy = np.meshgrid(cx, cy)
                burned = np.zeros((h, w), dtype=bool)
                paints = list(row.paints)
                paints.sort(key=lambda s: s["ord"] if isinstance(s, dict) else s[0])
                for s in paints:  # ascending paint order: LAST wins
                    if isinstance(s, dict):
                        pid, full = s["polygon_id"], s["is_full"]
                    else:
                        pid, full = s[1], s[2]
                    if full:
                        mask = np.ones((h, w), dtype=bool)
                    else:
                        mask = points_in_polygon(
                            gx.ravel(), gy.ravel(), ringmap[pid]
                        ).reshape(h, w)
                    arr[mask] = valmap[pid]
                    burned |= mask
                if not burned.any():
                    continue
                if not np.isnan(fill):
                    arr[~burned] = fill
                out.append(_tile_row(spec, 0, tx, ty, arr.astype(dtype, copy=False)))
            yield _rows_to_pdf(out)  # empty-safe: astype on 0 rows is fine

    return per_tile.mapInPandas(render, TILE_SCHEMA)
