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


# ---------------------------------------------------------------------------
# focal (neighborhood) statistics — the classic GIS raster family the
# block-aggregation pyramid does not cover: every output pixel is a
# function of its (2r+1)^2 neighborhood, which crosses tile boundaries.


FOCAL_STATS = ("mean", "sum", "count", "min", "max")

#: ``cell`` travels as a STRING: strips carry null metadata, and a
#: nullable int64 column coerces to float64 in pandas — cell ids near
#: 2^57 then collapse to the same double (ulp 32), which breaks every
#: downstream cell equi-join (caught by the focal oracle row).
_HALO_SCHEMA = (
    "tx int, ty int, dx int, dy int, bytes binary, w int, h int, "
    "dtype string, cell string, xmin double, ymin double, xmax double, "
    "ymax double"
)
#: cube levels carry their time slice through the exchange — halos never
#: cross t (a slice's neighborhood is spatial)
_HALO_SCHEMA_T = "t int, " + _HALO_SCHEMA


def _halo_gen(radius: int, with_t: bool = False):
    """mapInPandas stage: each tile re-emits itself (dx=dy=0, metadata
    attached) plus the r-wide edge strips its 8 neighbors need, keyed to
    the NEIGHBOR. Strips are O(perimeter) bytes — the shuffle moves
    ~2r/tilesize of the pixel volume (0.8% at r=1, 256px), never whole
    tiles."""
    import pandas as pd

    from ..functions.codec import decode_tile, encode_tile

    def gen(batches):
        for pdf in batches:
            # nullable int64 through pandas coerces the WHOLE column to
            # float64 (nulls arrive as NaN, non-null ids near 2^57 lose
            # bits); Int64 keeps exact integers with nulls
            if "cell" in pdf.columns:
                pdf = pdf.assign(cell=pdf["cell"].astype("Int64"))
            cols = ("tx", "ty", "dx", "dy", "bytes", "w", "h", "dtype",
                    "cell", "xmin", "ymin", "xmax", "ymax")
            if with_t:
                cols = ("t",) + cols
            out = {k: [] for k in cols}

            def emit(tx, ty, dx, dy, arr, meta=None, t=None):
                if with_t:
                    out["t"].append(t)
                out["tx"].append(tx); out["ty"].append(ty)
                out["dx"].append(dx); out["dy"].append(dy)
                out["bytes"].append(encode_tile(arr))
                out["h"].append(arr.shape[0]); out["w"].append(arr.shape[1])
                out["dtype"].append(str(arr.dtype))
                for k in ("cell", "xmin", "ymin", "xmax", "ymax"):
                    out[k].append(meta[k] if meta else None)

            for row in pdf.itertuples():
                if int(row.c) != 1:
                    raise ValueError(
                        "focal_stats supports single-channel rasters "
                        f"(tile ({row.tx},{row.ty}) has c={row.c})")
                r = radius
                if r > min(int(row.h), int(row.w)):
                    raise ValueError(
                        f"radius {r} exceeds tile dims "
                        f"({row.w}x{row.h}): halos only reach adjacent "
                        "tiles")
                a = decode_tile(row.bytes, row.h, row.w, row.dtype, row.c)
                meta = {k: getattr(row, k) for k in
                        ("cell", "xmin", "ymin", "xmax", "ymax")}
                meta["cell"] = None if pd.isna(meta["cell"]) else str(meta["cell"])
                t = int(row.t) if with_t else None
                emit(row.tx, row.ty, 0, 0, a, meta, t=t)
                for ex in (-1, 0, 1):
                    for ey in (-1, 0, 1):
                        if ex == 0 and ey == 0:
                            continue
                        piece = a
                        if ex:
                            piece = piece[:, -r:] if ex == 1 else piece[:, :r]
                        if ey:
                            piece = piece[-r:, :] if ey == 1 else piece[:r, :]
                        emit(int(row.tx) + ex, int(row.ty) + ey, -ex, -ey,
                             piece, t=t)
            yield pd.DataFrame(out)

    return gen


def _focal_assemble(stat: str, radius: int, z: int, with_t: bool = False):
    """applyInPandas stage per (tx, ty): pad the center tile with the
    received strips (absent neighbors/strips -> invalid: the window
    SHRINKS at raster borders, counts reflect valid pixels only), then
    compute the separable (2r+1)-window stat with explicit left-to-right
    adds — the exact operation order the DuckDB window-SUM twin uses, so
    float results reproduce bit-for-bit and integer results are exact."""
    import numpy as np
    import pandas as pd

    from ..functions.codec import decode_tile, encode_tile

    out_cols = ["z", "tx", "ty", "bytes", "w", "h", "c", "dtype",
                "vmin", "vmax", "vmean", "cell", "xmin", "ymin",
                "xmax", "ymax"]
    if with_t:
        out_cols = ["t"] + out_cols

    def fn(key, pdf):
        ctr = pdf[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if ctr.empty:
            return pd.DataFrame(columns=out_cols)
        c = ctr.iloc[0]
        h, w, r = int(c["h"]), int(c["w"]), radius
        a = decode_tile(c["bytes"], h, w, c["dtype"])
        is_int = a.dtype.kind in "ui"
        acc_dt = np.int64 if is_int else np.float64
        pad = np.zeros((h + 2 * r, w + 2 * r), dtype=acc_dt)
        valid = np.zeros(pad.shape, dtype=bool)
        pad[r:r + h, r:r + w] = np.nan_to_num(a) if not is_int else a
        # NaN pixels are NODATA (the sparse-assembly convention), not
        # values: they must neither poison neighbors' stats nor count
        valid[r:r + h, r:r + w] = np.isfinite(a)
        for row in pdf[(pdf["dx"] != 0) | (pdf["dy"] != 0)].itertuples():
            p = decode_tile(row.bytes, row.h, row.w, row.dtype)
            x0 = 0 if row.dx == -1 else (r if row.dx == 0 else r + w)
            y0 = 0 if row.dy == -1 else (r if row.dy == 0 else r + h)
            ph, pw = p.shape
            pad[y0:y0 + ph, x0:x0 + pw] = np.nan_to_num(p)
            valid[y0:y0 + ph, x0:x0 + pw] = np.isfinite(p)

        k = 2 * r + 1

        def h_windows(m):
            cols = [m[:, i:m.shape[1] - (k - 1 - i)] for i in range(k)]
            return cols

        def v_windows(m):
            return [m[i:m.shape[0] - (k - 1 - i), :] for i in range(k)]

        def seq_add(parts):
            acc = parts[0].copy()
            for p in parts[1:]:
                acc = acc + p  # fixed left-to-right order (the SQL twin)
            return acc

        if stat in ("mean", "sum", "count"):
            s = seq_add(h_windows(np.where(valid, pad, 0)))
            s = seq_add(v_windows(s))
            n = seq_add(h_windows(valid.astype(np.int64)))
            n = seq_add(v_windows(n))
            if stat == "sum":
                # all-nodata windows -> NaN on float rasters (the engine's
                # NaN-as-nodata convention and SQL window-SUM-over-empty-
                # frame NULL); int rasters have no nodata, keep int64 s
                res = s if is_int else np.where(n > 0, s, np.nan)
            elif stat == "count":
                res = n
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    # one IEEE division; all-nodata windows -> NaN
                    res = s.astype(np.float64) / n
        else:
            # ints stay int64 end-to-end (a float64 round-trip corrupts
            # values past 2^53 — the same width class zonal routes
            # around); sentinels replace +-inf
            if is_int:
                sent = (np.iinfo(np.int64).max if stat == "min"
                        else np.iinfo(np.int64).min)
                m = np.where(valid, pad, sent)
            else:
                m = np.where(valid, pad,
                             np.inf if stat == "min" else -np.inf)
            op = np.minimum if stat == "min" else np.maximum
            hw = h_windows(m)
            acc = hw[0]
            for p in hw[1:]:
                acc = op(acc, p)
            vw = v_windows(acc)
            acc2 = vw[0]
            for p in vw[1:]:
                acc2 = op(acc2, p)
            # all-nodata windows (possible when NaN nodata exists): NaN
            # for float rasters; int rasters have no nodata encoding, so
            # every window holds its (always finite) center pixel
            if is_int:
                res = acc2.astype(a.dtype)
            else:
                vany = h_windows(valid.astype(np.uint8))
                va = vany[0]
                for p in vany[1:]:
                    va = np.maximum(va, p)
                vv = v_windows(va)
                va2 = vv[0]
                for p in vv[1:]:
                    va2 = np.maximum(va2, p)
                res = np.where(va2 > 0, acc2, np.nan)
        out = np.ascontiguousarray(res)
        finite = out[np.isfinite(out)]
        return pd.DataFrame([{
            **({"t": int(c["t"])} if with_t else {}),
            "z": z, "tx": int(c["tx"]), "ty": int(c["ty"]),
            "bytes": encode_tile(out), "w": w, "h": h, "c": 1,
            "dtype": str(out.dtype),
            "vmin": float(finite.min()) if finite.size else float("nan"),
            "vmax": float(finite.max()) if finite.size else float("nan"),
            "vmean": float(finite.mean()) if finite.size else float("nan"),
            "cell": None if c["cell"] is None else int(c["cell"]),
            "xmin": float(c["xmin"]), "ymin": float(c["ymin"]),
            "xmax": float(c["xmax"]), "ymax": float(c["ymax"]),
        }])

    return fn


def focal_stats(
    spark,
    path: str,
    z: int = 0,
    stat: str = "mean",
    radius: int = 1,
):
    """Focal (neighborhood) statistics over a built pyramid level: every
    output pixel is the ``stat`` of its (2r+1)x(2r+1) window, windows
    SHRINKING at raster borders (counts reflect valid pixels only) —
    the GDAL/ArcGIS focal-stats contract. Returns TILE_SCHEMA rows (a
    derived raster level): compose with ``write_level`` +
    ``raster_extract``/``zonal_raster`` downstream.

    Plan: one tile scan -> mapInPandas emits each tile plus the r-wide
    edge strips its 8 neighbors need (the halo exchange: the shuffle
    carries ~2r/tilesize of the pixel volume — 0.8% at r=1/256px — never
    whole tiles) -> groupBy(tx, ty) applyInPandas pads the center with
    its halos and computes the separable window stat. Sum/count stay
    exact int64 for integer rasters; ``mean`` is one IEEE division of
    those, which is why the DuckDB oracle reproduces it bit-for-bit
    (engine-portable without any quantization).
    """
    from ..sources.catalog import TILE_SCHEMA, read_level

    if stat not in FOCAL_STATS:
        raise ValueError(f"stat must be one of {FOCAL_STATS}, got {stat!r}")
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    tiles = read_level(spark, path, z)
    if any(f.name == "t" for f in tiles.schema.fields):
        raise ValueError(
            "focal_stats expects a flat (x, y) level; use focal_stats_cube"
        )
    halo = tiles.mapInPandas(_halo_gen(radius), _HALO_SCHEMA)
    return halo.groupBy("tx", "ty").applyInPandas(
        _focal_assemble(stat, radius, z), TILE_SCHEMA
    )


def focal_stats_cube(
    spark,
    path: str,
    z: int = 0,
    stat: str = "mean",
    radius: int = 1,
):
    """``focal_stats`` over an (x, y, t) cube level: the neighborhood is
    SPATIAL — halos never cross time slices — so ``t`` simply rides the
    exchange keys (the J9/zonal_cube pattern: extra key columns, never
    extra scans). One scan of the cube level, strips keyed (t, ntx,
    nty), assembly per (t, tx, ty); returns CUBE_TILE_SCHEMA rows."""
    from ..operators.cube import CUBE_TILE_SCHEMA, read_cube_level

    if stat not in FOCAL_STATS:
        raise ValueError(f"stat must be one of {FOCAL_STATS}, got {stat!r}")
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    tiles = read_cube_level(spark, path, z)
    halo = tiles.mapInPandas(_halo_gen(radius, with_t=True), _HALO_SCHEMA_T)
    return halo.groupBy("t", "tx", "ty").applyInPandas(
        _focal_assemble(stat, radius, z, with_t=True), CUBE_TILE_SCHEMA
    )


def focal_apply(
    spark,
    path: str,
    kernel_fn,
    z: int = 0,
    radius: int = 1,
    out_dtype: str = "float64",
):
    """Custom neighborhood operator over a pyramid level: the §2.11
    any-callable contract for FOCAL computations. ``kernel_fn(padded,
    valid, radius)`` receives the (h+2r, w+2r) float64 window pad (NaN
    where no data exists — raster border or missing tile) plus the
    validity mask, and returns the (h, w) result array. Runs inside the
    same halo-exchange plan as ``focal_stats`` (strips-only shuffle);
    the kernel must be a pure per-tile numpy function.

    ``slope_degrees`` / ``hillshade`` below are the canonical DEM
    kernels (Horn's method); both are pytest-pinned against full-mosaic
    replays. Trig results are deliberately NOT oracle-gated (libm ulps
    are not engine-portable — the focal_stats mean row is the
    bit-exact representative of this plan)."""
    import numpy as np
    import pandas as pd

    from ..functions.codec import decode_tile, encode_tile
    from ..sources.catalog import TILE_SCHEMA, read_level

    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")

    def fn(key, pdf):
        ctr = pdf[(pdf["dx"] == 0) & (pdf["dy"] == 0)]
        if ctr.empty:
            return pd.DataFrame(
                columns=["z", "tx", "ty", "bytes", "w", "h", "c", "dtype",
                         "vmin", "vmax", "vmean", "cell", "xmin", "ymin",
                         "xmax", "ymax"])
        c = ctr.iloc[0]
        h, w, r = int(c["h"]), int(c["w"]), radius
        pad = np.full((h + 2 * r, w + 2 * r), np.nan, dtype=np.float64)
        valid = np.zeros(pad.shape, dtype=bool)
        pad[r:r + h, r:r + w] = decode_tile(c["bytes"], h, w, c["dtype"])
        valid[r:r + h, r:r + w] = True
        for row in pdf[(pdf["dx"] != 0) | (pdf["dy"] != 0)].itertuples():
            p = decode_tile(row.bytes, row.h, row.w, row.dtype)
            x0 = 0 if row.dx == -1 else (r if row.dx == 0 else r + w)
            y0 = 0 if row.dy == -1 else (r if row.dy == 0 else r + h)
            pad[y0:y0 + p.shape[0], x0:x0 + p.shape[1]] = p
            valid[y0:y0 + p.shape[0], x0:x0 + p.shape[1]] = True
        res = np.ascontiguousarray(
            np.asarray(kernel_fn(pad, valid, r), dtype=np.dtype(out_dtype))
        )
        if res.shape != (h, w):
            raise ValueError(
                f"kernel returned shape {res.shape}, expected {(h, w)}")
        finite = res[np.isfinite(res)]
        return pd.DataFrame([{
            "z": z, "tx": int(c["tx"]), "ty": int(c["ty"]),
            "bytes": encode_tile(res), "w": w, "h": h, "c": 1,
            "dtype": str(res.dtype),
            "vmin": float(finite.min()) if finite.size else float("nan"),
            "vmax": float(finite.max()) if finite.size else float("nan"),
            "vmean": float(finite.mean()) if finite.size else float("nan"),
            "cell": None if c["cell"] is None else int(c["cell"]),
            "xmin": float(c["xmin"]), "ymin": float(c["ymin"]),
            "xmax": float(c["xmax"]), "ymax": float(c["ymax"]),
        }])

    tiles = read_level(spark, path, z)
    if any(f.name == "t" for f in tiles.schema.fields):
        raise ValueError("focal_apply expects a flat (x, y) level, not a cube")
    halo = tiles.mapInPandas(_halo_gen(radius), _HALO_SCHEMA)
    return halo.groupBy("tx", "ty").applyInPandas(fn, TILE_SCHEMA)


def _horn_gradients(pad, cellsize: float):
    """Horn's method gradients on a 1-padded window; border pixels use
    edge replication (the GDAL -compute_edges convention)."""
    import numpy as np

    p = pad.copy()
    # replicate edges into NaN halo so border windows are defined
    for _ in range(2):  # two passes settle corners
        m = np.isnan(p)
        for sl_to, sl_from in (
            (np.s_[0, :], np.s_[1, :]), (np.s_[-1, :], np.s_[-2, :]),
            (np.s_[:, 0], np.s_[:, 1]), (np.s_[:, -1], np.s_[:, -2]),
        ):
            row = p[sl_to]
            src = p[sl_from]
            fill = np.isnan(row) & ~np.isnan(src)
            row[fill] = src[fill]
            p[sl_to] = row
    a, b, c = p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:]
    d, f = p[1:-1, :-2], p[1:-1, 2:]
    g, h2, i = p[2:, :-2], p[2:, 1:-1], p[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * cellsize)
    dzdy = ((g + 2 * h2 + i) - (a + 2 * b + c)) / (8.0 * cellsize)
    return dzdx, dzdy


def slope_degrees(spark, path: str, z: int = 0, cellsize: float = 1.0):
    """DEM slope in degrees (Horn's method, GDAL ``gdaldem slope``
    analog) as a ``focal_apply`` kernel."""
    import numpy as np

    def kern(pad, valid, r):
        dzdx, dzdy = _horn_gradients(pad, cellsize)
        return np.degrees(np.arctan(np.sqrt(dzdx ** 2 + dzdy ** 2)))

    return focal_apply(spark, path, kern, z=z, radius=1)


def aspect_degrees(spark, path: str, z: int = 0, cellsize: float = 1.0):
    """DEM aspect in compass degrees (GDAL ``gdaldem aspect`` analog,
    r8 — completes the Horn terrain family with ``slope_degrees`` and
    ``hillshade``): downslope direction clockwise from north, 0=N 90=E
    180=S 270=W; FLAT cells (both gradients zero) return -1 (the ArcGIS
    flat sentinel; GDAL emits nodata there)."""
    import numpy as np

    def kern(pad, valid, r):
        dzdx, dzdy = _horn_gradients(pad, cellsize)
        # atan2 measured from east CCW -> compass CW from north
        az = np.degrees(np.arctan2(dzdy, -dzdx))
        out = np.where(az > 90.0, 450.0 - az, 90.0 - az)
        out = np.where(out == 360.0, 0.0, out)
        return np.where((dzdx == 0) & (dzdy == 0), -1.0, out)

    return focal_apply(spark, path, kern, z=z, radius=1)


def hillshade(
    spark,
    path: str,
    z: int = 0,
    cellsize: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
):
    """DEM hillshade 0-255 (GDAL ``gdaldem hillshade`` analog):
    illumination of the Horn-gradient surface normal by a sun at
    (azimuth, altitude)."""
    import math

    import numpy as np

    def kern(pad, valid, r):
        dzdx, dzdy = _horn_gradients(pad, cellsize)
        zen = math.radians(90.0 - altitude_deg)
        az = math.radians(360.0 - azimuth_deg + 90.0)
        slope = np.arctan(np.sqrt(dzdx ** 2 + dzdy ** 2))
        aspect = np.arctan2(dzdy, -dzdx)
        shade = (np.cos(zen) * np.cos(slope)
                 + np.sin(zen) * np.sin(slope) * np.cos(az - aspect))
        return np.clip(shade * 255.0, 0, 255)

    return focal_apply(spark, path, kern, z=z, radius=1)


def raster_histogram(
    spark,
    path: str,
    z: int = 0,
    bins: int | None = None,
    vmin: float | None = None,
    vmax: float | None = None,
):
    """Value histogram of a pyramid level — the stretch/symbology/QA
    statistic every raster engine ships (GDAL ``gdalinfo -hist``).

    ``bins=None`` (integer rasters only): EXACT per-value counts,
    columns ``(value long, n long)``. With ``bins``/``vmin``/``vmax``:
    fixed-width binning over ``[vmin, vmax)`` (the GDAL bucket rule:
    values at ``vmax`` land in the last bucket), columns ``(bin int,
    lo double, hi double, n long)``; out-of-range pixels are dropped,
    NaN is nodata (excluded), per the engine convention.

    Plan shape (the reason this is cheap at 100 TB): one tile scan ->
    ``mapInPandas`` folds each Arrow batch's tiles into ONE partial
    (bin, n) frame via ``np.unique``/``bincount`` — so the shuffle
    carries at most (scan partitions x occupied bins) rows, never
    pixels — then a single hash aggregate sums partials. Map-side
    combining is structural, not optimizer-dependent.
    """
    from ..functions.codec import decode_tile
    from ..sources.catalog import read_level

    if bins is not None:
        if vmin is None or vmax is None or not (float(vmax) > float(vmin)):
            raise ValueError("binned histogram needs vmin < vmax")
        bins = int(bins)
        if bins <= 0:
            raise ValueError(f"bins must be positive, got {bins}")
    lo, hi = (float(vmin), float(vmax)) if bins is not None else (0.0, 0.0)
    nb = bins

    def gen(batches):
        for pdf in batches:
            acc: dict[int, int] = {}
            exact = None
            for row in pdf.itertuples():
                a = decode_tile(row.bytes, row.h, row.w, row.dtype,
                                getattr(row, "c", 1))
                flat = a.ravel()
                if nb is None:
                    if not np.issubdtype(flat.dtype, np.integer):
                        raise ValueError(
                            "exact-value histogram (bins=None) needs an "
                            f"integer raster, got dtype {row.dtype!r}; "
                            "pass bins/vmin/vmax"
                        )
                    vals, cnts = np.unique(flat, return_counts=True)
                else:
                    if np.issubdtype(flat.dtype, np.floating):
                        flat = flat[np.isfinite(flat)]  # NaN = nodata
                    x = flat.astype(np.float64)
                    idx = np.floor((x - lo) * nb / (hi - lo)).astype(np.int64)
                    idx[x == hi] = nb - 1  # GDAL: max value -> last bucket
                    keep = (idx >= 0) & (idx < nb)
                    vals, cnts = np.unique(idx[keep], return_counts=True)
                exact = True
                for v, c in zip(vals.tolist(), cnts.tolist()):
                    acc[int(v)] = acc.get(int(v), 0) + int(c)
            if exact is None:
                continue
            yield pd.DataFrame(
                {"bin": list(acc.keys()), "n": list(acc.values())}
            )

    part = read_level(spark, path, z).mapInPandas(gen, "bin long, n long")
    agg = part.groupBy("bin").agg(F.sum("n").alias("n"))
    if nb is None:
        return agg.select(F.col("bin").alias("value"), "n")
    w = (hi - lo) / nb
    return agg.select(
        F.col("bin").cast("int").alias("bin"),
        (F.lit(lo) + F.col("bin") * F.lit(w)).alias("lo"),
        (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("hi"),
        "n",
    )
