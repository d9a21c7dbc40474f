"""XYZ (slippy-map) tile-directory export — the serving handoff.

A built pyramid already IS the tile hierarchy a web map wants; this sink
lays it out in the ``{z}/{x}/{y}.png`` convention every tile client
(Leaflet/OpenLayers/MapLibre) reads, so "publish the raster" is one
distributed job over the stored levels instead of a GDAL2Tiles rerun.

Spark-first shape (the streaming-ingest write discipline):

- ONE scan of all stored levels (``read_tiles``), no per-level driver
  loop — executors decode, normalize, encode and write their own
  partitions through the ``fsio`` seam (``publish_file`` = atomic
  rename locally, direct PUT on object stores); the driver sees only
  the per-file manifest rows;
- zoom mapping: stored level ``nlevels`` (coarsest, single tile) is XYZ
  ``z=0``; the base is XYZ ``z=nlevels`` — standard top-of-pyramid-out
  numbering with y DOWN from the top (XYZ, not TMS);
- edge tiles are zero-padded to the full tilesize (the GDAL2Tiles
  convention — clients assume constant tile pixel size);
- uint8 levels pass through exactly; any other dtype requires an
  explicit ``(vmin, vmax)`` display range and maps by the exact
  round-half-up integer stretch (NaN -> 0): deterministic, no
  data-dependent driver pass.

Reference parity note: PyramidScheme.jl serves its pyramid interactively
through the Makie extension (SURVEY §5 item 10, out of scope); the XYZ
directory is the infrastructure-neutral equivalent every raster stack
pairs with a pyramid store — north-rule serving surface.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession


def export_xyz(
    spark: SparkSession,
    path: str,
    out_dir: str,
    vmin: float | None = None,
    vmax: float | None = None,
    fs: "LocalFS" = None,
) -> dict:
    """Export every stored level of the pyramid at ``path`` as a
    ``{z}/{x}/{y}.png`` tile directory under ``out_dir``. Returns a
    summary dict ``{"tiles": n, "bytes": total, "max_zoom": nlevels}``
    and writes a ``metadata.json`` (tilesize, zoom range, value range)
    at the root. Eager (it IS a sink), like ``compact_pyramid``."""
    from ..api import PyramidDataset
    from ..functions.codec import decode_tile
    from ..functions.media_codecs import encode_png
    from .catalog import read_tiles
    from .fsio import DEFAULT_FS

    if fs is None:
        fs = DEFAULT_FS

    spec = PyramidDataset.open(spark, path).spec
    nl, ts = spec.nlevels, spec.tilesize
    if vmin is not None or vmax is not None:
        if vmin is None or vmax is None or not (float(vmax) > float(vmin)):
            raise ValueError("pass BOTH vmin < vmax for the display stretch")
    lo, hi = vmin, vmax
    xfs = fs  # picklable seam (ArrowFS reconnects lazily on executors)

    def write_batch(batches):
        fs = xfs
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = decode_tile(r.bytes, r.h, r.w, r.dtype, r.c)
                if str(a.dtype) != "uint8":
                    if lo is None:
                        raise ValueError(
                            f"level dtype {a.dtype} needs an explicit "
                            "(vmin, vmax) display range"
                        )
                    x = a.astype(np.float64)
                    x = np.where(np.isfinite(x), x, lo)
                    x = np.clip(x, lo, hi)
                    # exact round-half-up integer stretch
                    a = np.floor(
                        (x - lo) * 255.0 / (hi - lo) + 0.5
                    ).astype(np.uint8)
                if a.shape[0] != ts or a.shape[1] != ts:  # zero-pad edges
                    pad = np.zeros(
                        (ts, ts) + a.shape[2:], dtype=np.uint8
                    )
                    pad[: a.shape[0], : a.shape[1]] = a
                    a = pad
                xyz_z = nl - int(r.z)
                d = os.path.join(out_dir, str(xyz_z), str(int(r.tx)))
                fs.makedirs(d)
                buf = encode_png(a)
                fname = f"{int(r.ty)}.png"
                fs.publish_file(d, fname, lambda p, b=buf: open(p, "wb").write(b))
                rows.append({"z": xyz_z, "x": int(r.tx), "y": int(r.ty),
                             "nbytes": len(buf)})
            if rows:
                yield pd.DataFrame(rows)

    manifest = read_tiles(spark, path).mapInPandas(
        write_batch, "z int, x int, y int, nbytes long"
    )
    from pyspark.sql import functions as F

    agg = manifest.agg(
        F.count("*").alias("n"), F.sum("nbytes").alias("b")
    ).collect()[0]
    n, total = int(agg["n"] or 0), int(agg["b"] or 0)
    fs.makedirs(out_dir)
    meta = {
        "tilesize": ts, "min_zoom": 0, "max_zoom": nl,
        "format": "png", "vmin": lo, "vmax": hi,
        "scheme": "xyz", "tiles": n,
    }
    fs.publish_file(
        out_dir, "metadata.json",
        lambda p: open(p, "w").write(json.dumps(meta, sort_keys=True)),
    )
    return {"tiles": n, "bytes": total, "max_zoom": nl}
