"""Import externally pre-aggregated overview levels (SURVEY.md §2.2 S3).

The reference's GDAL extension loads a COG's *existing* overviews instead of
rebuilding them: per band it reads each overview raster, concatenates the
bands, and wraps the stack as pyramid levels
(/root/reference/ext/PyramidSchemeArchGDALExt.jl:8-29; round-trip test
test/runtests.jl:70-84). No GDAL exists in the sandbox, so the foreign
format here is its minimal relational analogue — a parquet dataset of
per-band, per-level raster planes:

    (band int, z int, w int, h int, dtype string, bytes binary)

with ``z = 0`` the base raster and level ``z`` aggregated by ``2^z``
(the reference maps 0-based overview ``n`` to factor ``2^(n+1)``).

``from_prebuilt_levels`` validates the foreign level structure (complete
level set, halving shapes, per-level dtype agreement — the reference trusts
GDAL for this; a foreign parquet gets checked) and re-tiles each plane into
the engine's canonical tile layout with per-band concat, committing levels
through the same manifest protocol as ``build_pyramid`` so the imported
pyramid is indistinguishable to every reader.

Scale note: rows here are whole *planes* per (band, level) — faithful to
how GDAL hands overviews over, and fine for overview levels (level z is
4^-z of the base). A 10^12-px *base* would never travel as one row: a real
COG reader maps the file's internal tiling to tile rows directly and skips
the re-tiling shuffle; the validation + band-concat logic stays the same.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codec import decode_tile
from ..functions.reducers import reducer_hash
from ..operators.build import PyramidSpec, _rows_to_pdf, _tile_row
from ..plans.grid import level_shape
from ..sources.catalog import (
    TILE_SCHEMA,
    append_manifest,
    manifest_lineage,
    write_level,
    write_multiscales,
)

PREBUILT_SCHEMA = "band int, z int, w int, h int, dtype string, bytes binary"

_BAND_TILE_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("tx", T.IntegerType()),
        T.StructField("ty", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)


def validate_prebuilt(meta: list[dict], tilesize: int = 256) -> tuple[PyramidSpec, list[int], int]:
    """Driver-side structural validation of the foreign overview metadata.

    Returns ``(spec, levels, nbands)`` or raises ValueError with the defect:
    missing base, ragged band sets, incomplete level runs, shapes that are
    not the ceil-halving chain, or per-level dtype disagreement.
    """
    if not meta:
        raise ValueError("prebuilt source is empty")
    bands = sorted({int(r["band"]) for r in meta})
    by_band = {b: sorted(int(r["z"]) for r in meta if r["band"] == b) for b in bands}
    levels = by_band[bands[0]]
    for b in bands[1:]:
        if by_band[b] != levels:
            raise ValueError(
                f"band {b} has levels {by_band[b]}, band {bands[0]} has {levels} — "
                "all bands must carry the same overview set (reference reads "
                "noverview per band and cats, ext/PyramidSchemeArchGDALExt.jl:16-24)"
            )
    if levels[0] != 0:
        raise ValueError("prebuilt source must include the base raster as z=0")
    if levels != list(range(len(levels))):
        raise ValueError(f"level set {levels} has gaps — overviews must be contiguous")
    shapes = {(int(r["band"]), int(r["z"])): (int(r["w"]), int(r["h"])) for r in meta}
    dtypes: dict[int, set[str]] = {}
    for r in meta:
        dtypes.setdefault(int(r["z"]), set()).add(str(r["dtype"]))
    base_w, base_h = shapes[(bands[0], 0)]
    for b in bands:
        if shapes[(b, 0)] != (base_w, base_h):
            raise ValueError("bands disagree on base shape")
        for z in levels:
            want = level_shape((base_w, base_h), z)
            if shapes[(b, z)] != want:
                raise ValueError(
                    f"band {b} level {z} shape {shapes[(b, z)]} != ceil-halving {want}"
                )
    for z, ds in dtypes.items():
        if len(ds) > 1:
            raise ValueError(f"level {z} mixes dtypes {sorted(ds)}")
    spec = PyramidSpec(base_w, base_h, tilesize)
    if levels[-1] > spec.nlevels:
        raise ValueError(
            f"source has {levels[-1]} overview levels but base {base_w}x{base_h} "
            f"plans {spec.nlevels} (compute_nlevels)"
        )
    return spec, levels, len(bands)


def from_prebuilt_levels(
    spark: SparkSession,
    src: str,
    dest: str,
    tilesize: int = 256,
    run_id: str = "import-0",
) -> PyramidSpec:
    """Import a foreign pre-aggregated overview dataset as a pyramid.

    Per level: a narrow mapInPandas slices each band plane into tiles, a
    single groupBy(tx,ty) applyInPandas concatenates the bands channel-wise
    (the per-band read + band concat of the reference's GDAL path), and the
    level commits through the standard checkpoint+manifest protocol.
    If the source has fewer overviews than ``compute_nlevels`` plans, the
    missing top levels are NOT fabricated — the import preserves the foreign
    data exactly; run ``build_pyramid(resume=True)`` to extend.
    """
    df = spark.read.parquet(src)
    meta = [r.asDict() for r in df.select("band", "z", "w", "h", "dtype").collect()]
    spec, levels, nbands = validate_prebuilt(meta, tilesize)
    rhash = reducer_hash("prebuilt-import")
    T_ = tilesize

    def slice_plane(batches):
        for pdf in batches:
            out = {k: [] for k in ("band", "tx", "ty", "w", "h", "dtype", "bytes")}
            for band, buf, w, h, dt in zip(
                pdf["band"], pdf["bytes"], pdf["w"], pdf["h"], pdf["dtype"]
            ):
                plane = decode_tile(buf, int(h), int(w), dt)
                for ty in range(-(-int(h) // T_)):
                    for tx in range(-(-int(w) // T_)):
                        blk = plane[ty * T_ : (ty + 1) * T_, tx * T_ : (tx + 1) * T_]
                        out["band"].append(int(band))
                        out["tx"].append(tx)
                        out["ty"].append(ty)
                        out["w"].append(blk.shape[1])
                        out["h"].append(blk.shape[0])
                        out["dtype"].append(str(blk.dtype.name))
                        out["bytes"].append(np.ascontiguousarray(blk).tobytes())
            pdf_out = pd.DataFrame(out)
            for col in ("band", "tx", "ty", "w", "h"):
                pdf_out[col] = pdf_out[col].astype("int32")
            yield pdf_out

    def make_concat_bands(zz: int):
        def concat_bands(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("band")
            parts = [
                decode_tile(r["bytes"], r["h"], r["w"], r["dtype"])
                for r in pdf.to_dict("records")
            ]
            arr = parts[0] if len(parts) == 1 else np.dstack(parts)
            return _rows_to_pdf([_tile_row(spec, zz, int(key[0]), int(key[1]), arr)])

        return concat_bands

    for ordinal, z in enumerate(levels):
        plane_rows = df.where(F.col("z") == z).select("band", "bytes", "w", "h", "dtype")
        band_tiles = plane_rows.mapInPandas(slice_plane, _BAND_TILE_SCHEMA)
        level_df = band_tiles.groupBy("tx", "ty").applyInPandas(
            make_concat_bands(z), TILE_SCHEMA
        )
        write_level(level_df, dest, z)
        append_manifest(
            spark, dest, manifest_lineage(dest, z, run_id, "prebuilt-import", rhash, ordinal)
        )
    # imported pyramids get the same interchange document a built pyramid
    # gets; the stored level count is what the source actually had (the
    # import never fabricates missing overviews)
    write_multiscales(
        dest, max(levels), tilesize, spec.base_w, spec.base_h, "prebuilt-import", rhash
    )
    return spec
