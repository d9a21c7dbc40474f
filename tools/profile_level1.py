"""Bisect the slow level-1 build stage from profile_build.py.

Pieces timed separately:
  1. warm images.count() (cache hit baseline)
  2. quarters mapInPandas -> noop      (decode + 2x2 reduce + Arrow, no shuffle)
  3. quarters -> groupBy.applyInPandas -> noop  (adds shuffle + assemble)
  4. full level-1 with parquet write   (adds disk write)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

G = int(os.environ.get("SPARK_GRAFT_BENCH_G", "64"))
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

import pandas as pd

from pyramidscheme_jl_spark.operators.build import (
    QUARTER_SCHEMA,
    PyramidSpec,
    _assemble_parent,
    build_level1_from_images,
)
from pyramidscheme_jl_spark.sources.catalog import TILE_SCHEMA, write_level
from pyramidscheme_jl_spark.session import get_spark
from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, synth_images

spark = get_spark(app="profile-l1", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")


def _warm(batches):
    from pyramidscheme_jl_spark.functions.codec import decode_tile  # noqa: F401

    for pdf in batches:
        yield pd.DataFrame({"x": [len(pdf)]})


spark.range(0, cpus * 2, 1, cpus).mapInPandas(_warm, "x long").count()

rows = synth_images(G=G)
images = spark.createDataFrame(rows, IMAGES_DDL).repartition(cpus).cache()
images.count()

out = {}
t0 = time.perf_counter()
images.count()
out["warm_count"] = round(time.perf_counter() - t0, 2)

spec = PyramidSpec(G * 256, G * 256, 256)

# piece 2: quarters only (reuse the internals of build_level1_from_images)
from pyspark.sql import functions as F

idx = F.regexp_extract("image_id", r"^img-(\d{8})$", 1).cast("long")
src = (
    images.where(F.col("fmt") == F.lit("raw"))
    .where(idx.isNotNull())
    .select(
        (idx % G).cast("int").alias("tx"),
        (idx / G).cast("int").alias("ty"),
        "bytes",
        "w",
        "h",
    )
    .where(F.col("tx").isNotNull())
)

import numpy as np

from pyramidscheme_jl_spark.functions.codec import decode_tile, encode_tile
from pyramidscheme_jl_spark.functions.reducers import block_reduce


def gen(batches):
    for pdf in batches:
        o = {k: [] for k in ("ptx", "pty", "qx", "qy", "bytes", "w", "h", "c", "dtype")}
        for tx, ty, buf, w, h in zip(pdf["tx"], pdf["ty"], pdf["bytes"], pdf["w"], pdf["h"]):
            c = len(buf) // (int(w) * int(h))
            arr = decode_tile(buf, int(h), int(w), "uint8", c)
            red = block_reduce(arr, "mean")
            o["ptx"].append(int(tx) >> 1)
            o["pty"].append(int(ty) >> 1)
            o["qx"].append(int(tx) & 1)
            o["qy"].append(int(ty) & 1)
            o["bytes"].append(encode_tile(red))
            o["w"].append(red.shape[1])
            o["h"].append(red.shape[0])
            o["c"].append(c)
            o["dtype"].append(str(red.dtype.name))
        pdf_out = pd.DataFrame(o)
        for col in ("ptx", "pty", "qx", "qy", "w", "h", "c"):
            pdf_out[col] = pdf_out[col].astype("int32")
        yield pdf_out


quarters = src.mapInPandas(gen, QUARTER_SCHEMA)
t0 = time.perf_counter()
quarters.write.format("noop").mode("overwrite").save()
out["quarters_noop"] = round(time.perf_counter() - t0, 2)

assembled = quarters.groupBy("ptx", "pty").applyInPandas(_assemble_parent(spec, 1), TILE_SCHEMA)
t0 = time.perf_counter()
assembled.write.format("noop").mode("overwrite").save()
out["assemble_noop"] = round(time.perf_counter() - t0, 2)

tmp = tempfile.mkdtemp(prefix="l1_")
t0 = time.perf_counter()
write_level(build_level1_from_images(images, G, spec, "mean"), f"{tmp}/pyr", 1)
out["full_write"] = round(time.perf_counter() - t0, 2)
shutil.rmtree(tmp, ignore_errors=True)

print(json.dumps(out))
