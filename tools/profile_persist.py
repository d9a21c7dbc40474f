"""Isolate the persist() cost in the level-1 commit path."""

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

from pyramidscheme_jl_spark.operators.build import PyramidSpec, build_level1_from_images
from pyramidscheme_jl_spark.session import get_spark
from pyramidscheme_jl_spark.sources.catalog import write_level
from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, synth_images

spark = get_spark(app="profile-persist", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")


def _warm(batches):
    from pyramidscheme_jl_spark.functions.codec import decode_tile  # noqa: F401

    for pdf in batches:
        yield pd.DataFrame({"x": [len(pdf)]})


spark.range(0, cpus * 2, 1, cpus).mapInPandas(_warm, "x long").count()

images = spark.createDataFrame(synth_images(G=G), IMAGES_DDL).repartition(cpus).cache()
images.count()
spec = PyramidSpec(G * 256, G * 256, 256)
out = {}

tmp = tempfile.mkdtemp(prefix="pp_")
t0 = time.perf_counter()
df1 = build_level1_from_images(images, G, spec, "mean")
write_level(df1, f"{tmp}/a", 1)
out["write_no_persist"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
df2 = build_level1_from_images(images, G, spec, "mean").persist()
write_level(df2, f"{tmp}/b", 1)
out["write_with_persist"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
n = df2.count()
out["cached_count"] = round(time.perf_counter() - t0, 2)
df2.unpersist()
shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps(out))
