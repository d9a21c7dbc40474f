#!/usr/bin/env python
"""Deployment-path check: the engine runs under ``spark-submit --py-files``.

North rule: "the whole job runs via spark-submit --py-files on N and 4N
executors". This tool evidences the packaging half on the sandbox: it zips
the package (session.package_zip), writes a job script to a temp dir that
does NOT have the repo on sys.path — every import must resolve from the
``--py-files`` zip — and spark-submits a small end-to-end pyramid build +
point-in-polygon join, asserting level tile counts and join rows.

Usage: python tools/spark_submit_check.py [--master local[4]]
Prints one JSON line {"ok": true, ...} and exits nonzero on failure.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOB = """\
import json
import sys

# Imports must come from the --py-files zip: fail loudly if the repo dir
# leaked onto sys.path (that would void the packaging evidence).
leaked = [p for p in sys.path if p.rstrip("/").endswith("/repo")]
assert not leaked, f"repo on sys.path: {leaked}"

from pyspark.sql import SparkSession

import pyramidscheme_jl_spark
from pyramidscheme_jl_spark.operators.build import build_pyramid
from pyramidscheme_jl_spark.operators.joins import point_in_polygon_join, with_point_cells
from pyramidscheme_jl_spark.sources.catalog import read_level
from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, synth_images, synth_polygons

out_dir = sys.argv[1]
spark = SparkSession.builder.getOrCreate()  # conf comes from spark-submit
images = spark.createDataFrame(synth_images(G=8), IMAGES_DDL)
spec = build_pyramid(spark, images, out_dir + "/pyr", G=8, reducer="mean", run_id="submit")
counts = {z: read_level(spark, out_dir + "/pyr", z).count() for z in range(1, spec.nlevels + 1)}

import pyspark.sql.functions as F
world = float(spec.base_w)
pts = spark.range(0, 5000).select(
    F.concat(F.lit("p"), F.col("id")).alias("point_id"),
    (F.pmod(F.col("id") * 37, F.lit(2048)) + 0.5).cast("double").alias("x"),
    (F.pmod(F.col("id") * 91, F.lit(2048)) + 0.5).cast("double").alias("y"),
)
res = spec.cell_res(0)
pts = with_point_cells(pts, res=res, world=world)
pip_rows = point_in_polygon_join(
    spark, pts, synth_polygons(world), res=res, world=world
).count()
print("SUBMIT_RESULT " + json.dumps({
    "mod_from": pyramidscheme_jl_spark.__file__,
    "levels": counts, "pip_rows": pip_rows,
}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[4]")
    args = ap.parse_args()

    from pyramidscheme_jl_spark.session import package_zip

    zip_path = package_zip()
    work = tempfile.mkdtemp(prefix="submit_check_")
    job = os.path.join(work, "job.py")
    with open(job, "w") as f:
        f.write(JOB)

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing but the zip may provide the package
    cmd = [
        spark_submit,
        "--master", args.master,
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.python.worker.reuse=true",
        "--py-files", zip_path,
        job, work,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600, env=env, cwd=work)
    marker = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")]
    if proc.returncode != 0 or not marker:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:] + "\n")
        raise SystemExit(f"spark-submit failed (rc={proc.returncode})")
    result = json.loads(marker[0][len("SUBMIT_RESULT "):])
    expect = {"1": 16, "2": 4, "3": 1}
    got = {str(k): v for k, v in result["levels"].items()}
    ok = got == expect and result["pip_rows"] > 0 and ".zip" in result["mod_from"]
    print(json.dumps({"ok": ok, **result, "zip": zip_path, "master": args.master}))
    shutil.rmtree(work, ignore_errors=True)
    if not ok:
        raise SystemExit("unexpected job result")


if __name__ == "__main__":
    main()
