"""Scale-factor validation of the heavy oracle rows (VERDICT r7 #3).

Everything in BENCH_r*.json is measured at sf0.1, where per-job
constants dominate (dedup_components ~8 s is almost all fixed cost).
This tool re-runs the top-6 most expensive rows on the SAME query code
at 1x (sf0.1 as-is) and 10x input rows, and reports wall growth vs row
growth — the question being whether any operator hides super-linear
work behind the sandbox constants.

10x corpora are deterministic replicas of sf0.1 in /dev/shm:

- documents: 10 replicas; replica r shifts doc_id by r*97e6 (a multiple
  of 97, so the contamination row's doc_id%97 benchmark subset scales
  exactly) and suffixes EVERY token with "_r" — token sets of different
  replicas are disjoint, so minhash/simhash/hamming pair structure
  replicates per-replica with no cross-replica collisions: output and
  edge sets scale exactly 10x. n_chars keeps the ORIGINAL value (it is
  a filter column; recomputing would change the selected subset).
- lineitem/orders (interval fixture): replica r shifts keys by r*1e9
  and all dates by r*7305 days (20 years — disjoint time windows, so
  with no `by` key the point-in-interval density per window is
  unchanged and output scales 10x, not 100x).
- zonal raster: two built pyramids, 1024^2 vs 3328^2 base (10.6x the
  pixels), same three proportionally-scaled convex polygons (~half the
  raster covered) — interior-tile metadata work scales with area,
  boundary decode with perimeter.

Wall = best-of-``--reps`` of a full materialization (noop sink), per-rep
/proc/stat steal. local[--cpus].

Usage: python tools/sf_scale_bench.py [--cpus 8] [--reps 2]
       [--only name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
BASE = "/dev/shm/psjl_sfscale"
REPLICAS = 10
DOC_OFF = 97_000_000
KEY_OFF = 1_000_000_000
DAY_OFF = 7305


def steal_read():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def _replicate(spark, n: int):
    """DataFrame with column r = 0..n-1 to cross-join for replication."""
    from pyspark.sql import functions as F

    return spark.range(n).select(F.col("id").cast("int").alias("__r"))


def gen_scaled(spark) -> None:
    from pyspark.sql import functions as F

    marker = f"{BASE}/.done"
    if os.path.exists(marker):
        return
    os.makedirs(f"{BASE}/x1", exist_ok=True)
    os.makedirs(f"{BASE}/x10", exist_ok=True)
    for t in ("documents", "lineitem", "orders"):
        dst = f"{BASE}/x1/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF_DIR}/{t}.parquet", dst)

    r10 = _replicate(spark, REPLICAS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (
        docs.crossJoin(r10)
        .select(
            (F.col("doc_id") + F.col("__r").cast("long") * F.lit(DOC_OFF))
            .alias("doc_id"),
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit("_"),
                                           F.col("__r").cast("string")),
                    ),
                )
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite").parquet(f"{BASE}/x10/documents.parquet")
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_shipdate"
    )
    (
        li.crossJoin(r10)
        .select(
            (F.col("l_orderkey") + F.col("__r").cast("long") * F.lit(KEY_OFF))
            .alias("l_orderkey"),
            "l_linenumber", "l_partkey",
            F.date_add(F.col("l_shipdate"), F.col("__r") * F.lit(DAY_OFF))
            .alias("l_shipdate"),
        )
        .repartition(32)
        .write.mode("overwrite").parquet(f"{BASE}/x10/lineitem.parquet")
    )
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    (
        od.crossJoin(r10)
        .select(
            (F.col("o_orderkey") + F.col("__r").cast("long") * F.lit(KEY_OFF))
            .alias("o_orderkey"),
            F.date_add(F.col("o_orderdate"), F.col("__r") * F.lit(DAY_OFF))
            .alias("o_orderdate"),
        )
        .repartition(32)
        .write.mode("overwrite").parquet(f"{BASE}/x10/orders.parquet")
    )
    open(marker, "w").close()


def _zonal_polys(n: int):
    """Three convex polygons scaled to an n x n raster (~55% coverage)."""
    f = n / 16.0

    def pt(x, y):
        return [float(int(x * f)), float(int(y * f))]

    return [
        {"polygon_id": "p1",
         "ring": [pt(1, 1), pt(7, 2), pt(6, 7), pt(2, 6)]},
        {"polygon_id": "p2",
         "ring": [pt(9, 3), pt(14, 4), pt(13, 9), pt(10, 8)]},
        {"polygon_id": "p3",
         "ring": [pt(3, 9), pt(12, 10), pt(11, 14), pt(4, 15)]},
    ]


def ensure_zonal_pyr(spark, g: int, size: int) -> str:
    from pyramidscheme_jl_spark.operators.build import build_pyramid
    from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, synth_images

    path = f"{BASE}/zonal_g{g}_s{size}"
    if os.path.exists(f"{path}/.done"):
        return path
    images = spark.createDataFrame(synth_images(G=g, size=size), IMAGES_DDL)
    build_pyramid(spark, images, path, G=g, reducer="mean", tilesize=size,
                  run_id=f"sfscale-{g}")
    open(f"{path}/.done", "w").close()
    return path


def timed(fn, reps: int):
    walls, steals, n = [], [], None
    for _ in range(reps):
        s0, t0 = steal_read(), time.time()
        n = fn()
        walls.append(round(time.time() - t0, 3))
        s1 = steal_read()
        steals.append(round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
    return {"walls": walls, "best": min(walls), "steal": steals, "rows_out": n}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import __spark_entry__ as E
    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark("sf-scale", master=f"local[{args.cpus}]")
    gen_scaled(spark)
    qs = E.queries()

    def run_query(name, sf_dir):
        def fn():
            df = qs[name](spark, sf_dir)
            n = df.count()
            return n
        return fn

    names = ["minhash_lsh", "hamming_near_dup", "dedup_components",
             "docs_contamination", "interval_join_tiered"]
    if args.only is not None:
        names = [n for n in names if n in set(args.only)]
    out = {"tool": "sf_scale_bench", "cpus": args.cpus, "reps": args.reps,
           "results": {}}
    for name in names:
        r1 = timed(run_query(name, f"{BASE}/x1"), args.reps)
        r10 = timed(run_query(name, f"{BASE}/x10"), args.reps)
        out["results"][name] = {
            "x1": r1, "x10": r10,
            "wall_growth": round(r10["best"] / max(r1["best"], 1e-9), 2),
            "rows_out_growth": round(
                r10["rows_out"] / max(r1["rows_out"], 1), 2),
        }

    if args.only is None or "zonal_raster" in set(args.only):
        from pyramidscheme_jl_spark.operators.joins import zonal_raster

        p1 = ensure_zonal_pyr(spark, g=8, size=128)    # 1024^2 = 1.05M px
        p10 = ensure_zonal_pyr(spark, g=26, size=128)  # 3328^2 = 11.1M px
        z1 = timed(lambda: zonal_raster(
            spark, p1, _zonal_polys(1024), z=0).count(), args.reps)
        z10 = timed(lambda: zonal_raster(
            spark, p10, _zonal_polys(3328), z=0).count(), args.reps)
        out["results"]["zonal_raster"] = {
            "x1": z1, "x10": z10,
            "wall_growth": round(z10["best"] / max(z1["best"], 1e-9), 2),
            "px_growth": round((3328 / 1024) ** 2, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
