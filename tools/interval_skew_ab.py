"""A/B: interval joins under interval-length skew (r7 tiers).

Fixture (realistic shape): short job intervals live in BUSY resource
groups; a small population of "always-on" maintenance windows spans the
whole time range in IDLE groups. The flat plan must explode every giant
into len/w bucket rows (the unbounded term); the tiered plan caps each
interval at ~3 buckets per tier x log2(spread) tiers. Output size is
held small by the by-key design (giants match few points), so the
measured delta is the interval-side explode + shuffle — exactly the
term tiers bound.

Arms (identical checksums asserted):
  flat_skew    — tier_threshold=2^60 (never tier), skewed corpus
  tiered_skew  — tier_threshold=64 (default; giants trip it)
  flat_short   — same corpus MINUS the giants (the no-skew control:
                 tiers must not help or hurt here)
  tiered_short

Deterministic corpora (xxhash64 of row id), /dev/shm, best-of-reps,
per-rep /proc/stat steal.

Usage: python tools/interval_skew_ab.py [--points 500000]
       [--intervals 100000] [--giants 2000] [--trange 1048576]
       [--width 64] [--cpus 8] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def steal_read():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def gen(spark, base, n_pts, n_iv, n_giant, trange):
    from pyspark.sql import functions as F

    # points: 90% in busy groups g0-g9, 10% spread over g10-g999
    p = spark.range(n_pts).select(
        F.col("id").alias("pt_id"),
        F.when(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10)) < 9,
            F.concat(F.lit("g"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10))),
        ).otherwise(
            F.concat(F.lit("g"), 10 + F.pmod(F.xxhash64("id", F.lit(3)), F.lit(990)))
        ).alias("res"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(trange)).alias("t"),
    )
    p.write.mode("overwrite").parquet(f"{base}/pts")
    # short intervals in busy groups
    s = F.pmod(F.xxhash64("id", F.lit(5)), F.lit(trange))
    iv = spark.range(n_iv).select(
        F.col("id").alias("iv_id"),
        F.concat(F.lit("g"), F.pmod(F.xxhash64("id", F.lit(6)), F.lit(10))).alias("res"),
        s.alias("s"),
        (s + F.pmod(F.xxhash64("id", F.lit(7)), F.lit(128))).alias("e"),
    )
    iv.write.mode("overwrite").parquet(f"{base}/iv_short")
    # giants: full-range windows in idle groups
    g = spark.range(n_giant).select(
        (F.col("id") + 10_000_000).alias("iv_id"),
        F.concat(F.lit("g"), 10 + F.pmod(F.xxhash64("id", F.lit(8)), F.lit(990))).alias("res"),
        F.lit(0).cast("long").alias("s"),
        F.lit(trange - 1).cast("long").alias("e"),
    )
    g.write.mode("overwrite").parquet(f"{base}/iv_giant")


def run_arm(spark, iv_paths, pt_path, width, threshold, reps):
    from pyspark.sql import functions as F

    from pyramidscheme_jl_spark.operators.temporal import interval_join

    # the generator writes a handful of fat parquet files, which pins the
    # map-side explode to their split count at ANY core width (the same
    # AQE/input-parallelism trap BENCH/RASTER_SCALING.md documents) — a
    # deployment-scale scan provides splits naturally, so emulate that
    cores = spark.sparkContext.defaultParallelism
    iv = spark.read.parquet(*iv_paths).repartition(4 * cores)
    pt = spark.read.parquet(pt_path).repartition(4 * cores)
    walls, steals = [], []
    for _ in range(reps):
        s0, t0 = steal_read(), time.time()
        out = interval_join(
            iv, pt, "s", "e", "t", by="res",
            bucket_width=width, tier_threshold=threshold,
        )
        row = out.agg(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.col("iv_id") * 31 + F.col("pt_id"), F.lit(1 << 30))).alias("ck"),
        ).collect()[0]
        walls.append(round(time.time() - t0, 3))
        s1 = steal_read()
        steals.append(round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
    return {"walls": walls, "best": min(walls), "steal": steals,
            "rows": row["n"], "checksum": int(row["ck"])}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=500_000)
    ap.add_argument("--intervals", type=int, default=100_000)
    ap.add_argument("--giants", type=int, default=2_000)
    ap.add_argument("--trange", type=int, default=1 << 20)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark("interval-skew-ab", master=f"local[{args.cpus}]")
    # size-specific dir: a larger gen must not overwrite a smaller
    # corpus its marker still vouches for
    base = (f"/dev/shm/psjl_interval_ab/"
            f"{args.points}-{args.intervals}-{args.giants}-{args.trange}")
    marker = f"{base}/.done"
    if not os.path.exists(marker):
        gen(spark, base, args.points, args.intervals, args.giants, args.trange)
        open(marker, "w").close()

    both = [f"{base}/iv_short", f"{base}/iv_giant"]
    short = [f"{base}/iv_short"]
    run_arm(spark, short, f"{base}/pts", args.width, 1 << 60, 1)  # warm

    arms = {
        "flat_skew": run_arm(spark, both, f"{base}/pts", args.width, 1 << 60, args.reps),
        "tiered_skew": run_arm(spark, both, f"{base}/pts", args.width, 64, args.reps),
        "flat_short": run_arm(spark, short, f"{base}/pts", args.width, 1 << 60, args.reps),
        "tiered_short": run_arm(spark, short, f"{base}/pts", args.width, 1, args.reps),
    }
    assert arms["flat_skew"]["checksum"] == arms["tiered_skew"]["checksum"]
    assert arms["flat_skew"]["rows"] == arms["tiered_skew"]["rows"]
    assert arms["flat_short"]["checksum"] == arms["tiered_short"]["checksum"]
    out = {
        "tool": "interval_skew_ab",
        "points": args.points, "intervals": args.intervals,
        "giants": args.giants, "trange": args.trange,
        "width": args.width, "cpus": args.cpus,
        "arms": arms,
        "speedup_skew": round(arms["flat_skew"]["best"] / arms["tiered_skew"]["best"], 2),
        "tier_cost_short": round(
            arms["tiered_short"]["best"] / arms["flat_short"]["best"], 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
