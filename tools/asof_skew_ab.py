"""A/B: asof_join under a hot ``by`` key (VERDICT r5 #5).

The plain as-of window serializes each ``by`` group into one task. This
tool measures, on the same synthetic corpus:

  (a) plain window, uniform keys;
  (b) plain window, one key holding 50% of both sides (the hot control);
  (c) bucketed two-pass (``bucket_width``), same hot corpus.

Criterion (VERDICT r5 nits): hot/uniform <= 2x. If plain breaches it the
bucketed variant must restore it. Corpora are deterministic (xxhash64 of
the row id — no RNG state), written once to /dev/shm; wall times are
best-of-``--reps`` with per-rep /proc/stat steal.

Usage: python tools/asof_skew_ab.py [--rows 4000000] [--right 1000000]
       [--users 2000] [--cpus 8] [--reps 3] [--width 16777216]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T_RANGE = 1_000_000_000


def steal_read():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def gen(spark, path: str, rows: int, users: int, hot: bool, side: str) -> None:
    from pyspark.sql import functions as F

    df = spark.range(rows)
    key = F.concat(F.lit("u"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(users)))
    if hot:
        key = F.when(F.pmod("id", F.lit(2)) == 0, F.lit("u0")).otherwise(key)
    cols = [
        key.alias("user"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(T_RANGE)).alias("t"),
    ]
    if side == "left":
        cols = [F.col("id").alias("eid"), *cols]
    else:
        cols = [
            F.col("id").alias("qid"), *cols,
            (F.pmod(F.xxhash64("id", F.lit(13)), F.lit(100000)) / 100.0).alias("v"),
        ]
    df.select(*cols).write.mode("overwrite").parquet(path)


def run_arm(spark, lpath, rpath, width, reps):
    from pyspark.sql import functions as F

    from pyramidscheme_jl_spark.operators.temporal import asof_join

    l, r = spark.read.parquet(lpath), spark.read.parquet(rpath)
    walls, steals = [], []
    for _ in range(reps):
        s0, t0 = steal_read(), time.time()
        out = asof_join(
            l, r, on="t", by="user", tiebreak="qid", bucket_width=width
        )
        row = out.agg(
            F.count("*").alias("n"), F.sum("v_right").alias("s")
        ).collect()[0]
        walls.append(round(time.time() - t0, 3))
        s1 = steal_read()
        steals.append(round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
    return {"walls": walls, "best": min(walls), "steal": steals,
            "rows": row["n"], "checksum": round(float(row["s"]), 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--right", type=int, default=1_000_000)
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--width", type=int, default=16_777_216)
    args = ap.parse_args()

    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark("asof-skew-ab", master=f"local[{args.cpus}]")
    base = "/dev/shm/psjl_asof_ab"
    marker = f"{base}/.done-{args.rows}-{args.right}-{args.users}"
    if not os.path.exists(marker):
        for hot in (False, True):
            tag = "hot" if hot else "uni"
            gen(spark, f"{base}/l_{tag}", args.rows, args.users, hot, "left")
            gen(spark, f"{base}/r_{tag}", args.right, args.users, hot, "right")
        open(marker, "w").close()

    # warm JVM/codegen once on an unrelated tiny pass
    run_arm(spark, f"{base}/l_uni", f"{base}/r_uni", None, 1)

    arms = {
        "plain_uniform": run_arm(spark, f"{base}/l_uni", f"{base}/r_uni", None, args.reps),
        "plain_hot": run_arm(spark, f"{base}/l_hot", f"{base}/r_hot", None, args.reps),
        "bucketed_hot": run_arm(
            spark, f"{base}/l_hot", f"{base}/r_hot", args.width, args.reps
        ),
        "bucketed_uniform": run_arm(
            spark, f"{base}/l_uni", f"{base}/r_uni", args.width, args.reps
        ),
        # r7 (VERDICT r6 #6): the auto trigger — one count job picks the
        # width on the hot corpus, resolves to plain on the uniform one
        "auto_hot": run_arm(
            spark, f"{base}/l_hot", f"{base}/r_hot", "auto", args.reps
        ),
        "auto_uniform": run_arm(
            spark, f"{base}/l_uni", f"{base}/r_uni", "auto", args.reps
        ),
    }
    assert arms["plain_hot"]["checksum"] == arms["bucketed_hot"]["checksum"]
    assert arms["plain_hot"]["rows"] == arms["bucketed_hot"]["rows"]
    assert arms["plain_hot"]["checksum"] == arms["auto_hot"]["checksum"]
    assert arms["plain_uniform"]["checksum"] == arms["auto_uniform"]["checksum"]
    uni = arms["plain_uniform"]["best"]
    out = {
        "tool": "asof_skew_ab",
        "rows": args.rows, "right": args.right, "users": args.users,
        "cpus": args.cpus, "bucket_width": args.width,
        "arms": arms,
        "ratio_plain_hot": round(arms["plain_hot"]["best"] / uni, 2),
        "ratio_bucketed_hot": round(arms["bucketed_hot"]["best"] / uni, 2),
        "ratio_auto_hot": round(arms["auto_hot"]["best"] / uni, 2),
        "ratio_auto_uniform": round(arms["auto_uniform"]["best"] / uni, 2),
        "criterion": "hot/uniform <= 2.0",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
