"""A/B: sessionize under a hot ``by`` key (VERDICT r7 #5).

The plain sessionize window serializes each ``by`` group into one task —
the same breach asof_join measures (tools/asof_skew_ab.py). The running
session count is order-carrying but associative, so the bucketed repair
transfers: per-(group, time-bucket) local counts + a tiny per-bucket
boundary stitch. This tool measures, on the same synthetic corpus:

  (a) plain window, uniform keys;
  (b) plain window, one key holding 50% of the rows (the hot control);
  (c) bucketed (explicit width), same hot corpus;
  (d) auto trigger on both corpora (count job resolves plain/bucketed).

Criterion (mirrors ASOF_SKEW): hot/uniform <= 2x. Output identity is
asserted via an order-insensitive checksum over (user, t, session_id).
Corpora are deterministic (xxhash64 of the row id); written once to
/dev/shm; wall times best-of-``--reps``, per-rep /proc/stat steal.

Usage: python tools/sessionize_skew_ab.py [--rows 4000000] [--users 2000]
       [--cpus 8] [--reps 3] [--width 16777216]
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


def gen(spark, path: str, rows: int, users: int, hot: bool) -> None:
    from pyspark.sql import functions as F

    df = spark.range(rows)
    key = F.concat(F.lit("u"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(users)))
    if hot:
        key = F.when(F.pmod("id", F.lit(2)) == 0, F.lit("u0")).otherwise(key)
    df.select(
        F.col("id").alias("eid"),
        key.alias("user"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(T_RANGE)).alias("t"),
    ).write.mode("overwrite").parquet(path)


def run_arm(spark, path, width, reps):
    from pyspark.sql import functions as F

    from pyramidscheme_jl_spark.operators.temporal import sessionize

    df = spark.read.parquet(path)
    walls, steals = [], []
    for _ in range(reps):
        s0, t0 = steal_read(), time.time()
        out = sessionize(df, "user", "t", gap=1000, bucket_width=width)
        row = out.agg(
            F.count("*").alias("n"),
            F.sum(
                F.pmod(F.xxhash64("user", "t", "session_id"),
                       F.lit(1_000_000_007))
            ).alias("s"),
        ).collect()[0]
        walls.append(round(time.time() - t0, 3))
        s1 = steal_read()
        steals.append(round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
    return {"walls": walls, "best": min(walls), "steal": steals,
            "rows": row["n"], "checksum": int(row["s"])}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--width", type=int, default=16_777_216)
    args = ap.parse_args()

    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark("sessionize-skew-ab", master=f"local[{args.cpus}]")
    base = "/dev/shm/psjl_sess_ab"
    marker = f"{base}/.done-{args.rows}-{args.users}"
    if not os.path.exists(marker):
        gen(spark, f"{base}/uni", args.rows, args.users, False)
        gen(spark, f"{base}/hot", args.rows, args.users, True)
        open(marker, "w").close()

    run_arm(spark, f"{base}/uni", None, 1)  # warm JVM/codegen

    arms = {
        "plain_uniform": run_arm(spark, f"{base}/uni", None, args.reps),
        "plain_hot": run_arm(spark, f"{base}/hot", None, args.reps),
        "bucketed_hot": run_arm(spark, f"{base}/hot", args.width, args.reps),
        "bucketed_uniform": run_arm(spark, f"{base}/uni", args.width, args.reps),
        "auto_hot": run_arm(spark, f"{base}/hot", "auto", args.reps),
        "auto_uniform": run_arm(spark, f"{base}/uni", "auto", args.reps),
    }
    for arm in ("bucketed_hot", "auto_hot"):
        assert arms[arm]["checksum"] == arms["plain_hot"]["checksum"], arm
        assert arms[arm]["rows"] == arms["plain_hot"]["rows"], arm
    for arm in ("bucketed_uniform", "auto_uniform"):
        assert arms[arm]["checksum"] == arms["plain_uniform"]["checksum"], arm
    uni = arms["plain_uniform"]["best"]
    out = {
        "tool": "sessionize_skew_ab",
        "rows": args.rows, "users": args.users, "cpus": args.cpus,
        "bucket_width": args.width,
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
