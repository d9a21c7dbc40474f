"""Two-parallelism scaling for grid_points (r8 session 3).

Unlike the halo-raster benches, gridding's input is a POINT CLOUD:
``spark.range(n)`` with closed-form integer-hash coordinates/values
(generated ON the executors — nothing driver-side), binned onto a
4096^2 grid. The plan under test is the full chain: pixel hash
aggregate (map-side partials) -> skinny-row halo ownership explode ->
per-tile disc kernel. ``--method`` picks the kernel (mean = disc sums,
nearest = the value-carrying EDT).

Protocol = BENCH/RASTER_SCALING.md: fresh session per core count,
untimed warm pass, best-of-``--reps`` of a full materialization
(count()), per-rep /proc/stat steal.

Usage: python tools/grid_scaling_bench.py [--cores 2 8] [--points 50000000]
       [--world 4096] [--radius 3] [--method mean] [--reps 2]
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


def points_df(spark, n: int, world: int, parts: int):
    from pyspark.sql import functions as F

    # integer-hash scatter: xxhash64 is JVM-side and split-deterministic;
    # coordinates land non-uniformly (mod-biased) on purpose — mild bin
    # skew is the realistic case
    return (
        spark.range(0, n, 1, parts)
        .select(
            (F.abs(F.xxhash64("id")) % (world * 8) / 8.0).alias("x"),
            (F.abs(F.xxhash64("id", F.lit(1))) % (world * 8) / 8.0).alias("y"),
            (F.abs(F.xxhash64("id", F.lit(2))) % 251).cast("double").alias("value"),
        )
    )


def run_one(cores: int, n: int, world: int, radius: int, method: str,
            reps: int) -> dict:
    from pyramidscheme_jl_spark.operators.gridding import grid_points
    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark(f"grid-scale-{cores}", master=f"local[{cores}]")
    parts = max(64, cores * 8)
    grid_points(
        spark, points_df(spark, 1_000_000, world, parts), (world, world),
        method=method, radius=radius,
    ).count()  # warm
    walls, steals, tiles = [], [], None
    for _ in range(reps):
        s0, t0 = steal_read(), time.time()
        tiles = grid_points(
            spark, points_df(spark, n, world, parts), (world, world),
            method=method, radius=radius,
        ).count()
        walls.append(round(time.time() - t0, 3))
        s1 = steal_read()
        steals.append(round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
    spark.stop()
    return {"cores": cores, "walls": walls, "best": min(walls),
            "steal": steals, "tiles": tiles}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--points", type=int, default=50_000_000)
    ap.add_argument("--world", type=int, default=4096)
    ap.add_argument("--radius", type=int, default=3)
    ap.add_argument("--method", default="mean")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    results = [
        run_one(c, args.points, args.world, args.radius, args.method,
                args.reps)
        for c in args.cores
    ]
    out = {
        "tool": "grid_scaling_bench", "points": args.points,
        "world": args.world, "radius": args.radius, "method": args.method,
        "results": results,
    }
    for a, b in zip(results, results[1:]):
        step = b["cores"] / a["cores"]
        out[f"eff_{a['cores']}to{b['cores']}"] = round(
            (a["best"] / b["best"]) / step, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
