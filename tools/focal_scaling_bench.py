"""Two-parallelism scaling for focal_stats (r8, VERDICT r7 #4).

r7 measured focal mean 2->8 at 0.72 on a 67M px base (and 0.42 at
16M px — the per-job floor), against the host's ~0.8-per-4x no-Spark
control ceiling. This tool re-points the measurement at a 256M px base
(16384^2: G=64 tiles of 256px) where the floor amortizes further, at
``--radius`` (default 2, the verdict's ask — 5x5 windows, 2x the halo
strip volume of r1).

Protocol = BENCH/RASTER_SCALING.md: pyramid built once (distributed
synth, /dev/shm, memoized), fresh SparkSession per core count, untimed
warm pass, best-of-``--reps`` wall of a full focal materialization,
per-rep /proc/stat steal. The level-0 parquet split count is printed —
the r6/r7 lesson: map-side parallelism is pinned by input splits, so
the tool asserts splits >= 2x the largest core count.

Usage: python tools/focal_scaling_bench.py [--cores 2 8] [--radius 2]
       [--g 64] [--size 256] [--reps 2]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/dev/shm/psjl_focal_scale"


def steal_read():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def ensure_pyramid(g: int, size: int) -> str:
    from pyramidscheme_jl_spark.operators.build import build_pyramid
    from pyramidscheme_jl_spark.session import get_spark
    from pyramidscheme_jl_spark.sources.synth import synth_images_df

    path = f"{BASE}/pyr_g{g}_s{size}"
    if os.path.exists(f"{path}/.done"):
        return path
    spark = get_spark("focal-scale-build", master="local[16]")
    images = synth_images_df(spark, G=g, size=size, partitions=64)
    build_pyramid(spark, images, path, G=g, reducer="mean", tilesize=size,
                  run_id=f"focal-scale-{g}")
    open(f"{path}/.done", "w").close()
    spark.stop()
    return path


def run_one(path: str, cores: int, radius: int, reps: int) -> dict:
    from pyramidscheme_jl_spark.operators.raster import focal_stats
    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark(f"focal-scale-{cores}", master=f"local[{cores}]")
    focal_stats(spark, path, z=3, stat="count", radius=1).count()  # warm
    walls, steals = [], []
    n = None
    for _ in range(reps):
        s0, t0 = steal_read(), time.time()
        n = focal_stats(spark, path, z=0, stat="mean", radius=radius).count()
        walls.append(round(time.time() - t0, 3))
        s1 = steal_read()
        steals.append(round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
    spark.stop()
    return {"cores": cores, "walls": walls, "best": min(walls),
            "steal": steals, "tiles_out": n}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--radius", type=int, default=2)
    ap.add_argument("--g", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    path = ensure_pyramid(args.g, args.size)
    splits = len(glob.glob(f"{path}/tiles/z=0/*.parquet"))
    assert splits >= 2 * max(args.cores), (
        f"level-0 has {splits} parquet splits; map-side parallelism would "
        f"be pinned below {max(args.cores)} cores (the r6/r7 repartition "
        "lesson) — rebuild with more shuffle partitions")

    results = [run_one(path, c, args.radius, args.reps)
               for c in args.cores]
    out = {
        "tool": "focal_scaling_bench",
        "px": (args.g * args.size) ** 2, "radius": args.radius,
        "splits_z0": splits, "results": results,
    }
    for a, b in zip(results, results[1:]):
        step = b["cores"] / a["cores"]
        out[f"eff_{a['cores']}to{b['cores']}"] = round(
            (a["best"] / b["best"]) / step, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
