"""Two-parallelism scaling for the streaming point-grid ingest (r8).

The sink under test is ``streaming.points.ingest_points``: per
micro-batch one binning shuffle (map-side combined) + one appended
partial file. Source = pre-written parquet files of closed-form
integer-hash points on /dev/shm (generated once, distributed);
``--files-per-trigger`` fixes the micro-batch count so both core
counts run the SAME batch structure. Fresh session and fresh state
dir per core count; wall = availableNow start -> awaitTermination.

Usage: python tools/points_ingest_scaling_bench.py [--cores 2 8]
       [--points 16000000] [--files 8] [--files-per-trigger 2]
       [--world 4096] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/dev/shm/psjl_ptsingest_scale"


def steal_read():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def ensure_source(n: int, files: int, world: int) -> str:
    from pyspark.sql import functions as F

    from pyramidscheme_jl_spark.session import get_spark

    src = f"{BASE}/src_n{n}_f{files}"
    if os.path.exists(f"{src}/.done"):
        return src
    spark = get_spark("pts-scale-src", master="local[16]")
    per = n // files
    for i in range(files):
        (
            spark.range(i * per, (i + 1) * per, 1, 16)
            .select(
                (F.abs(F.xxhash64("id")) % (world * 8) / 8.0).alias("x"),
                (F.abs(F.xxhash64("id", F.lit(1))) % (world * 8) / 8.0).alias("y"),
                (F.abs(F.xxhash64("id", F.lit(2))) % 251).cast("double").alias("value"),
            )
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(f"{src}/f{i}")
        )
    open(f"{src}/.done", "w").close()
    spark.stop()
    return src


def run_one(src: str, cores: int, world: int, fpt: int, reps: int) -> dict:
    from pyramidscheme_jl_spark.session import get_spark
    from pyramidscheme_jl_spark.streaming.points import (
        grid_from_state,
        ingest_points,
    )

    spark = get_spark(f"pts-scale-{cores}", master=f"local[{cores}]")
    walls, steals, tiles = [], [], None
    for rep in range(reps):
        state = f"{BASE}/state_{cores}_{rep}"
        shutil.rmtree(state, ignore_errors=True)
        s0, t0 = steal_read(), time.time()
        q = ingest_points(
            spark, f"{src}/*", state, (world, world),
            max_files_per_trigger=fpt,
        )
        q.awaitTermination(1800)
        walls.append(round(time.time() - t0, 3))
        s1 = steal_read()
        steals.append(round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
        tiles = grid_from_state(spark, state, "count", 0, 256).count()
        shutil.rmtree(state, ignore_errors=True)
    spark.stop()
    return {"cores": cores, "walls": walls, "best": min(walls),
            "steal": steals, "tiles": tiles}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--points", type=int, default=16_000_000)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--files-per-trigger", type=int, default=2)
    ap.add_argument("--world", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    src = ensure_source(args.points, args.files, args.world)
    results = [
        run_one(src, c, args.world, args.files_per_trigger, args.reps)
        for c in args.cores
    ]
    out = {
        "tool": "points_ingest_scaling_bench", "points": args.points,
        "files": args.files, "files_per_trigger": args.files_per_trigger,
        "world": args.world, "results": results,
    }
    for a, b in zip(results, results[1:]):
        step = b["cores"] / a["cores"]
        out[f"eff_{a['cores']}to{b['cores']}"] = round(
            (a["best"] / b["best"]) / step, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
