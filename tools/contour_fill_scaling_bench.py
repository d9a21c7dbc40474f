"""Two-parallelism scaling for contour_segments + fillnodata (r8).

Both ops ride the focal halo exchange, but their compute fractions
differ from focal_stats: marching squares adds per-cell classification
plus O(contour length) row emission; fillnodata runs 2x(2r+1) shift
passes carrying (d^2, value) tuples. Measured on a 67M px base
(8192^2: G=32 tiles of 256px) where the xor mosaic makes contours
dense (~1 segment/cell at the median level) — the emission-bound
worst case, not a sparse-isoline best case.

Protocol = BENCH/RASTER_SCALING.md: pyramid built once (distributed
synth, /dev/shm, memoized), fresh SparkSession per core count, untimed
warm pass, best-of-``--reps`` wall of a full materialization
(``count()``), per-rep /proc/stat steal; split-count assertion per the
r6/r7 map-side-parallelism lesson.

Usage: python tools/contour_fill_scaling_bench.py [--cores 2 8]
       [--g 32] [--size 256] [--reps 2] [--radius 5]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/dev/shm/psjl_cf_scale"


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
    spark = get_spark("cf-scale-build", master="local[16]")
    images = synth_images_df(spark, G=g, size=size, partitions=64)
    build_pyramid(spark, images, path, G=g, reducer="mean", tilesize=size,
                  run_id=f"cf-scale-{g}")
    open(f"{path}/.done", "w").close()
    spark.stop()
    return path


def run_one(path: str, cores: int, radius: int, reps: int) -> dict:
    from pyramidscheme_jl_spark.operators.raster import (
        contour_segments,
        fillnodata,
    )
    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark(f"cf-scale-{cores}", master=f"local[{cores}]")
    contour_segments(spark, path, [127.5], z=3).count()  # warm (cold JVM)
    out = {"cores": cores}
    for op, thunk in (
        ("contour", lambda: contour_segments(spark, path, [127.5], z=0)),
        ("fill", lambda: fillnodata(spark, path, 7.0, radius, z=0)),
    ):
        walls, steals, n = [], [], None
        for _ in range(reps):
            s0, t0 = steal_read(), time.time()
            n = thunk().count()
            walls.append(round(time.time() - t0, 3))
            s1 = steal_read()
            steals.append(
                round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
        out[op] = {"walls": walls, "best": min(walls), "steal": steals,
                   "rows": n}
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--g", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--radius", type=int, default=5)
    args = ap.parse_args()

    path = ensure_pyramid(args.g, args.size)
    splits = len(glob.glob(f"{path}/tiles/z=0/*.parquet"))
    assert splits >= 2 * max(args.cores), (
        f"level-0 has {splits} parquet splits; map-side parallelism would "
        f"be pinned below {max(args.cores)} cores — rebuild with more "
        "shuffle partitions")

    results = [run_one(path, c, args.radius, args.reps)
               for c in args.cores]
    out = {
        "tool": "contour_fill_scaling_bench",
        "px": (args.g * args.size) ** 2, "radius": args.radius,
        "splits_z0": splits, "results": results,
    }
    for op in ("contour", "fill"):
        for a, b in zip(results, results[1:]):
            step = b["cores"] / a["cores"]
            out[f"{op}_eff_{a['cores']}to{b['cores']}"] = round(
                (a[op]["best"] / b[op]["best"]) / step, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
