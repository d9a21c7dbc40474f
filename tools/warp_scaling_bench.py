"""Two-parallelism scaling for warp_affine (r8).

Reuses the focal scaling fixture (G tiles of 256px, mean-built pyramid
on /dev/shm, memoized by tools/focal_scaling_bench.ensure_pyramid) and
times a full warp materialization: rational 3/2 downscale with offsets
(every output tile gathers from ≤4 source tiles; fully covered, so the
uint8 base dtype is preserved end-to-end). Output tile count has a
closed form, asserted every rep.

Protocol = BENCH/RASTER_SCALING.md: fresh SparkSession per core count,
untimed warm pass, best-of-``--reps``, per-rep steal, input splits
asserted >= 2x the largest core count.

Usage: python tools/warp_scaling_bench.py [--cores 2 8] [--g 64] [--reps 2]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from focal_scaling_bench import ensure_pyramid, steal_read  # noqa: E402


def run_one(path: str, g: int, cores: int, reps: int, resampling: str = "nearest") -> dict:
    from pyramidscheme_jl_spark.operators.raster import warp_affine
    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark(f"warp-scale-{cores}", master=f"local[{cores}]")
    n = g * 256
    out_w = (n * 2) // 3  # 3/2 downscale; offset keeps full coverage
    expect = (-(-out_w // 256)) ** 2
    warp_affine(spark, path, (512, 512), (3, 2), offset=(8, 8), z=0,
                resampling=resampling).count()  # warm
    walls, steals = [], []
    for _ in range(reps):
        s0, t0 = steal_read(), time.time()
        cnt = warp_affine(spark, path, (out_w, out_w), (3, 2), offset=(8, 8),
                          z=0, resampling=resampling).count()
        walls.append(round(time.time() - t0, 3))
        s1 = steal_read()
        steals.append(round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
        assert cnt == expect, f"output tiles {cnt} != closed form {expect}"
    spark.stop()
    return {"cores": cores, "resampling": resampling,
            "walls": walls, "best": min(walls),
            "steal_pct": steals, "out_tiles": expect,
            "out_px": out_w * out_w}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--g", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--resampling", default="nearest")
    args = ap.parse_args()
    path = ensure_pyramid(args.g, 256)
    splits = len(glob.glob(f"{path}/tiles/z=0/*.parquet"))
    assert splits >= 2 * max(args.cores), (
        f"only {splits} input splits for {max(args.cores)} cores"
    )
    out = {"g": args.g, "src_px": (args.g * 256) ** 2, "splits": splits,
           "runs": []}
    for c in args.cores:
        r = run_one(path, args.g, c, args.reps, args.resampling)
        out["runs"].append(r)
        print(json.dumps(r))
    if len(out["runs"]) >= 2:
        a, b = out["runs"][0], out["runs"][-1]
        ratio = a["best"] / b["best"]
        out["speedup"] = round(ratio, 3)
        out["efficiency"] = round(ratio / (b["cores"] / a["cores"]), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
