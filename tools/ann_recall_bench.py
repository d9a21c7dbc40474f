"""ANN quality table (VERDICT r5 #3): recall@10 AND wall time for every
ANN path — brute force, LSH, IVF, PQ, IVF-PQ — on one clustered corpus at
two sizes, same seed, so a user can pick an index from one table.

Corpus: mixture of 256 seeded Gaussian clusters in [-1,1]^64, every vector
UNIT-NORMALIZED (clustered is the honest regime — it is where IVF/PQ earn
their keep AND where ADC ties hurt; unit norms make the comparison valid
at all: brute/LSH/IVF rank by inner product while PQ/IVF-PQ rank by
euclidean ADC, and only on the unit sphere are those orders identical —
the standard cosine-embedding regime). Queries are 50 held-out draws from
the same mixture (ids >= 10^9, so the self-exclusion predicate never
fires asymmetrically). Ground truth = ``brute_force_topk(k=10)`` exact
integer ranks; recall@10 = mean over queries of |approx ∩ exact| / 10.

Wall times are best-of-``--reps`` of the full operator call (train +
encode + search — the whole cost a caller pays; at deployment train/encode
amortize across queries, noted in BENCH/ANN_RECALL.md) with per-rep
/proc/stat steal. Corpus on /dev/shm, memoized by (rows, dim, seed).

Usage: python tools/ann_recall_bench.py [--sizes 50000 200000] [--dim 64]
       [--queries 50] [--cpus 8] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLUSTERS = 256
NOISE = 0.15
QUERY_ID_BASE = 1_000_000_000


def steal_read():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def centers(dim: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).uniform(-1, 1, size=(N_CLUSTERS, dim))


def gen_corpus(path: str, rows: int, dim: int, seed: int) -> None:
    cent = centers(dim, seed)
    os.makedirs(path, exist_ok=True)
    chunk = 100_000
    for i, lo in enumerate(range(0, rows, chunk)):
        n = min(chunk, rows - lo)
        rng = np.random.RandomState(seed + 1000 + i)
        emb = cent[rng.randint(0, N_CLUSTERS, n)] + rng.normal(0, NOISE, (n, dim))
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        tab = pa.table(
            {
                "vec_id": pa.array(np.arange(lo, lo + n), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.ravel(), type=pa.float64()), dim
                ).cast(pa.list_(pa.float64())),
            }
        )
        pq.write_table(tab, os.path.join(path, f"part-{i:04d}.parquet"))


def gen_queries(spark, dim: int, q: int, seed: int):
    cent = centers(dim, seed)
    rng = np.random.RandomState(seed + 777)
    emb = cent[rng.randint(0, N_CLUSTERS, q)] + rng.normal(0, NOISE, (q, dim))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    rows = [
        (QUERY_ID_BASE + i, [float(v) for v in emb[i]]) for i in range(q)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for row in df.select("query_id", "n_id").collect():
        out.setdefault(row["query_id"], set()).add(row["n_id"])
    return out


def run_path(fn, reps: int):
    walls, steals, res = [], [], None
    for _ in range(reps):
        s0, t0 = steal_read(), time.time()
        res = topk_sets(fn())
        walls.append(round(time.time() - t0, 3))
        s1 = steal_read()
        steals.append(round(100 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2))
    return {"walls": walls, "best": min(walls), "steal": steals}, res


def recall(approx: dict[int, set[int]], exact: dict[int, set[int]], k: int) -> float:
    hits = sum(len(approx.get(qid, set()) & t) for qid, t in exact.items())
    return round(hits / (k * len(exact)), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[50_000, 200_000])
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these path names (still runs brute "
                         "for ground truth)")
    args = ap.parse_args()

    from pyramidscheme_jl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
        pq_topk,
    )
    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark("ann-recall", master=f"local[{args.cpus}]")
    q = gen_queries(spark, args.dim, args.queries, args.seed)
    k = args.k
    results = {}
    for rows in args.sizes:
        path = f"/dev/shm/psjl_ann_recall/{rows}-{args.dim}-{args.seed}"
        if not os.path.exists(os.path.join(path, ".done")):
            gen_corpus(path, rows, args.dim, args.seed)
            open(os.path.join(path, ".done"), "w").close()
        data = spark.read.parquet(path)
        # two operating points per approximate path: the fast end and the
        # wide/refined end of each family's recall knob (probes / nprobe /
        # rerank) — the trade a user actually tunes
        paths = {
            "brute": lambda: brute_force_topk(data, q, k=k),
            "lsh_b12": lambda: lsh_topk(
                data, q, k=k, bits=12, seed=args.seed, dim=args.dim, probes=1
            ),
            "lsh_b8": lambda: lsh_topk(
                data, q, k=k, bits=8, seed=args.seed, dim=args.dim, probes=1
            ),
            "ivf_np2": lambda: ivf_topk(
                data, q, k=k, nlist=64, nprobe=2, seed=args.seed
            ),
            "ivf_np8": lambda: ivf_topk(
                data, q, k=k, nlist=64, nprobe=8, seed=args.seed
            ),
            "pq_r200": lambda: pq_topk(
                data, q, k=k, m=8, ksub=16, seed=args.seed, rerank=200
            ),
            "pq_r1000": lambda: pq_topk(
                data, q, k=k, m=8, ksub=16, seed=args.seed, rerank=1000
            ),
            "ivfpq_r200": lambda: ivfpq_topk(
                data, q, k=k, nlist=64, nprobe=8, m=8, ksub=16,
                seed=args.seed, rerank=200,
            ),
            "ivfpq_r1000": lambda: ivfpq_topk(
                data, q, k=k, nlist=64, nprobe=8, m=8, ksub=16,
                seed=args.seed, rerank=1000,
            ),
            # r7 (VERDICT r6 #8): margin-ordered multi-probe depth>=2 —
            # the recall knob that does not square bucket occupancy
            "lsh_b12_d2": lambda: lsh_topk(
                data, q, k=k, bits=12, seed=args.seed, dim=args.dim,
                probes=2, probe_budget=48,
            ),
            "lsh_b12_d3": lambda: lsh_topk(
                data, q, k=k, bits=12, seed=args.seed, dim=args.dim,
                probes=3, probe_budget=96,
            ),
            # r8 (VERDICT r7 #7): axis-aligned margin multiprobe (the
            # folded non-hyperplane path — margins are |v[b]|)
            "lsh_ax_b12": lambda: lsh_topk(data, q, k=k, bits=12),
            "lsh_ax_b12_d2": lambda: lsh_topk(
                data, q, k=k, bits=12, probes=2, probe_budget=48,
            ),
        }
        if args.only:
            keep = set(args.only) | {"brute"}
            paths = {n: f for n, f in paths.items() if n in keep}
        # warm codegen/JVM once before any timed arm
        paths["brute"]().count()
        timing, sets = {}, {}
        for name, fn in paths.items():
            timing[name], sets[name] = run_path(fn, args.reps)
        exact = sets["brute"]
        results[str(rows)] = {
            name: {
                "recall_at_k": 1.0 if name == "brute" else recall(sets[name], exact, k),
                **timing[name],
            }
            for name in paths
        }
    print(json.dumps({
        "tool": "ann_recall_bench", "dim": args.dim, "k": k,
        "queries": args.queries, "cpus": args.cpus, "seed": args.seed,
        "params": {"lsh": "probes=1, bits as named",
                   "ivf": "nlist=64, nprobe as named",
                   "pq": "m=8 ksub=16, rerank as named",
                   "ivfpq": "nlist=64 nprobe=8 m=8 ksub=16, rerank as named"},
        "results": results,
    }))


if __name__ == "__main__":
    main()
