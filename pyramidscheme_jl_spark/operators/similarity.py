"""Similarity search over embedding columns (``array<float>``).

Two paths, same results contract:

- **Brute-force top-k** — the exactness baseline. Queries are a small set:
  broadcast them, evaluate the dot product as a JVM ``aggregate(zip_with)``
  expression (no UDF, stays in codegen), window top-k per query.
- **LSH-bucketed** — the scale path: sign-bit (hyperplane) bucket key per
  vector, candidates share a bucket (plus optional 1-bit-flip probes),
  local top-k inside buckets then global re-rank. Turns the O(N*Q) scan
  into an equi-join.

Scores are computed on deterministically quantized vectors
(``round(x * 10^6)`` as bigint) so dot products are exact integers —
engine-portable and hash-stable for the DuckDB oracles (float64 summation
order never matters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

QUANT = 1_000_000


def quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``qvec array<bigint>``: deterministic fixed-point quantization."""
    q = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long")
    )
    return df.withColumn("qvec", q)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Distributed two-phase top-k over (query_id, n_id, ip) candidates.

    Phase 1 groups by ``(query_id, spark_partition_id())`` — the partition
    id is constant within each input partition, so the partial hash
    aggregation COMPLETES map-side and only ``<= k`` survivors per (query,
    partition) cross the exchange. Phase 2 ranks the tiny survivor set.
    A single global window would shuffle every candidate row — the
    difference between O(candidates) and O(k * partitions) network at
    10^12-row scale. Ties break (ip desc, n_id asc), deterministic.
    """
    local = (
        scored.withColumn("_pid", F.spark_partition_id())
        .groupBy("query_id", "_pid")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct((-F.col("ip")).alias("nip"), F.col("n_id")))
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.explode("top").alias("t"))
        .select("query_id", F.col("t.n_id").alias("n_id"), (-F.col("t.nip")).alias("ip"))
    )
    win = Window.partitionBy("query_id").orderBy(F.col("ip").desc(), F.col("n_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("query_id", "n_id", "ip", "rank")
    )


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact inner-product top-k for each query vector.

    ``queries`` (small) is broadcast; the scan over ``data`` is a single
    narrow pass per query batch — the right baseline plan when Q is dims-
    sized. Ties break on neighbor id for determinism.
    """
    from .parallelism import ensure_min_parallelism

    d = quantized(ensure_min_parallelism(data), vec_col).select(
        F.col(id_col).alias("n_id"), F.col("qvec").alias("n_qvec")
    )
    q = quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("q_qvec")
    )
    scored = (
        d.crossJoin(F.broadcast(q))
        .where(F.col("n_id") != F.col("query_id"))
        .withColumn("ip", _dot(F.col("q_qvec"), F.col("n_qvec")))
    )
    return topk_per_query(scored, k)


def hyperplane_signs(bits: int, dim: int, seed: int) -> list[list[int]]:
    """Seeded Rademacher (+-1) hyperplane matrix, shared verbatim by the
    Spark expression and the DuckDB oracle so buckets match bit-for-bit."""
    rng = np.random.RandomState(seed)
    return rng.choice([-1, 1], size=(bits, dim)).astype(int).tolist()


def lsh_bucket(
    df: DataFrame,
    bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """LSH bucket id per vector.

    ``seed=None``: axis-aligned sign bits of the first ``bits`` dims
    (``bucket = sum_b (v[b] > 0) << b``) — kept as the zero-config fallback,
    but correlated dims degrade its recall.

    ``seed`` given (needs ``dim``): seeded random-hyperplane (Rademacher
    SimHash for cosine) buckets — ``bit b = <qvec, r_b> > 0`` with r_b in
    {-1,+1}^dim from ``hyperplane_signs(bits, dim, seed)``. Strictly better
    partitioning under correlated dimensions (VERDICT r1 #10); all
    arithmetic is exact integer dots on the quantized vectors, so the
    DuckDB twin reproduces buckets exactly from the same sign matrix.
    """
    if seed is not None:
        if dim is None:
            raise ValueError("hyperplane LSH needs the embedding dim")
        signs_t = np.array(hyperplane_signs(bits, dim, seed), dtype=np.int64).T
        shifts = np.arange(bits, dtype=np.int64)
        src = df if "qvec" in df.columns else quantized(df, vec_col)

        # The bits x dim projection is ~1000 multiply-adds per row: Spark's
        # higher-order functions (aggregate/zip_with) are NOT whole-stage-
        # codegen'd (interpreted, measured ~1 ms/row), and the unrolled
        # generated-SQL codegen formulation measured 1.7x SLOWER here at
        # sf0.1 — confirmed decisively by the round-5 corpus-scale A/B
        # (tools/ivf_assign_ab.py, 2M rows x dim 64 x 16 keys, local[16]):
        # warm scan 34M rows/s (matmul UDF) vs 7.7M rows/s (unrolled expr),
        # 4.4x, AND a smaller one-time driver constant (6.0 s vs 12.9 s
        # plan-analysis + Janino compile of the ~1000-term tree). One
        # vectorized int64 matmul beats codegen'd scalar chains at every
        # scale for this shape. Exactness is preserved (int64, no floats).
        @F.pandas_udf("long")
        def bucket_udf(qv: pd.Series) -> pd.Series:
            m = np.array(qv.tolist(), dtype=np.int64)  # (n, dim)
            dots = m @ signs_t  # (n, bits), exact
            return pd.Series(((dots > 0).astype(np.int64) << shifts).sum(axis=1))

        return src.withColumn("bucket", bucket_udf(F.col("qvec")))
    # unrolled sum of `bits` when-terms (bits <= ~16, so the tree is
    # tiny). NOT F.aggregate over F.sequence: besides being interpreted
    # rather than codegen'd, the lambda formulation hits a Spark
    # binding bug when both sides of a join carry the structurally
    # identical expression with different attribute ids
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at BindReferences — found by
    # the r8 axis-multiprobe bench arm, latent in every prior
    # axis-aligned lsh_topk call with a broadcast query side)
    bucket = F.lit(0).cast("long")
    for b in range(bits):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), b + 1) > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return df.withColumn("bucket", bucket)


def _multiprobe_udf(signs_t, bits: int, depth: int, budget: int):
    """array<long> of probe buckets per query vector, margin-ordered
    multi-probe (the Lv et al. 2007 shape): the buckets most likely to
    hold a missed neighbor are the base bucket with its LOWEST-|margin|
    hyperplane bits flipped. Flip sets of size <= ``depth`` over the
    ``w`` smallest-margin bits are scored by sum of squared margins and
    the best ``budget`` kept (plus the base bucket, always first).

    ``signs_t=None`` (r8, VERDICT r7 #7) is the axis-aligned fold: bit
    ``b``'s hyperplane is ``v[b] = 0``, so the margin is the exact
    quantized ``|v[b]|`` — identical machinery with the projection
    replaced by ``m[:, :bits]`` (an implicit identity sign matrix).

    Fully vectorized int64 numpy per Arrow batch: with C the fixed
    (ncombos x w) subset indicator over margin RANKS, scores =
    sorted_margins^2 @ C.T and — because a flip set picks distinct bits —
    XOR masks = (1 << rank_to_bit) @ C.T. Exact integer end-to-end, so a
    numpy twin reproduces the probe sequence bit-for-bit (pinned in
    tests)."""
    from itertools import combinations

    w = min(bits, 12)
    combos = [c for r in range(1, depth + 1) for c in combinations(range(w), r)]
    C = np.zeros((len(combos), w), dtype=np.int64)
    for i, c in enumerate(combos):
        C[i, list(c)] = 1
    shifts = np.arange(bits, dtype=np.int64)
    budget = min(int(budget), len(combos))

    @F.pandas_udf("array<long>")
    def probe_buckets(qv: pd.Series) -> pd.Series:
        m = np.array(qv.tolist(), dtype=np.int64)  # (n, dim)
        dots = m[:, :bits] if signs_t is None else m @ signs_t  # exact
        base = ((dots > 0).astype(np.int64) << shifts).sum(axis=1)
        mg = np.abs(dots)
        order = np.argsort(mg, axis=1, kind="stable")[:, :w]  # rank -> bit
        mg_sorted = np.take_along_axis(mg, order, axis=1)
        scores = (mg_sorted * mg_sorted) @ C.T  # (n, ncombos)
        masks = (np.int64(1) << order) @ C.T  # distinct bits: sum == OR
        top = np.argsort(scores, axis=1, kind="stable")[:, :budget]
        flips = np.take_along_axis(masks, top, axis=1)
        bucket_lists = np.concatenate(
            [base[:, None], base[:, None] ^ flips], axis=1
        )
        return pd.Series(list(bucket_lists))

    return probe_buckets


def lsh_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int | None = None,
    dim: int | None = None,
    probes: int = 0,
    probe_budget: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket (equi-join
    instead of a full scan); exact integer re-rank inside the candidates.
    Recall grows with fewer bits / added probe buckets; exactness is NOT
    guaranteed — that is the documented trade of the scale path. Pass
    ``seed``+``dim`` for random-hyperplane buckets (better recall under
    correlated dims). ``probes=1`` is classic multi-probe: the query side
    also probes every 1-bit-flip bucket (``bits+1`` equi-join keys per
    query — still no scan of the data side), rescuing neighbors that fall
    just across one hyperplane.

    ``probes>=2`` (VERDICT r6 #8) is margin-ordered multi-probe: flip
    sets of up to ``probes`` of the query's lowest-|margin| hyperplane
    bits, scored by sum of squared margins, best ``probe_budget``
    buckets kept (default ``4*bits``; capped by the combo space). A
    neighbor across TWO close hyperplanes is reachable without halving
    ``bits`` (which would square every bucket's occupancy) — probe count
    buys recall linearly where fewer bits buys it exponentially in
    candidate volume. Works on BOTH hash families (r8, VERDICT r7 #7):
    hyperplane margins are the exact int64 dots; axis-aligned margins
    are the exact quantized ``|v[b]|`` (same machinery, identity sign
    matrix). Still an equi-join on bucket — data side never rehashed,
    never scanned.

    ``broadcast_queries`` (VERDICT r2 #2): True is the dims-sized-Q plan
    (query side broadcast, data side never shuffled). For large Q — "top-k
    every vector against the corpus" — a broadcast of Q x (bits+1) exploded
    rows would flood every executor; False shuffles BOTH sides on the
    bucket key instead (shuffle-hash equi-join, each bucket meets on one
    partition), the same split bbox_join -> point_box_join_cells makes for
    boxes. Results are identical either way."""
    d = lsh_bucket(quantized(data, vec_col), bits, id_col, vec_col, seed, dim).select(
        F.col(id_col).alias("n_id"), F.col("qvec").alias("n_qvec"), "bucket"
    )
    q = lsh_bucket(quantized(queries, vec_col), bits, id_col, vec_col, seed, dim).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("q_qvec"), "bucket"
    )
    if probes >= 2:
        if seed is not None:
            if dim is None:
                raise ValueError("hyperplane multiprobe needs the "
                                 "embedding dim")
            signs_t = np.array(
                hyperplane_signs(bits, dim, seed), dtype=np.int64
            ).T
        else:
            signs_t = None  # axis-aligned: margins are the first dims
        budget = 4 * bits if probe_budget is None else int(probe_budget)
        mp = _multiprobe_udf(signs_t, bits, int(probes), budget)
        q = q.select(
            "query_id", "q_qvec", F.explode(mp(F.col("q_qvec"))).alias("bucket")
        )
    elif probes:
        probe_buckets = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)],
        )
        q = q.select(
            "query_id", "q_qvec", F.explode(probe_buckets).alias("bucket")
        )
    if broadcast_queries:
        joined = d.join(F.broadcast(q), "bucket")
        scored = joined.where(F.col("n_id") != F.col("query_id")).withColumn(
            "ip", _dot(F.col("q_qvec"), F.col("n_qvec"))
        )
        return topk_per_query(scored, k)
    # Large-Q path (r9, guide §4.2): both sides shuffle on the bucket key
    # ANYWAY, so the candidate scoring runs as ONE exact int64 Gram matmul
    # per bucket in an Arrow cogroup stage instead of an interpreted
    # 64-element dot fold per candidate pair (~6.2M candidates at
    # sf1.0/bits=6: 12-15 -> ~3 s, identical rows). Each bucket emits only
    # its per-query local top-k (deterministic (-ip, n_id) order, self
    # excluded) — the exact survivor set the old plan's partition-partial
    # phase kept — and the unchanged global window reranks. numpy int64
    # wraps on overflow exactly like the JVM long arithmetic it replaces.
    import pandas as pd

    id_t = data.schema[id_col].dataType.simpleString()

    def _bucket_topk(key, dpdf: pd.DataFrame, qpdf: pd.DataFrame) -> pd.DataFrame:
        if len(dpdf) == 0 or len(qpdf) == 0:
            return pd.DataFrame({"query_id": qpdf["query_id"][:0],
                                 "n_id": dpdf["n_id"][:0],
                                 "ip": np.array([], dtype=np.int64)})
        D = np.array(dpdf["n_qvec"].tolist(), dtype=np.int64)
        Q = np.array(qpdf["q_qvec"].tolist(), dtype=np.int64)
        G = Q @ D.T
        n_ids = dpdf["n_id"].to_numpy()
        q_ids = qpdf["query_id"].to_numpy()
        out_q, out_n, out_ip = [], [], []
        for i in range(len(q_ids)):
            ips = G[i]
            sel = np.flatnonzero(n_ids != q_ids[i])
            if len(sel) == 0:
                continue
            # primary -ip desc, secondary n_id asc (lexsort: last key primary)
            o = np.lexsort((n_ids[sel], -ips[sel]))[:k]
            take = sel[o]
            out_q.extend([q_ids[i]] * len(take))
            out_n.extend(n_ids[take])
            out_ip.extend(ips[take])
        return pd.DataFrame({"query_id": out_q, "n_id": out_n, "ip": out_ip})

    scored = (
        d.groupBy("bucket")
        .cogroup(q.groupBy("bucket"))
        .applyInPandas(_bucket_topk, f"query_id {id_t}, n_id {id_t}, ip long")
    )
    return topk_per_query(scored, k)


def train_ivf_centroids(x: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic seeded Lloyd's k-means (driver-side, runs on a sample)."""
    rng = np.random.RandomState(seed)
    c = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            m = x[a == j]
            if len(m):
                c[j] = m.mean(axis=0)
    return c


def quantized_centroids(centroids: np.ndarray) -> np.ndarray:
    """Centroids on the same fixed-point grid as ``quantized`` vectors —
    makes the nearest-list metric pure int64 (engine-portable, tie-stable:
    ``argmin(|c|^2 - 2 q.c)`` with first-minimum = lowest list id)."""
    return np.floor(centroids * QUANT + 0.5).astype(np.int64)


def _packed_centroid_scores_sql(qcent: np.ndarray, qvec_col: str) -> str:
    """SQL text for the per-centroid distance scores ``|c_j|^2 - 2 q.c_j``
    packed as ``score * nlist + j`` so ties resolve to the lowest list id
    exactly.

    **Measured A/B loser — kept as the JVM twin, not the production path.**
    Round 4 shipped this as the corpus-scan assignment (VERDICT r3 #4 asked
    for a Python-free scan); the round-5 corpus-scale A/B
    (``tools/ivf_assign_ab.py``, 2M rows, dim=64, nlist=16, local[16])
    settled the contradiction with ``lsh_bucket``'s measurement: the Arrow
    int64-matmul UDF (``_assign_udf``) wins on BOTH axes — warm scan
    34M rows/s vs 7.7M rows/s (4.4x) and one-time driver constant 6.0 s vs
    12.9 s (plan analysis + Janino compile of the ~1000-term tree). The
    production ``ivf_topk`` therefore uses ``_assign_udf``/``_probe_udf``;
    this generator remains for the expr<->numpy parity property test and
    the A/B tool. No crossover exists at this shape; a much smaller
    ``nlist*dim`` product (<~64 terms, where one batch matmul stops
    amortizing Arrow transfer) is the only regime where the expr could win.

    Within the expr formulation the two earlier choices still hold:
    unrolled multiply-add chains (not CodegenFallback higher-order
    functions), and ONE ``F.expr`` SQL string (Column algebra costs ~12 s
    of py4j round-trips for the same tree).
    """
    nlist, dim = qcent.shape
    c_norm = (qcent * qcent).sum(axis=1)
    parts = []
    for j in range(nlist):
        terms = " + ".join(
            f"{qvec_col}[{i}] * {int(qcent[j, i])}L"
            for i in range(dim)
            if qcent[j, i] != 0
        ) or "0L"
        parts.append(f"({int(c_norm[j])}L - 2L * ({terms})) * {nlist}L + {j}L")
    return "array(" + ", ".join(parts) + ")"


def _assign_expr(qcent: np.ndarray, qvec_col: str = "qvec"):
    """qvec -> nearest-centroid list id, pure JVM (first-minimum = lowest
    list id, matching np.argmin semantics; pmod because packed scores go
    negative and Spark ``%`` is remainder)."""
    packed = _packed_centroid_scores_sql(qcent, qvec_col)
    return F.expr(f"cast(pmod(array_min({packed}), {len(qcent)}) as int)")


def _probe_lists_expr(qcent: np.ndarray, nprobe: int, qvec_col: str = "qvec"):
    """qvec -> the nprobe nearest list ids in distance order, pure JVM
    (sorted packed scores; unique packing makes the order total). A/B
    loser like ``_assign_expr`` — kept for the parity test."""
    packed = _packed_centroid_scores_sql(qcent, qvec_col)
    return F.expr(
        f"transform(slice(array_sort({packed}), 1, {int(nprobe)}), "
        f"v -> cast(pmod(v, {len(qcent)}) as int))"
    )


def _centroid_scores_np(qcent: np.ndarray, m: np.ndarray) -> np.ndarray:
    """(n, nlist) exact int64 distance scores ``|c_j|^2 - 2 q.c_j`` for a
    batch of quantized vectors — one matmul, shared by assign and probe."""
    cnorm = (qcent * qcent).sum(axis=1)  # (nlist,)
    return cnorm[None, :] - 2 * (m @ np.ascontiguousarray(qcent.T))


def _assign_udf(qcent: np.ndarray):
    """qvec -> nearest-centroid list id via one Arrow-batched int64 matmul.

    The measured production path (tools/ivf_assign_ab.py, round 5): 4.4x
    the unrolled-codegen expr's warm scan rate and half its driver
    constant at the (nlist=16, dim=64) shape — see
    ``_packed_centroid_scores_sql`` for the full A/B record. Semantics are
    bit-identical to ``_assign_expr``: exact int64 arithmetic,
    first-minimum tie-break (``np.argmin``) == lowest list id (pinned by
    ``test_ivf_assign_expr_matches_numpy_argmin`` and the A/B tool's
    full-corpus assignment-equality assert).
    """
    qc = qcent.copy()

    @F.pandas_udf("int")
    def assign(qv: pd.Series) -> pd.Series:
        m = np.array(qv.tolist(), dtype=np.int64)  # (n, dim)
        return pd.Series(_centroid_scores_np(qc, m).argmin(axis=1).astype(np.int32))

    return assign


def _probe_udf(qcent: np.ndarray, nprobe: int):
    """qvec -> the nprobe nearest list ids in distance order (query side,
    same matmul scores; stable argsort + packed tiebreak on list id matches
    ``_probe_lists_expr``'s total order exactly)."""
    qc = qcent.copy()
    nlist = len(qcent)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(qv: pd.Series) -> pd.Series:
        m = np.array(qv.tolist(), dtype=np.int64)
        # pack score*nlist+j like the expr so the sort key is total and ties
        # resolve to the lowest list id; argsort positions ARE the list ids
        packed = _centroid_scores_np(qc, m) * nlist + np.arange(nlist, dtype=np.int64)
        idx = np.argsort(packed, axis=1)[:, : int(nprobe)]
        return pd.Series(list(idx.astype(np.int32)))

    return probe


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 2,
    seed: int = 7,
    train_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k (the inverted-file ANN scale path).

    Train: deterministic seeded k-means over a bounded sample (driver-side
    numpy — the coarse quantizer is dims-sized by construction). Assign:
    every vector gets its nearest-centroid ``list`` via one Arrow-batched
    matmul. Search: each query probes its ``nprobe`` nearest lists
    (exploded), candidates come from the list equi-join — the data side is
    scanned once and shuffled on a bounded key space — and the exact
    integer inner-product re-rank picks the top k.

    At 10^12 rows the assignment is a narrow pass, the join key space is
    ``nlist``, and recall tunes with ``nprobe`` — the standard IVF trade.
    Exactness is NOT guaranteed (use ``brute_force_topk`` as the oracle).
    """
    sample = (
        data.orderBy(id_col).limit(train_size).select(vec_col).toPandas()[vec_col].tolist()
    )
    centroids = train_ivf_centroids(np.array(sample, dtype=np.float64), nlist, seed)
    qcent = quantized_centroids(centroids)
    # assignment + probing are Arrow-batched int64 matmuls — the measured
    # winner over the unrolled-codegen expr at every scale (4.4x warm scan,
    # half the driver constant; tools/ivf_assign_ab.py, round 5). The
    # narrow UDF stage carries only qvec; the join stays an equi-join on
    # the bounded nlist key space.
    d = quantized(data, vec_col).select(
        F.col(id_col).alias("n_id"),
        F.col("qvec").alias("n_qvec"),
        _assign_udf(qcent)(F.col("qvec")).alias("list_id"),
    )
    q = quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.explode(_probe_udf(qcent, int(nprobe))(F.col("qvec"))).alias("list_id"),
    )
    scored = (
        d.join(q, "list_id")
        .where(F.col("n_id") != F.col("query_id"))
        .withColumn("ip", _dot(F.col("q_qvec"), F.col("n_qvec")))
    )
    return topk_per_query(scored, k).withColumn("rank", F.col("rank").cast("long"))


def train_pq_codebooks(x: np.ndarray, m: int, ksub: int, seed: int) -> np.ndarray:
    """Product-quantization codebooks: the dim-D space split into ``m``
    subspaces of D/m dims, each with its own ``ksub``-codeword seeded
    k-means (reuses the deterministic Lloyd's trainer). -> (m, ksub, D/m)
    float64."""
    d = x.shape[1] // m
    if d * m != x.shape[1]:
        raise ValueError(f"dim {x.shape[1]} not divisible into {m} subspaces")
    return np.stack(
        [train_ivf_centroids(x[:, i * d : (i + 1) * d], ksub, seed + i) for i in range(m)]
    )


def _pq_encode_udf(qbooks: np.ndarray):
    """qvec -> m PQ codes (nearest codeword per subspace) via one int64
    matmul per subspace — the same Arrow-batch formulation the IVF assign
    A/B selected (BENCH/IVF_ASSIGN_AB.md). Exact integer euclidean
    ``|q_sub - c|^2`` with first-minimum (lowest code) tie-break, so the
    DuckDB twin reproduces codes bit-for-bit from the same codebook
    literals."""
    qb = qbooks.copy()  # (m, ksub, d) int64
    m, ksub, d = qb.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(qv: pd.Series) -> pd.Series:
        X = np.array(qv.tolist(), dtype=np.int64)
        codes = np.empty((len(X), m), dtype=np.int32)
        ar = np.arange(ksub, dtype=np.int64)
        for i in range(m):
            sub = X[:, i * d : (i + 1) * d]
            cn = (qb[i] * qb[i]).sum(axis=1)
            qn = (sub * sub).sum(axis=1)
            full = qn[:, None] + cn[None, :] - 2 * (sub @ qb[i].T)  # |q-c|^2
            codes[:, i] = np.argmin(full * ksub + ar, axis=1).astype(np.int32)
        return pd.Series(list(codes))

    return enc


def pq_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    seed: int = 7,
    train_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | str | None = "auto",
) -> DataFrame:
    """Product-quantization ANN top-k — the memory-compression scale path.

    At 10^12 vectors the raw embeddings (D float32/64 per row) cannot be
    scanned per query; PQ stores ``m`` byte-sized codes per vector (64x+
    compression at D=64, m=8) and scores candidates with an
    asymmetric-distance (ADC) lookup: per query, an (m x ksub) table of
    exact integer ``|q_sub - c|^2`` distances is built once, and a
    candidate's approximate distance is the sum of m table lookups over
    its codes — no decoded vector is ever touched at scan time. Here the
    LUT sum is a JVM ``zip_with``/``aggregate`` over the broadcast
    per-query tables (m=8 lookups/row — far below the measured
    higher-order-function crossover), so the corpus scan reads ONLY the
    codes column. Train/encode mirror the IVF pattern: bounded driver-side
    seeded k-means per subspace, one Arrow matmul encode pass.

    Exact integer arithmetic end-to-end (quantized vectors and codebooks)
    makes codes, LUTs and ADC scores engine-portable — the DuckDB oracle
    reproduces every rank. Approximate by design; ADC cannot rank
    within-cell neighbors (tightly clustered vectors share codes and tie),
    which is why production IVF-PQ systems refine: ``rerank=R`` keeps the
    ADC top-R per query and exact-scores ONLY those candidates (one more
    corpus scan pruned to id+vector, broadcast-joined against the tiny
    candidate set — at deployment scale this is an id-indexed fetch of
    Q*R rows, not a scan). Recall with refinement is pinned >= 0.9 by
    tests. Ties break (score, n_id), deterministic either way.

    ``rerank="auto"`` — the DEFAULT (VERDICT r6 #7: rerank=None at
    realistic occupancy silently returns recall~0.35 order) — measures
    the tie cell directly: ADC cannot rank rows sharing an identical
    ``codes`` tuple, so one count job takes the max code-cell occupancy
    over the encoded corpus and sets R = max(4k, that). Unlike IVF-PQ
    there is no list structure to estimate from, but the PQ codes ARE
    the cells — the statistic is exact, not a proxy. Pass ``None`` for
    the raw bit-exact ADC order (the DuckDB oracle's path)."""
    if isinstance(rerank, str) and rerank != "auto":
        raise ValueError(f"rerank must be an int, None, or 'auto'; got {rerank!r}")
    sample = (
        data.orderBy(id_col).limit(train_size).select(vec_col).toPandas()[vec_col].tolist()
    )
    books = train_pq_codebooks(np.array(sample, dtype=np.float64), m, ksub, seed)
    qbooks = quantized_centroids(books.reshape(m * ksub, -1)).reshape(books.shape[0], ksub, -1)
    d = quantized(data, vec_col).select(
        F.col(id_col).alias("n_id"),
        _pq_encode_udf(qbooks)(F.col("qvec")).alias("codes"),
    )
    if rerank == "auto":
        # One scalars-only count job over the codes column. Deliberately
        # NOT persisted: the function returns a lazy DataFrame, so a
        # persist here could never be released after the caller evaluates
        # — the exact leak class VERDICT r6 #3 closed elsewhere. The cost
        # is one extra Arrow encode pass for the count job; at deployment
        # codes are a stored column and occupancy is catalog metadata, so
        # neither exists there.
        occ = (
            d.groupBy("codes").count().agg(F.max("count")).collect()[0][0]
        )
        rerank = max(4 * int(k), int(occ or 0))
    # per-query LUTs, driver-side (queries are dims-sized like the other
    # broadcast ANN paths): luts[i][j] = |q_sub_i - c_ij|^2, exact int64
    qrows = quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"), "qvec"
    ).toPandas()
    msub = qbooks.shape[2]
    lut_rows = []
    for qid, qv in zip(qrows["query_id"], qrows["qvec"]):
        q = np.asarray(list(qv), dtype=np.int64)
        luts = []
        for i in range(m):
            sub = q[i * msub : (i + 1) * msub]
            diff = sub[None, :] - qbooks[i]
            luts.append([int(v) for v in (diff * diff).sum(axis=1)])
        lut_rows.append((qid, luts))
    spark = data.sparkSession
    luts_df = spark.createDataFrame(
        # query_id values come from the QUERIES side — type the column from
        # it (a string-keyed queries df against a bigint-keyed corpus would
        # otherwise fail createDataFrame)
        lut_rows, f"query_id {dict(queries.dtypes)[id_col]}, luts array<array<bigint>>"
    )
    scored = (
        d.crossJoin(F.broadcast(luts_df))
        .where(F.col("n_id") != F.col("query_id"))
        .withColumn(
            "adc",
            F.expr(
                "aggregate(zip_with(codes, luts, (c, l) -> element_at(l, c + 1)), "
                "0L, (acc, v) -> acc + v)"
            ),
        )
        .withColumn("ip", -F.col("adc"))  # topk folds by ip desc == adc asc
    )
    if not rerank:
        return (
            topk_per_query(scored, k)
            .select("query_id", "n_id", (-F.col("ip")).alias("adc"), F.col("rank").cast("long"))
        )
    cands = topk_per_query(scored, int(rerank)).select("query_id", "n_id")
    dq = quantized(data, vec_col).select(
        F.col(id_col).alias("n_id"), F.col("qvec").alias("n_qvec")
    )
    qq = quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("q_qvec")
    )
    refined = (
        dq.join(F.broadcast(cands), "n_id")  # corpus scanned once, no shuffle
        .join(F.broadcast(qq), "query_id")
        .withColumn(
            "d2",
            F.expr(
                "aggregate(zip_with(q_qvec, n_qvec, (a, b) -> (a - b) * (a - b)), "
                "0L, (acc, v) -> acc + v)"
            ),
        )
        .withColumn("ip", -F.col("d2"))
    )
    return (
        topk_per_query(refined, k)
        .select("query_id", "n_id", (-F.col("ip")).alias("d2"), F.col("rank").cast("long"))
    )


def train_ivfpq(
    x: np.ndarray, nlist: int, m: int, ksub: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Train the composed IVF-PQ index from one sample: coarse k-means
    centroids, then PQ codebooks over the RESIDUALS ``x - centroid`` —
    the assignment used for the residuals is the same exact-int64 metric
    the engine (and the DuckDB twin) applies at encode time, so training
    and encoding see the same partition of the sample.

    Returns ``(qcent (nlist, D) int64, qbooks (m, ksub, D/m) int64)`` on
    the shared fixed-point grid.
    """
    cent = train_ivf_centroids(x, nlist, seed)
    qcent = quantized_centroids(cent)
    qx = np.floor(x * QUANT + 0.5).astype(np.int64)
    assign = _centroid_scores_np(qcent, qx).argmin(axis=1)
    books = train_pq_codebooks(x - cent[assign], m, ksub, seed)
    qbooks = quantized_centroids(books.reshape(m * ksub, -1)).reshape(m, ksub, -1)
    return qcent, qbooks


def _ivfpq_encode_udf(qcent: np.ndarray, qbooks: np.ndarray):
    """qvec -> (nearest IVF list, m residual-PQ codes) in ONE Arrow pass —
    a single python stage per corpus scan (two chained UDF stages run two
    python workers per task with the JVM relaying Arrow between them).
    Residual = ``qvec - qcent[list]`` in exact int64; per-subspace argmin
    with the packed lowest-code tie-break, bit-identical to the SQL twin."""
    qc, qb = qcent.copy(), qbooks.copy()
    m, ksub, d = qb.shape

    @F.pandas_udf("list_id int, codes array<integer>")
    def enc(qv: pd.Series) -> pd.DataFrame:
        X = np.array(qv.tolist(), dtype=np.int64)
        lists = _centroid_scores_np(qc, X).argmin(axis=1)
        R = X - qc[lists]
        codes = np.empty((len(X), m), dtype=np.int32)
        ar = np.arange(ksub, dtype=np.int64)
        for i in range(m):
            sub = R[:, i * d : (i + 1) * d]
            cn = (qb[i] * qb[i]).sum(axis=1)
            qn = (sub * sub).sum(axis=1)
            full = qn[:, None] + cn[None, :] - 2 * (sub @ qb[i].T)
            codes[:, i] = np.argmin(full * ksub + ar, axis=1).astype(np.int32)
        return pd.DataFrame({"list_id": lists.astype(np.int32), "codes": list(codes)})

    return enc


def auto_rerank(n_rows: int, nlist: int, k: int) -> int:
    """The measured refinement rule from BENCH/ANN_RECALL.md: ADC cannot
    rank within a quantization cell (tightly clustered vectors share codes
    and tie), so at 200k rows a rerank budget scaled to k collapsed recall
    to 0.35-0.45 while rerank >= cell occupancy restored 1.0 at ~2% extra
    wall. The budget must therefore cover the EXPECTED OCCUPANCY of one
    probed list (ceil(N / nlist)) — it scales with the corpus, not with k.
    The 4k floor keeps tiny corpora from degenerating to rerank < k."""
    return max(4 * int(k), -(-int(n_rows) // int(nlist)))


def ivfpq_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    seed: int = 7,
    train_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | str | None = "auto",
) -> DataFrame:
    """Composed IVF-PQ ANN top-k — the actual 10^12-vector architecture
    (VERDICT r5 #1): PQ codes stored per IVF list, ADC scans ONLY the
    probed lists. ``ivf_topk`` bounds the *candidates* but re-ranks with
    raw vectors (a memory-scale problem at 10^12 rows); ``pq_topk``
    compresses the *vectors* but ADC-scans the whole corpus. This
    operator composes both halves: the corpus pass emits
    ``(list, codes)`` in one Arrow stage (codes are residual-encoded —
    ``q - centroid`` — the FAISS IVFPQ formulation, which keeps the
    codebook error centered per cell), queries build one exact-int64
    LUT *per probed list* driver-side (Q and nprobe are dims-sized),
    and candidate scoring is the bounded ``list_id`` equi-join followed
    by a JVM ``zip_with``/``aggregate`` LUT-sum over the codes column
    only. Per 100 TB scan: bytes read = m bytes/vector over nprobe/nlist
    of the corpus — both compression AND pruning, multiplicative.

    Exact integer arithmetic end-to-end: assignment, residuals, codes,
    LUTs and ADC sums land on the shared fixed-point grid, so the DuckDB
    twin reproduces every rank bit-for-bit. ``rerank=R`` refines the ADC
    top-R per query with exact distances (the deployment-shape id-indexed
    fetch), pinned recall >= 0.9 in tests. Ties break (score, n_id).

    ``rerank="auto"`` — the DEFAULT (VERDICT r6 #7: at realistic
    occupancy rerank=None silently returns recall~0.45 order) — applies
    the measured occupancy rule (``auto_rerank``: R = max(4k,
    ceil(N/nlist)), one count job — at deployment N is catalog
    metadata). Pass ``None`` for the raw bit-exact ADC order (the DuckDB
    oracle's path).
    """
    if rerank == "auto":
        rerank = auto_rerank(data.count(), nlist, k)
    elif isinstance(rerank, str):
        raise ValueError(f"rerank must be an int, None, or 'auto'; got {rerank!r}")
    qcent, qbooks = _train_ivfpq_from(data, nlist, m, ksub, seed, train_size, id_col, vec_col)
    enc = _ivfpq_encode_udf(qcent, qbooks)
    d = (
        quantized(data, vec_col)
        .select(F.col(id_col).alias("n_id"), enc(F.col("qvec")).alias("e"))
        .select("n_id", F.col("e.list_id").alias("list_id"), F.col("e.codes").alias("codes"))
    )
    lut_rows = _ivfpq_lut_rows(queries, qcent, qbooks, nprobe, id_col, vec_col)
    luts_df = _ivfpq_luts_df(data.sparkSession, lut_rows, dict(queries.dtypes)[id_col])
    return _ivfpq_score_topk(
        d, luts_df, k, rerank, data, queries, id_col=id_col, vec_col=vec_col
    )


def _train_ivfpq_from(
    data: DataFrame, nlist: int, m: int, ksub: int, seed: int,
    train_size: int, id_col: str, vec_col: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic sample (orderBy id, limit) -> ``train_ivfpq``."""
    sample = (
        data.orderBy(id_col).limit(train_size).select(vec_col).toPandas()[vec_col].tolist()
    )
    return train_ivfpq(np.array(sample, dtype=np.float64), nlist, m, ksub, seed)


def _ivfpq_lut_rows(
    queries: DataFrame, qcent: np.ndarray, qbooks: np.ndarray, nprobe: int,
    id_col: str, vec_col: str,
) -> list[tuple]:
    """Per-(query, probed list) residual LUT rows, driver-side numpy.

    Queries are dims-sized (every broadcast ANN path here makes the same
    assumption): probe + residual LUTs in driver numpy, then broadcast."""
    qrows = quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"), "qvec"
    ).toPandas()
    m, _ksub, dsub = qbooks.shape
    nlist = qcent.shape[0]
    qm = np.array(qrows["qvec"].tolist(), dtype=np.int64)
    packed = _centroid_scores_np(qcent, qm) * nlist + np.arange(nlist, dtype=np.int64)
    probe_ids = np.argsort(packed, axis=1)[:, : int(nprobe)]
    lut_rows = []
    for qi, qid in enumerate(qrows["query_id"]):
        for lid in probe_ids[qi]:
            r = qm[qi] - qcent[lid]
            luts = []
            for i in range(m):
                diff = r[i * dsub : (i + 1) * dsub][None, :] - qbooks[i]
                luts.append([int(v) for v in (diff * diff).sum(axis=1)])
            lut_rows.append((qid, int(lid), luts))
    return lut_rows


def _ivfpq_luts_df(spark, lut_rows: list[tuple], qid_ddl: str) -> DataFrame:
    # query_id typed from the QUERIES side (see pq_topk)
    return spark.createDataFrame(
        lut_rows, f"query_id {qid_ddl}, list_id int, luts array<array<bigint>>"
    )


def _ivfpq_score_topk(
    d: DataFrame, luts_df: DataFrame, k: int, rerank: int | None,
    data: DataFrame | None, queries: DataFrame | None,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ADC scoring over encoded candidates + optional exact refinement —
    the shared back half of ``ivfpq_topk`` and ``IvfPqIndex.topk`` (one
    code path => the indexed query is bit-identical by construction)."""
    scored = (
        d.join(F.broadcast(luts_df), "list_id")
        .where(F.col("n_id") != F.col("query_id"))
        .withColumn(
            "adc",
            F.expr(
                "aggregate(zip_with(codes, luts, (c, l) -> element_at(l, c + 1)), "
                "0L, (acc, v) -> acc + v)"
            ),
        )
        .withColumn("ip", -F.col("adc"))
    )
    if not rerank:
        return (
            topk_per_query(scored, k)
            .select("query_id", "n_id", (-F.col("ip")).alias("adc"), F.col("rank").cast("long"))
        )
    cands = topk_per_query(scored, int(rerank)).select("query_id", "n_id")
    dq = quantized(data, vec_col).select(
        F.col(id_col).alias("n_id"), F.col("qvec").alias("n_qvec")
    )
    qq = quantized(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("q_qvec")
    )
    refined = (
        dq.join(F.broadcast(cands), "n_id")
        .join(F.broadcast(qq), "query_id")
        .withColumn(
            "d2",
            F.expr(
                "aggregate(zip_with(q_qvec, n_qvec, (a, b) -> (a - b) * (a - b)), "
                "0L, (acc, v) -> acc + v)"
            ),
        )
        .withColumn("ip", -F.col("d2"))
    )
    return (
        topk_per_query(refined, k)
        .select("query_id", "n_id", (-F.col("ip")).alias("d2"), F.col("rank").cast("long"))
    )


IVFPQ_MANIFEST = "ivfpq_index.json"


def write_ivfpq_index(
    data: DataFrame,
    path: str,
    nlist: int = 16,
    m: int = 8,
    ksub: int = 16,
    seed: int = 7,
    train_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train + encode ONCE, persist the serve-many index shape (VERDICT r7
    #2): codes parquet partitioned by ``list_id`` + a JSON manifest holding
    the trained centroids/codebooks (exact int64 grid) and the corpus row
    count. At query time the probed lists become a *partition filter* on
    the codes scan — files read ∝ nprobe/nlist — which is what makes the
    nprobe/nlist I/O pruning in ``ivfpq_topk``'s docstring real at the
    scan instead of join-side. The train/encode/count constants move to
    build time where they belong (ad-hoc ``ivfpq_topk`` pays them per
    call). Same commit discipline as the pyramid catalog: codes land
    first, the manifest last — an index is open-able iff its manifest
    exists."""
    import json
    import os

    qcent, qbooks = _train_ivfpq_from(data, nlist, m, ksub, seed, train_size, id_col, vec_col)
    enc = _ivfpq_encode_udf(qcent, qbooks)
    codes = (
        quantized(data, vec_col)
        .select(F.col(id_col).alias("n_id"), enc(F.col("qvec")).alias("e"))
        .select("n_id", F.col("e.list_id").alias("list_id"), F.col("e.codes").alias("codes"))
    )
    codes.write.mode("overwrite").partitionBy("list_id").parquet(f"{path}/codes")
    # row count from the just-written codes (no second pass over the corpus)
    n_rows = data.sparkSession.read.parquet(f"{path}/codes").count()
    doc = {
        "format": "ivfpq-v1",
        "nlist": int(nlist), "m": int(m), "ksub": int(ksub),
        "seed": int(seed), "train_size": int(train_size),
        "dim": int(qcent.shape[1]), "n_rows": int(n_rows),
        "id_col": id_col, "vec_col": vec_col,
        "id_ddl": dict(data.dtypes)[id_col],
        "centroids": [[int(v) for v in row] for row in qcent],
        "codebooks": [
            [[int(v) for v in c] for c in book] for book in qbooks
        ],
    }
    os.makedirs(path, exist_ok=True)
    tmp = f"{path}/{IVFPQ_MANIFEST}.tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, f"{path}/{IVFPQ_MANIFEST}")
    return doc


class IvfPqIndex:
    """Opened persisted IVF-PQ index: query-path twin of ``ivfpq_topk``
    minus train/encode/count. ``topk`` reads ONLY the probed ``list_id=``
    partitions (partition pruning — verify with
    ``.explain``'s PartitionFilters / files-read metrics)."""

    def __init__(self, spark, path: str, doc: dict):
        self.spark, self.path, self.doc = spark, path, doc
        self.qcent = np.array(doc["centroids"], dtype=np.int64)
        self.qbooks = np.array(doc["codebooks"], dtype=np.int64)

    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 2,
        rerank: int | str | None = "auto",
        data: DataFrame | None = None,
    ) -> DataFrame:
        """ANN top-k against the stored codes. ``rerank="auto"`` applies the
        measured occupancy rule using the manifest's ``n_rows`` — NO count
        job (the serving shape VERDICT r7 flagged). An int ``rerank``
        requires ``data`` (the raw-vector table) for the exact-refine
        fetch; ``None`` returns the raw bit-exact ADC order (the oracle's
        path, identical ranks to ``ivfpq_topk(rerank=None)``)."""
        doc = self.doc
        if rerank == "auto":
            rerank = auto_rerank(doc["n_rows"], doc["nlist"], k)
        elif isinstance(rerank, str):
            raise ValueError(f"rerank must be an int, None, or 'auto'; got {rerank!r}")
        if rerank and data is None:
            raise ValueError(
                "rerank requires data= (the raw-vector table) for exact refinement"
            )
        lut_rows = _ivfpq_lut_rows(
            queries, self.qcent, self.qbooks, nprobe, doc["id_col"], doc["vec_col"]
        )
        luts_df = _ivfpq_luts_df(self.spark, lut_rows, dict(queries.dtypes)[doc["id_col"]])
        probed = sorted({int(r[1]) for r in lut_rows})
        d = (
            self.spark.read.parquet(f"{self.path}/codes")
            # partition filter: only the probed list_id= directories are read
            .where(F.col("list_id").isin(probed))
            .select("n_id", F.col("list_id").cast("int").alias("list_id"), "codes")
        )
        return _ivfpq_score_topk(
            d, luts_df, k, rerank, data, queries,
            id_col=doc["id_col"], vec_col=doc["vec_col"],
        )


def open_ivfpq_index(spark, path: str) -> IvfPqIndex:
    import json

    with open(f"{path}/{IVFPQ_MANIFEST}") as f:
        doc = json.load(f)
    if doc.get("format") != "ivfpq-v1":
        raise ValueError(f"{path} is not an ivfpq-v1 index")
    return IvfPqIndex(spark, path, doc)


def cosine_near_dup_pairs(
    df: DataFrame, threshold_milli: int = 990, bits: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
    seed: int | None = None, dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH bucket blocking + exact
    integer comparison ``ip^2 * 10^6 >= t^2 * na2 * nb2`` (squared-cosine
    threshold without any float division; sign guarded).

    r9 (guide §4.2 — hand whole batches to vectorized native code): the
    within-bucket pair products run as ONE exact int64 Gram matmul per
    bucket in an Arrow ``applyInPandas`` stage instead of an interpreted
    64-element ``zip_with``/``aggregate`` fold per candidate pair (the
    old plan spent ~13 µs/pair on ~900k candidates at sf1.0: 25 -> ~3 s,
    identical rows; numpy int64 wraps on overflow exactly like the JVM
    long arithmetic it replaces). The exact decimal threshold filter is
    unchanged JVM. Bucket payload memory is m x dim x 8 B per group —
    any bucket big enough to strain a task is already infeasible for the
    all-pairs semantics itself (m^2 output), so the group shape is safe
    wherever the operator is usable at all."""
    import numpy as np
    import pandas as pd

    d = lsh_bucket(quantized(df, vec_col), bits, id_col, vec_col, seed, dim).select(
        F.col(id_col).alias("id"), F.col("qvec"), "bucket"
    )
    id_t = d.schema["id"].dataType.simpleString()

    def _bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {"id_a": pdf["id"][:0], "id_b": pdf["id"][:0],
                 "ip": np.array([], dtype=np.int64),
                 "na2": np.array([], dtype=np.int64),
                 "nb2": np.array([], dtype=np.int64)}
            )
        pdf = pdf.sort_values("id", kind="stable")
        ids = pdf["id"].to_numpy()
        V = np.array(pdf["qvec"].tolist(), dtype=np.int64)
        G = V @ V.T
        n2 = np.diagonal(G)
        iu, ju = np.triu_indices(m, 1)
        return pd.DataFrame(
            {"id_a": ids[iu], "id_b": ids[ju], "ip": G[iu, ju],
             "na2": n2[iu], "nb2": n2[ju]}
        )

    pairs = d.groupBy("bucket").applyInPandas(
        _bucket_pairs,
        f"id_a {id_t}, id_b {id_t}, ip long, na2 long, nb2 long",
    )
    t2 = threshold_milli * threshold_milli  # milli^2 = 1e6 scale
    return pairs.where(
        (F.col("ip") > 0)
        & (
            F.col("ip").cast("decimal(38,0)") * F.col("ip") * 1_000_000
            >= F.lit(t2).cast("decimal(38,0)") * F.col("na2") * F.col("nb2")
        )
    ).select("id_a", "id_b", "ip", "na2", "nb2")
