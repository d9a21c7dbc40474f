"""Dump executed-plan evidence for the scale-critical queries.

Writes BENCH/PLANS.md with ``explain(formatted)`` extracts proving the
optimizations the engine's design claims (SURVEY.md §4): partition pruning
on ``z``, pushed tx/ty filters, broadcast joins on the dims side,
whole-stage codegen spans around the relational work.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark(app="plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = io.StringIO()
    out.write("# BENCH/PLANS — executed-plan evidence (auto-generated)\n\n")

    # 1) pruned pyramid scan: one level + pushed tx/ty filters
    import shutil
    import tempfile

    from pyramidscheme_jl_spark.operators.build import build_pyramid
    from pyramidscheme_jl_spark.operators.read import subset_tiles
    from pyramidscheme_jl_spark.sources.catalog import read_tiles
    from pyramidscheme_jl_spark.sources.synth import IMAGES_DDL, synth_images

    tmp = tempfile.mkdtemp()
    images = spark.createDataFrame(synth_images(G=4), IMAGES_DDL)
    build_pyramid(spark, images, tmp + "/p", G=4, run_id="plans")
    sub = subset_tiles(read_tiles(spark, tmp + "/p"), 0, 512, 0, 512).where("z = 1")
    plan = sub._jdf.queryExecution().executedPlan().toString()
    out.write("## Pruned window scan (subset_tiles @ z=1)\n\n```\n")
    for line in plan.splitlines():
        if any(k in line for k in ("FileScan", "PushedFilters", "PartitionFilters", "ReadSchema")):
            out.write(line.strip()[:400] + "\n")
    out.write("```\n\n")
    shutil.rmtree(tmp, ignore_errors=True)

    # 1b) streaming ancestor-patch child scan: pushed tx/ty IN-lists
    from pyramidscheme_jl_spark.sources.catalog import read_level
    from pyramidscheme_jl_spark.streaming.ingest import _children_of

    tmp2 = tempfile.mkdtemp()
    build_pyramid(spark, images, tmp2 + "/p", G=4, run_id="plans2")
    kids = _children_of(read_level(spark, tmp2 + "/p", 0), [(0, 0), (1, 1)])
    plan = kids._jdf.queryExecution().executedPlan().toString()
    out.write("## Streaming ancestor-patch child scan (pushed IN-lists)\n\n```\n")
    for line in plan.splitlines():
        if any(k in line for k in ("FileScan", "PushedFilters")):
            out.write(line.strip()[:400] + "\n")
    out.write("```\n\n")
    shutil.rmtree(tmp2, ignore_errors=True)

    # 1c) F4 threshold tile skipping: stats predicate pushed to the scan
    from pyramidscheme_jl_spark.operators.read import prune_tiles_by_stats

    tmp3 = tempfile.mkdtemp()
    build_pyramid(spark, images, tmp3 + "/p", G=4, run_id="plans3")
    pr = prune_tiles_by_stats(read_level(spark, tmp3 + "/p", 0), "gt", 200.0)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    out.write(
        "## F4 threshold tile skip (prune_tiles_by_stats, vmax > 200)\n\n"
        "The per-tile stats predicate reaches the parquet scan — row-group\n"
        "min/max stats skip tiles whose pixel bytes are then never read:\n\n```\n"
    )
    for line in plan.splitlines():
        if any(k in line for k in ("FileScan", "PushedFilters", "ReadSchema")):
            out.write(line.strip()[:400] + "\n")
    out.write("```\n\n")
    shutil.rmtree(tmp3, ignore_errors=True)

    # 2) key relational queries: broadcast + codegen + python-free evidence
    notes = {
        "embedding_pq_topk": (
            "NOTE: the corpus side carries ONLY the m-byte codes column into "
            "the ADC scan (the 64x PQ compression); the ArrowEvalPython is the "
            "one-matmul encode pass, the LUT sum is JVM zip_with/aggregate."
        ),
        "events_asof_click": (
            "NOTE: one Exchange on the by-key + Window sort — the sort-merge-"
            "join physical shape; no python stage, no range-bucket explosion."
        ),
        "embedding_ivfpq_topk": (
            "NOTE: the composed 10^12-vector shape (VERDICT r5 #1): ONE "
            "ArrowEvalPython emits (list_id, residual codes) for the whole "
            "corpus, the probed-list equi-join bounds candidates on the "
            "nlist key space, and the per-(query, list) LUT ADC sum is JVM "
            "zip_with/aggregate over the codes column only — compression "
            "AND pruning, multiplicative; rerank joins the tiny candidate "
            "set back against id+vector."
        ),
        "embedding_ivf_topk": (
            "NOTE: the ArrowEvalPython on the corpus side is the assign "
            "matmul — the MEASURED round-5 winner over the unrolled-codegen "
            "expr (tools/ivf_assign_ab.py: 34M vs 7.7M rows/s warm scan and "
            "half the driver constant at nlist=16 x dim=64). 'Python-free' "
            "was the r3/r4 hypothesis; the A/B retired it."
        ),
    }
    for name in (
        "block_agg_mean",
        "bbox_join",
        "bbox_join_cells",
        "zonal_agg",
        "embedding_topk",
        "pip_join",
        "block_agg_median",
        "embedding_ivf_topk",
        "embedding_pq_topk",
        "embedding_ivfpq_topk",
        "events_asof_click",
        "bpe_tokens",
    ):
        df = E.queries()[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        keep = []
        for line in plan.splitlines():
            s = line.strip()
            if any(k in s for k in ("WholeStageCodegen", "BroadcastHashJoin", "BroadcastNestedLoop", "HashAggregate", "Exchange", "FileScan", "PushedFilters", "EvalPython", "SortMergeJoin", "Generate")):
                keep.append(s[:300])
        note = f"\n{notes[name]}\n" if name in notes else ""
        out.write(f"## {name}\n{note}\n```\n" + "\n".join(keep[:25]) + "\n```\n\n")

    # 3) kNN candidate-join round: assert no Python eval in the key path
    from pyspark.sql import functions as F

    from pyramidscheme_jl_spark.operators.joins import grid_coord_cols

    pts = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("point_id"),
        (F.col("id") % 32).cast("double").alias("x"),
        (F.col("id") / 32).cast("double").alias("y"),
    )
    ix, iy = grid_coord_cols(4, 32.0)
    q = pts.select("point_id", "x", "y", ix.alias("qix"), iy.alias("qiy"))
    d = pts.select(F.col("point_id").alias("n_id"), ix.alias("nix"), iy.alias("niy"))
    offs = F.sequence(F.lit(-1), F.lit(1))
    cand = (
        q.select("*", F.explode(offs).alias("dx"))
        .select("*", F.explode(offs).alias("dy"))
        .join(
            d,
            ((F.col("qix") + F.col("dx")) == F.col("nix"))
            & ((F.col("qiy") + F.col("dy")) == F.col("niy")),
        )
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    has_py = "EvalPython" in plan
    out.write(
        f"## kNN candidate join (one ring)\n\nPython eval in plan: **{has_py}** "
        "(must be False — the key path is pure column arithmetic)\n\n```\n"
    )
    for line in plan.splitlines():
        s = line.strip()
        if any(k in s for k in ("Join", "Generate", "EvalPython", "Project")):
            out.write(s[:300] + "\n")
    out.write("```\n")

    with open("BENCH/PLANS.md", "w") as f:
        f.write(out.getvalue())
    print("wrote BENCH/PLANS.md")


if __name__ == "__main__":
    main()
