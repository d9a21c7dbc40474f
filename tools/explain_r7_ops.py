"""Executed-plan evidence for the r7 operators (BENCH/PLANS.md input).

Prints the formatted plan of each new operator on the sf0.01 tables and
greps it for the properties the docstrings claim: no CartesianProduct /
BroadcastNestedLoopJoin anywhere, the intended join strategy, and no
Python (BatchEvalPython) stage outside the ops that declare an Arrow
stage. Exit 1 if any claim fails.

Usage: python tools/explain_r7_ops.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark(app="explain-r7")
    qs = E.queries()
    names = [
        "events_asof_next_click", "events_asof_nearest", "events_sessionize",
        "docs_stratified_sample", "docs_hash_split", "geo_radius_join",
        "lines_near_pairs", "lines_snap_nearest",
        "interval_join_ship", "interval_overlap_orders",
        "events_session_agg", "focal_mean_extract",
    ]
    # ops whose PLAN declares Arrow stages (focal's halo exchange):
    # row-at-a-time python (BatchEvalPython) is still forbidden there,
    # and at least one Arrow stage MUST be present
    arrow_ok = {"focal_mean_extract"}
    rc = 0
    for name in names:
        df = qs[name](spark, sf)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        bad = [
            m for m in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if m in plan
        ]
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython")  # row-python: forbidden everywhere
        arrow_stages = ("ArrowEvalPython" in plan
                        or "FlatMapGroupsInPandas" in plan
                        or "MapInPandas" in plan)
        if arrow_stages and name not in arrow_ok:
            bad.append("unexpected-arrow-stage")
        if name in arrow_ok and not arrow_stages:
            bad.append("missing-declared-arrow-stage")
        joins = [
            ln.strip() for ln in plan.splitlines()
            if "Join" in ln and ln.strip().startswith(("*", "+", "Sort", "Broadcast", "Shuffled"))
        ]
        exch = plan.count("Exchange")
        print(f"== {name}: exchanges~{exch} joins={joins[:3]}"
              + (f"  VIOLATIONS={bad}" if bad else "  ok"))
        if bad:
            rc = 1
            print(plan[:4000])
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
