"""Executed-plan evidence for the r8 operators (BENCH/PLANS.md input).

Same contract as explain_r7_ops: no CartesianProduct /
BroadcastNestedLoopJoin, no row-at-a-time python (BatchEvalPython)
anywhere, Arrow stages only where the op declares them. Exit 1 on any
violation.

Usage: python tools/explain_r8_ops.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from pyramidscheme_jl_spark.session import get_spark

    spark = get_spark(app="explain-r8")
    qs = E.queries()
    names = [
        "warp_affine_stats",       # decode+gather Arrow stages by design
        "region_label",            # scan + edge-match Arrow stages by design
        "raster_value_histogram",  # partial-histogram Arrow stage by design
        "embedding_ivfpq_indexed", # codes scan: NO arrow (LUT join is JVM)
        "prebuilt_extend_window",  # metadata projection: NO arrow
        "geo_radius_join",         # ring-grid cells (r8 wrap): pure JVM
        "zonal_quantiles",         # refine Arrow stage by design
        "zonal_cube_quantiles",    # same, t riding the keys
        "region_sieve",            # runs-pass + assemble Arrow stages
        "region_label_hist",       # histogram partials Arrow stage
        # -- late-r8 wave ----------------------------------------------------
        "warp_bilinear_stats",     # bilinear gather + stats Arrow stages
        "zonal_categorical",       # shared refine Arrow stage, struct-agg JVM
        "morphology_open_hist",    # stored-open histogram partials Arrow
        "equalize_hist",           # stored-equalized histogram partials Arrow
        "cube_trend_stats",        # cube gather + stats Arrow stages
        "cube_anomaly_stats",      # same
        "region_stats",            # runs pass + JVM moment agg
        "dem_roughness_stats",     # halo exchange + kernel Arrow stages
        "contour_stats",           # halo + marching-squares Arrow stages
        "fillnodata_hist",         # stored-fill histogram partials Arrow
        "grid_points_stats",       # grid assemble + stats Arrow stages
        "grid_points_nearest",     # same, EDT kernel
        "crosstab_stats",          # pair-count partials Arrow stage
        "cube_rolling_stats",      # chunked rolling + stats Arrow stages
        "region_perimeter",        # runs/strip scans Arrow by design
        "contour_topology",        # halo + marching squares Arrow; CC eager
        "color_relief_hist",       # LUT map + pack-count Arrow stages
        "streamed_grid_stats",     # state merge + grid/stats Arrow stages
    ]
    arrow_ok = {
        "warp_affine_stats", "region_label", "raster_value_histogram",
        "zonal_quantiles", "zonal_cube_quantiles", "region_sieve",
        "region_label_hist",
        "warp_bilinear_stats", "zonal_categorical", "morphology_open_hist",
        "equalize_hist", "cube_trend_stats", "cube_anomaly_stats",
        "region_stats", "dem_roughness_stats",
        "contour_stats", "fillnodata_hist",
        "grid_points_stats", "grid_points_nearest", "crosstab_stats",
        "cube_rolling_stats", "region_perimeter", "contour_topology",
        "color_relief_hist", "streamed_grid_stats",
    }
    # region_label & co run part of their Arrow work EAGERLY inside the
    # call (the scan is localCheckpointed and the resolve executes there);
    # a returned plan without visible arrow stages is legitimate for them
    eager_arrow = {"region_label", "region_sieve", "region_label_hist",
                   "region_perimeter", "contour_topology"}
    rc = 0
    for name in names:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        bad = [
            m for m in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if m in plan
        ]
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython")
        arrow_stages = ("ArrowEvalPython" in plan
                        or "FlatMapGroupsInPandas" in plan
                        or "MapInPandas" in plan)
        if arrow_stages and name not in arrow_ok:
            bad.append("unexpected-arrow-stage")
        if name in arrow_ok - eager_arrow and not arrow_stages:
            bad.append("missing-declared-arrow-stage")
        if name == "embedding_ivfpq_indexed" and "PartitionFilters: []" in plan:
            # the whole point of the persisted index: probed lists must be
            # partition filters on the codes scan
            for ln in plan.splitlines():
                if "PartitionFilters" in ln and "list_id" in ln:
                    break
            else:
                bad.append("missing-list_id-partition-filter")
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
