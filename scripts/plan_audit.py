#!/usr/bin/env python
"""Physical-plan audit: verifies every headline query compiles to the
plan shape we'd want on a 1000-executor cluster, and fails on known
pathologies:

  - BroadcastNestedLoopJoin / CartesianProduct anywhere
  - the ts-range scan not reaching PushedFilters
  - missing broadcast on the dimension joins
  - the as-of join using more than one Exchange

Run: python scripts/plan_audit.py   (prints a table; exit 1 on violation)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main():
    import tdengine_spark.queries_extra  # noqa: F401
    import tdengine_spark.queries_pipeline  # noqa: F401
    from tdengine_spark.queries import REGISTRY
    from tdengine_spark.session import get_spark

    spark = get_spark("plan-audit")
    sf = "/root/testdata/sf0.1"

    audits = [
        "scan_filter_project",
        "agg_pricing_summary",
        "join_revenue_by_nation",
        "interval_1h_by_type",
        "interval_fill_prev",
        "session_windows_30m",
        "asof_join_purchase_click",
        "window_join_5m",
        "interp_linear_daily",
        "last_row_per_user",
        "cosine_topk_bruteforce",
        "dedup_exact_documents",
        "slimit_first_groups",
        "over_clause_analytics",
        "diff_csum_mavg",
        "external_window_agg",
        "interp_prev_6h",
    ]
    violations = []
    print(f"{'query':32s} {'exch':>4s} {'sort':>4s} {'bhj':>3s} {'smj':>3s} {'bnlj':>4s} notes")
    for name in audits:
        p = plan_of(REGISTRY[name].spark_fn(spark, sf))
        exch = p.count("Exchange")
        sort = len(re.findall(r"\bSort\b", p))
        bhj = p.count("BroadcastHashJoin")
        smj = p.count("SortMergeJoin")
        bnlj = p.count("BroadcastNestedLoopJoin") + p.count("CartesianProduct")
        notes = []
        if bnlj and name != "cosine_topk_bruteforce":
            # brute-force ANN is a deliberate broadcast cross join
            violations.append(f"{name}: nested-loop/cartesian join")
            notes.append("NESTED-LOOP!")
        # an un-partitioned Window funnels every row into one partition:
        # windowspecdefinition's first arg being an order-spec (ASC/DESC)
        # means there are no partition columns
        if re.search(r"windowspecdefinition\([^,()]+ (ASC|DESC)", p):
            violations.append(f"{name}: un-partitioned (global) Window")
            notes.append("GLOBAL-WINDOW!")
        if name == "scan_filter_project":
            m = re.search(r"PushedFilters: \[([^\]]*)", p)
            pushed = m.group(1) if m else ""
            if "GreaterThanOrEqual(ts" not in pushed:
                violations.append(f"{name}: ts range not pushed to parquet")
                notes.append("NO-TS-PUSHDOWN!")
            else:
                notes.append("ts-range pushed")
        if name == "join_revenue_by_nation" and bhj < 2:
            violations.append(f"{name}: dimension joins not broadcast")
            notes.append("NO-BROADCAST!")
        if name == "asof_join_purchase_click" and exch > 2:
            violations.append(f"{name}: as-of join shuffles {exch}x")
            notes.append("EXTRA-SHUFFLE!")
        if name == "window_join_5m" and exch > 3:
            violations.append(f"{name}: window join shuffles {exch}x")
            notes.append("EXTRA-SHUFFLE!")
        if name in ("interp_linear_daily", "interp_prev_6h"):
            # single-fact-scan contract: key spine from the catalog tag
            # domain, not a second scan of events; ≤2 exchanges (window
            # hash + output range sort)
            scans = p.count("events.parquet")
            if scans > 1:
                violations.append(f"{name}: {scans} scans of events")
                notes.append("DOUBLE-SCAN!")
            if exch > 2:
                violations.append(f"{name}: interp shuffles {exch}x")
                notes.append("EXTRA-SHUFFLE!")
        print(f"{name:32s} {exch:4d} {sort:4d} {bhj:3d} {smj:3d} {bnlj:4d} {' '.join(notes)}")

    if violations:
        print("\nPLAN VIOLATIONS:")
        for v in violations:
            print(" -", v)
        return 1
    print("\nall plans clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
