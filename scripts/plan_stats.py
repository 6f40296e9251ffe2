#!/usr/bin/env python
"""One-line plan-shape stats (exchanges/sorts/python nodes/joins) for
every registry query — the r14 optimization checklist source.

Usage: python scripts/plan_stats.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import tdengine_spark.queries_extra  # noqa: F401
    import tdengine_spark.queries_pipeline  # noqa: F401
    from tdengine_spark.queries import REGISTRY
    from tdengine_spark.session import get_spark

    spark = get_spark("plan-stats")
    for name, q in REGISTRY.items():
        try:
            df = q.spark_fn(spark, sf_dir)
            p = df._jdf.queryExecution().executedPlan().toString()
            ex = len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange RoundRobin|Exchange SinglePartition", p))
            bc = len(re.findall(r"BroadcastExchange", p))
            srt = len(re.findall(r"\bSort \[", p))
            py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow", p))
            smj = len(re.findall(r"SortMergeJoin", p))
            bnl = len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", p))
            print(f"{name}: ex={ex} bc={bc} sort={srt} py={py} smj={smj} bnlj={bnl}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
