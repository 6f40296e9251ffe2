#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized with a noop write (all columns computed, no
collect-to-driver skew). Times include Catalyst planning but not session
startup; a warmup query primes the JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas  # noqa: F401  (annotation target for the warmup udf)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "interval_1h_by_type",
    "interval_sliding_30m",
    "interval_fill_prev",
    "interval_fill_linear",
    "session_windows_30m",
    "state_windows_event_type",
    "event_windows_spike",
    "asof_join_purchase_click",
    "window_join_5m",
    "twa_by_type",
    "last_row_per_user",
    "top3_per_type",
    "diff_csum_mavg",
    "percentiles_by_type",
    "interp_linear_daily",
    "count_windows_sliding",
    "virtual_table_align",
    "forecast_linear_trend",
    "anomaly_detection_zscore",
    "dedup_exact_documents",
    "minhash_near_dup_pairs",
    "simhash_near_pairs",
    "cosine_topk_bruteforce",
    "lsh_ann_topk",
    "quality_features",
    "language_id",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import tdengine_spark.queries_extra  # noqa: F401  (self-registers)
    import tdengine_spark.queries_pipeline  # noqa: F401  (self-registers)
    from tdengine_spark.queries import REGISTRY
    from tdengine_spark.session import get_spark

    spark = get_spark("bench")

    def run_once(name: str) -> float:
        t0 = time.time()
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def run(name: str, reps: int = 2) -> float:
        # min-of-N: single-run scheduler noise can neither fake nor mask
        # a regression (the min is the query's reproducible cost)
        return min(run_once(name) for _ in range(reps))

    # warmup: prime JVM/codegen + parquet footer caches, and spin up the
    # Python/Arrow worker pool so UDF-backed queries measure steady-state
    # compute rather than one-time worker fork+import cost
    run_once("agg_pricing_summary")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _noop_udf(s: "pandas.Series") -> "pandas.Series":
        return s

    spark.range(0, 1024, 1, 32).select(_noop_udf("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    times = {}
    for name in HEADLINE:
        if name in REGISTRY:
            times[name] = round(run(name), 3)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
