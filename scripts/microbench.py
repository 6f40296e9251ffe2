#!/usr/bin/env python
"""Micro-bench specific registry queries min-of-N with the noop sink —
the same timed action as bench.py, for isolated A/B runs.

Usage: python scripts/microbench.py name1,name2 [reps]
"""

from __future__ import annotations

import os
import sys
import time

import pandas  # noqa: F401  (annotation target for the warmup udf)

sys.path.insert(0, "/root/repo")


def main():
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import tdengine_spark.queries_extra  # noqa: F401
    import tdengine_spark.queries_pipeline  # noqa: F401
    from tdengine_spark.queries import REGISTRY
    from tdengine_spark.session import get_spark

    spark = get_spark("microbench")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # same warmup as bench.py: JVM/codegen + parquet footers + Arrow pool
    REGISTRY["agg_pricing_summary"].spark_fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _noop_udf(s: "pandas.Series") -> "pandas.Series":
        return s

    spark.range(0, 1024, 1, 32).select(_noop_udf("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        spark.sparkContext.setJobDescription(f"microbench:{name}")
        try:
            ts = []
            for _ in range(reps):
                t0 = time.time()
                REGISTRY[name].spark_fn(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                ts.append(time.time() - t0)
            print(f"{name}: min={min(ts):.3f} all={[round(t, 3) for t in ts]}")
        finally:
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
