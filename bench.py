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
        # label the jobs (guide §1.5) so UI/event-log analysis can map
        # stages back to queries; no effect on the timed work
        spark.sparkContext.setJobDescription(f"bench:{name}")
        try:
            t0 = time.time()
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t0
        finally:
            # always reset — a raising query must not leak its label
            # onto every subsequent job in the UI/event log
            spark.sparkContext.setJobDescription(None)

    def run(name: str, reps: int = 3) -> float:
        # min-of-N: single-run scheduler noise can neither fake nor mask
        # a regression (the min is the query's reproducible cost).
        # reps=3 because first-run codegen/worker warm-up leaks into
        # min-of-2 for regex/UDF-heavy queries and produced phantom
        # regressions (r7 verdict: quality_features 1.54s printed vs
        # 0.58s steady-state).
        return min(run_once(name) for _ in range(reps))

    # warmup: prime JVM/codegen + parquet footer caches, and spin up the
    # Python/Arrow worker pool so UDF-backed queries measure steady-state
    # compute rather than one-time worker fork+import cost. TWO reps: the
    # first timed query historically paid residual JIT that one warmup
    # run did not absorb (r14 verdict #8 — agg_pricing_summary 0.45
    # first-timed vs 0.31 steady; min-of-3 only partly absorbed it),
    # which put a phantom ±0.1 s in every round-over-round diff.
    run_once("agg_pricing_summary")
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
    # streaming BEFORE the 10× scale probe: the probe writes + scans a
    # 6M-row synthetic table and leaves JVM heap/shuffle pressure that
    # depressed the streaming numbers ~25-30% in r10/r11 (r9, with no
    # probe, measured 12.7k rows/s where r11 read 8.7k from the same
    # code) — each section now measures from a comparable warm state
    streaming = _bench_streaming(spark, sf_dir)
    probe, superlinear = _scale_probe(spark, sf_dir, run, times)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # self-certify the CPU contract (r14 verdict #2): the
                # driver's low-core scaling probe needs proof the session
                # actually ran local[$SPARK_GRAFT_CPUS], not an
                # environment-inherited master
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "streaming": streaming,
                "scale_probe_10x": probe,
                "scale_probe_superlinear": superlinear,
            }
        )
    )


#: window-family queries re-run on a synthetic 10×-rows-per-key events
#: table. O(n)-per-key kernels scale ≈10× (less, given fixed plan/scan
#: overhead); an O(n²)-per-key kernel (the shrinking-frame class that
#: hid at sf0.1 until round 9) shows ≈100× and trips the flag.
_PROBE_QUERIES = [
    "state_windows_event_type",
    "event_windows_spike",
    "interp_linear_daily",
    "interval_fill_linear",
]
_PROBE_SUPERLINEAR_RATIO = 25.0


def _scale_probe(spark, sf_dir: str, run, base_times: dict):
    """Generate a 10×-rows-per-key twin of ``events`` (each row exploded
    into 10 with millisecond ts jitter — runs get 10× longer, keys stay
    the same), re-run the window-family queries against it, and flag any
    query whose time grew superlinearly vs its same-session sf run."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="tds_bench_probe_")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        (
            ev.withColumn(
                "_k", F.explode(F.sequence(F.lit(0), F.lit(9)))
            )
            .withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros("ts") + F.col("_k") * 1000
                ),
            )
            .drop("_k")
            .write.mode("overwrite")
            .parquet(f"{d}/events.parquet")
        )
        probe, superlinear = {}, []
        for name in _PROBE_QUERIES:
            if name not in base_times:
                continue
            t10 = round(run_probe_query(spark, d, name, run), 3)
            ratio = round(t10 / max(base_times[name], 1e-6), 2)
            probe[name] = {"sf": base_times[name], "x10": t10,
                           "ratio": ratio}
            if ratio > _PROBE_SUPERLINEAR_RATIO:
                superlinear.append(name)
        return probe, superlinear
    finally:
        shutil.rmtree(d, ignore_errors=True)


def run_probe_query(spark, probe_dir: str, name: str, run) -> float:
    import time as _t

    from tdengine_spark.queries import REGISTRY

    best = None
    for _ in range(2):
        t0 = _t.time()
        REGISTRY[name].spark_fn(spark, probe_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = _t.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def _bench_streaming(spark, sf_dir: str) -> dict:
    """Trigger-to-sink latency for the stream operators (the reference's
    TSBS stream harness measures delay percentiles the same way,
    tools/tsbs-tdengine/src/doTest.py:33-50): replay events as 8
    arriving files through interval / session / count triggers with
    availableNow, and report per-micro-batch triggerExecution p50/p95
    plus drain wall-clock and row throughput."""
    import shutil
    import statistics
    import tempfile

    from pyspark.sql import functions as F

    from tdengine_spark.catalog import Database
    from tdengine_spark.streaming.stream import (
        count_window_trigger,
        interval_trigger,
        read_stream,
        session_trigger,
    )

    d = tempfile.mkdtemp(prefix="tds_bench_stream_")
    try:
        ev = Database(root=sf_dir).read(spark, "events")
        # 8 arriving files → 8 micro-batches at maxFilesPerTrigger=1
        ev.repartition(8).write.mode("overwrite").parquet(f"{d}/in")
        schema = spark.read.parquet(f"{d}/in").schema

        def src():
            return read_stream(spark, f"{d}/in", schema, max_files_per_trigger=1)

        cases = {
            "interval_1h": lambda: interval_trigger(
                src(), "ts", "1h", partition_by=["event_type"],
                watermark="1 hour",
                aggs=[F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv")],
            ),
            "session_30m": lambda: session_trigger(
                src(), "ts", "30m", ["user_id"], "1 hour",
                [F.count(F.lit(1)).alias("cnt")],
            ),
            "count_window_100": lambda: count_window_trigger(
                src(), "ts", 100, "user_id", "value"
            ),
        }
        out = {}
        for name, build in cases.items():
            t0 = time.time()
            q = (
                build()
                .writeStream.outputMode("append")
                .format("noop")
                .option("checkpointLocation", f"{d}/ckpt_{name}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            wall = time.time() - t0
            prog = [json.loads(p.json) for p in (q.recentProgress or [])]
            durs = sorted(
                p["durationMs"]["triggerExecution"]
                for p in prog
                if p.get("durationMs", {}).get("triggerExecution") is not None
            )
            rows = sum(p.get("numInputRows") or 0 for p in prog)
            out[name] = {
                "wall_sec": round(wall, 3),
                "batches": len(durs),
                "rows": rows,
                "rows_per_sec": round(rows / wall, 1) if wall else None,
                "trigger_ms_p50": (
                    round(statistics.median(durs), 1) if durs else None
                ),
                "trigger_ms_p95": (
                    round(durs[max(0, int(len(durs) * 0.95) - 1)], 1)
                    if durs
                    else None
                ),
            }
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
