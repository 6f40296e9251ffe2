"""Structured Streaming trigger analogs, driven end-to-end with the file
source (events parquet replayed as arriving files) and availableNow."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tdengine_spark.streaming.latest import LatestTable
from tdengine_spark.streaming.stream import (
    count_window_trigger,
    interval_trigger,
    read_stream,
    session_trigger,
)

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture()
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="tds_stream_")
    # replay the events table as N arriving files (ts order preserved
    # within files; the watermark handles cross-file disorder)
    df = spark.read.parquet(SRC)
    df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))).repartition(
        4
    ).write.mode("overwrite").parquet(f"{d}/in")
    yield d
    shutil.rmtree(d, ignore_errors=True)



@pytest.fixture()
def ordered_stream_dir(spark):
    """Replay events as 4 files in strict ts order (the reference's WAL
    tail is ts-ordered per vnode; cross-batch disorder is a watermark/
    IGNORE_DISORDER concern, not a state-kernel one)."""
    import time as _time

    d = tempfile.mkdtemp(prefix="tds_ostream_")
    os.makedirs(f"{d}/in")
    pdf = (
        spark.read.parquet(SRC)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # pandas defaults to ns-precision parquet timestamps, which the
    # session reads back as raw longs (nanosAsLong) — write us instead
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    n = len(pdf)
    for i in range(4):
        chunk = pdf.iloc[i * n // 4 : (i + 1) * n // 4]
        chunk.to_parquet(f"{d}/in/data_{i}.parquet", index=False)
        _time.sleep(0.05)  # distinct mtimes → deterministic pickup order
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_available_now(result, d, name):
    q = (
        result.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{d}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_interval_trigger_matches_batch(spark, stream_dir):
    schema = spark.read.parquet(f"{stream_dir}/in").schema
    src = read_stream(spark, f"{stream_dir}/in", schema, max_files_per_trigger=2)
    result = interval_trigger(
        src, "ts", "1h", partition_by=["event_type"],
        watermark="1 hour",
        aggs=[F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sv")],
    )
    _run_available_now(result, stream_dir, "iv")
    got = spark.sql("SELECT * FROM iv")
    batch = (
        spark.read.parquet(f"{stream_dir}/in")
        .groupBy(F.window("ts", "1 hour").alias("_w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sv"))
    )
    # append mode + availableNow: all windows finalize (watermark passes
    # max ts at end-of-input except the tail window)
    assert got.count() >= batch.count() - 5
    j = got.join(
        batch.select(
            F.col("_w.start").alias("_wstart"), "event_type",
            F.col("cnt").alias("cnt_b"), F.col("sv").alias("sv_b"),
        ),
        ["_wstart", "event_type"],
    )
    mism = j.where((F.col("cnt") != F.col("cnt_b")) | (F.col("sv") != F.col("sv_b")))
    assert mism.count() == 0


def test_session_trigger(spark, stream_dir):
    schema = spark.read.parquet(f"{stream_dir}/in").schema
    src = read_stream(spark, f"{stream_dir}/in", schema)
    result = session_trigger(
        src, "ts", "30m", partition_by=["user_id"], watermark="2 hours",
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    _run_available_now(result, stream_dir, "sess")
    got = spark.sql("SELECT * FROM sess")
    assert got.count() > 0
    # every emitted session respects the gap: _wend - _wstart covers n rows
    assert got.where(F.col("n") < 1).count() == 0


def test_count_window_trigger(spark, stream_dir):
    schema = spark.read.parquet(f"{stream_dir}/in").schema
    src = read_stream(spark, f"{stream_dir}/in", schema, max_files_per_trigger=1)
    result = count_window_trigger(src, "ts", 50, "user_id", "value")
    _run_available_now(result, stream_dir, "cw")
    got = spark.sql("SELECT * FROM cw")
    n = got.count()
    assert n > 0
    # every emitted window has exactly 50 rows
    assert got.where(F.col("n_rows") != 50).count() == 0
    # total windows ≈ floor(rows_per_user/50) summed
    import math
    per_user = (
        spark.read.parquet(f"{stream_dir}/in").groupBy("user_id").count().collect()
    )
    expected = sum(math.floor(r["count"] / 50) for r in per_user)
    assert n == expected


def test_latest_table(spark, stream_dir):
    lt = LatestTable(f"{stream_dir}/latest", ["user_id"], "ts")
    full = spark.read.parquet(f"{stream_dir}/in").select(
        "user_id", "ts", "event_type", "value"
    )
    # simulate two micro-batches split by time
    cut = "2024-01-15"
    lt.merge_batch(full.where(F.col("ts") < cut))
    lt.merge_batch(full.where(F.col("ts") >= cut))
    got = lt.read(spark)
    from tdengine_spark.functions.selection import last_row

    expect = last_row(full, "ts", ["user_id"])
    assert got.count() == expect.count()
    j = got.alias("g").join(expect.alias("e"), "user_id").where(
        (F.col("g.ts") != F.col("e.ts")) | (F.col("g.value") != F.col("e.value"))
    )
    assert j.count() == 0


def test_state_window_trigger_matches_batch(spark, ordered_stream_dir):
    from tdengine_spark.streaming.stream import state_window_trigger
    from tdengine_spark.operators.eventwindow import assign_state_windows, window_agg

    stream_dir = ordered_stream_dir
    schema = spark.read.parquet(f"{stream_dir}/in").schema
    src = read_stream(spark, f"{stream_dir}/in", schema, max_files_per_trigger=1)
    result = state_window_trigger(src, "ts", "event_type", "user_id", "value")
    _run_available_now(result, stream_dir, "sw")
    got = spark.sql("SELECT * FROM sw")
    # batch equivalent: all CLOSED state windows (stream holds the last
    # open window per key in state)
    batch = window_agg(
        assign_state_windows(
            spark.read.parquet(f"{stream_dir}/in"), "ts", "event_type", ["user_id"]
        ),
        "ts",
        [F.count(F.lit(1)).alias("n2")],
        ["user_id"],
        keep_state=True,
    )
    n_users = spark.read.parquet(f"{stream_dir}/in").select("user_id").distinct().count()
    assert got.count() == batch.count() - n_users  # one open window per key
    j = got.join(
        batch.select(
            F.col("user_id").cast("string").alias("k"),
            F.col("_state").alias("state"), "_wstart", "_wend",
            F.col("_wrows").alias("n_b"),
        ),
        ["k", "state", "_wstart", "_wend"],
    )
    assert j.count() == got.count()
    assert j.where(F.col("n_rows") != F.col("n_b")).count() == 0


def test_event_window_trigger(spark, ordered_stream_dir):
    from tdengine_spark.streaming.stream import event_window_trigger

    stream_dir = ordered_stream_dir
    schema = spark.read.parquet(f"{stream_dir}/in").schema
    src = read_stream(spark, f"{stream_dir}/in", schema, max_files_per_trigger=1)
    result = event_window_trigger(src, "ts", "user_id", "value", 180.0, 20.0)
    _run_available_now(result, stream_dir, "ew")
    got = spark.sql("SELECT * FROM ew")
    assert got.count() > 0
    assert got.where(F.col("_wend") < F.col("_wstart")).count() == 0


def test_recalc_on_late_rows(spark, stream_dir):
    """Late rows update the affected bucket instead of being dropped."""
    import tempfile

    from tdengine_spark.streaming.recalc import RecalcAggTable

    d = tempfile.mkdtemp(prefix="tds_recalc_")
    rt = RecalcAggTable(
        f"{d}/raw", f"{d}/agg", "1h", "ts", keys=["event_type"], metrics=["value"]
    )
    full = (
        spark.read.parquet(f"{stream_dir}/in")
        .select("ts", "event_type", "value")
        .orderBy("ts")
    )
    # batch 1: everything except one hour in the middle of the range
    hole_lo, hole_hi = "2024-01-10 05:00:00", "2024-01-10 06:00:00"
    b1 = full.where((F.col("ts") < hole_lo) | (F.col("ts") >= hole_hi))
    r1 = rt.process_batch(b1)
    assert r1["late"] == 0
    # batch 2: the late hour arrives after the watermark passed it
    b2 = full.where((F.col("ts") >= hole_lo) & (F.col("ts") < hole_hi))
    r2 = rt.process_batch(b2)
    assert r2["late"] == r2["touched"] > 0  # all touched buckets are late
    # final aggregate equals a clean batch aggregate over ALL rows
    got = rt.read(spark)
    from tdengine_spark.operators.timewindow import window_start

    expect = (
        full.groupBy(window_start("ts", "1h").alias("_wstart"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )
    assert got.count() == expect.count()
    j = got.alias("g").join(expect.alias("e"), ["_wstart", "event_type"]).where(
        (F.col("g.n_rows") != F.col("e.n_rows"))
        | (F.col("g.sum_value") != F.col("e.sum_value"))
    )
    assert j.count() == 0
    import shutil

    shutil.rmtree(d, ignore_errors=True)
