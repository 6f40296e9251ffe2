"""Hand-computed expectations for the time-window family — the tests the
oracle gate can't do (calendar buckets, NEAR/VALUE fill, TRUE_FOR,
sliding count windows)."""

from datetime import datetime

from pyspark.sql import functions as F

from tdengine_spark.operators.eventwindow import (
    assign_count_windows,
    assign_event_windows,
    assign_session_windows,
    assign_state_windows,
    window_agg,
)
from tdengine_spark.operators.fill import fill
from tdengine_spark.operators.timewindow import interval_window, window_start


def ts(s):
    return datetime.fromisoformat(s)


def test_window_start_alignment(spark):
    df = spark.createDataFrame(
        [(ts("2024-03-15 10:47:31"),)], "t timestamp"
    ).select(
        window_start("t", "10s").alias("s10"),
        window_start("t", "1h").alias("h"),
        window_start("t", "1d").alias("d"),
        window_start("t", "1n").alias("mo"),
        window_start("t", "1y").alias("y"),
        window_start("t", "1h", offset="30m").alias("h_off"),
    )
    row = df.first()
    assert row.s10 == ts("2024-03-15 10:47:30")
    assert row.h == ts("2024-03-15 10:00:00")
    assert row.d == ts("2024-03-15 00:00:00")
    assert row.mo == ts("2024-03-01 00:00:00")
    assert row.y == ts("2024-01-01 00:00:00")
    assert row.h_off == ts("2024-03-15 10:30:00")


def test_multi_month_bucket(spark):
    df = spark.createDataFrame(
        [(ts("2024-05-20 00:00:00"),), (ts("2024-02-01 00:00:00"),)], "t timestamp"
    ).select(window_start("t", "3n").alias("q"))
    got = sorted(r.q for r in df.collect())
    assert got == [ts("2024-01-01"), ts("2024-04-01")]


def _mini_series(spark):
    rows = [
        ("a", ts("2024-01-01 00:00:05"), 1.0),
        ("a", ts("2024-01-01 00:00:15"), 2.0),
        # gap: bucket 00:00:20-30 empty
        ("a", ts("2024-01-01 00:00:35"), 4.0),
    ]
    return spark.createDataFrame(rows, "k string, t timestamp, v double")


def test_fill_modes(spark):
    df = _mini_series(spark)
    agg = interval_window(
        df, "t", "10s", partition_by=["k"], aggs=[F.avg("v").alias("v")]
    ).drop("_wend")

    def vals(mode, **kw):
        out = fill(agg, mode, "10s", ["k"], ["v"], **kw).orderBy("_wstart").collect()
        return [r.v for r in out]

    assert vals("null") == [1.0, 2.0, None, 4.0]
    assert vals("value", fill_values={"v": 9.0}) == [1.0, 2.0, 9.0, 4.0]
    assert vals("prev") == [1.0, 2.0, 2.0, 4.0]
    assert vals("next") == [1.0, 2.0, 4.0, 4.0]
    assert vals("linear") == [1.0, 2.0, 3.0, 4.0]
    # NEAR: bucket 00:20 is 10s from prev (00:10) and 10s from next (00:30)
    # → tie goes to prev per (ts-prev) <= (next-ts)
    assert vals("near") == [1.0, 2.0, 2.0, 4.0]


def test_fill_range_extends_spine(spark):
    df = _mini_series(spark)
    agg = interval_window(
        df, "t", "10s", partition_by=["k"], aggs=[F.avg("v").alias("v")]
    ).drop("_wend")
    out = fill(
        agg, "prev", "10s", ["k"], ["v"],
        range_start="2024-01-01 00:00:00", range_end="2024-01-01 00:00:50",
    ).orderBy("_wstart").collect()
    assert len(out) == 6  # 00:00 .. 00:50
    # buckets: 00→1.0 (sample@05), 10→2.0, 20→PREV 2.0, 30→4.0, 40/50→PREV 4.0
    assert [r.v for r in out] == [1.0, 2.0, 2.0, 4.0, 4.0, 4.0]


def test_session_windows(spark):
    rows = [
        ("a", ts("2024-01-01 00:00:00"), 1.0),
        ("a", ts("2024-01-01 00:00:05"), 1.0),
        ("a", ts("2024-01-01 00:01:00"), 1.0),  # 55s gap > 10s → new session
        ("b", ts("2024-01-01 00:00:00"), 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    out = window_agg(
        assign_session_windows(df, "t", "10s", ["k"]),
        "t",
        [F.count(F.lit(1)).alias("n")],
        ["k"],
    ).collect()
    sessions = {(r.k, r._wid): r.n for r in out}
    assert sessions == {("a", 1): 2, ("a", 2): 1, ("b", 1): 1}


def test_state_windows_true_for(spark):
    rows = [
        ("a", ts("2024-01-01 00:00:00"), "up"),
        ("a", ts("2024-01-01 00:00:10"), "up"),
        ("a", ts("2024-01-01 00:00:20"), "down"),  # run of 1 → duration 0
        ("a", ts("2024-01-01 00:00:30"), "up"),
        ("a", ts("2024-01-01 00:00:45"), "up"),
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, s string")
    assigned = assign_state_windows(df, "t", "s", ["a" == "a" and "k"])
    out = window_agg(
        assigned, "t", [F.count(F.lit(1)).alias("n")], ["k"],
        true_for="10s", keep_state=True,
    ).collect()
    # only runs spanning >= 10s survive TRUE_FOR
    got = {(r._state, r.n) for r in out}
    assert got == {("up", 2), ("up", 2)}  # two up-runs of 2 rows, 10s/15s span


def test_event_windows(spark):
    rows = [
        ("a", ts("2024-01-01 00:00:00"), 5.0),   # outside
        ("a", ts("2024-01-01 00:00:01"), 95.0),  # START (>90)
        ("a", ts("2024-01-01 00:00:02"), 50.0),  # inside
        ("a", ts("2024-01-01 00:00:03"), 5.0),   # END (<10)
        ("a", ts("2024-01-01 00:00:04"), 50.0),  # outside
        ("a", ts("2024-01-01 00:00:05"), 99.0),  # START
        ("a", ts("2024-01-01 00:00:06"), 1.0),   # END
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    assigned = assign_event_windows(
        df, "t", F.col("v") > 90, F.col("v") < 10, ["k"]
    )
    out = window_agg(assigned, "t", [F.count(F.lit(1)).alias("n")], ["k"]).collect()
    assert sorted(r.n for r in out) == [2, 3]  # windows: rows 1-3 and 5-6


def test_count_windows_sliding(spark):
    rows = [("a", ts(f"2024-01-01 00:00:0{i}"), float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    # COUNT_WINDOW(4, 2): windows rows [0-3], [2-5], [4-5]
    assigned = assign_count_windows(df, "t", 4, 2, ["k"])
    out = window_agg(assigned, "t", [F.count(F.lit(1)).alias("n")], ["k"]).collect()
    assert sorted(r._wrows for r in out) == [2, 4, 4]
