"""TSMA rewrite equivalence, RSMA tiers, DELETE, and analytics ops."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tdengine_spark.catalog import Database
from tdengine_spark.functions.analytics import (
    anomaly_zscore,
    dtw_distance,
    forecast_linear,
    impute_missing,
    tlcc,
)
from tdengine_spark.operators.delete import delete_where
from tdengine_spark.plans.tsma import TsmaCatalog, create_tsma, rollup_tiers

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="tds_tsma_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark):
    return Database(root=SF).read(spark, "events")


def test_tsma_rewrite_matches_raw(spark, tmpdir):
    ev = _events(spark)
    spec = create_tsma(
        spark, ev, f"{tmpdir}/tsma_1h", "1h",
        keys=["event_type"], metrics=["value"],
    )
    cat = TsmaCatalog()
    cat.register(spec)
    # 6h is a multiple of 1h → rewritten onto the TSMA
    got = cat.interval_agg(
        spark, ev, "6h", ["event_type"],
        {"value": ["avg", "sum", "count", "min", "max"]},
    )
    raw = ev.groupBy(
        F.timestamp_micros(
            (F.floor(F.unix_micros("ts") / (6 * 3600 * 1_000_000))
             * 6 * 3600 * 1_000_000).cast("long")
        ).alias("_wstart"),
        "event_type",
    ).agg(
        F.avg("value").alias("avg_value"),
        F.sum("value").alias("sum_value"),
        F.count("value").alias("count_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    j = got.alias("g").join(raw.alias("r"), ["_wstart", "event_type"])
    mism = j.where(
        (F.abs(F.col("g.avg_value") - F.col("r.avg_value")) > 1e-9)
        | (F.abs(F.col("g.sum_value") - F.col("r.sum_value")) > 1e-6)
        | (F.col("g.count_value") != F.col("r.count_value"))
        | (F.col("g.min_value") != F.col("r.min_value"))
        | (F.col("g.max_value") != F.col("r.max_value"))
    )
    assert got.count() == raw.count()
    assert mism.count() == 0


def test_tsma_incompatible_width_falls_back(spark, tmpdir):
    ev = _events(spark)
    spec = create_tsma(
        spark, ev, f"{tmpdir}/tsma_1h", "1h", keys=["event_type"], metrics=["value"]
    )
    cat = TsmaCatalog()
    cat.register(spec)
    assert cat.best_for("90m", ["event_type"], ["value"]) is None  # not a multiple
    assert cat.best_for("2h", ["event_type"], ["value"]) is spec
    assert cat.best_for("2h", ["user_id"], ["value"]) is None  # key not covered


def test_rsma_tiers(spark, tmpdir):
    ev = _events(spark)
    base = create_tsma(
        spark, ev, f"{tmpdir}/L0", "1h", keys=["event_type"], metrics=["value"]
    )
    tiers = rollup_tiers(spark, base, ["6h", "1d"], tmpdir)
    assert [t.width_us for t in tiers] == [
        3600_000_000, 6 * 3600_000_000, 24 * 3600_000_000
    ]
    l2 = spark.read.parquet(tiers[2].path)
    # L2 day-sums equal raw day-sums
    raw_day = _events(spark).groupBy(
        F.date_trunc("day", "ts").alias("_wstart"), "event_type"
    ).agg(F.sum("value").alias("s"))
    j = l2.join(raw_day, ["_wstart", "event_type"])
    assert j.where(F.abs(F.col("sum_value") - F.col("s")) > 1e-6).count() == 0


def test_delete_where(spark, tmpdir):
    ev = _events(spark).select("event_id", "ts", "user_id", "value")
    ev.write.mode("overwrite").parquet(f"{tmpdir}/tbl")
    n_match = spark.read.parquet(f"{tmpdir}/tbl").where("user_id = 3").count()
    deleted = delete_where(spark, f"{tmpdir}/tbl", F.col("user_id") == 3)
    assert deleted == n_match > 0
    assert spark.read.parquet(f"{tmpdir}/tbl").where("user_id = 3").count() == 0


def test_forecast_linear(spark):
    rows = [("a", f"2024-01-01 00:00:{i:02d}", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t string, v double").select(
        "k", F.col("t").cast("timestamp").alias("t"), "v"
    )
    out = forecast_linear(df, "t", "v", 3, "1s", ["k"]).orderBy("t").collect()
    assert len(out) == 3
    # perfect linear series: forecast continues 10, 11, 12
    assert [r.forecast_value for r in out] == [10.0, 11.0, 12.0]
    assert all(r.is_forecast for r in out)


def test_impute_linear(spark):
    rows = [
        ("a", "2024-01-01 00:00:00", 0.0),
        ("a", "2024-01-01 00:00:10", None),
        ("a", "2024-01-01 00:00:20", 20.0),
    ]
    df = spark.createDataFrame(rows, "k string, t string, v double").select(
        "k", F.col("t").cast("timestamp").alias("t"), "v"
    )
    out = impute_missing(df, "t", "v", ["k"]).orderBy("t").collect()
    assert [r.v_imputed for r in out] == [0.0, 10.0, 20.0]


def test_anomaly_zscore(spark):
    vals = [10.0] * 20 + [1000.0]
    rows = [("a", f"2024-01-01 00:00:{i:02d}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t string, v double").select(
        "k", F.col("t").cast("timestamp").alias("t"), "v"
    )
    out = anomaly_zscore(df, "t", "v", ["k"], k=3.0)
    flagged = out.where("is_anomaly").collect()
    assert len(flagged) == 1 and flagged[0].v == 1000.0


def test_dtw_and_tlcc(spark):
    import math

    rows = []
    for i in range(30):
        rows.append(("s1", f"2024-01-01 00:00:{i:02d}", math.sin(i / 5)))
        rows.append(("s2", f"2024-01-01 00:00:{i:02d}", math.sin(i / 5)))
        rows.append(("s3", f"2024-01-01 00:00:{i:02d}", math.cos(i / 5)))
    df = spark.createDataFrame(rows, "k string, t string, v double").select(
        "k", F.col("t").cast("timestamp").alias("t"), "v"
    )
    d = {
        (r.key_a, r.key_b): r.dtw
        for r in dtw_distance(df, "t", "v", "k", [("s1", "s2"), ("s1", "s3")]).collect()
    }
    assert d[("s1", "s2")] == 0.0  # identical series
    assert d[("s1", "s3")] > 0.0
    cc = {r.lag: r.corr for r in tlcc(df, "t", "v", "k", "s1", "s2", 3).collect()}
    assert cc[0] == 1.0  # identical series correlate perfectly at lag 0


def test_dtw_path(spark):
    rows = [("a", f"2024-01-01 00:00:{i:02d}", float(i)) for i in range(5)]
    rows += [("b", f"2024-01-01 00:00:{i:02d}", float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, t string, v double").select(
        "k", F.col("t").cast("timestamp").alias("t"), "v"
    )
    from tdengine_spark.functions.analytics import dtw_path

    out = dtw_path(df, "t", "v", "k", "a", "b").orderBy("step").collect()
    # identical series: diagonal path, distance 0
    assert [(r.i, r.j) for r in out] == [(i, i) for i in range(5)]
    assert all(r.dtw == 0.0 for r in out)


def test_notify_hook(spark):
    from tdengine_spark.streaming.notify import notify_on_close

    captured = []
    hook = notify_on_close(lambda events: captured.extend(events))
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "wid int, k string")
    hook(batch, batch_id=7)
    assert len(captured) == 2
    assert captured[0]["event"] == "WINDOW_CLOSE"
    assert captured[0]["batch_id"] == 7
    assert {e["k"] for e in captured} == {"a", "b"}


def test_query_pseudocols(spark):
    from tdengine_spark.catalog import Database
    from tdengine_spark.query_builder import Scan

    df = (
        Scan(Database(root=SF), "events", spark)
        .range("2024-01-05", "2024-01-06")
        .df(query_pseudocols=True)
    )
    row = df.select("_qstart", "_qend", "_qduration").first()
    assert str(row._qstart) == "2024-01-05 00:00:00"
    assert row._qduration == 86400 * 1_000_000
