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


def test_anomaly_mad_and_iqr(spark):
    from tdengine_spark.functions.analytics import anomaly_detect

    # 10 spread inliers around 10 plus one gross outlier; median=10,
    # MAD=1 (robust), q1=9.5 q3=11 — only the outlier trips either fence
    vals = [8.0, 9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 10.0, 1000.0]
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "ts long, v double"
    )
    mad = anomaly_detect(df, "ts", "v", algo="mad", k=3.0).collect()
    flagged = {r.ts for r in mad if r.is_anomaly}
    assert flagged == {10}
    iqr = anomaly_detect(df, "ts", "v", algo="iqr", k=1.5).collect()
    assert {r.ts for r in iqr if r.is_anomaly} == {10}
    with __import__("pytest").raises(ValueError):
        anomaly_detect(df, "ts", "v", algo="nope").collect()


def test_anomaly_mad_flags_outlier_nonzero_mad(spark):
    from tdengine_spark.functions.analytics import anomaly_detect

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ts long, v double"
    )
    out = anomaly_detect(df, "ts", "v", algo="mad", k=3.0).collect()
    by_ts = {r.ts: r for r in out}
    assert by_ts[9].is_anomaly
    assert not by_ts[4].is_anomaly
    # median=5.5, MAD=median(|v-5.5|)=2.5 → score(100)=(100-5.5)/(1.4826*2.5)
    assert abs(by_ts[9].score - (100 - 5.5) / (1.4826 * 2.5)) < 1e-9


def test_forecast_holt_golden(spark):
    """General (alpha, beta) recursion against a hand-run golden trace."""
    import numpy as np

    from tdengine_spark.functions.analytics import forecast_holt

    xs = [10.0, 12.0, 11.0, 13.0, 14.0]
    base = 1_700_000_000_000_000  # us epoch
    step = 3_600_000_000
    rows = [(i, base + i * step, v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "i long, ts_us long, v double").select(
        F.timestamp_micros(F.col("ts_us")).alias("ts"), "v"
    )
    alpha, beta = 0.5, 0.3
    out = forecast_holt(
        df, "ts", "v", horizon_rows=3, every="1h", alpha=alpha, beta=beta
    ).collect()
    # independent replica of the recursion
    level, trend = xs[0], xs[1] - xs[0]
    errs = []
    for v in xs[1:]:
        errs.append(v - (level + trend))
        nl = alpha * v + (1 - alpha) * (level + trend)
        trend = beta * (nl - level) + (1 - beta) * trend
        level = nl
    sigma = float(np.std(errs))
    z = 1.959963986120195
    got = sorted((r.ts, r.forecast_value, r.forecast_low, r.forecast_high)
                 for r in out)
    assert len(got) == 3
    for h, (ts_, fv, lo, hi) in enumerate(got, start=1):
        want = level + h * trend
        assert abs(fv - want) < 1e-9
        assert abs(lo - (want - z * sigma * np.sqrt(h))) < 1e-9
        assert abs(hi - (want + z * sigma * np.sqrt(h))) < 1e-9
    import datetime as _dt

    t1_plus_1h = _dt.datetime.utcfromtimestamp((base + 5 * step) / 1e6)
    assert got[0][0] == t1_plus_1h  # t1 + 1h


def test_forecast_holt_single_point(spark):
    from tdengine_spark.functions.analytics import forecast_holt

    df = spark.createDataFrame(
        [(1_700_000_000_000_000, 42.0)], "ts_us long, v double"
    ).select(F.timestamp_micros(F.col("ts_us")).alias("ts"), "v")
    out = forecast_holt(df, "ts", "v", horizon_rows=2, every="1h").collect()
    assert [r.forecast_value for r in sorted(out, key=lambda r: r.ts)] == [42.0, 42.0]
    assert all(r.forecast_low == 42.0 and r.forecast_high == 42.0 for r in out)


def test_information_schema_views(spark):
    from tdengine_spark.catalog import Database, information_schema

    db = Database(root=SF)
    db.tables.clear()
    tbl = db.table("events")
    tbl.tag_cols = ("event_type",)
    stables = information_schema(spark, {"d": db}, "ins_stables").collect()
    assert len(stables) == 1 and stables[0].stable_name == "events"
    # columns counts data columns only — the event_type tag is excluded
    # (reference systable userStbsSchema: tags are counted in `tags`)
    assert stables[0].columns == 5 and stables[0].tags == 1
    cols = information_schema(spark, {"d": db}, "ins_columns").collect()
    assert [c.col_name for c in sorted(cols, key=lambda r: r.col_position)] == [
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]
    tags = information_schema(spark, {"d": db}, "ins_tags").collect()
    assert [(t.tag_name, t.tag_type) for t in tags] == [("event_type", "string")]


def test_forecast_holtwinters_seasonal(spark):
    """Additive seasonal Holt-Winters recovers a clean season+trend."""
    import numpy as np

    from tdengine_spark.functions.analytics import forecast_holt

    m = 4
    season = [10.0, -5.0, 0.0, -5.0]
    base = 1_700_000_000_000_000
    step = 3_600_000_000
    xs = [100.0 + 0.5 * t + season[t % m] for t in range(24)]
    rows = [(base + t * step, v) for t, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "ts_us long, v double").select(
        F.timestamp_micros(F.col("ts_us")).alias("ts"), "v"
    )
    out = sorted(
        forecast_holt(
            df, "ts", "v", horizon_rows=m, every="1h",
            alpha=0.5, beta=0.3, season_length=m, gamma=0.3,
        ).collect(),
        key=lambda r: r.ts,
    )
    assert len(out) == m
    # a noiseless seasonal series forecasts within a tight band
    for h, r in enumerate(out, start=1):
        want = 100.0 + 0.5 * (24 + h - 1) + season[(24 + h - 1) % m]
        assert abs(r.forecast_value - want) < 1.0, (h, r.forecast_value, want)
    # fewer than 2 cycles falls back to Holt linear (no crash)
    short = spark.createDataFrame(rows[:6], "ts_us long, v double").select(
        F.timestamp_micros(F.col("ts_us")).alias("ts"), "v"
    )
    assert forecast_holt(
        short, "ts", "v", horizon_rows=2, every="1h", season_length=4
    ).count() == 2


def test_anomaly_grubbs_esd(spark):
    import numpy as np

    from tdengine_spark.functions.analytics import anomaly_detect

    rng = np.random.default_rng(3)
    vals = list(10 + rng.standard_normal(30))
    outliers = {30: 100.0, 31: -80.0, 32: 90.0}
    for i, v in outliers.items():
        vals.append(v)
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "ts long, v double"
    )
    esd = anomaly_detect(df, "ts", "v", algo="esd", k=5)
    assert {r.ts for r in esd.collect() if r.is_anomaly} == set(outliers)
    # Grubbs: at most ONE flag — the most extreme |v−mean|/s point,
    # which is −80 (ts=31): the mean sits near 12, so its deviation
    # beats +100's
    gr = [r.ts for r in anomaly_detect(df, "ts", "v", algo="grubbs").collect()
          if r.is_anomaly]
    assert gr == [31]
    # clean data: no flags
    clean = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(10 + rng.standard_normal(40))],
        "ts long, v double",
    )
    assert not any(
        r.is_anomaly
        for r in anomaly_detect(clean, "ts", "v", algo="esd", k=5).collect()
    )


def test_anomaly_shesd_seasonal(spark):
    """Plain ESD drowns a modest spike in seasonal spread; SHESD detrends
    the season first and catches it."""
    import numpy as np

    from tdengine_spark.functions.analytics import anomaly_detect

    rng = np.random.default_rng(9)
    m = 12
    season = 30 * np.sin(2 * np.pi * np.arange(m) / m)
    vals = []
    for t in range(120):
        vals.append(float(season[t % m] + rng.normal(0, 0.5)))
    vals[60] += 12.0  # spike small vs the ±30 seasonal swing
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ts long, v double"
    )
    shesd = {
        r.ts
        for r in anomaly_detect(
            df, "ts", "v", algo="shesd", k=4, season_length=m
        ).collect()
        if r.is_anomaly
    }
    assert 60 in shesd
    esd = {
        r.ts
        for r in anomaly_detect(df, "ts", "v", algo="esd", k=4).collect()
        if r.is_anomaly
    }
    assert 60 not in esd  # the seasonal spread hides it from plain ESD
    import pytest as _pytest

    with _pytest.raises(ValueError, match="season_length"):
        anomaly_detect(df, "ts", "v", algo="shesd")


def test_anomaly_lof(spark):
    import numpy as np

    from tdengine_spark.functions.analytics import anomaly_detect

    rng = np.random.default_rng(4)
    # two dense clusters + two isolated points between/beyond them
    vals = list(rng.normal(0, 0.3, 50)) + list(rng.normal(20, 0.3, 50))
    vals += [10.0, 40.0]
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "ts long, v double"
    )
    out = anomaly_detect(df, "ts", "v", algo="lof", k=10).collect()
    flagged = {r.ts for r in out if r.is_anomaly}
    assert flagged == {100, 101}
    # the isolated points dominate the score ranking
    top2 = {r.ts for r in sorted(out, key=lambda r: -r.score)[:2]}
    assert top2 == {100, 101}


def test_forecast_arima_matches_closed_form(spark):
    """ARIMA(1,1,0) via the numpy CSS kernel equals the closed-form
    geometric-series forecast (the forecast_arima gate's JVM path)."""
    import numpy as np
    import pandas as pd

    from tdengine_spark.functions.analytics import forecast, forecast_arima

    rng = np.random.RandomState(7)
    n = 60
    ts = pd.date_range("2024-01-01", periods=n, freq="h")
    y = np.cumsum(rng.normal(0.5, 1.0, n)) + 100
    pdf = pd.DataFrame({"ts": ts, "v": y})
    df = spark.createDataFrame(pdf)

    out = forecast_arima(df, "ts", "v", 5, "1h", p=1, d=1).orderBy("ts")
    got = [r.forecast_value for r in out.collect()]

    # closed form: OLS of dv on lagged dv
    dv = np.diff(y)
    X = np.vstack([np.ones(len(dv) - 1), dv[:-1]]).T
    b, *_ = np.linalg.lstsq(X, dv[1:], rcond=None)
    c, phi = b
    d_t, y_t = dv[-1], y[-1]
    level = []
    acc = y_t
    for h in range(1, 6):
        dhat = c * (1 - phi ** h) / (1 - phi) + phi ** h * d_t
        acc += dhat
        level.append(round(acc, 4))
    assert got == pytest.approx(level, abs=1e-3)

    # algo dispatcher + p=2 sanity: right shape, finite values
    out2 = forecast(df, "ts", "v", 4, "1h", algo="arima", p=2, d=1)
    rows = out2.collect()
    assert len(rows) == 4
    assert all(np.isfinite(r.forecast_value) for r in rows)
    assert all(r.forecast_low <= r.forecast_value <= r.forecast_high
               for r in rows)
