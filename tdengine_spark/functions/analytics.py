"""Analytics operators — the reference's TDgpt-backed functions
(forecast builtins.c:6735, imputation imputationoperator.c, anomaly
anomalywindowoperator.c, dtw/tlcc builtins.c:7602-7646) re-implemented
with deterministic public algorithms.

Design split:
  - forecast / imputation / z-score anomaly: pure Catalyst expressions
    (OLS via regr_*, window neighbors) — scan-speed, no Python;
  - dtw / tlcc: genuinely iterative dynamic programming → grouped
    applyInPandas with numpy (Arrow-batched, one group per series pair).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tdengine_spark.durations import parse_duration


def forecast_linear(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    horizon_rows: int,
    every: str,
    partition_by: "list[str] | None" = None,
) -> DataFrame:
    """forecast(col): per-key OLS trend extrapolated ``horizon_rows``
    instants past the last sample (the reference's default ARIMA-ish
    TDgpt call replaced by closed-form linear trend — deterministic and
    JVM-side). Output: (keys..., ts, forecast_value, is_forecast)."""
    keys = list(partition_by or [])
    step_us = parse_duration(every).microseconds
    t_us = F.unix_micros(F.col(ts_col)).cast("double")
    fit = df.groupBy(*keys).agg(
        F.regr_slope(F.col(val_col).cast("double"), t_us).alias("_m"),
        F.regr_intercept(F.col(val_col).cast("double"), t_us).alias("_b"),
        F.max(F.unix_micros(F.col(ts_col))).alias("_t1"),
        F.avg(F.col(val_col).cast("double")).alias("_mean"),
    )
    future = fit.select(
        *keys,
        "_m",
        "_b",
        "_mean",
        F.explode(
            F.sequence(
                F.col("_t1") + step_us,
                F.col("_t1") + F.lit(step_us) * horizon_rows,
                F.lit(step_us).cast("long"),
            )
        ).alias("_tf"),
    )
    pred = F.when(
        F.col("_m").isNotNull(), F.col("_m") * F.col("_tf") + F.col("_b")
    ).otherwise(F.col("_mean"))
    return future.select(
        *keys,
        F.timestamp_micros(F.col("_tf")).alias(ts_col),
        F.round(pred, 4).alias("forecast_value"),
        F.lit(True).alias("is_forecast"),
    )


def impute_missing(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    partition_by: "list[str] | None" = None,
    method: str = "linear",
    out_col: "str | None" = None,
) -> DataFrame:
    """imputation(col): fill NULL samples from neighbors in ts order —
    linear (default), prev, next, or mean. Same forward/backward window
    kernel as FILL, applied to raw rows instead of buckets."""
    keys = list(partition_by or [])
    out_col = out_col or f"{val_col}_imputed"
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(val_col).cast("double")
    t = F.unix_micros(F.col(ts_col))
    pv = F.last(v, ignorenulls=True).over(fwd)
    pt = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(fwd)
    nv = F.last(v, ignorenulls=True).over(bwd)
    nt = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(bwd)
    if method == "prev":
        filled = pv
    elif method == "next":
        filled = nv
    elif method == "mean":
        filled = F.avg(v).over(Window.partitionBy(*keys))
    elif method == "linear":
        frac = (t - pt).cast("double") / (nt - pt).cast("double")
        filled = (
            F.when(pt.isNull(), nv)
            .when(nt.isNull(), pv)
            .otherwise(pv + (nv - pv) * frac)
        )
    else:
        raise ValueError(f"unknown imputation method {method!r}")
    return df.withColumn(out_col, F.round(F.coalesce(v, filled), 4))


def anomaly_zscore(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    partition_by: "list[str] | None" = None,
    k: float = 3.0,
) -> DataFrame:
    """anomalycheck(col): flag |v - mean| > k·stddev per key (the
    reference's default ksigma algorithm). Adds is_anomaly + zscore."""
    keys = list(partition_by or [])
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    v = F.col(val_col).cast("double")
    mu = F.avg(v).over(w)
    sd = F.stddev_pop(v).over(w)
    z = F.when(sd > 0, (v - mu) / sd).otherwise(F.lit(0.0))
    # zscore is left unrounded: rounding here then again in a caller is a
    # double-round that shifts values near decimal boundaries
    return df.withColumn("zscore", z).withColumn("is_anomaly", F.abs(z) > k)


def anomaly_window(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    partition_by: "list[str] | None" = None,
    k: float = 3.0,
):
    """ANOMALY_WINDOW(col): windows delimited by detected anomalies —
    anomaly rows become window boundaries (state-window kernel over the
    running anomaly count)."""
    from tdengine_spark.operators.eventwindow import assign_state_windows

    keys = list(partition_by or [])
    flagged = anomaly_zscore(df, ts_col, val_col, keys, k)
    run = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = F.sum(F.col("is_anomaly").cast("int")).over(run)
    return assign_state_windows(
        flagged.withColumn("_anomaly_seg", seg), ts_col, "_anomaly_seg", keys
    )


_DTW_SCHEMA = "key_a string, key_b string, dtw double"


def dtw_distance(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    key_col: str,
    pairs: "list[tuple[str, str]]",
    window: "int | None" = None,
) -> DataFrame:
    """dtw(a, b): dynamic-time-warping distance between named series
    pairs. Iterative DP → numpy inside applyInPandas (one task per pair;
    pairs are independent so this scales horizontally)."""
    sel = df.select(
        F.col(key_col).cast("string").alias("_k"), ts_col, F.col(val_col).cast("double").alias("_v")
    )
    wanted = {str(k) for p in pairs for k in p}
    sel = sel.where(F.col("_k").isin(list(wanted)))
    pair_df = [(str(a), str(b)) for a, b in pairs]

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        series = {
            k: g.sort_values(ts_col)["_v"].to_numpy()
            for k, g in pdf.groupby("_k")
        }
        rows = []
        for a, b in pair_df:
            if a in series and b in series:
                rows.append((a, b, round(_dtw(series[a], series[b], window), 4)))
        return pd.DataFrame(rows, columns=["key_a", "key_b", "dtw"])

    # single logical group: pair count is small by construction (explicit
    # list); for large pair sets, repartition by pair instead
    return (
        sel.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda _, pdf: compute(pdf), _DTW_SCHEMA)
    )


def dtw_path(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    key_col: str,
    key_a: str,
    key_b: str,
    window: "int | None" = None,
) -> DataFrame:
    """dtw_path(a, b) (builtins.c:7624): the optimal warping path as
    (step, i, j) rows plus the distance."""
    sel = df.select(
        F.col(key_col).cast("string").alias("_k"), ts_col,
        F.col(val_col).cast("double").alias("_v"),
    ).where(F.col("_k").isin([str(key_a), str(key_b)]))

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        g = {k: s.sort_values(ts_col)["_v"].to_numpy() for k, s in pdf.groupby("_k")}
        a, b = g.get(str(key_a)), g.get(str(key_b))
        rows = []
        if a is not None and b is not None:
            dist, path = _dtw_with_path(a, b, window)
            for step, (i, j) in enumerate(path):
                rows.append((step, i, j, round(dist, 4)))
        return pd.DataFrame(rows, columns=["step", "i", "j", "dtw"])

    return (
        sel.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda _, pdf: compute(pdf), "step int, i int, j int, dtw double"
        )
    )


def _dtw_with_path(a, b, window=None):
    n, m = len(a), len(b)
    w = max(window, abs(n - m)) if window else max(n, m)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        lo, hi = max(1, i - w), min(m, i + w)
        for j in range(lo, hi + 1):
            cost = abs(a[i - 1] - b[j - 1])
            D[i, j] = cost + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    # backtrack
    path = []
    i, j = n, m
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        k = int(np.argmin([D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]]))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    path.reverse()
    return float(D[n, m]), path


def _dtw(a: np.ndarray, b: np.ndarray, window: "int | None" = None) -> float:
    n, m = len(a), len(b)
    w = max(window, abs(n - m)) if window else max(n, m)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        lo, hi = max(1, i - w), min(m, i + w)
        for j in range(lo, hi + 1):
            cost = abs(a[i - 1] - b[j - 1])
            D[i, j] = cost + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return float(D[n, m])


def tlcc(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    key_col: str,
    key_a: str,
    key_b: str,
    max_lag: int = 10,
) -> DataFrame:
    """tlcc(a, b): time-lagged cross-correlation — Pearson correlation of
    b shifted by each lag in [-max_lag, max_lag]. Output (lag, corr)."""
    sel = df.select(
        F.col(key_col).cast("string").alias("_k"), ts_col, F.col(val_col).cast("double").alias("_v")
    ).where(F.col("_k").isin([str(key_a), str(key_b)]))

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        g = {k: s.sort_values(ts_col)["_v"].to_numpy() for k, s in pdf.groupby("_k")}
        a, b = g.get(str(key_a)), g.get(str(key_b))
        rows = []
        if a is not None and b is not None:
            n = min(len(a), len(b))
            a, b = a[:n], b[:n]
            for lag in range(-max_lag, max_lag + 1):
                if lag < 0:
                    x, y = a[-lag:], b[: n + lag]
                else:
                    x, y = a[: n - lag] if lag else a, b[lag:]
                if len(x) > 1 and np.std(x) > 0 and np.std(y) > 0:
                    rows.append((lag, round(float(np.corrcoef(x, y)[0, 1]), 4)))
                else:
                    rows.append((lag, None))
        return pd.DataFrame(rows, columns=["lag", "corr"])

    return (
        sel.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda _, pdf: compute(pdf), "lag int, corr double")
    )
