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


def forecast_arima(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    horizon_rows: int,
    every: str,
    partition_by: "list[str] | None" = None,
    p: int = 1,
    d: int = 1,
    conf: float = 0.95,
) -> DataFrame:
    """forecast(col, 'algo=arima'): ARIMA(p,d,0) per key — conditional
    least squares (CSS): difference ``d`` times, fit AR(p) on the lagged
    differences by OLS (numpy lstsq), forecast ``horizon_rows`` steps by
    the AR recursion, then integrate ``d`` times back to levels. The
    same algo surface as the reference's TDgpt forecast
    (include/common/tanalytics.h:28,110 — algo param routed by name),
    with a deterministic public estimator instead of the model daemon.

    Iterative per-key recursion → grouped applyInPandas (Arrow-batched;
    keys are independent so the fit scales horizontally like every other
    per-key analytic). Output: (keys..., ts, forecast_value,
    forecast_low, forecast_high, is_forecast)."""
    keys = list(partition_by or [])
    step_us = parse_duration(every).microseconds
    z = _norm_ppf(0.5 + conf / 2.0)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name in keys
    )
    out_schema = (
        (key_fields + ", " if key_fields else "")
        + f"{ts_col} timestamp, forecast_value double, "
        + "forecast_low double, forecast_high double, is_forecast boolean"
    )
    sel = df.select(*keys, ts_col, F.col(val_col).cast("double").alias("_v"))

    def fit_group(key_vals, pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(ts_col)
        y = g["_v"].to_numpy(dtype=np.float64)
        y = y[~np.isnan(y)]
        t1 = g[ts_col].max()
        cols = [*keys, ts_col, "forecast_value", "forecast_low",
                "forecast_high", "is_forecast"]
        if len(y) == 0:
            return pd.DataFrame(columns=cols)
        # difference d times, remembering the boundary values for the
        # integration step
        tails = []
        x = y.copy()
        for _ in range(d):
            if len(x) < 2:
                break
            tails.append(x[-1])
            x = np.diff(x)
        eff_d = len(tails)
        if len(x) <= p or p < 1:
            # not enough samples to fit: flat forecast from the mean
            phi = np.zeros(max(p, 1))
            c = float(x.mean()) if len(x) else 0.0
            hist = x if len(x) else np.zeros(1)
            sigma = 0.0
        else:
            # CSS: OLS of x_t on (1, x_{t-1..t-p})
            rows = len(x) - p
            X = np.ones((rows, p + 1))
            for j in range(p):
                X[:, 1 + j] = x[p - 1 - j: len(x) - 1 - j]
            b, *_ = np.linalg.lstsq(X, x[p:], rcond=None)
            c, phi = float(b[0]), b[1:]
            resid = x[p:] - X @ b
            sigma = float(np.std(resid, ddof=0))
            hist = x
        # AR recursion over the differenced series
        buf = list(hist[-max(p, 1):])
        dhat = []
        for _ in range(horizon_rows):
            v = c + sum(
                phi[j] * buf[-1 - j] for j in range(min(p, len(buf)))
            )
            dhat.append(v)
            buf.append(v)
        # integrate back to levels
        level = np.asarray(dhat, dtype=np.float64)
        for tail in reversed(tails):
            level = tail + np.cumsum(level)
        if eff_d == 0:
            level = np.asarray(dhat, dtype=np.float64)
        hs = np.arange(1, horizon_rows + 1, dtype=np.float64)
        band = z * sigma * np.sqrt(hs)
        ts_out = pd.to_datetime(t1) + pd.to_timedelta(
            hs * step_us, unit="us"
        )
        out = pd.DataFrame(
            {
                ts_col: ts_out,
                "forecast_value": np.round(level, 4),
                "forecast_low": np.round(level - band, 4),
                "forecast_high": np.round(level + band, 4),
                "is_forecast": True,
            }
        )
        for k, v in zip(keys, key_vals):
            out[k] = v
        return out[cols]

    return sel.groupBy(*keys).applyInPandas(fit_group, out_schema)


#: forecast algo registry — the reference routes forecast(col,
#: 'algo=<name>') to its TDgpt daemon (tanalytics.h:28); here each name
#: maps to a deterministic local estimator with the same output shape
FORECAST_ALGOS = ("linear", "holt", "holtwinters", "arima")


def forecast(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    horizon_rows: int,
    every: str,
    partition_by: "list[str] | None" = None,
    algo: str = "linear",
    **params,
) -> DataFrame:
    """Algo-routed forecast — the reference's param surface
    (forecast(col, 'algo=…') builtins.c:6735)."""
    a = algo.lower()
    if a == "linear":
        return forecast_linear(
            df, ts_col, val_col, horizon_rows, every, partition_by
        )
    if a == "holt":
        return forecast_holt(
            df, ts_col, val_col, horizon_rows, every, partition_by, **params
        )
    if a == "holtwinters":
        params.setdefault("season_length", 24)
        return forecast_holt(
            df, ts_col, val_col, horizon_rows, every, partition_by, **params
        )
    if a == "arima":
        return forecast_arima(
            df, ts_col, val_col, horizon_rows, every, partition_by, **params
        )
    raise ValueError(f"unknown forecast algo {algo!r} (one of {FORECAST_ALGOS})")


def forecast_holt(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    horizon_rows: int,
    every: str,
    partition_by: "list[str] | None" = None,
    alpha: float = 0.5,
    beta: float = 0.3,
    conf: float = 0.95,
    season_length: "int | None" = None,
    gamma: float = 0.3,
) -> DataFrame:
    """forecast(col, 'algo=holtwinters'): Holt-Winters exponential
    smoothing per key — the model-based counterpart to
    ``forecast_linear`` (reference forecast params rows/conf per
    include/common/tanalytics.h:32-46; builtins.c:6735).

    Without ``season_length``: Holt's linear. Init l0=x0, b0=x1−x0;
    recursion l_t=αx_t+(1−α)(l+b), b_t=β(l_t−l)+(1−β)b. Forecast
    ŷ_{T+h}=l_T+h·b_T.

    With ``season_length=m`` (requires ≥2m samples): additive seasonal
    component — s initialized from the first-cycle deviations,
    l_t=α(x_t−s_{t−m})+(1−α)(l+b), s_t=γ(x_t−l_t)+(1−γ)s_{t−m},
    ŷ_{T+h}=l_T+h·b_T+s_{T+h−m·⌈h/m⌉}.

    Confidence band: ±z(conf)·σ̂·√h from one-step in-sample residuals.

    Iterative recursion → grouped applyInPandas (one task per key; keys
    are independent, scales horizontally). Output: (keys..., ts,
    forecast_value, forecast_low, forecast_high, is_forecast).
    """
    keys = list(partition_by or [])
    step_us = parse_duration(every).microseconds
    z = _norm_ppf(0.5 + conf / 2.0)
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name in keys
    )
    out_schema = (
        (key_fields + ", " if key_fields else "")
        + f"{ts_col} timestamp, forecast_value double, "
        + "forecast_low double, forecast_high double, is_forecast boolean"
    )

    sel = df.select(*keys, ts_col, F.col(val_col).cast("double").alias("_v"))

    def fit_group(key_vals, pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(ts_col)
        x = g["_v"].to_numpy(dtype=np.float64)
        x = x[~np.isnan(x)]
        t1 = g[ts_col].max()
        if len(x) == 0:
            return pd.DataFrame(
                columns=[*keys, ts_col, "forecast_value", "forecast_low",
                         "forecast_high", "is_forecast"]
            )
        m = season_length
        seasonal = m is not None and len(x) >= 2 * m
        season = None
        if len(x) == 1:
            level, trend, sigma = float(x[0]), 0.0, 0.0
        elif seasonal:
            # init from the first cycle: level = cycle mean, trend =
            # mean cycle-over-cycle step, season = first-cycle deviations
            level = float(x[:m].mean())
            trend = float((x[m : 2 * m].mean() - x[:m].mean()) / m)
            season = (x[:m] - level).astype(np.float64).copy()
            errs = []
            for t in range(m, len(x)):
                s_prev = season[t % m]
                pred = level + trend + s_prev
                errs.append(x[t] - pred)
                new_level = alpha * (x[t] - s_prev) + (1 - alpha) * (level + trend)
                trend = beta * (new_level - level) + (1 - beta) * trend
                level = new_level
                season[t % m] = gamma * (x[t] - new_level) + (1 - gamma) * s_prev
            sigma = float(np.std(np.asarray(errs), ddof=0))
        else:
            level, trend = float(x[0]), float(x[1] - x[0])
            errs = []
            for v in x[1:]:
                pred = level + trend
                errs.append(v - pred)
                new_level = alpha * v + (1 - alpha) * (level + trend)
                trend = beta * (new_level - level) + (1 - beta) * trend
                level = new_level
            sigma = float(np.std(np.asarray(errs), ddof=0))
        hs = np.arange(1, horizon_rows + 1, dtype=np.float64)
        yhat = level + hs * trend
        if seasonal:
            idx = (len(x) + np.arange(horizon_rows)) % m
            yhat = yhat + season[idx]
        half = z * sigma * np.sqrt(hs)
        future_ts = pd.Timestamp(t1) + pd.to_timedelta(
            hs * step_us, unit="us"
        )
        # unrounded: callers round once (rounding here then again in a
        # caller is a double-round that shifts boundary values)
        out = pd.DataFrame(
            {
                ts_col: future_ts,
                "forecast_value": yhat,
                "forecast_low": yhat - half,
                "forecast_high": yhat + half,
                "is_forecast": True,
            }
        )
        for kcol, kval in zip(keys, key_vals):
            out.insert(0, kcol, kval)
        return out[[*keys, ts_col, "forecast_value", "forecast_low",
                    "forecast_high", "is_forecast"]]

    grouped = sel.groupBy(*keys) if keys else sel.groupBy(F.lit(1).alias("_g"))
    if keys:
        return grouped.applyInPandas(fit_group, out_schema)
    return grouped.applyInPandas(
        lambda kv, pdf: fit_group((), pdf), out_schema
    )


def _norm_ppf(p: float) -> float:
    """Standard-normal quantile (Acklam's rational approximation —
    |err| < 1.15e-9; avoids a scipy dependency)."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0,1)")
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = float(np.sqrt(-2 * np.log(p)))
        num = ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
        den = (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        return num / den
    if p > phigh:
        q = float(np.sqrt(-2 * np.log(1 - p)))
        num = ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
        den = (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        return -num / den
    q = p - 0.5
    r = q * q
    num = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q
    den = ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    return num / den


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


#: detector algorithms accepted by anomaly_detect / anomaly_window —
#: the reference's ANOMALY_WINDOW(col, 'algo=...') parameter
#: (anomalywindowoperator.c:138; tanalytics.h algo list)
ANOMALY_ALGOS = ("ksigma", "mad", "iqr", "grubbs", "esd", "shesd", "lof")

#: MAD → σ-equivalent scale for a normal distribution
_MAD_SCALE = 1.4826


def anomaly_detect(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    partition_by: "list[str] | None" = None,
    algo: str = "ksigma",
    k: float = 3.0,
    season_length: "int | None" = None,
) -> DataFrame:
    """anomalycheck(col, algo): flag per-key outliers. Adds ``score`` +
    ``is_anomaly`` (and keeps ``zscore`` as an alias column for ksigma).

    - ``ksigma`` (reference default): |v − mean| > k·stddev_pop.
    - ``mad``: |v − median| > k·(1.4826·MAD) — robust to the outliers
      themselves inflating the spread.
    - ``iqr``: v outside [q1 − k·IQR, q3 + k·IQR] (use k=1.5 for the
      Tukey fences); score = (v − median)/IQR.

    All three are unbounded-window aggregates over the partition keys —
    one shuffle, no Python; the two-level MAD median is two window
    passes over the same sort order (Catalyst reuses the exchange).
    """
    keys = list(partition_by or [])
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    v = F.col(val_col).cast("double")
    if algo == "ksigma":
        mu = F.avg(v).over(w)
        sd = F.stddev_pop(v).over(w)
        score = F.when(sd > 0, (v - mu) / sd).otherwise(F.lit(0.0))
        # score left unrounded: rounding here then again in a caller is a
        # double-round that shifts values near decimal boundaries
        return (
            df.withColumn("score", score)
            .withColumn("zscore", F.col("score"))
            .withColumn("is_anomaly", F.abs(F.col("score")) > k)
        )
    if algo == "mad":
        med = F.expr(f"percentile({val_col}, 0.5)").over(w)
        out = df.withColumn("_med", med)
        dev = F.abs(v - F.col("_med"))
        mad = F.expr("percentile(abs(cast({v} as double) - _med), 0.5)".format(v=val_col)).over(w)
        out = out.withColumn("_mad", mad)
        score = F.when(
            F.col("_mad") > 0, (v - F.col("_med")) / (_MAD_SCALE * F.col("_mad"))
        ).otherwise(F.lit(0.0))
        return (
            out.withColumn("score", score)
            .withColumn("is_anomaly", F.abs(F.col("score")) > k)
            .drop("_med", "_mad")
        )
    if algo == "iqr":
        q1 = F.expr(f"percentile({val_col}, 0.25)").over(w)
        q3 = F.expr(f"percentile({val_col}, 0.75)").over(w)
        med = F.expr(f"percentile({val_col}, 0.5)").over(w)
        out = (
            df.withColumn("_q1", q1).withColumn("_q3", q3).withColumn("_med", med)
        )
        iqr = F.col("_q3") - F.col("_q1")
        score = F.when(iqr > 0, (v - F.col("_med")) / iqr).otherwise(F.lit(0.0))
        flag = (v < F.col("_q1") - k * iqr) | (v > F.col("_q3") + k * iqr)
        return (
            out.withColumn("score", score)
            .withColumn("is_anomaly", flag)
            .drop("_q1", "_q3", "_med")
        )
    if algo in ("grubbs", "esd", "shesd"):
        # Grubbs = ESD with one candidate; SHESD = ESD on seasonally
        # detrended residuals; iterative removal needs the whole key
        # group → applyInPandas (keys independent, scales out)
        if algo == "shesd" and not season_length:
            raise ValueError("algo='shesd' needs season_length")
        return _anomaly_esd(
            df, ts_col, val_col, keys,
            max_anomalies=1 if algo == "grubbs" else max(int(k), 1),
            season_length=season_length if algo == "shesd" else None,
        )
    if algo == "lof":
        return _anomaly_lof(df, ts_col, val_col, keys, k=max(int(k), 2))
    raise ValueError(f"unknown anomaly algo {algo!r}; supported: {ANOMALY_ALGOS}")


def _t_ppf(p: float, df: int) -> float:
    """Student-t quantile via the Cornish-Fisher expansion in the normal
    quantile (Abramowitz & Stegun 26.7.5) — adequate for the df ≥ 5 the
    ESD test meets in practice (N ≥ 7)."""
    z = _norm_ppf(p)
    g1 = (z**3 + z) / 4
    g2 = (5 * z**5 + 16 * z**3 + 3 * z) / 96
    g3 = (3 * z**7 + 19 * z**5 + 17 * z**3 - 15 * z) / 384
    g4 = (79 * z**9 + 776 * z**7 + 1482 * z**5 - 1920 * z**3 - 945 * z) / 92160
    return z + g1 / df + g2 / df**2 + g3 / df**3 + g4 / df**4


def _anomaly_esd(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    keys: list,
    max_anomalies: int,
    alpha: float = 0.05,
    season_length: "int | None" = None,
) -> DataFrame:
    """Generalized ESD (Rosner 1983) per key: iteratively remove the
    most extreme |v − mean|/s point, compare R_i against the λ_i
    critical value; all points up to the last significant i are
    anomalies. Grubbs' test = i ≤ 1. ``season_length`` → SHESD (Twitter
    / Hochenbaum 2017): subtract the per-phase seasonal median + the
    overall median, run ESD on the residuals — robust to periodic
    series that plain ESD reads as spread. Output schema matches the
    expression detectors: input columns + score + is_anomaly."""
    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    )
    out_schema = f"{in_fields}, score double, is_anomaly boolean"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        v = pdf[val_col].to_numpy(dtype=np.float64)
        n = len(v)
        if season_length and n >= 2 * season_length:
            phases = np.arange(n) % season_length
            seas = np.zeros(season_length)
            for ph in range(season_length):
                seas[ph] = np.median(v[phases == ph])
            v = v - seas[phases] - np.median(v - seas[phases])
        out = pdf.copy()
        mu0, sd0 = float(np.mean(v)), float(np.std(v, ddof=1)) if n > 1 else 0.0
        out["score"] = (v - mu0) / sd0 if sd0 > 0 else 0.0
        flagged: list[int] = []
        if n >= 7 and sd0 > 0:
            mask = np.ones(n, dtype=bool)
            cand: list[int] = []
            last_sig = 0
            for i in range(1, max_anomalies + 1):
                vv = v[mask]
                if len(vv) < 3:
                    break
                mu, sd = np.mean(vv), np.std(vv, ddof=1)
                if sd == 0:
                    break
                devs = np.abs(vv - mu) / sd
                j_local = int(np.argmax(devs))
                r_i = float(devs[j_local])
                j_global = int(np.flatnonzero(mask)[j_local])
                cand.append(j_global)
                mask[j_global] = False
                ni = len(vv)
                t = _t_ppf(1 - alpha / (2 * ni), ni - 2)
                lam = (ni - 1) * t / np.sqrt((ni - 2 + t * t) * ni)
                if r_i > lam:
                    last_sig = i
            flagged = cand[:last_sig]
        out["is_anomaly"] = False
        if flagged:
            out.iloc[flagged, out.columns.get_loc("is_anomaly")] = True
        return out

    if keys:
        return df.groupBy(*keys).applyInPandas(lambda _, p: run(p), out_schema)
    return df.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda _, p: run(p), out_schema
    )


def _anomaly_lof(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    keys: list,
    k: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Local Outlier Factor (Breunig 2000) on the value distribution per
    key. Univariate shortcut: after sorting, every point's k nearest
    neighbors lie inside a 2k+1 window → one (n, 2k+1) distance matrix
    instead of n² — scale-safe for large keys. Flags LOF > threshold
    (1-D gaussian cluster edges reach LOF ≈ 2.4, so the classic 1.5
    multivariate cutoff over-flags; 3.0 separates cleanly)."""
    in_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
    )
    out_schema = f"{in_fields}, score double, is_anomaly boolean"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[val_col].to_numpy(dtype=np.float64)
        n = len(v)
        out = pdf.copy()
        if n < 2 * k + 2:
            out["score"] = 1.0
            out["is_anomaly"] = False
            return out
        order = np.argsort(v, kind="stable")
        sv = v[order]
        # distinct candidate window per point (edges shift inward so the
        # window always holds 2k+1 DISTINCT indices incl. self)
        starts = np.clip(np.arange(n) - k, 0, n - 2 * k - 1)
        idx = starts[:, None] + np.arange(2 * k + 1)[None, :]
        d = np.abs(sv[idx] - sv[:, None])
        d[idx == np.arange(n)[:, None]] = np.inf  # exclude self
        nbr_pos = np.argsort(d, axis=1, kind="stable")[:, :k]
        knn_d = np.take_along_axis(d, nbr_pos, axis=1)
        nbr_idx = np.take_along_axis(idx, nbr_pos, axis=1)
        kdist = knn_d[:, k - 1]
        reach = np.maximum(kdist[nbr_idx], knn_d)
        lrd = k / np.maximum(reach.sum(axis=1), 1e-12)
        lof = lrd[nbr_idx].mean(axis=1) / np.maximum(lrd, 1e-12)
        score = np.empty(n)
        score[order] = lof
        out["score"] = score
        out["is_anomaly"] = score > threshold
        return out

    if keys:
        return df.groupBy(*keys).applyInPandas(lambda _, p: run(p), out_schema)
    return df.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda _, p: run(p), out_schema
    )


def anomaly_zscore(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    partition_by: "list[str] | None" = None,
    k: float = 3.0,
) -> DataFrame:
    """Back-compat wrapper: anomaly_detect(algo='ksigma')."""
    return anomaly_detect(df, ts_col, val_col, partition_by, "ksigma", k)


def anomaly_window(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    partition_by: "list[str] | None" = None,
    k: float = 3.0,
    algo: str = "ksigma",
):
    """ANOMALY_WINDOW(col, 'algo=...'): windows delimited by detected
    anomalies — anomaly rows become window boundaries (state-window
    kernel over the running anomaly count)."""
    from tdengine_spark.operators.eventwindow import assign_state_windows

    keys = list(partition_by or [])
    flagged = anomaly_detect(df, ts_col, val_col, keys, algo, k)
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
