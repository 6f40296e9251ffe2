"""Aggregate functions with TDengine semantics (reference registry
source/libs/function/src/builtins.c, impls builtinsimpl.c).

Everything here is built from JVM-side Catalyst expressions — no Python
UDFs — so partial/final aggregation, codegen and spill all apply. The
window-based ones (twa, irate) cost one per-key ordered window, identical
in shape to the reference's per-child-table ts-ordered pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tdengine_spark.durations import parse_duration


def spread(col: "str | Column") -> Column:
    """spread = max - min (builtins.c:3441)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.max(c) - F.min(c)


def elapsed(ts_col: "str | Column", unit: "str | int" = "a") -> Column:
    """elapsed(ts[, unit]): time span covered by the group's samples
    (builtins.c:3516). Default unit ms (db precision)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    unit_us = parse_duration(f"1{unit}" if isinstance(unit, str) else unit).microseconds
    return (F.max(F.unix_micros(c)) - F.min(F.unix_micros(c))) / F.lit(unit_us)


def leastsquares(ts_col: "str | Column", val_col: "str | Column") -> Column:
    """leastsquares(val) vs ts (builtins.c:3110) → struct(slope, intercept).

    Uses Spark's regr_slope/regr_intercept (numerically the same closed
    form the reference computes)."""
    t = F.unix_micros(F.col(ts_col) if isinstance(ts_col, str) else ts_col).cast("double")
    v = (F.col(val_col) if isinstance(val_col, str) else val_col).cast("double")
    return F.struct(
        F.regr_slope(v, t).alias("slope"), F.regr_intercept(v, t).alias("intercept")
    )


def hyperloglog(col: "str | Column", rsd: float = 0.05) -> Column:
    """hyperloglog(col) → approx distinct (builtins.c:4151)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.approx_count_distinct(c, rsd)


def apercentile(col: "str | Column", p: float) -> Column:
    """apercentile(col, p): t-digest approx percentile (builtins.c:3250) →
    Spark percentile_approx."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile_approx(c, p / 100.0, 10000)


def percentile(col: "str | Column", p: float) -> Column:
    """percentile(col, p): exact, linear interpolation (tpercentile.c)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.percentile(c, F.lit(p / 100.0))


def histogram_linear(
    df: DataFrame,
    col: str,
    start: float,
    width: float,
    count: int,
    partition_by: "list[str] | None" = None,
    normalized: bool = False,
) -> DataFrame:
    """histogram(col, 'linear_bin', ...) (builtins.c:4032): fixed-width
    bins [start + i*width, start + (i+1)*width). Returns one row per
    non-empty bin: (partition..., bin_lower, bin_upper, bin_count)."""
    if not 1 <= int(count) <= 1000:  # builtins.c:788 binDesc "count" bound
        raise ValueError('histogram "count" should be in range [1, 1000]')
    if width == 0:
        raise ValueError('histogram "width" cannot be 0')
    keys = list(partition_by or [])
    v = F.col(col).cast("double")
    idx = F.floor((v - start) / width)
    binned = df.where((v >= start) & (v < start + width * count)).withColumn(
        "_bin", idx.cast("int")
    )
    out = binned.groupBy(*keys, "_bin").agg(F.count(F.lit(1)).alias("bin_count"))
    out = out.select(
        *keys,
        (F.lit(start) + F.col("_bin") * width).alias("bin_lower"),
        (F.lit(start) + (F.col("_bin") + 1) * width).alias("bin_upper"),
        "bin_count",
    )
    if normalized:
        tot = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
        out = out.withColumn(
            "bin_count", F.col("bin_count") / F.sum("bin_count").over(tot)
        )
    return out.orderBy(*keys, "bin_lower")


def histogram_log(
    df: DataFrame,
    col: str,
    base: float,
    start: float,
    count: int,
    partition_by: "list[str] | None" = None,
) -> DataFrame:
    """histogram(col, 'log_bin', ...): bins [start*base^i, start*base^(i+1))."""
    if not 1 <= int(count) <= 1000:  # builtins.c:788 binDesc "count" bound
        raise ValueError('histogram "count" should be in range [1, 1000]')
    if start == 0:
        raise ValueError('histogram "start" cannot be 0 with "log_bin" type')
    if base <= 0 or base == 1:
        raise ValueError('histogram "factor" cannot be negative or 0/1')
    keys = list(partition_by or [])
    v = F.col(col).cast("double")
    idx = F.floor(F.log(float(base), v / start))
    binned = df.where((v >= start) & (v < start * (base ** count))).withColumn(
        "_bin", idx.cast("int")
    )
    out = binned.groupBy(*keys, "_bin").agg(F.count(F.lit(1)).alias("bin_count"))
    return out.select(
        *keys,
        (F.lit(start) * F.pow(F.lit(float(base)), F.col("_bin"))).alias("bin_lower"),
        (F.lit(start) * F.pow(F.lit(float(base)), F.col("_bin") + 1)).alias("bin_upper"),
        "bin_count",
    ).orderBy(*keys, "bin_lower")


def twa(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    partition_by: "list[str] | None" = None,
    out_col: str = "twa",
) -> DataFrame:
    """twa(val): time-weighted average (builtins.c:4008) — trapezoid
    integration of the piecewise-linear series over [first_ts, last_ts],
    divided by the span. Single-sample groups return the sample value.

    One lag window per key + one aggregate; all JVM-side.
    """
    keys = list(partition_by or [])
    w = Window.partitionBy(*keys).orderBy(ts_col)
    t = F.unix_micros(F.col(ts_col)).cast("double")
    v = F.col(val_col).cast("double")
    # NULL samples do not participate (reference skips them), but the
    # group itself must survive all-NULL input (twa = NULL) — so link
    # each non-null sample to the previous NON-NULL one instead of
    # filtering rows out before the window pass
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wprev)
    prev_v = F.last(F.when(v.isNotNull(), v), ignorenulls=True).over(wprev)
    area = F.when(
        v.isNotNull() & prev_t.isNotNull(),
        (v + prev_v) / 2.0 * (t - prev_t),
    ).otherwise(0.0)
    staged = df.select(
        *keys,
        F.when(v.isNotNull(), t).alias("_t"),
        v.alias("_v"),
        area.alias("_area"),
    )
    return staged.groupBy(*keys).agg(
        F.when(F.count("_v") == 0, F.lit(None).cast("double"))
        .when(
            F.max("_t") > F.min("_t"),
            F.sum("_area") / (F.max("_t") - F.min("_t")),
        )
        .otherwise(F.first("_v", ignorenulls=True))
        .alias(out_col)
    )


def irate(
    df: DataFrame,
    ts_col: str,
    val_col: str,
    partition_by: "list[str] | None" = None,
    out_col: str = "irate",
) -> DataFrame:
    """irate(val): instantaneous per-second rate from the last two samples
    (builtins.c:3645), counter-reset aware: if the last value is smaller
    than the previous one (counter wrapped), the rate is last/(dt)."""
    keys = list(partition_by or [])
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
    t = F.unix_micros(F.col(ts_col)).cast("double")
    v = F.col(val_col).cast("double")
    ranked = df.select(
        *keys, t.alias("_t"), v.alias("_v"), F.row_number().over(w).alias("_rn")
    ).where(F.col("_rn") <= 2)
    agg = ranked.groupBy(*keys).agg(
        F.max_by("_v", "_t").alias("_v1"),
        F.min_by("_v", "_t").alias("_v0"),
        F.max("_t").alias("_t1"),
        F.min("_t").alias("_t0"),
        F.count(F.lit(1)).alias("_n"),
    )
    dt_s = (F.col("_t1") - F.col("_t0")) / 1e6
    diff = F.when(F.col("_v1") >= F.col("_v0"), F.col("_v1") - F.col("_v0")).otherwise(
        F.col("_v1")
    )
    return agg.select(
        *keys,
        F.when(F.col("_n") < 2, F.lit(0.0)).otherwise(diff / dt_s).alias(out_col),
    )
