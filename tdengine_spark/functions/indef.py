"""Indefinite-rows functions — diff, csum, mavg, derivative, statecount,
stateduration (reference builtins.c:4221-4400, executed by the
IndefRowsFunc operator, projectoperator.c:676).

Every one is a Spark analytic window over ``partitionBy(keys).orderBy(ts)``
— one shuffle + one per-key sort for any number of these applied together,
since they share the same window spec (Catalyst collapses same-spec
windows into one Window physical operator).
"""

from __future__ import annotations

import operator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tdengine_spark.durations import parse_duration

_CMP = {
    "lt": operator.lt,
    "gt": operator.gt,
    "le": operator.le,
    "ge": operator.ge,
    "eq": operator.eq,
    "ne": operator.ne,
}


def _w(partition_by, ts_col):
    keys = list(partition_by or [])
    return Window.partitionBy(*keys).orderBy(ts_col)


def diff(
    val_col: "str | Column",
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
    ignore_negative: bool = False,
) -> Column:
    """diff(col[, ignore_negative]) (builtins.c:4221): value minus previous
    value; first row per key → NULL (dropped by the reference; callers
    filter)."""
    v = F.col(val_col) if isinstance(val_col, str) else val_col
    d = v - F.lag(v).over(_w(partition_by, ts_col))
    if ignore_negative:
        d = F.when(d >= 0, d)
    return d


def csum(
    val_col: "str | Column",
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
) -> Column:
    """csum(col) (builtins.c:4343): running sum in ts order."""
    v = F.col(val_col) if isinstance(val_col, str) else val_col
    return F.sum(v).over(
        _w(partition_by, ts_col).rowsBetween(Window.unboundedPreceding, 0)
    )


def mavg(
    val_col: "str | Column",
    k: int,
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
) -> Column:
    """mavg(col, k) (builtins.c:4368): moving average of the last k rows.
    Reference emits NULL until k rows are available — replicated via a
    count guard."""
    v = (F.col(val_col) if isinstance(val_col, str) else val_col).cast("double")
    frame = _w(partition_by, ts_col).rowsBetween(-(k - 1), 0)
    avg = F.avg(v).over(frame)
    cnt = F.count(v).over(frame)
    return F.when(cnt >= k, avg)


def derivative(
    val_col: "str | Column",
    interval_unit: "str | int" = "1s",
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
    ignore_negative: bool = False,
) -> Column:
    """derivative(col, unit, ignore_negative) (builtins.c:3603):
    (v - prev_v) / (ts - prev_ts) scaled to per-``unit``."""
    w = _w(partition_by, ts_col)
    v = (F.col(val_col) if isinstance(val_col, str) else val_col).cast("double")
    t = F.unix_micros(F.col(ts_col)).cast("double")
    unit_us = parse_duration(interval_unit).microseconds
    d = (v - F.lag(v).over(w)) / (t - F.lag(t).over(w)) * unit_us
    if ignore_negative:
        d = F.when(d >= 0, d)
    return d


def statecount(
    val_col: "str | Column",
    op: str,
    threshold: float,
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
) -> Column:
    """statecount(col, op, val) (builtins.c:4256): consecutive-rows counter
    while the condition holds; -1 when it doesn't.

    Kernel: rows where the condition flips start a new run (running sum of
    flip flags = run id), then a row_number within the run."""
    v = F.col(val_col) if isinstance(val_col, str) else val_col
    cond = _CMP[op.lower()](v, F.lit(threshold)).cast("int")
    w = _w(partition_by, ts_col)
    run_flag = F.when(
        F.lag(cond).over(w).isNull() | (F.lag(cond).over(w) != cond), 1
    ).otherwise(0)
    run_id = F.sum(run_flag).over(
        _w(partition_by, ts_col).rowsBetween(Window.unboundedPreceding, 0)
    )
    keys = list(partition_by or [])
    in_run = F.row_number().over(Window.partitionBy(*keys, run_id).orderBy(ts_col))
    return F.when(cond == 1, in_run).otherwise(F.lit(-1))


def stateduration(
    val_col: "str | Column",
    op: str,
    threshold: float,
    unit: "str | int" = "1s",
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
) -> Column:
    """stateduration(col, op, val[, unit]) (builtins.c:4296): elapsed time
    since the current true-run began (0 at the run's first row); -1 when
    the condition is false."""
    v = F.col(val_col) if isinstance(val_col, str) else val_col
    cond = _CMP[op.lower()](v, F.lit(threshold)).cast("int")
    w = _w(partition_by, ts_col)
    run_flag = F.when(
        F.lag(cond).over(w).isNull() | (F.lag(cond).over(w) != cond), 1
    ).otherwise(0)
    run_id = F.sum(run_flag).over(
        _w(partition_by, ts_col).rowsBetween(Window.unboundedPreceding, 0)
    )
    keys = list(partition_by or [])
    run_w = Window.partitionBy(*keys, run_id).orderBy(ts_col)
    t = F.unix_micros(F.col(ts_col))
    unit_us = parse_duration(unit).microseconds
    dur = (t - F.first(t).over(run_w)) / F.lit(unit_us)
    return F.when(cond == 1, dur.cast("long")).otherwise(F.lit(-1))
