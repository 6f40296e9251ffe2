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


def _v(val_col):
    """Resolve a value argument: Column passes through; a string is a
    column name, scalar expression, or numeric CONSTANT (the reference
    accepts `csum(1)` — cumulative count — builtins.c indef translate
    takes any numeric expression)."""
    if isinstance(val_col, Column):
        return val_col
    return F.expr(str(val_col))


def diff(
    val_col: "str | Column",
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
    ignore_negative: bool = False,
) -> Column:
    """diff(col[, ignore_negative]) (builtins.c:4221): value minus previous
    value; first row per key → NULL (dropped by the reference; callers
    filter)."""
    v = _v(val_col)
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
    v = _v(val_col)
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
    v = _v(val_col).cast("double")
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
    v = _v(val_col).cast("double")
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
    """statecount(col, op, val) (builtinsimpl.c stateCountFunction):
    consecutive-true counter; -1 on a false row (counter resets);
    NULL input rows emit NULL and leave the counter UNCHANGED (they
    neither count nor reset).

    Kernel: non-null false rows open a new run (cumulative reset
    count = run id); within a run, count the non-null true rows."""
    v = _v(val_col)
    cond = _CMP[op.lower()](v, F.lit(threshold))
    cum = _w(partition_by, ts_col).rowsBetween(Window.unboundedPreceding, 0)
    reset = F.when(v.isNotNull() & ~cond, 1).otherwise(0)
    run_id = F.sum(reset).over(cum)
    keys = list(partition_by or [])
    wg = Window.partitionBy(*keys, run_id).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cnt = F.sum(F.when(v.isNotNull() & cond, 1).otherwise(0)).over(wg)
    return (
        F.when(v.isNull(), F.lit(None).cast("long"))
        .when(cond, cnt)
        .otherwise(F.lit(-1))
    )


def stateduration(
    val_col: "str | Column",
    op: str,
    threshold: float,
    unit: "str | int" = "1s",
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
) -> Column:
    """stateduration(col, op, val[, unit]) (builtinsimpl.c
    stateDurationFunction): elapsed time since the current true-run's
    FIRST true row (0 there); -1 on a false row (run restarts); NULL
    input rows emit NULL and leave the run UNCHANGED."""
    v = _v(val_col)
    cond = _CMP[op.lower()](v, F.lit(threshold))
    cum = _w(partition_by, ts_col).rowsBetween(Window.unboundedPreceding, 0)
    reset = F.when(v.isNotNull() & ~cond, 1).otherwise(0)
    run_id = F.sum(reset).over(cum)
    keys = list(partition_by or [])
    wg = Window.partitionBy(*keys, run_id).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    t = F.unix_micros(F.col(ts_col))
    start = F.min(F.when(v.isNotNull() & cond, t)).over(wg)
    import re as _re

    u = str(unit)
    if _re.fullmatch(r"(?i)\d+b", u):
        # ns unit: ts stores at us precision — scale the us span to ns
        unit_us = int(u[:-1]) / 1000.0
    else:
        unit_us = parse_duration(unit).microseconds
    dur = (t - start) / F.lit(unit_us)
    return (
        F.when(v.isNull(), F.lit(None).cast("long"))
        .when(cond, dur.cast("long"))
        .otherwise(F.lit(-1))
    )
