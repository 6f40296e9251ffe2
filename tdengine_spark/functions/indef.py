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
    order = ts_col if isinstance(ts_col, list) else [ts_col]
    return Window.partitionBy(*keys).orderBy(*order)


def _v(val_col):
    """Resolve a value argument: Column passes through; a string is a
    column name, scalar expression, or numeric CONSTANT (the reference
    accepts `csum(1)` — cumulative count — builtins.c indef translate
    takes any numeric expression)."""
    if isinstance(val_col, Column):
        return val_col
    return F.expr(str(val_col))


def diff_parts(
    val_col: "str | Column",
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
    option: int = 0,
) -> "tuple[Column, Column]":
    """``(value, emit)`` per the reference diffFunction
    (builtinsimpl.c diffFunction + test_fun_ts_diff.py ignoreTest):
    the delta is taken against the previous NON-NULL value — NULL
    inputs do not break the chain. ignore_option:

      0 (default): emit every row except the group's first; NULL input
        or no prior non-null → NULL output.
      1: like 0, but negative deltas are suppressed to NULL (the value
        still advances the chain).
      2: NULL-input rows and chain-start rows are DROPPED (not
        emitted) — only defined deltas appear.
      3: like 2, and rows with negative deltas are dropped too (the
        value still advances the chain)."""
    v = _v(val_col)
    w = _w(partition_by, ts_col)
    prev = F.last(v, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    d = v - prev
    # negative test on the ORIGINAL values, not the delta: int64 deltas
    # wrap in C (reference intOverflowTest expects the wrapped value
    # with the TRUE sign deciding suppression — 9.2e18 - (-9.2e18)
    # prints -10 under option 1, not NULL)
    neg = v < prev
    not_first = F.lag(F.lit(0)).over(w).isNotNull()
    if option == 0:
        return d, not_first
    if option == 1:
        return F.when(~neg, d), not_first
    if option == 2:
        e = v.isNotNull() & prev.isNotNull()
        return F.when(e, d), e
    e = v.isNotNull() & prev.isNotNull() & ~neg
    return F.when(e, d), e


def diff(
    val_col: "str | Column",
    ts_col: str = "ts",
    partition_by: "list[str] | None" = None,
    ignore_negative: bool = False,
) -> Column:
    """diff(col[, ignore_negative]) — value column only (see
    ``diff_parts`` for the emit condition and full option semantics)."""
    return diff_parts(
        val_col, ts_col, partition_by, 1 if ignore_negative else 0
    )[0]


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
    order_by: "list | None" = None,
) -> Column:
    """derivative(col, unit, ignore_negative) (builtins.c:3603):
    (v - prev_v) / (ts - prev_ts) scaled to per-``unit``.
    ``order_by``: run the delta chain in a FROM-subquery's explicit
    presentation order (dt still comes from ``ts_col`` values, so a
    descending subquery yields negative dt — reference
    timeline_fallback `order by ts desc` derivative)."""
    w = _w(partition_by, order_by if order_by is not None else ts_col)
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
