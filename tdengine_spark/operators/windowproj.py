"""Projection-mode windows — window clause + raw-column select list.

The reference's planner runs a window query in *scalar* (projection) mode
when the select list carries no aggregate function but references
row-varying columns: the window operator labels every input row with its
window's pseudo-columns (``_wstart``/``_wend``/``_wduration``) instead of
aggregating (reference behavior captured in
``test/cases/13-TimeSeriesExt/09-WindowProjection``; planner mode split in
``source/libs/parser/src/parTranslater.c`` isWindowPseudoColumnFunc /
scalar-mode checks).

Golden-verified conventions (ans/test_window_projection_*.ans):

  - INTERVAL projection rows: ``_wend = _wstart + width - 1 precision
    unit`` (closed end), ``_wduration = _wend - _wstart`` (so width-1 ms).
  - Data-driven windows (session/state/event/count): ``_wstart = min(ts)``,
    ``_wend = max(ts)`` within the window, per-row.
  - EVENT_WINDOW projection drops rows outside any window.
  - FILL over projection INTERVAL emits one row per *empty* bucket with
    ``_wend = _wstart + width`` (exclusive-end, the aggregate-mode
    convention — the reference's fill machinery generates these rows) and
    the projected columns NULL (fill null/null_f) or positional constants
    (fill value/value_f).  Only NONE/NULL/NULL_F/VALUE/VALUE_F are legal;
    PREV/NEXT/LINEAR/NEAR are rejected by the reference parser.
  - The fill bucket spine spans the WHERE clause's time range when bounds
    are present, else the data's bucket range.

Scale notes: interval labeling is a pure projection (no shuffle,
whole-stage codegen).  Data-driven labeling reuses the ``_wid``
assignment's single (keys, ts) shuffle; the min/max-over-window runs on
the same partitioning.  The fill spine is bucket-counted (range/width
rows per group), joined via a broadcast-friendly anti-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tdengine_spark.durations import Duration, parse_duration
from tdengine_spark.operators.eventwindow import WINDOW_ID
from tdengine_spark.operators.timewindow import (
    WEND,
    WSTART,
    window_end,
    window_start,
)

WDURATION = "_wduration"

PSEUDO_COLS = (WSTART, WEND, WDURATION)

#: fill modes the reference's parser accepts in projection mode
PROJECTION_FILL_MODES = ("none", "null", "null_f", "value", "value_f")


def _with_duration(df: DataFrame) -> DataFrame:
    """_wduration in ms (the precision unit of the ms-precision tables):
    ``_wend - _wstart`` — uniform across modes (golden-verified: interval
    projection rows show width-1, agg/filled rows width, data windows
    max(ts)-min(ts))."""
    return df.withColumn(
        WDURATION,
        ((F.unix_micros(F.col(WEND)) - F.unix_micros(F.col(WSTART))) / 1000)
        .cast("long"),
    )


def interval_projection(
    df: DataFrame,
    ts_col: str,
    width: "str | int | Duration",
    offset: "str | int | Duration | None" = None,
    partition_by: "list[str] | None" = None,
    sliding: "str | int | Duration | None" = None,
) -> DataFrame:
    """Label each row with its interval window's pseudo-columns.

    Tumbling: pure projection — bucket arithmetic on the ts column
    (codegen, no shuffle). SLIDING: each row belongs to
    ceil(width/slide) hopping windows — the row explodes into one copy
    per covering window (still scan-local, no shuffle; downstream
    per-window passes partition on ``_wstart``). ``_wend`` uses the
    closed-end convention (start + width - 1 ms)."""
    w = parse_duration(width)
    if sliding is not None:
        s = parse_duration(sliding)
        if w.is_calendar or s.is_calendar:
            raise ValueError(
                "SLIDING projection over calendar intervals unsupported"
            )
        k = -(-w.microseconds // s.microseconds)  # ceil(width/slide)
        base0 = window_start(F.col(ts_col), s, offset)
        out = (
            df.withColumn("_si", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
            .withColumn(
                WSTART,
                F.timestamp_micros(
                    (F.unix_micros(base0)
                     - F.col("_si") * s.microseconds).cast("long")
                ),
            )
            .where(
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.col(WSTART)) < w.microseconds
            )
            .drop("_si")
        )
    else:
        out = df.withColumn(WSTART, window_start(F.col(ts_col), w, offset))
    wend_excl = (
        F.timestamp_micros(
            (F.unix_micros(F.col(WSTART)) + w.microseconds).cast("long")
        )
        if sliding is not None
        else window_end(F.col(WSTART), w, offset)
    )
    out = out.withColumn(
        WEND, F.timestamp_micros((F.unix_micros(wend_excl) - 1000).cast("long"))
    )
    return _with_duration(out)


def keyed_window_projection(
    assigned: DataFrame,
    ts_col: str,
    partition_by: "list[str] | None" = None,
) -> DataFrame:
    """Label rows of a ``_wid``-assigned frame (session/state/event/count)
    with ``_wstart = min(ts)`` / ``_wend = max(ts)`` of their window.

    Rows outside any window (event-window ``_wid`` NULL) are dropped —
    reference semantics: they belong to no window, so projection emits
    nothing for them."""
    keys = list(partition_by or [])
    w = Window.partitionBy(*keys, WINDOW_ID)
    out = (
        assigned.where(F.col(WINDOW_ID).isNotNull())
        .withColumn(WSTART, F.min(ts_col).over(w))
        .withColumn(WEND, F.max(ts_col).over(w))
    )
    return _with_duration(out)


def projection_fill_rows(
    df: DataFrame,
    observed: DataFrame,
    width: "str | int | Duration",
    partition_by: "list[str] | None" = None,
    range_start=None,
    range_end=None,
) -> DataFrame:
    """Empty-bucket rows for projection-mode FILL.

    ``observed``: distinct (keys, _wstart) buckets that have data.
    Returns (keys..., _wstart, _wend, _wduration) for every bucket in the
    spine that has no data row; the caller attaches the filled select
    items.  ``_wend = _wstart + width`` — the aggregate-mode convention
    the reference's fill operator uses for generated rows."""
    keys = list(partition_by or [])
    w = parse_duration(width)
    def _b(v):
        # bounds arrive as Columns (Spark-side bucketing), datetimes or
        # strings — normalize to a timestamp Column
        return v if isinstance(v, Column) else F.lit(v).cast("timestamp")

    lo = _b(range_start) if range_start is not None else F.min(WSTART)
    hi = _b(range_end) if range_end is not None else F.max(WSTART)
    # a group with zero observed buckets emits nothing — the reference's
    # fill needs at least one data row in range (an all-empty WHERE range
    # returns an empty result, not a wall of filled rows)
    per_group = observed.groupBy(*keys).agg(
        lo.alias("_lo"), hi.alias("_hi"), F.count(F.lit(1)).alias("_n")
    ).where(F.col("_n") > 0)
    step = F.expr(f"interval {w.interval_string()}")
    spine = per_group.select(
        *keys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(WSTART),
    )
    empty = spine.join(observed, on=[*keys, WSTART], how="left_anti")
    empty = empty.withColumn(WEND, window_end(F.col(WSTART), w))
    return _with_duration(empty)
