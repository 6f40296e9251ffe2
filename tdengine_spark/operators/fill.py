"""FILL — materialize missing interval buckets per fill mode.

Reference: executor/src/filloperator.c + tfill.c; modes EFillMode
(querynodes.h:717-727): NONE, VALUE, VALUE_F, PREV, NULL, NULL_F, LINEAR,
NEXT, NEAR.

Spark-first design:
  1. build the bucket *spine* per group with ``sequence(min_ws, max_ws, w)``
     + ``explode`` — a per-group expression, no driver loop;
  2. left-join the aggregated buckets onto the spine (broadcast-friendly:
     the spine and the aggregate are both post-aggregation row counts,
     orders of magnitude smaller than the raw data);
  3. apply the fill mode with window functions over buckets.

Scale notes: everything downstream of the aggregate operates on bucket
rows (raw_rows / bucket_width), so the per-group ordered windows used by
PREV/NEXT/LINEAR/NEAR sort only the downsampled series. The spine join is
an equi-join on (group, _wstart) — AQE will broadcast the smaller side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tdengine_spark.durations import Duration, parse_duration
from tdengine_spark.operators.timewindow import WEND, WSTART, window_end

FILL_MODES = ("none", "null", "value", "prev", "next", "linear", "near")


def bucket_spine(
    agg: DataFrame,
    width: "str | int | Duration",
    partition_by: "list[str] | None" = None,
    range_start=None,
    range_end=None,
    force: bool = False,
) -> DataFrame:
    """All bucket starts per group between the group's (or the query's)
    min/max ``_wstart``, as a DataFrame (group_cols..., _wstart).

    ``force`` (NULL_F/VALUE_F): emit the explicit-range spine even when
    the input has no rows at all (reference tfill.c FILL_MODE_NULL_F —
    the forced variants fabricate every bucket of the query range; only
    meaningful ungrouped, since an empty input has no groups to name)."""
    partition_by = partition_by or []
    w = parse_duration(width)
    def _b(v):
        # bounds arrive as Columns (Spark-side bucketing), datetimes or
        # strings — normalize to a timestamp Column
        return v if isinstance(v, Column) else F.lit(v).cast("timestamp")

    lo = _b(range_start) if range_start is not None else F.min(WSTART)
    hi = _b(range_end) if range_end is not None else F.max(WSTART)
    # zero-bucket groups emit nothing: with an explicit range the lo/hi
    # literals would otherwise fabricate a spine for an empty input
    per_group = agg.groupBy(*partition_by).agg(
        lo.alias("_lo"), hi.alias("_hi"), F.count(F.lit(1)).alias("_n")
    )
    if not (force and not partition_by and range_start is not None):
        per_group = per_group.where(F.col("_n") > 0)
    step = F.expr(f"interval {w.interval_string()}")
    return per_group.select(
        *partition_by,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(WSTART),
    )


def fill(
    agg: DataFrame,
    mode: str,
    width: "str | int | Duration",
    partition_by: "list[str] | None" = None,
    value_cols: "list[str] | None" = None,
    fill_values: "dict[str, object] | None" = None,
    range_start=None,
    range_end=None,
    ordered: bool = True,
) -> DataFrame:
    """Apply a FILL mode to an interval-aggregated DataFrame.

    ``agg`` must contain ``_wstart``, the group columns, and value columns.
    Returns the same shape with missing buckets materialized (plus
    ``_wend`` recomputed if it was present).
    """
    force = mode.lower().endswith("_f")  # VALUE_F/NULL_F force variants
    mode = mode.lower().rstrip("_f")
    if mode == "none":
        return agg
    partition_by = partition_by or []
    value_cols = value_cols or [
        c for c in agg.columns if c not in (*partition_by, WSTART, WEND)
    ]
    had_wend = WEND in agg.columns

    w_d = parse_duration(width)
    if (
        not force
        and range_start is None
        and range_end is None
        and not w_d.is_calendar
    ):
        # common case (per-group min..max spine, fixed width): the
        # gap-generation kernel — missing buckets are exploded from
        # each real bucket's lead() gap, so the whole operator is one
        # shuffle + one ordered pass (a second, reverse-ordered pass
        # only for NEXT/NEAR) instead of spine-aggregate + spine join
        # + two fill passes (r14; guide §2.4 — the join and both of
        # its exchanges disappear from the plan)
        out = _gap_fill(
            agg.drop(WEND) if had_wend else agg,
            mode,
            w_d.microseconds,
            partition_by,
            value_cols,
            fill_values,
        )
        if had_wend:
            out = out.withColumn(WEND, window_end(F.col(WSTART), width))
            out = out.select(WSTART, WEND, *partition_by, *value_cols)
        else:
            out = out.select(WSTART, *partition_by, *value_cols)
        # ordered=False: skip the range-exchange global sort and its
        # boundary-sampling pass (registry gates; value hash is
        # order-insensitive — dialect keeps the ordered default)
        return out.orderBy(*partition_by, WSTART) if ordered else out

    spine = bucket_spine(
        agg, width, partition_by, range_start, range_end, force=force
    )
    joined = spine.join(
        (agg.drop(WEND) if had_wend else agg).withColumn("_has", F.lit(True)),
        on=[*partition_by, WSTART],
        how="left",
    )

    if mode == "null":
        out = joined
    elif mode == "value":
        fv = fill_values or {}
        # fill constants coerce to the column's type C-STYLE (reference
        # convertFillType → taosVariant): strtod prefix for numerics, so
        # 'xx' → 0 → false for BOOL (NOT a null cast), utf-8 bytes for
        # VARBINARY, digits render for VARCHAR
        dtypes = {f.name: f.dataType for f in joined.schema.fields}
        out = joined.select(
            *partition_by,
            WSTART,
            *[
                (
                    F.coalesce(
                        F.col(c),
                        F.lit(_c_fill_literal(fv[c], dtypes[c])).cast(
                            dtypes[c]
                        ),
                    ).alias(c)
                    if c in fv
                    # no literal for this column (mixed-expression
                    # placeholders): generated rows stay NULL
                    else F.col(c)
                )
                for c in value_cols
            ],
        )
    elif mode in ("prev", "next", "linear", "near"):
        out = _directional_fill(joined, mode, partition_by, value_cols)
    else:
        raise ValueError(f"unknown fill mode {mode!r}")

    if had_wend:
        out = out.withColumn(WEND, window_end(F.col(WSTART), width))
        out = out.select(WSTART, WEND, *partition_by, *value_cols)
    else:
        out = out.select(WSTART, *partition_by, *value_cols)
    return out.orderBy(*partition_by, WSTART) if ordered else out


def _gap_fill(
    agg: DataFrame,
    mode: str,
    w_us: int,
    partition_by: list[str],
    value_cols: list[str],
    fill_values: "dict[str, object] | None",
) -> DataFrame:
    """Single-pass FILL: every real bucket row carries its fill sources
    (prev non-null tracker from the ascending growing frame; strict
    next non-null tracker from a reverse-ordered growing frame — a
    shrinking frame would re-aggregate per row, O(n²) per key; LINEAR's
    anchors from lead()), then explodes into itself plus the missing
    buckets of the gap to its successor. Missing buckets inherit the
    source row's trackers, so no spine, no join, and no post-join fill
    passes exist in the plan.

    Matches the spine path exactly on its domain (no explicit range, no
    force, fixed width): the spine there spans each group's min..max
    _wstart, which is precisely the union of all lead() gaps; NULL-
    ``_wstart`` rows are dropped (the spine join never matched them).
    """
    from pyspark.sql.types import IntegralType, NumericType

    rows = agg.where(F.col(WSTART).isNotNull())
    dtypes = {f.name: f.dataType for f in rows.schema.fields}
    ts_us = F.unix_micros(F.col(WSTART))

    asc = Window.partitionBy(*partition_by).orderBy(WSTART)
    wprev = asc.rowsBetween(Window.unboundedPreceding, 0)
    need_next = mode in ("next", "near")

    track: list[Column] = [F.lead(ts_us).over(asc).alias("_nxt_ws")]
    if mode == "linear":
        # LINEAR anchors on the ADJACENT REAL buckets — a NULL agg
        # value at either anchor fills NULL, it is NOT skipped the way
        # PREV/NEXT skip over NULLs (tfill.c doLinearInterpolation
        # SET_NULL paths)
        track.append(
            F.lead(
                F.struct(*[F.col(c).alias(c) for c in value_cols])
            ).over(asc).alias("_nxt_anchor")
        )
    for c in value_cols:
        if mode == "linear" and not isinstance(dtypes[c], NumericType):
            continue
        v = F.col(c)
        if mode in ("prev", "near"):
            pair = F.when(v.isNotNull(), F.struct(ts_us.alias("t"), v.alias("v")))
            track.append(
                F.last(pair, ignorenulls=True).over(wprev).alias(f"_pv_{c}")
            )
    staged = rows.select("*", *track)
    if need_next:
        # strict next non-null per column: reverse-ordered growing
        # frame excluding the current row — the value the gap buckets
        # after this row (and this row itself, when NULL) fill from
        rev = (
            Window.partitionBy(*partition_by)
            .orderBy(F.col(WSTART).desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        nxt_track = [
            F.last(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(ts_us.alias("t"), F.col(c).alias("v")),
                ),
                ignorenulls=True,
            ).over(rev).alias(f"_nv_{c}")
            for c in value_cols
        ]
        staged = staged.select("*", *nxt_track)

    # explode each row into itself + the missing buckets before its
    # successor (gap = (ws + w .. nxt_ws - w); sequence() errors on an
    # inverted range, so gate on a 2-bucket gap)
    gap = F.when(
        F.col("_nxt_ws").isNotNull()
        & (F.col("_nxt_ws") >= ts_us + F.lit(2 * w_us)),
        F.sequence(
            ts_us + F.lit(w_us), F.col("_nxt_ws") - F.lit(w_us), F.lit(w_us)
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    buckets = F.concat(
        F.array(F.struct(ts_us.alias("bus"), F.lit(False).alias("gen"))),
        F.transform(
            gap, lambda b: F.struct(b.alias("bus"), F.lit(True).alias("gen"))
        ),
    )
    exploded = staged.withColumn("_b", F.explode(buckets))
    g_us = F.col("_b.bus")
    is_gen = F.col("_b.gen")

    fv = fill_values or {}
    cols: list[Column] = []
    for c in value_cols:
        v = F.when(is_gen, F.lit(None).cast(dtypes[c])).otherwise(F.col(c))
        if mode == "null":
            filled = v
        elif mode == "value":
            if c in fv:
                filled = F.coalesce(
                    v, F.lit(_c_fill_literal(fv[c], dtypes[c])).cast(dtypes[c])
                )
            else:
                # no literal for this column (mixed-expression
                # placeholders): generated rows stay NULL
                filled = v
        elif mode == "prev":
            filled = F.coalesce(v, F.col(f"_pv_{c}.v"))
        elif mode == "next":
            filled = F.coalesce(v, F.col(f"_nv_{c}.v"))
        elif mode == "near":
            pt, pv = F.col(f"_pv_{c}.t"), F.col(f"_pv_{c}.v")
            nt, nv = F.col(f"_nv_{c}.t"), F.col(f"_nv_{c}.v")
            filled = (
                F.when(v.isNotNull(), v)
                .when(nt.isNull(), pv)
                .when(pt.isNull(), nv)
                .when((g_us - pt) <= (nt - g_us), pv)
                .otherwise(nv)
            )
        else:  # linear
            if not isinstance(dtypes[c], NumericType):
                # LINEAR cannot interpolate non-numeric columns — the
                # reference fills NULL (tfill.c doLinearInterpolation)
                filled = v
            else:
                pa = F.col(c)  # the gap's left anchor IS the source row
                na = F.col(f"_nxt_anchor.{c}")
                frac = (g_us - ts_us).cast("double") / (
                    F.col("_nxt_ws") - ts_us
                ).cast("double")
                interp = pa + (na - pa) * frac
                if isinstance(dtypes[c], IntegralType):
                    # integer columns STAY integer: the reference
                    # writes the interpolated double back into the
                    # column's slot (C truncation — Spark's
                    # double→integral cast matches)
                    interp = interp.cast(dtypes[c])
                filled = F.when(~is_gen, v).otherwise(interp)
        cols.append(filled.alias(c))
    return exploded.select(
        *partition_by, F.timestamp_micros(g_us).alias(WSTART), *cols
    )


def _c_fill_literal(v, dt):
    """Coerce a FILL(VALUE, …) literal to the column's type the way the
    reference does (tfill.c doSetVal → taosVariant convert): C string→
    number conversion reads the numeric prefix and yields 0 for
    non-numeric text (so 'xx' into BOOL is false, not NULL); numbers
    into VARCHAR render as text; VARBINARY takes utf-8 bytes."""
    import re as _re

    from pyspark.sql.types import (
        BinaryType,
        BooleanType,
        IntegralType,
        NumericType,
        StringType,
    )

    if v is None:
        return None

    def _num(x):
        if isinstance(x, bool):
            return int(x)
        if isinstance(x, (int, float)):
            return x
        m = _re.match(r"\s*[-+]?(\d+(\.\d+)?([eE][+-]?\d+)?)", str(x))
        return float(m.group(0)) if m else 0

    if isinstance(dt, BooleanType):
        return bool(_num(v) != 0)
    if isinstance(dt, IntegralType):
        return int(_num(v))
    if isinstance(dt, NumericType):
        return float(_num(v))
    if isinstance(dt, StringType):
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)
    if isinstance(dt, BinaryType):
        return str(v).encode("utf-8") if not isinstance(v, bytes) else v
    return v


def _directional_fill(
    joined: DataFrame, mode: str, partition_by: list[str], value_cols: list[str]
) -> DataFrame:
    """PREV / NEXT / LINEAR / NEAR over the bucket sequence."""
    wprev = (
        Window.partitionBy(*partition_by)
        .orderBy(WSTART)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # next-value tracker as a REVERSE-ordered growing frame (includes
    # the current row): Spark re-aggregates shrinking
    # current→unboundedFollowing frames per output row — O(n²) per key —
    # while this is a second O(n) pass over the same hash partitioning
    # (one extra sort, no extra shuffle)
    wnext = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(WSTART).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    from pyspark.sql.types import NumericType

    dtypes = {f.name: f.dataType for f in joined.schema.fields}
    ts_us = F.unix_micros(F.col(WSTART))
    cols: list[Column] = []
    for c in value_cols:
        v = F.col(c)
        has = F.col("_has")
        if mode == "linear" and not isinstance(dtypes[c], NumericType):
            # LINEAR cannot interpolate non-numeric columns — the
            # reference fills NULL (tfill.c doLinearInterpolation)
            cols.append(F.when(v.isNotNull(), v).alias(c))
            continue
        prev_v = F.last(v, ignorenulls=True).over(wprev)
        next_v = F.last(v, ignorenulls=True).over(wnext)
        prev_t = F.last(F.when(v.isNotNull(), ts_us), ignorenulls=True).over(wprev)
        next_t = F.last(F.when(v.isNotNull(), ts_us), ignorenulls=True).over(wnext)
        if mode == "prev":
            filled = prev_v
        elif mode == "next":
            filled = next_v
        elif mode == "near":
            filled = (
                F.when(v.isNotNull(), v)
                .when(next_t.isNull(), prev_v)
                .when(prev_t.isNull(), next_v)
                .when((ts_us - prev_t) <= (next_t - ts_us), prev_v)
                .otherwise(next_v)
            )
        else:
            # LINEAR anchors on the ADJACENT REAL buckets — a NULL agg
            # value at either anchor fills NULL, it is NOT skipped the
            # way PREV/NEXT skip over NULLs; and a real bucket's NULL
            # stays NULL (tfill.c doLinearInterpolation SET_NULL paths).
            # The struct wrapper makes ignorenulls key on "real bucket"
            # rather than "non-null value".
            anchor = F.when(has, F.struct(v.alias("v"), ts_us.alias("t")))
            prev_s = F.last(anchor, ignorenulls=True).over(wprev)
            next_s = F.last(anchor, ignorenulls=True).over(wnext)
            frac = (ts_us - prev_s["t"]).cast("double") / (
                next_s["t"] - prev_s["t"]
            ).cast("double")
            interp = prev_s["v"] + (next_s["v"] - prev_s["v"]) * frac
            from pyspark.sql.types import IntegralType

            if isinstance(dtypes[c], IntegralType):
                # integer columns STAY integer: the reference writes the
                # interpolated double back into the column's slot
                # (tfill.c doLinearInterpolation → colDataSetVal), i.e.
                # a C truncation — Spark's double→integral cast matches
                interp = interp.cast(dtypes[c])
            filled = (
                F.when(has, v)
                .when(prev_s.isNull() | next_s.isNull(), F.lit(None))
                .otherwise(interp)
            )
        cols.append(F.coalesce(F.col(c), filled).alias(c) if mode in ("prev", "next") else filled.alias(c))
    return joined.select(*partition_by, WSTART, *cols)
