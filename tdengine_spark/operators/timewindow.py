"""INTERVAL / SLIDING time windows — the reference's HashInterval operator
(executor/src/timewindowoperator.c createIntervalOperatorInfo) re-expressed
as Catalyst-native bucketing.

Semantics reproduced:
  - ``INTERVAL(w)``: tumbling windows aligned to the epoch (reference aligns
    to calendar for calendar units, epoch for fixed units).
  - ``INTERVAL(w, offset)``: bucket origin shifted by offset.
  - ``SLIDING(s)`` with s < w: hopping windows — each row lands in w/s
    windows.
  - emits ``_wstart`` / ``_wend`` pseudo-columns (builtins.c:5253-5281).
  - calendar widths ``1n`` (month) / ``1y``: date_trunc-based buckets.

Scale notes: tumbling windows compile to a single projection + hash
aggregate — the bucket expression is a pure Catalyst expression
(whole-stage codegen), and partial aggregation runs map-side, so the
shuffle carries one row per (group, bucket). Hopping windows use
``F.window`` which explodes each row into w/s buckets *before* the partial
aggregate — unavoidable in any engine (the reference does the same loop in
timewindowoperator.c hashIntervalAgg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tdengine_spark.durations import Duration, parse_duration

WSTART = "_wstart"
WEND = "_wend"

#: fixed-width windows align to the REAL UTC epoch (reference
#: taosTimeTruncate works on true epoch instants). When the engine holds
#: wall-clock-as-UTC timestamps for a session whose real offset is X
#: (replay of the reference CI in Asia/Shanghai → 8h), alignment must
#: subtract X before the modulo. 0 for native-UTC deployments.
EPOCH_ALIGN_OFFSET_US = 0

#: reference `first_day_of_week` config (taosTimeTruncate week anchor,
#: sclfunc.c:4617): None = legacy epoch alignment (weeks start Thursday,
#: 1970-01-01); 0=Sunday … 6=Saturday anchors week-unit windows to that
#: weekday. Set via the dialect's SET FIRST_DAY_OF_WEEK statement.
FIRST_DAY_OF_WEEK: "int | None" = None

#: SET TIMEZONE session mode (reference L2 session timezone,
#: taosTimeTruncate with the connection's tz): when set, day/week
#: windows truncate the LOCAL calendar day/week of this zone — DST days
#: are 23/25 h, so bucketing is date arithmetic (DST-safe), not epoch
#: modulo. None = native epoch-aligned mode. The dialect's SET TIMEZONE
#: statement keeps this in lockstep with spark.sql.session.timeZone.
SESSION_CALENDAR_TZ: "str | None" = None

#: epoch day 0 (1970-01-01) was a Thursday = 4 in the 0=Sunday encoding
_EPOCH_WEEKDAY = 4


def _tz_day_bucket_date(ts: Column, w: Duration) -> Column:
    """Local-calendar day/week bucket START as a DATE (session-tz mode).

    Pure date arithmetic — datediff/date_add count calendar days, so a
    23- or 25-hour DST day is still one day and boundaries stay on local
    midnight. Casting the DATE to timestamp yields local midnight in the
    session timezone (which is what SESSION_CALENDAR_TZ mode sets)."""
    d = F.to_date(ts)
    width_days = w.value * (7 if w.unit == "w" else 1)
    anchor = 0
    if w.unit == "w":
        fdow = FIRST_DAY_OF_WEEK if FIRST_DAY_OF_WEEK is not None else 1
        anchor = (fdow - _EPOCH_WEEKDAY) % 7
    if width_days == 1:
        return d
    days = F.datediff(d, F.lit("1970-01-01"))
    bucket = (
        F.floor((days - F.lit(anchor)) / width_days) * width_days
        + F.lit(anchor)
    )
    return F.date_add(F.lit("1970-01-01").cast("date"), bucket.cast("int"))


def window_start(
    ts: "Column | str", width: "str | int | Duration", offset: "str | int | Duration | None" = None
) -> Column:
    """``_wstart`` of the tumbling window containing ``ts``.

    Pure expression (no shuffle, codegen-friendly): epoch-aligned integer
    arithmetic on microseconds for fixed widths; date_trunc for calendar
    widths. Matches DuckDB's ``time_bucket`` for the same width/offset,
    which is what the correctness oracle uses.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    w = parse_duration(width)
    if w.is_calendar:
        months = w.months
        # calendar offset (INTERVAL(1n, 1w) / INTERVAL(1y, 6n)): shift,
        # truncate, shift back — windows anchored at trunc+offset
        # (reference taosTimeTruncate with interval offset)
        shift = None
        if offset is not None:
            o = parse_duration(offset)
            if o.is_calendar:
                shift = F.make_ym_interval(
                    F.lit(0), F.lit(o.months)
                )
            elif o.microseconds:
                shift = F.expr(f"INTERVAL {o.microseconds} MICROSECOND")
        tsx = ts - shift if shift is not None else ts
        if months == 1:
            trunc = F.date_trunc("month", tsx)
        elif months == 12:
            trunc = F.date_trunc("year", tsx)
        else:
            # k-month buckets anchored at epoch (1970-01)
            month_idx = (F.year(tsx) - F.lit(1970)) * 12 + F.month(tsx) - 1
            bucket = F.floor(month_idx / months) * months
            trunc = F.to_timestamp(
                F.make_date(
                    (bucket / 12).cast("int") + 1970,
                    (bucket % 12).cast("int") + 1,
                    F.lit(1),
                )
            )
        return (trunc + shift).cast("timestamp") if shift is not None else trunc
    if SESSION_CALENDAR_TZ is not None and w.unit in ("d", "w") and not offset:
        # SET TIMEZONE session mode: day/week windows are LOCAL calendar
        # buckets of the session zone — DST-safe date arithmetic, so the
        # spring-forward day is a 23 h window (reference taosTimeTruncate
        # with the connection timezone, v3.4.2 timezone tasks)
        return _tz_day_bucket_date(ts, w).cast("timestamp")
    us = F.lit(w.microseconds)
    # day/week widths truncate the LOCAL calendar day (reference
    # taosTimeTruncate unit d/w); sub-day fixed units use pure epoch
    # modulo of the real instant — only the latter needs the wall-mode
    # alignment correction
    align = 0 if w.unit in ("d", "w") else EPOCH_ALIGN_OFFSET_US
    if w.unit == "w" and FIRST_DAY_OF_WEEK is not None:
        # anchor week windows at the configured weekday (epoch is a
        # Thursday = 4 in the 0=Sunday encoding)
        align += ((FIRST_DAY_OF_WEEK - 4) % 7) * 86_400_000_000
    off = F.lit(
        (parse_duration(offset).microseconds if offset is not None else 0)
        + align
    )
    epoch_us = F.unix_micros(ts)
    start_us = F.floor((epoch_us - off) / us) * us + off
    return F.timestamp_micros(start_us.cast("long"))


def window_end(
    ts: "Column | str", width: "str | int | Duration", offset: "str | int | Duration | None" = None
) -> Column:
    """``_wend`` = ``_wstart + width`` (exclusive end, reference semantics
    emit inclusive wend = start+width-1 unit; we expose exclusive end and
    let the dialect layer subtract one unit if needed)."""
    w = parse_duration(width)
    start = window_start(ts, width, offset)
    if w.is_calendar:
        months = w.months
        return F.add_months(start, months).cast("timestamp")
    if SESSION_CALENDAR_TZ is not None and w.unit in ("d", "w") and not offset:
        # local-calendar end: N calendar days after the start date —
        # crosses DST as 23/25 h of real time (_wduration reflects it)
        width_days = w.value * (7 if w.unit == "w" else 1)
        return F.date_add(start.cast("date"), width_days).cast("timestamp")
    return F.timestamp_micros((F.unix_micros(start) + w.microseconds).cast("long"))


def interval_window(
    df: DataFrame,
    ts_col: str,
    width: "str | int | Duration",
    sliding: "str | int | Duration | None" = None,
    offset: "str | int | Duration | None" = None,
    partition_by: "list[str] | None" = None,
    aggs: "list[Column] | None" = None,
    ordered: bool = True,
) -> DataFrame:
    """``SELECT _wstart, _wend, <part>, <aggs> ... PARTITION BY <part>
    INTERVAL(width[, offset]) [SLIDING(sliding)]``.

    Tumbling path: custom epoch-aligned bucket expression + groupBy.
    Hopping path (sliding < width): ``F.window(ts, w, s, offset)``.
    Result is ordered by (partition, _wstart) as the reference guarantees;
    ``ordered=False`` skips that terminal range-partition global sort (a
    separate boundary-sampling pass + exchange on output-sized data) for
    callers whose consumers are order-insensitive — the registry gates,
    whose oracle compares a sorted value hash, and fill/interp inputs
    whose window functions re-cluster by hash anyway. The dialect and
    replay paths keep the reference's ordered contract (default True).
    """
    partition_by = partition_by or []
    aggs = aggs or [F.count(F.lit(1)).alias("cnt")]
    w = parse_duration(width)
    s = parse_duration(sliding) if sliding is not None else None

    if s is not None and w.is_calendar and not s.is_calendar:
        # calendar width, fixed slide (INTERVAL(1n) SLIDING(1d)): window
        # starts sit on the epoch-aligned slide grid; each end is a true
        # calendar-month add (session-tz aware, end-of-month clamped).
        # Candidates overestimated with a 32-day month, exact-filtered.
        months = w.months
        sus = s.microseconds
        mon_iv = F.make_ym_interval(F.lit(0), F.lit(months))
        t_us = F.unix_micros(F.col(ts_col))
        max_len_us = months * 32 * 86_400 * 1_000_000
        j_hi = F.floor(t_us / sus).cast("long")
        j_lo = (F.floor((t_us - max_len_us) / sus) + 1).cast("long")
        exploded = df.withColumn("_j", F.explode(F.sequence(j_lo, j_hi)))
        start = F.timestamp_micros((F.col("_j") * sus).cast("long"))
        kept = (
            exploded.withColumn(WSTART, start)
            .withColumn(WEND, (F.col(WSTART) + mon_iv).cast("timestamp"))
            .where(
                (F.col(ts_col) >= F.col(WSTART))
                & (F.col(ts_col) < F.col(WEND))
            )
        )
        out = kept.groupBy(WSTART, WEND, *partition_by).agg(*aggs)
        return out.orderBy(*partition_by, WSTART) if ordered else out
    if s is not None and not w.is_calendar and s.microseconds != w.microseconds:
        off_str = parse_duration(offset).interval_string() if offset is not None else None
        win = F.window(F.col(ts_col), w.interval_string(), s.interval_string(), off_str)
        out = (
            df.groupBy(win.alias("_w"), *partition_by)
            .agg(*aggs)
            .select(
                F.col("_w.start").alias(WSTART),
                F.col("_w.end").alias(WEND),
                *partition_by,
                *[c for c in _agg_names(aggs)],
            )
        )
    else:
        ws = window_start(F.col(ts_col), w, offset)
        out = (
            df.groupBy(ws.alias(WSTART), *partition_by)
            .agg(*aggs)
            .withColumn(WEND, window_end(F.col(WSTART), w, offset))
            .select(WSTART, WEND, *partition_by, *_agg_names(aggs))
        )
    return out.orderBy(*partition_by, WSTART) if ordered else out


def _agg_names(aggs: list[Column]) -> list[str]:
    """Output column names of aggregate expressions (requires .alias())."""
    import re

    names = []
    for c in aggs:
        # Column's name is the last alias; toString gives `expr AS alias`
        # (F.expr-built columns keep the user's lowercase `as`)
        jc = c._jc.toString()
        m = re.search(r"\s+AS\s+`?([A-Za-z_][\w]*)`?\s*$", jc, re.IGNORECASE)
        names.append(m.group(1) if m else jc)
    return names


def interval_window_auto(
    df: DataFrame,
    ts_col: str,
    width: "str | int | Duration",
    origin_us: int,
    sliding: "str | int | Duration | None" = None,
    partition_by: "list[str] | None" = None,
    aggs: "list[Column] | None" = None,
    cal_tz_offset_us: int = 0,
) -> DataFrame:
    """``INTERVAL(w, AUTO)``: windows aligned to an *origin instant*
    instead of the epoch — the reference's AUTO offset anchors the
    window origin to the query's time-range start (or the first data
    row when the range has no lower bound); goldens in
    ``test/cases/13-TimeSeriesExt/03-TimeWindow/ans/interval.csv``.

    Fixed widths reduce to the epoch-aligned kernel with the origin as
    offset.  Calendar widths (n/y) step whole months from the origin
    instant (day-of-month/time-of-day preserved, end-of-month clamped —
    same as the reference's taosTimeAdd).  SLIDING with AUTO explodes
    rows into their covering windows (origin + j*slide), like the
    reference's hopping scan.
    """
    partition_by = partition_by or []
    aggs = aggs or [F.count(F.lit(1)).alias("cnt")]
    w = parse_duration(width)
    s = parse_duration(sliding) if sliding is not None else None
    t_us = F.unix_micros(F.col(ts_col))
    origin = F.timestamp_micros(F.lit(origin_us))

    if not w.is_calendar:
        wus = w.microseconds
        if s is None or s.microseconds == wus:
            start_us = (
                F.floor((t_us - origin_us) / wus).cast("long") * wus + origin_us
            )
            ws = F.timestamp_micros(start_us)
            out = (
                df.groupBy(ws.alias(WSTART), *partition_by)
                .agg(*aggs)
                .withColumn(
                    WEND,
                    F.timestamp_micros(F.unix_micros(F.col(WSTART)) + wus),
                )
            )
            return out.orderBy(*partition_by, WSTART)
        sus = s.microseconds
        # window j covers [origin + j*s, origin + j*s + w):
        # (t-o-w)/s < j <= (t-o)/s
        j_hi = F.floor((t_us - origin_us) / sus).cast("long")
        j_lo = (F.floor((t_us - origin_us - wus) / sus) + 1).cast("long")
        exploded = df.withColumn("_j", F.explode(F.sequence(j_lo, j_hi)))
        start_us = (F.col("_j") * sus + origin_us).cast("long")
        out = (
            exploded.groupBy(
                F.timestamp_micros(start_us).alias(WSTART), *partition_by
            )
            .agg(*aggs)
            .withColumn(
                WEND, F.timestamp_micros(F.unix_micros(F.col(WSTART)) + wus)
            )
        )
        return out.orderBy(*partition_by, WSTART)

    months = w.months
    mon_iv = F.make_ym_interval(F.lit(0), F.lit(months))
    off = cal_tz_offset_us

    def to_wall(c):
        return F.timestamp_micros(F.unix_micros(c) + off) if off else c

    def from_wall(c):
        return F.timestamp_micros(F.unix_micros(c) - off) if off else c

    ts_w = to_wall(F.col(ts_col))
    origin_w = F.timestamp_micros(F.lit(origin_us + off))
    if s is None:
        k0 = (
            (F.year(ts_w) - F.year(origin_w)) * 12
            + F.month(ts_w)
            - F.month(origin_w)
        )
        idx = (F.floor(k0 / months) * months).cast("int")
        cand = (origin_w + F.make_ym_interval(F.lit(0), idx)).cast("timestamp")
        start_w = F.when(
            ts_w < cand,
            (origin_w + F.make_ym_interval(F.lit(0), idx - F.lit(months)))
            .cast("timestamp"),
        ).otherwise(cand)
        end_w = (start_w + mon_iv).cast("timestamp")
        out = (
            df.withColumn(WSTART, from_wall(start_w))
            .withColumn(WEND, from_wall(end_w))
            .groupBy(WSTART, WEND, *partition_by)
            .agg(*aggs)
        )
        return out.orderBy(*partition_by, WSTART)
    sus = s.microseconds
    # calendar width, fixed slide: candidate windows overestimated with a
    # 32-day month, then exact-filtered against the calendar end
    max_len_us = months * 32 * 86_400 * 1_000_000
    j_hi = F.floor((t_us - origin_us) / sus).cast("long")
    j_lo = (F.floor((t_us - origin_us - max_len_us) / sus) + 1).cast("long")
    exploded = df.withColumn("_j", F.explode(F.sequence(j_lo, j_hi)))
    start = F.timestamp_micros((F.col("_j") * sus + origin_us).cast("long"))
    wend = from_wall((to_wall(start) + mon_iv).cast("timestamp"))
    kept = exploded.withColumn(WSTART, start).withColumn(WEND, wend).where(
        (F.col(ts_col) >= F.col(WSTART)) & (F.col(ts_col) < F.col(WEND))
    )
    out = kept.groupBy(WSTART, WEND, *partition_by).agg(*aggs)
    return out.orderBy(*partition_by, WSTART)
