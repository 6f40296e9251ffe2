"""Fluent query API — the user-facing surface mirroring the reference
dialect's shape (SURVEY §7 phase 0):

    Scan(db, "meters")
        .range("2024-01-01", "2024-02-01")      # WHERE ts BETWEEN ...
        .where(F.col("voltage") > 220)
        .partition_by("tbname")                  # PARTITION BY
        .interval("10m", sliding="5m")           # INTERVAL(...) SLIDING(...)
        .agg(F.avg("current").alias("avg_cur"))
        .fill("prev")                            # FILL(PREV)
        .df()

Every combinator only *builds* the DataFrame plan — Catalyst sees one
declarative tree, so pushdown/pruning/AQE all apply. The ts-range is
routed through the catalog's pushable scan (catalog.py).

Window-clause variants mirror the grammar (sql.y:2871-2888):
    .session(gap) .state_window(col) .event_window(start, end)
    .count_window(n[, sliding]) — then .agg(...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tdengine_spark.catalog import Database
from tdengine_spark.operators import fill as fill_op
from tdengine_spark.operators import timewindow as tw
from tdengine_spark.operators.eventwindow import (
    assign_count_windows,
    assign_event_windows,
    assign_session_windows,
    assign_state_windows,
    window_agg,
)
from tdengine_spark.operators.interp import interp as interp_op


class Scan:
    """Entry point: a scan of one super table."""

    def __init__(self, db: Database, table: str, spark=None, ts_col: str = "ts"):
        self._db = db
        self._table = table
        self._spark = spark
        self._ts_col = ts_col
        self._range = None
        self._filters: list[Column] = []
        self._keys: list[str] = []
        self._dedup = False

    # -- scan options -------------------------------------------------
    def range(self, start=None, end=None) -> "Scan":
        self._range = (start, end)
        return self

    def where(self, cond: Column) -> "Scan":
        self._filters.append(cond)
        return self

    def dedup(self) -> "Scan":
        """Keep-last (tbname, ts) dedup on read (SURVEY §1.4)."""
        self._dedup = True
        return self

    def partition_by(self, *cols: str) -> "Scan":
        self._keys = list(cols)
        return self

    # -- window clauses ----------------------------------------------
    def interval(self, width, sliding=None, offset=None) -> "IntervalQuery":
        return IntervalQuery(self, width, sliding, offset)

    def session(self, gap) -> "EventishQuery":
        return EventishQuery(self, "session", gap=gap)

    def state_window(self, state_col) -> "EventishQuery":
        return EventishQuery(self, "state", state_col=state_col)

    def event_window(self, start_cond: Column, end_cond: Column) -> "EventishQuery":
        return EventishQuery(self, "event", start_cond=start_cond, end_cond=end_cond)

    def count_window(self, n: int, sliding: "int | None" = None) -> "EventishQuery":
        return EventishQuery(self, "count", n=n, sliding=sliding)

    def interp(self, val_col, start, end, every, mode="linear", fill_value=None):
        return interp_op(
            self.df(), self._ts_col, val_col, start, end, every,
            mode=mode, partition_by=self._keys, fill_value=fill_value,
        )

    # -- joins (reference ASOF / WINDOW JOIN) --------------------------
    def asof_join(
        self,
        other: "Scan | DataFrame",
        on: "list[str] | None" = None,
        direction: str = "backward",
        strict: bool = False,
        tolerance=None,
        jlimit: int = 1,
    ) -> DataFrame:
        """``this ASOF JOIN other ON keys [JLIMIT k]`` — keys default to
        the scan's PARTITION BY columns."""
        from tdengine_spark.operators.asofjoin import asof_join

        right = other.df() if isinstance(other, Scan) else other
        return asof_join(
            self.df(), right, on or self._keys, ts_col=self._ts_col,
            direction=direction, strict=strict, tolerance=tolerance,
            jlimit=jlimit,
        )

    def window_join(
        self,
        other: "Scan | DataFrame",
        lower,
        upper,
        on: "list[str] | None" = None,
        jlimit: "int | None" = None,
    ) -> DataFrame:
        """``this WINDOW JOIN other WINDOW_OFFSET(lower, upper)``."""
        from tdengine_spark.operators.asofjoin import window_join

        right = other.df() if isinstance(other, Scan) else other
        return window_join(
            self.df(), right, on or self._keys, lower, upper,
            ts_col=self._ts_col, jlimit=jlimit,
        )

    # -- terminal ------------------------------------------------------
    def df(self, query_pseudocols: bool = False) -> DataFrame:
        base = self._db.table(self._table).read(
            self._spark, dedup=self._dedup, ts_range=self._range
        )
        for f in self._filters:
            base = base.where(f)
        if query_pseudocols:
            # _qstart/_qend/_qduration (reference builtins.c:5211-5239):
            # the query's time range as row-constant pseudo-columns
            lo, hi = self._range or (None, None)
            qs = F.lit(lo).cast("timestamp")
            qe = F.lit(hi).cast("timestamp")
            base = (
                base.withColumn("_qstart", qs)
                .withColumn("_qend", qe)
                .withColumn(
                    "_qduration", F.unix_micros(qe) - F.unix_micros(qs)
                )
            )
        return base

    def agg(self, *aggs: Column) -> DataFrame:
        """Plain (non-windowed) aggregate, honoring PARTITION BY."""
        base = self.df()
        if self._keys:
            return base.groupBy(*self._keys).agg(*aggs)
        return base.agg(*aggs)


class IntervalQuery:
    def __init__(self, scan: Scan, width, sliding, offset):
        self._scan = scan
        self._width = width
        self._sliding = sliding
        self._offset = offset
        self._aggs: list[Column] = []
        self._fill: "tuple | None" = None

    def agg(self, *aggs: Column) -> "IntervalQuery":
        self._aggs = list(aggs)
        return self

    def fill(self, mode: str, values: "dict | None" = None) -> "IntervalQuery":
        self._fill = (mode, values)
        return self

    def df(self) -> DataFrame:
        out = tw.interval_window(
            self._scan.df(),
            self._scan._ts_col,
            self._width,
            sliding=self._sliding,
            offset=self._offset,
            partition_by=self._scan._keys,
            aggs=self._aggs or None,
        )
        if self._fill:
            mode, values = self._fill
            rng = self._scan._range or (None, None)
            had = [
                c
                for c in out.columns
                if c not in ("_wstart", "_wend", *self._scan._keys)
            ]
            out = fill_op.fill(
                out, mode, self._width, self._scan._keys, had,
                fill_values=values,
                range_start=_align_bucket(rng[0], self._width, self._offset),
                range_end=_align_bucket(
                    rng[1], self._width, self._offset, end_exclusive=True
                ),
            )
        return out


def _align_bucket(bound, width, offset=None, end_exclusive=False):
    """Align a query-range bound down to its bucket start (driver-side,
    fixed-width units only — calendar fills use the data-driven spine).
    ``end_exclusive`` aligns to the last bucket strictly before the bound
    (the scan range is half-open)."""
    if bound is None:
        return None
    from tdengine_spark.durations import parse_duration

    w = parse_duration(width)
    if w.is_calendar:
        return None
    import pandas as pd

    us = pd.Timestamp(bound).value // 1000
    if end_exclusive:
        us -= 1
    off = parse_duration(offset).microseconds if offset is not None else 0
    aligned = (us - off) // w.microseconds * w.microseconds + off
    return pd.Timestamp(aligned * 1000)


class EventishQuery:
    """session / state / event / count windows — shared terminal."""

    def __init__(self, scan: Scan, kind: str, **kw):
        self._scan = scan
        self._kind = kind
        self._kw = kw
        self._true_for = None

    def true_for(self, duration) -> "EventishQuery":
        self._true_for = duration
        return self

    def agg(self, *aggs: Column) -> DataFrame:
        scan = self._scan
        base = scan.df()
        ts = scan._ts_col
        keys = scan._keys
        if self._kind == "session":
            assigned = assign_session_windows(base, ts, self._kw["gap"], keys)
        elif self._kind == "state":
            assigned = assign_state_windows(base, ts, self._kw["state_col"], keys)
        elif self._kind == "event":
            assigned = assign_event_windows(
                base, ts, self._kw["start_cond"], self._kw["end_cond"], keys
            )
        else:
            assigned = assign_count_windows(
                base, ts, self._kw["n"], self._kw.get("sliding"), keys
            )
        return window_agg(
            assigned, ts, list(aggs), keys,
            true_for=self._true_for,
            keep_state=(self._kind == "state"),
        )
