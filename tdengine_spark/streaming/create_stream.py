"""CREATE STREAM dialect statement → Structured Streaming wire-up.

Reference grammar (parser/inc/sql.y:1623-1664):

    CREATE STREAM [IF NOT EXISTS] name trigger_def
        FROM src [PARTITION BY k1, k2]
        [STREAM_OPTIONS(opt[, ...])] [NOTIFY(...)]
        INTO out [AS SELECT ...]

with trigger_def one of INTERVAL(w[, offset]) [SLIDING(s)],
SESSION(ts, gap), STATE_WINDOW(col), EVENT_WINDOW(START WITH cond END
WITH cond), COUNT_WINDOW(n[, sliding]), PERIOD(d). Reference behavior
exercised by test/cases/18-StreamProcessing.

This layer translates the statement onto the trigger constructors in
``tdengine_spark.streaming.stream`` — the parse result is a
``StreamDef`` you can ``apply`` to any streaming source DataFrame (the
test path), or hand to ``create_stream`` for the full file-source →
parquet-sink wire-up (the deployment path). The SELECT list reuses the
batch dialect's aggregate rewrites, so ``spread``/``last_row``/… work in
stream select lists too.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CREATE_STREAM_RE = re.compile(
    r"""
    ^\s*CREATE\s+STREAM\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[A-Za-z_]\w*)
    \s+(?P<trigger>
        INTERVAL\s*\(.*?\)(?:\s+SLIDING\s*\(.*?\))?
      | SESSION\s*\(.*?\)
      | STATE_WINDOW\s*\(.*?\)
      | EVENT_WINDOW\s*\(\s*START\s+WITH\s+.*?\s+END\s+WITH\s+.*?\s*\)
      | COUNT_WINDOW\s*\(.*?\)
      | PERIOD\s*\(.*?\)
    )
    \s+FROM\s+(?P<src>[A-Za-z_][\w.]*)
    (?:\s+PARTITION\s+BY\s+(?P<partition>.*?))?
    (?:\s+STREAM_OPTIONS\s*\(\s*(?P<options>.*?)\s*\))?
    (?:\s+WATERMARK\s*\(\s*(?P<watermark>[^)]+)\s*\))?
    \s+INTO\s+(?P<into>[A-Za-z_][\w.]*)
    (?:\s+AS\s+(?P<query>SELECT\s+.*?))?
    \s*;?\s*$
    """,
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


@dataclass
class StreamDef:
    """Parsed CREATE STREAM statement."""

    name: str
    trigger: str  # interval|session|state_window|event_window|count_window|period
    trigger_args: dict
    source: str
    partition_by: list[str] = field(default_factory=list)
    options: list[str] = field(default_factory=list)
    watermark: "str | None" = None
    into: "str | None" = None
    select: "str | None" = None  # the AS SELECT ... select list (raw)

    def apply(
        self,
        src: DataFrame,
        ts_col: str = "ts",
        value_col: str = "value",
    ) -> DataFrame:
        """Build the transformed streaming DataFrame for this stream over
        ``src`` (a streaming source with the FROM table's schema)."""
        from tdengine_spark.streaming import stream as st

        keys = self.partition_by
        wm = self.watermark or "0 seconds"
        aggs = self._aggs(ts_col)
        ta = self.trigger_args
        if self.trigger == "interval":
            return st.interval_trigger(
                src, ts_col, ta["width"], ta.get("sliding"), keys, wm, aggs
            )
        if self.trigger == "session":
            return st.session_trigger(
                src, ta.get("ts_col", ts_col), ta["gap"], keys, wm, aggs
            )
        if self.trigger == "count_window":
            return st.count_window_trigger(
                src, ts_col, ta["count"], _one_key(keys), value_col,
                sliding=ta.get("sliding"),
            )
        if self.trigger == "state_window":
            return st.state_window_trigger(
                src, ts_col, ta["state_col"], _one_key(keys), value_col
            )
        if self.trigger == "event_window":
            lo, hi = _event_thresholds(ta["start"], ta["end"], value_col)
            return st.event_window_trigger(
                src, ts_col, _one_key(keys), value_col, lo, hi
            )
        if self.trigger == "period":
            # PERIOD is a wall-clock emit cadence, not a data window: the
            # frame passes through; cadence rides on the sink trigger
            return src
        raise ValueError(f"unknown trigger {self.trigger!r}")

    # -- STREAM_OPTIONS (sql.y:1730-1739) ---------------------------------

    def max_delay(self) -> "str | None":
        """MAX_DELAY(d): emit intermediate window results at latency ≤ d
        even before the window closes."""
        for o in self.options:
            m = re.match(r"MAX_DELAY\s*\(\s*([^)]+)\s*\)", o, re.IGNORECASE)
            if m:
                return m.group(1).strip()
        return None

    def has_option(self, name: str) -> bool:
        return any(o.upper().startswith(name.upper()) for o in self.options)

    def sink_trigger(self) -> "dict | None":
        """writeStream.trigger kwargs implied by the trigger type/options."""
        from tdengine_spark.streaming.stream import period_trigger_options

        delay = self.max_delay()
        if delay is not None:
            return period_trigger_options(delay)
        if self.trigger == "period":
            return period_trigger_options(self.trigger_args["period"])
        return None

    def output_mode(self) -> str:
        """MAX_DELAY → update mode: every micro-batch pushes the current
        (partial) window aggregates, the reference's early-emit semantics;
        otherwise append (windows emit once, finalized by the watermark)."""
        return "update" if self.max_delay() is not None else "append"

    def _aggs(self, ts_col: str) -> "list | None":
        if not self.select:
            return None
        from tdengine_spark.dialect import _rewrite_aggs, _split_select

        m = re.match(
            r"SELECT\s+(?P<sel>.*?)(?:\s+FROM\s+[A-Za-z_][\w.]*)?\s*$",
            self.select,
            re.IGNORECASE | re.DOTALL,
        )
        items = _split_select(_rewrite_aggs(m.group("sel"), ts_col))
        skip = {"_wstart", "_wend", *self.partition_by}
        return [F.expr(it) for it in items if it.strip() not in skip] or None


def _one_key(keys: list[str]) -> str:
    if len(keys) != 1:
        raise ValueError(
            "count/state/event window stream triggers need exactly one "
            f"PARTITION BY key, got {keys!r}"
        )
    return keys[0]


def _event_thresholds(start: str, end: str, value_col: str):
    """Parse ``v > a`` / ``v < b`` threshold conditions (the stream
    event-trigger kernel tracks scalar thresholds)."""
    ms = re.match(rf"\s*{value_col}\s*>\s*(-?[\d.]+)\s*$", start)
    me = re.match(rf"\s*{value_col}\s*<\s*(-?[\d.]+)\s*$", end)
    if not ms or not me:
        raise ValueError(
            f"unsupported EVENT_WINDOW conditions: {start!r} / {end!r} "
            f"(expected '{value_col} > x' and '{value_col} < y')"
        )
    return float(ms.group(1)), float(me.group(1))


#: session-level stream catalog (reference mnode stream registry,
#: surfaced as information_schema.ins_streams / SHOW STREAMS)
_STREAMS: "dict[str, StreamDef]" = {}


def register_stream(defn: StreamDef) -> StreamDef:
    _STREAMS[defn.name] = defn
    return defn


def drop_stream(name: str) -> bool:
    return _STREAMS.pop(name, None) is not None


def list_streams() -> "list[StreamDef]":
    return [_STREAMS[k] for k in sorted(_STREAMS)]


def parse_create_stream(sql: str) -> StreamDef:
    """Parse a CREATE STREAM statement into a StreamDef (raises on
    unrecognized syntax rather than silently mis-translating)."""
    m = _CREATE_STREAM_RE.match(sql)
    if not m:
        raise ValueError(f"unrecognized CREATE STREAM statement: {sql!r}")
    g = m.groupdict()
    trig = g["trigger"].strip()
    tl = trig.lower()
    if tl.startswith("interval"):
        mm = re.match(
            r"interval\s*\(\s*([^,)]+)(?:,\s*([^)]+))?\)"
            r"(?:\s+sliding\s*\(\s*([^)]+)\s*\))?",
            trig,
            re.IGNORECASE,
        )
        kind, args = "interval", {
            "width": mm.group(1).strip(),
            "offset": (mm.group(2) or "").strip() or None,
            "sliding": (mm.group(3) or "").strip() or None,
        }
    elif tl.startswith("session"):
        mm = re.match(r"session\s*\(\s*([^,]+),\s*([^)]+)\)", trig, re.IGNORECASE)
        kind, args = "session", {
            "ts_col": mm.group(1).strip(),
            "gap": mm.group(2).strip(),
        }
    elif tl.startswith("state_window"):
        mm = re.match(r"state_window\s*\(\s*([^)]+)\)", trig, re.IGNORECASE)
        kind, args = "state_window", {"state_col": mm.group(1).strip()}
    elif tl.startswith("event_window"):
        mm = re.match(
            r"event_window\s*\(\s*start\s+with\s+(.*?)\s+end\s+with\s+(.*?)\s*\)",
            trig,
            re.IGNORECASE | re.DOTALL,
        )
        kind, args = "event_window", {
            "start": mm.group(1).strip(),
            "end": mm.group(2).strip(),
        }
    elif tl.startswith("count_window"):
        mm = re.match(
            r"count_window\s*\(\s*(\d+)(?:,\s*(\d+))?\)", trig, re.IGNORECASE
        )
        kind, args = "count_window", {
            "count": int(mm.group(1)),
            "sliding": int(mm.group(2)) if mm.group(2) else None,
        }
    else:
        mm = re.match(r"period\s*\(\s*([^)]+)\)", trig, re.IGNORECASE)
        kind, args = "period", {"period": mm.group(1).strip()}
    return StreamDef(
        name=g["name"],
        trigger=kind,
        trigger_args=args,
        source=g["src"],
        partition_by=(
            [c.strip() for c in g["partition"].split(",")] if g["partition"] else []
        ),
        options=(
            [o.strip() for o in g["options"].split("|")] if g["options"] else []
        ),
        watermark=(g["watermark"] or "").strip() or None,
        into=g["into"],
        select=(g["query"] or "").strip() or None,
    )


def batch_sink_hook(defn: StreamDef, write_batch):
    """foreachBatch wrapper honoring IGNORE_NODATA_TRIGGER (skip firings
    whose batch produced no rows — the reference's no-data gate for
    wall-clock triggers) and FORCE_OUTPUT (fire even on empty batches:
    ``write_batch`` receives the empty frame and must emit its
    placeholder row). Default behavior (neither flag): write whatever
    the batch holds, empty or not."""
    ignore_nodata = defn.has_option("IGNORE_NODATA_TRIGGER")
    force = defn.has_option("FORCE_OUTPUT")

    def hook(batch_df, batch_id):
        if ignore_nodata and batch_df.isEmpty():
            return
        write_batch(batch_df, batch_id, force_output=force)

    return hook


def create_stream(
    spark,
    sql: str,
    in_root: str,
    out_root: str,
    checkpoint_root: str,
    ts_col: str = "ts",
    value_col: str = "value",
    max_files_per_trigger: int = 10,
):
    """Full deployment path: parse, read the FROM table as a file-source
    stream under ``in_root``, apply the trigger, start the parquet sink
    at ``out_root/<into>``. Returns the StreamingQuery.

    STREAM_OPTIONS honored here: MAX_DELAY(d) → update-mode sink firing
    every d (early partial windows); IGNORE_NODATA_TRIGGER /
    FORCE_OUTPUT → foreachBatch gate (see ``batch_sink_hook``)."""
    from tdengine_spark.streaming.stream import read_stream, write_into

    defn = parse_create_stream(sql)
    src_path = f"{in_root}/{defn.source}"
    schema = spark.read.parquet(src_path).schema
    src = read_stream(spark, src_path, schema, max_files_per_trigger)
    result = defn.apply(src, ts_col, value_col)
    out_path = f"{out_root}/{defn.into}"
    ckpt = f"{checkpoint_root}/{defn.name}"
    if defn.has_option("IGNORE_NODATA_TRIGGER") or defn.has_option("FORCE_OUTPUT"):

        def write_batch(batch_df, batch_id, force_output=False):
            if force_output and batch_df.isEmpty():
                # FORCE_OUTPUT: a firing with no data still writes a row
                # of NULL aggregates (reference empty-window emission)
                batch_df = batch_df.sparkSession.createDataFrame(
                    [tuple(None for _ in batch_df.columns)], batch_df.schema
                )
            batch_df.write.mode("append").parquet(out_path)

        w = (
            result.writeStream.outputMode(defn.output_mode())
            .option("checkpointLocation", ckpt)
            .foreachBatch(batch_sink_hook(defn, write_batch))
        )
        trig = defn.sink_trigger()
        if trig:
            w = w.trigger(**trig)
        return w.start()
    return write_into(
        result,
        out_path,
        ckpt,
        output_mode=defn.output_mode(),
        trigger=defn.sink_trigger(),
    )
