"""CREATE STREAM analogs — each reference trigger type as a Structured
Streaming wrapper.

Reference: ``CREATE STREAM s trigger_type(...) FROM src PARTITION BY k
[WATERMARK(d)] INTO out AS SELECT ...`` (grammar sql.y:1623-1800; engine
source/libs/new-stream/). Mapping per SURVEY §2.10:

  INTERVAL(w) SLIDING(s)  → groupBy(window(ts,w,s), keys) + watermark
  SESSION(ts, gap)        → session_window(ts, gap)
  COUNT_WINDOW(n)         → applyInPandasWithState (row-count state)
  STATE_WINDOW(col)       → applyInPandasWithState (run-tracking state)
  PERIOD(d)               → processingTime trigger
  WATERMARK(d)            → withWatermark (late rows dropped at finalize)
  FILL_HISTORY            → one batch backfill over the same dir, then
                            the stream tails new files (file source
                            reads existing files first by default)
  INTO out_table          → writeStream.start(path) / foreachBatch

Scale notes: windowed aggs with watermarks keep bounded state in the
state store; per-key stateful ops (count/state windows) shuffle once on
the key and hold O(open windows) state per key. Checkpointing is
Spark-native (``checkpointLocation``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tdengine_spark.durations import parse_duration


def read_stream(
    spark,
    path: str,
    schema: "T.StructType | str",
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """File-source stream over a Parquet directory (the analog of the
    reference's WAL-tailing StreamScan; new files = new data)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def interval_trigger(
    src: DataFrame,
    ts_col: str,
    width: str,
    sliding: "str | None" = None,
    partition_by: "list[str] | None" = None,
    watermark: str = "0 seconds",
    aggs: "list | None" = None,
) -> DataFrame:
    """INTERVAL(w) [SLIDING(s)] trigger with WATERMARK: emits finalized
    windows in append mode once the watermark passes _wend."""
    keys = list(partition_by or [])
    aggs = aggs or [F.count(F.lit(1)).alias("cnt")]
    w = parse_duration(width)
    s = parse_duration(sliding) if sliding else w
    win = F.window(F.col(ts_col), w.interval_string(), s.interval_string())
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(win.alias("_w"), *keys)
        .agg(*aggs)
        # "*" already expands the group keys — re-listing them would
        # produce duplicate column names that break file sinks
        .select(F.col("_w.start").alias("_wstart"), F.col("_w.end").alias("_wend"), "*")
        .drop("_w")
    )


def session_trigger(
    src: DataFrame,
    ts_col: str,
    gap: str,
    partition_by: "list[str] | None" = None,
    watermark: str = "0 seconds",
    aggs: "list | None" = None,
) -> DataFrame:
    """SESSION(ts, gap) trigger → native session_window."""
    keys = list(partition_by or [])
    aggs = aggs or [F.count(F.lit(1)).alias("cnt")]
    gap_str = parse_duration(gap).interval_string()
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap_str).alias("_w"), *keys)
        .agg(*aggs)
        # "*" already expands the group keys (see interval_trigger)
        .select(F.col("_w.start").alias("_wstart"), F.col("_w.end").alias("_wend"), "*")
        .drop("_w")
    )


def count_window_trigger(
    src: DataFrame,
    ts_col: str,
    count: int,
    key_col: str,
    value_col: str,
    sliding: "int | None" = None,
    buckets: "int | None" = None,
) -> DataFrame:
    """COUNT_WINDOW(n[, sliding]) trigger: emit one row per n rows per
    key; with ``sliding=s`` windows advance every s rows (overlapping
    when s < n).

    Tumbling (default): applyInPandasWithState emits a window each time
    a key's row counter crosses n — the reference's stream count-window
    semantics (streamTriggerTask.c count trigger). The state group is a
    HASH BUCKET of keys, not a single key (r15, guide §4.5): per state
    group, every micro-batch pays a Python call + an Arrow state
    (de)serialization + a state-store op, so grouping per key made a
    high-cardinality stream pay that fixed cost |keys| times per batch
    (measured at sf0.1: 1500 keys 5.7k rows/s vs 5 keys 9.7k rows/s on
    identical data). Each bucket keeps a dict {key: (cnt, sum, wstart)}
    pickled into a binary state column; per-key arithmetic is the same
    numpy kernel, applied per key segment of the bucket's sorted batch.
    ``buckets`` defaults to 4× the cluster parallelism — it scales with
    the cluster, keeps every core busy, and bounds the per-bucket dict
    at |keys|/buckets entries. Sliding: the state carries the last n−1
    (ts, value) pairs per key — bounded O(n) — and a window closes at
    every s-th arriving row once n rows are in scope.
    """
    if sliding and sliding != count:
        return _sliding_count_window_trigger(
            src, ts_col, count, key_col, value_col, sliding
        )
    out_schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("_wstart", T.TimestampType()),
            T.StructField("_wend", T.TimestampType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("blob", T.BinaryType())])
    n_buckets = buckets or (
        src.sparkSession.sparkContext.defaultParallelism * 4
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pickle

        import numpy as np

        st: dict = (
            pickle.loads(bytes(state.get[0])) if state.exists else {}
        )
        out_k: list = []
        out_ws: list = []
        out_we: list = []
        out_sum: list = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            # stable (k, ts) sort: each key's rows form one contiguous
            # ts-ordered segment, so the per-key kernel below is the
            # pre-r15 per-key-group body unchanged
            pdf = pdf.sort_values(["k", ts_col], kind="stable")
            ks = pdf["k"].to_numpy()
            ts_us = pdf[ts_col].astype("int64").to_numpy() // 1000
            v = pdf[value_col].to_numpy(dtype=float)
            seg = np.concatenate(
                ([0], np.nonzero(ks[1:] != ks[:-1])[0] + 1, [len(ks)])
            )
            for s0, e0 in zip(seg[:-1], seg[1:]):
                k = ks[s0]
                cnt, total, wstart = st.get(k, (0, 0.0, None))
                tseg = ts_us[s0:e0]
                vseg = v[s0:e0]
                n = e0 - s0
                # boundary i closes a window when the carried counter
                # + i + 1 hits a multiple of `count` — one cumsum
                bounds = np.nonzero(
                    (np.arange(1, n + 1) + cnt) % count == 0
                )[0]
                if len(bounds):
                    csum = np.cumsum(vseg) + total
                    sums = csum[bounds] - np.concatenate(
                        ([0.0], csum[bounds[:-1]])
                    )
                    starts = np.empty(len(bounds), dtype=np.int64)
                    starts[0] = wstart if wstart is not None else tseg[0]
                    starts[1:] = tseg[bounds[:-1] + 1]
                    out_k.extend([k] * len(bounds))
                    out_ws.extend(starts.tolist())
                    out_we.extend(tseg[bounds].tolist())
                    # python round, not np.round: bit-parity with the
                    # pre-r15 per-key path (np.round's scale-and-round
                    # can differ by 1 ulp on halfway values)
                    out_sum.extend(round(float(s), 4) for s in sums)
                    rem = bounds[-1] + 1
                    cnt = n - rem
                    total = float(vseg[rem:].sum())
                    wstart = int(tseg[rem]) if cnt else None
                else:
                    if wstart is None:
                        wstart = int(tseg[0])
                    cnt += n
                    total += float(vseg.sum())
                st[k] = (cnt, total, wstart)
        state.update((pickle.dumps(st, protocol=4),))
        yield pd.DataFrame(
            {
                "k": pd.Series(out_k, dtype=object),
                "_wstart": pd.to_datetime(
                    pd.Series(out_ws, dtype="int64") * 1000
                ),
                "_wend": pd.to_datetime(
                    pd.Series(out_we, dtype="int64") * 1000
                ),
                "n_rows": pd.Series(
                    [count] * len(out_k), dtype="int64"
                ),
                "sum_value": pd.Series(out_sum, dtype="float64"),
            }
        )

    return (
        src.select(F.col(key_col).cast("string").alias("k"), ts_col, value_col)
        .withColumn(
            "_kb", F.pmod(F.xxhash64(F.col("k")), F.lit(n_buckets))
        )
        .groupBy("_kb")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def _sliding_count_window_trigger(
    src: DataFrame,
    ts_col: str,
    count: int,
    key_col: str,
    value_col: str,
    sliding: int,
) -> DataFrame:
    """Sliding count windows: close a window of the last ``count`` rows
    at every ``sliding``-th row. State = ring of the last count−1
    (ts, value) pairs + a phase counter — bounded, no full history."""
    out_schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("_wstart", T.TimestampType()),
            T.StructField("_wend", T.TimestampType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )
    def kernel(key_state, ts_us, arrs):
        import numpy as np

        ts_buf, v_buf, seen = key_state
        ts_hist = np.asarray(ts_buf, dtype=np.int64)
        v_hist = np.asarray(v_buf, dtype=np.float64)
        ts_new = ts_us
        v_new = arrs[value_col].astype(float)
        ts_all = np.concatenate([ts_hist, ts_new])
        v_all = np.concatenate([v_hist, v_new])
        n_hist = len(ts_hist)
        out = []
        # global row index of each arriving row (1-based): a window
        # [i-count+1 .. i] closes when i % sliding == 0 and i >= count
        idx = seen + np.arange(1, len(ts_new) + 1)
        closes = idx[(idx % sliding == 0) & (idx >= count)]
        csum = np.concatenate(([0.0], np.cumsum(v_all)))
        for gi in closes:
            # position of the closing row within ts_all
            e = int(gi - seen) + n_hist - 1
            s_i = e - count + 1
            out.append(
                {
                    "_wstart": pd.Timestamp(int(ts_all[s_i]) * 1000),
                    "_wend": pd.Timestamp(int(ts_all[e]) * 1000),
                    "n_rows": count,
                    "sum_value": round(float(csum[e + 1] - csum[s_i]), 4),
                }
            )
        seen += len(ts_new)
        # clamp: a negative slice start would wrap around and
        # silently DROP rows when fewer than count-1 are buffered
        start = max(len(ts_all) - (count - 1), 0)
        return out, (
            ts_all[start:].tolist(), v_all[start:].tolist(), seen
        )

    sel = src.select(
        F.col(key_col).cast("string").alias("k"), ts_col, value_col
    )
    return _bucketed_apply(
        sel, ts_col, [value_col], out_schema, ([], [], 0), kernel
    )


def period_trigger_options(period: str) -> dict:
    """PERIOD(d) → wall-clock processing-time trigger kwargs for
    ``writeStream.trigger(**...)``."""
    d = parse_duration(period)
    return {"processingTime": f"{int(d.seconds)} seconds"}


def write_into(
    result: DataFrame,
    out_path: str,
    checkpoint: str,
    output_mode: str = "append",
    trigger: "dict | None" = None,
    partition_cols: "list[str] | None" = None,
):
    """INTO out-table: continuous Parquet sink with checkpointing; the
    partition columns play the reference's SUBTABLE role (one directory
    per key)."""
    w = (
        result.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", out_path)
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if trigger:
        w = w.trigger(**trigger)
    return w.start()


def _bucketed_apply(
    selected: DataFrame,
    ts_col: str,
    data_cols: "list[str]",
    out_schema: T.StructType,
    state0: tuple,
    kernel,
    buckets: "int | None" = None,
) -> DataFrame:
    """Shared bucketed applyInPandasWithState harness (r15, guide §4.5):
    the state group is a hash bucket of keys, so a micro-batch pays the
    Python call + Arrow state round-trip + state-store op per BUCKET,
    not per key (the per-key grouping made high-cardinality streams pay
    that fixed cost |keys| times per batch — see count_window_trigger).
    ``selected`` must carry a string key column ``k`` plus ``ts_col``
    and ``data_cols``. Each bucket's state is a pickled
    {key: per-key-state-tuple} dict; ``kernel(state, ts_us, arrs)``
    processes one key's ts-sorted batch segment and returns
    (rows_without_k, new_state)."""
    state_schema = T.StructType([T.StructField("blob", T.BinaryType())])
    n_buckets = buckets or (
        selected.sparkSession.sparkContext.defaultParallelism * 4
    )
    out_cols = [f.name for f in out_schema]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pickle

        import numpy as np

        st: dict = (
            pickle.loads(bytes(state.get[0])) if state.exists else {}
        )
        out: list[dict[str, Any]] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            # stable (k, ts) sort: each key's rows form one contiguous
            # ts-ordered segment — the kernel body is the pre-r15
            # per-key-group body unchanged
            pdf = pdf.sort_values(["k", ts_col], kind="stable")
            ks = pdf["k"].to_numpy()
            ts_us = pdf[ts_col].astype("int64").to_numpy() // 1000
            arrs = {c: pdf[c].to_numpy() for c in data_cols}
            seg = np.concatenate(
                ([0], np.nonzero(ks[1:] != ks[:-1])[0] + 1, [len(ks)])
            )
            for s0, e0 in zip(seg[:-1], seg[1:]):
                k = ks[s0]
                rows, new_st = kernel(
                    st.get(k, state0),
                    ts_us[s0:e0],
                    {c: a[s0:e0] for c, a in arrs.items()},
                )
                for r in rows:
                    r["k"] = k
                out.extend(rows)
                st[k] = new_st
        state.update((pickle.dumps(st, protocol=4),))
        yield pd.DataFrame(out, columns=out_cols)

    return (
        selected.withColumn(
            "_kb", F.pmod(F.xxhash64(F.col("k")), F.lit(n_buckets))
        )
        .groupBy("_kb")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def state_window_trigger(
    src: DataFrame,
    ts_col: str,
    state_col: str,
    key_col: str,
    value_col: str,
    buckets: "int | None" = None,
) -> DataFrame:
    """STATE_WINDOW(col) stream trigger: emit a window each time the
    state value changes (reference stream state trigger,
    streamTriggerTask.c). Keeps (state, wstart, last_ts, cnt, sum) per
    key — bucketed per ``_bucketed_apply`` — and a state flip closes
    and emits the previous window."""
    out_schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("state", T.StringType()),
            T.StructField("_wstart", T.TimestampType()),
            T.StructField("_wend", T.TimestampType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )

    def kernel(key_state, ts_us, arrs):
        import numpy as np

        cur, wstart, wend, cnt, total = key_state
        v = arrs[value_col].astype(float)
        st = arrs[state_col].astype(str)
        n = len(v)
        out = []
        # run starts: state differs from the previous row (numpy
        # compare — the only python loop left is over runs, whose
        # number is bounded by state flips, not rows)
        is_start = np.empty(n, dtype=bool)
        is_start[0] = cur is None or st[0] != cur
        is_start[1:] = st[1:] != st[:-1]
        run_starts = np.nonzero(is_start)[0]
        run_ends = np.append(run_starts[1:] - 1, n - 1)
        csum = np.cumsum(v)
        # batch head continuing the carried run (same state value)
        first = int(run_starts[0]) if len(run_starts) else n
        if first > 0:
            cnt += first
            total += float(csum[first - 1])
            wend = int(ts_us[first - 1])
        for s_i, e_i in zip(run_starts, run_ends):
            if cur is not None:  # a flip closes the carried window
                out.append(
                    {
                        "state": cur,
                        "_wstart": pd.Timestamp(wstart * 1000),
                        "_wend": pd.Timestamp(wend * 1000),
                        "n_rows": cnt,
                        "sum_value": round(total, 4),
                    }
                )
            cur = str(st[s_i])
            wstart = int(ts_us[s_i])
            wend = int(ts_us[e_i])
            cnt = int(e_i - s_i + 1)
            total = float(csum[e_i] - (csum[s_i - 1] if s_i else 0.0))
        return out, (cur, wstart, wend, cnt, total)

    sel = src.select(
        F.col(key_col).cast("string").alias("k"),
        ts_col,
        F.col(state_col).cast("string").alias(state_col)
        if state_col != "k"
        else F.col(state_col),
        value_col,
    )
    return _bucketed_apply(
        sel,
        ts_col,
        [state_col, value_col],
        out_schema,
        (None, None, None, 0, 0.0),
        kernel,
        buckets,
    )


def event_window_trigger(
    src: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    start_threshold: float,
    end_threshold: float,
) -> DataFrame:
    """EVENT_WINDOW START WITH value > start_t END WITH value < end_t
    stream trigger: window opens at a start-condition row, closes
    (inclusive) at the first end-condition row."""
    out_schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("_wstart", T.TimestampType()),
            T.StructField("_wend", T.TimestampType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )

    def kernel(key_state, ts_us, arrs):
        import numpy as np

        is_open, wstart, cnt = key_state
        v = arrs[value_col].astype(float)
        n = len(v)
        out = []
        starts = np.nonzero(v > start_threshold)[0]
        ends = np.nonzero(v < end_threshold)[0]

        def emit(ws, e_i, rows):
            out.append(
                {
                    "_wstart": pd.Timestamp(int(ws) * 1000),
                    "_wend": pd.Timestamp(int(ts_us[e_i]) * 1000),
                    "n_rows": int(rows),
                }
            )

        pos = 0
        if is_open:  # carried window: close at first end-row, if any
            if len(ends):
                e_i = int(ends[0])
                emit(wstart, e_i, cnt + e_i + 1)
                is_open, wstart, cnt = False, None, 0
                pos = e_i + 1
            else:
                cnt += n
                pos = n
        # loop is over emitted windows (searchsorted jumps), not rows
        while pos < n:
            k_i = np.searchsorted(starts, pos)
            if k_i >= len(starts):
                break
            s_i = int(starts[k_i])
            j = np.searchsorted(ends, s_i)
            if j >= len(ends):
                is_open, wstart, cnt = True, int(ts_us[s_i]), n - s_i
                break
            e_i = int(ends[j])
            emit(ts_us[s_i], e_i, e_i - s_i + 1)
            pos = e_i + 1
        return out, (is_open, wstart, cnt)

    sel = src.select(
        F.col(key_col).cast("string").alias("k"), ts_col, value_col
    )
    return _bucketed_apply(
        sel, ts_col, [value_col], out_schema, (False, None, 0), kernel
    )
