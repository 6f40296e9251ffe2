"""EXTERNAL_WINDOW — windows defined by the rows of another query.

Reference: ``SELECT ... FROM fact [PARTITION BY k]
EXTERNAL_WINDOW((<window query>) w)`` (grammar sql.y external_window
clause; 13-TimeSeriesExt/08-ExternalWindow goldens). Each row of the
window query defines one window [start, end] (INCLUSIVE both bounds —
pinned by ans/basic_query.ans) with projectable payload columns; fact
rows falling inside produce joined rows (no aggregation) or per-window
aggregates. Windows with no fact rows produce nothing.

Spark-first plan: a BUCKETED range join, the same trick as
operators/asofjoin.window_join — fact rows bucket at the widest window
width, window rows explode into their covered buckets, and the join is
a pure equi-join on (bucket [+ correlation keys]) with the exact range
predicate riding along. No BroadcastNestedLoopJoin, no cartesian; the
widest-window bucket choice bounds the explode fan-out at
ceil(width/W)+1 = 2 per window row.

Correlation: window-query output columns that also appear in the fact's
PARTITION BY list become equi-join keys (the reference scopes windows
per partition when both sides are partitioned by the same tag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WSTART = "_wstart"
WEND = "_wend"
WID = "_ext_wid"
WPREFIX = "_w_"


def _with_wid(windows: DataFrame, wcols: "list[str]") -> DataFrame:
    """Deterministic per-window id that scales: the id IS the window row
    (a struct of every window column) plus a duplicate sequence number.

    Value-identity makes the id stable across independent recomputations
    (external_window and external_window_frames must assign the SAME id
    to the same window row), and the only window function involved
    partitions by the full row — duplicate-row groups, each a handful of
    rows — so no global, single-partition ordering exists anywhere, no
    matter how many window rows the definition query yields (an
    INTERVAL subquery over a year of 10s buckets stays distributed).
    Duplicate window rows keep distinct ids (the reference emits
    duplicated windows separately); which physical duplicate gets which
    sequence number is immaterial because the rows are identical."""
    dup = F.row_number().over(
        Window.partitionBy(*[F.col(c) for c in wcols]).orderBy(
            F.col(wcols[0])
        )
    )
    return windows.withColumn(
        WID,
        F.struct(*[F.col(c) for c in wcols], dup.alias("_dup")),
    )


def external_window_frames(
    fact: DataFrame,
    windows: DataFrame,
    ts_col: str = "ts",
    corr_keys: "list[str] | None" = None,
):
    """(joined, window_frame): the joined fact×window rows AND the keyed
    window-definition frame (_ext_wid, _wstart, _wend, _w_<payload>…) —
    FILL modes need the empty windows the inner join drops."""
    joined = external_window(fact, windows, ts_col, corr_keys)
    wcols = windows.columns
    if WSTART in wcols and WEND in wcols:
        start_c, end_c = WSTART, WEND
    else:
        start_c, end_c = wcols[0], wcols[1]
    payload = [c for c in wcols if c not in (start_c, end_c)]
    wkeyed = _with_wid(windows, wcols).select(
        F.col(WID),
        F.col(start_c).alias(WSTART),
        F.col(end_c).alias(WEND),
        *[F.col(c).alias(f"{WPREFIX}{c}") for c in payload],
    )
    return joined, wkeyed


def external_window(
    fact: DataFrame,
    windows: DataFrame,
    ts_col: str = "ts",
    corr_keys: "list[str] | None" = None,
) -> DataFrame:
    """Join each fact row to every window row whose [start, end] covers
    its ``ts_col`` (bounds inclusive), window bounds being the window
    frame's FIRST TWO columns; remaining window columns come back
    prefixed ``_w_``, the bounds as ``_wstart``/``_wend``, plus a
    deterministic per-window id ``_ext_wid`` for aggregation.

    The window side is expected to be small relative to the fact table
    (it is a window DEFINITION set); its width statistics are collected
    to pick the bucket granularity — one tiny driver action, analogous
    to broadcasting a dimension.
    """
    corr_keys = list(corr_keys or [])
    wcols = windows.columns
    if len(wcols) < 2:
        raise ValueError(
            "external window query needs >= 2 columns (start, end)"
        )
    if WSTART in wcols and WEND in wcols:
        # an INTERVAL() window subquery names its bounds; positional
        # otherwise (first two columns = start, end)
        start_c, end_c = WSTART, WEND
    else:
        start_c, end_c = wcols[0], wcols[1]
    payload = [c for c in wcols if c not in (start_c, end_c)]

    # deterministic, distributed window id (see _with_wid) — duplicate
    # window rows each stay their own window (the reference emits
    # duplicated windows separately)
    w = _with_wid(windows, wcols)

    s_us = F.unix_micros(F.col(start_c))
    e_us = F.unix_micros(F.col(end_c))
    stats = w.agg(
        F.max(e_us - s_us).alias("w"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if not stats["n"]:
        # no windows → empty result with the joined schema
        width = 1
    else:
        width = max(int(stats["w"] or 0), 1)

    wb = w.select(
        F.col(start_c).alias(WSTART),
        F.col(end_c).alias(WEND),
        *[F.col(c).alias(f"{WPREFIX}{c}") for c in payload],
        *[F.col(c).alias(f"_k_{c}") for c in corr_keys if c in wcols],
        F.col(WID),
        F.explode(
            F.sequence(
                F.floor(s_us / width), F.floor(e_us / width)
            )
        ).alias("_b"),
    )
    fb = fact.withColumn("_b", F.floor(F.unix_micros(F.col(ts_col)) / width))

    t = F.unix_micros(F.col(f"f.{ts_col}"))
    cond = (
        (F.col("f._b") == F.col("wb._b"))
        & (t >= F.unix_micros(F.col(f"wb.{WSTART}")))
        & (t <= F.unix_micros(F.col(f"wb.{WEND}")))
    )
    for k in corr_keys:
        if f"_k_{k}" in wb.columns:
            cond = cond & (F.col(f"f.{k}") == F.col(f"wb._k_{k}"))
    joined = fb.alias("f").join(wb.alias("wb"), cond, "inner")
    return joined.select(
        *[F.col(f"f.{c}") for c in fact.columns],
        F.col(f"wb.{WSTART}"),
        F.col(f"wb.{WEND}"),
        *[F.col(f"wb.{WPREFIX}{c}") for c in payload],
        F.col(f"wb.{WID}"),
    )
