"""Session / state / event / count windows — the reference's data-driven
window family (timewindowoperator.c SESSION, STATE_WINDOW; eventwindow
operator.c EVENT_WINDOW; countwindowoperator.c COUNT_WINDOW) as one shared
Spark kernel:

    boundary flag  →  running sum over (keys, ts)  →  window id  →  groupBy

All four windows reduce to "assign a window id per row, then aggregate" —
exactly how the reference's operators stream over ts-sorted blocks, but
expressed as Catalyst window + aggregate so Spark handles partitioning,
sorting, codegen and spill.

Scale notes: the window-id assignment is one ordered analytic window per
series key (`partitionBy(tbname).orderBy(ts)`) — the same per-child-table
ts-ordered pass the reference makes. Spark shuffles once on the keys; the
subsequent groupBy on (keys, window_id) reuses that partitioning, so the
whole operator costs a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tdengine_spark.durations import Duration, parse_duration
from tdengine_spark.operators.timewindow import WEND, WSTART

WINDOW_ID = "_wid"


def _keyed(partition_by: "list[str] | None"):
    return list(partition_by or [])


def _order_keys(ts_col: str, order_by):
    """Window sort keys for run assignment: the presented row order of an
    ordered subquery when given (reference: windows over a derived table
    with ORDER BY assign in that order — parTranslater keeps the sort,
    04-StateWindow orderbyOtherTS), else primary-ts order. ``order_by``:
    list of (column, is_desc)."""
    if not order_by:
        return [F.col(ts_col)]
    return [
        F.col(c).desc() if is_desc else F.col(c) for c, is_desc in order_by
    ]


def assign_session_windows(
    df: DataFrame,
    ts_col: str,
    gap: "str | int | Duration",
    partition_by: "list[str] | None" = None,
    order_by=None,
) -> DataFrame:
    """SESSION(ts, gap): a new window starts when the ABSOLUTE gap since
    the previous row exceeds ``gap``. In primary-ts scan order the
    difference is never negative; scanning an ordered subquery's
    presented order (orderbyOtherTS), a descending-pk walk with steps
    within the gap still forms one session — the reference compares
    |prev − cur| (doSessionWindowAgg). Adds ``_wid``."""
    keys = _keyed(partition_by)
    gap_us = parse_duration(gap).microseconds
    order = _order_keys(ts_col, order_by)
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    cur_ts = F.unix_micros(F.col(ts_col))
    new_flag = (
        F.when(prev_ts.isNull(), 1)
        .when(F.abs(cur_ts - prev_ts) > gap_us, 1)
        .otherwise(0)
    )
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(WINDOW_ID, F.sum(new_flag).over(run))


def assign_state_windows(
    df: DataFrame,
    ts_col: str,
    state_col: "str | Column",
    partition_by: "list[str] | None" = None,
    extend: int = 0,
    state_nullable: "bool | None" = None,
    order_by=None,
) -> DataFrame:
    """STATE_WINDOW(expr): one window per run of equal state value. Adds
    ``_wid`` and ``_state``. ``order_by``: assign runs in an ordered
    subquery's presented order instead of ts order (orderbyOtherTS).

    NULL state values are skipped — they belong to no window and do not
    split a run (reference statewindowoperator NULL-block handling,
    test/cases/13-TimeSeriesExt/04-StateWindow null tests; golden:
    09-WindowProjection d_null state_window rows absent).

    ``extend`` (sql.y state_window_opt EXTEND, v3.3.8): 0 = NULL-state
    rows belong to no window (default); 1 = they attach FORWARD to the
    preceding window; 2 = they attach BACKWARD to the following window.
    The caller (window_agg) also stretches _wstart/_wend to cover the
    inter-window gap per the same mode.

    ``state_nullable``: the NULL-state machinery costs one extra
    analytic pass (a reverse-ordered next-state scan). Pass ``False``
    when the state column is known non-NULL (the caller asserts it, the
    same way its oracle SQL does) to keep the single-direction two-pass
    kernel; ``None`` infers from the schema (parquet columns are
    usually declared nullable, so explicit ``False`` is the fast path).

    Scale: both paths are one shuffle on ``partition_by`` + O(n)
    growing-frame passes per key; the nullable path adds one extra sort
    (descending ts) on the already-co-partitioned data — no
    whole-partition or shrinking frames anywhere."""
    keys = _keyed(partition_by)
    state = F.col(state_col) if isinstance(state_col, str) else state_col
    if state_nullable is None:
        state_nullable = (
            df.schema[state_col].nullable
            if isinstance(state_col, str) and state_col in df.columns
            else True
        )
    order = _order_keys(ts_col, order_by)
    w = Window.partitionBy(*keys).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    tagged = df.withColumn("_state", state)

    if not state_nullable:
        # non-NULL state: plain lag run-change kernel — two chained
        # ascending window passes sharing one shuffle + one sort
        prev = F.lag("_state").over(w)
        change = F.when(
            prev.isNull() | (prev != F.col("_state")), 1
        ).otherwise(0)
        out = tagged.withColumn(WINDOW_ID, F.sum(change).over(run))
        if extend == 2:
            out = out.withColumn("_isdata", F.lit(True))
        return out

    # nullable state: NULL rows never cut a run; carry the last
    # non-NULL state forward, count run changes on non-NULL rows only.
    # ``_wida`` gives every row (NULL-state included) the id of the
    # last window STARTED at or before it; which NULL rows truly
    # belong to a window is decided per EXTEND mode below.
    prev_rows = w.rowsBetween(Window.unboundedPreceding, -1)
    tagged = tagged.withColumn(
        "_prev", F.last("_state", ignorenulls=True).over(prev_rows)
    )
    change = F.when(
        F.col("_state").isNotNull()
        & (F.col("_prev").isNull() | (F.col("_prev") != F.col("_state"))),
        1,
    ).otherwise(0)
    tagged = tagged.withColumn("_wida", F.sum(change).over(run))
    # next non-NULL state via a reverse-ordered growing frame: O(n) per
    # key, reuses the hash partitioning (one extra sort, no shuffle,
    # no shrinking UnboundedFollowing frame)
    rev_order = (
        [F.col(ts_col).desc()]
        if not order_by
        else [
            F.col(c) if is_desc else F.col(c).desc()
            for c, is_desc in order_by
        ]
    )
    rev_prev = Window.partitionBy(*keys).orderBy(
        *rev_order
    ).rowsBetween(Window.unboundedPreceding, -1)
    nxt = F.last("_state", ignorenulls=True).over(rev_prev)

    if extend == 0:
        # interior NULL-state rows (same non-null state on both sides)
        # belong to that run — reference statewindowoperator keeps them
        # in the window (count(*) includes them, count(state) doesn't);
        # boundary nulls (state differs across, or leading/trailing)
        # stay outside. A NULL row is interior iff its forward and
        # backward neighbouring states agree (equal states can never
        # straddle a window boundary — a boundary needs a differing
        # state), and then the last-started window IS its window.
        out = tagged.withColumn(
            WINDOW_ID,
            F.when(F.col("_state").isNotNull(), F.col("_wida")).when(
                F.col("_prev").isNotNull() & (F.col("_prev") == nxt),
                F.col("_wida"),
            ),
        )
    elif extend == 1:
        # forward attach: a NULL row joins the last-started window
        # (none before the first window starts)
        out = tagged.withColumn(
            WINDOW_ID,
            F.when(
                F.col("_state").isNotNull() | F.col("_prev").isNotNull(),
                F.col("_wida"),
            ),
        ).withColumn("_state", F.coalesce("_state", "_prev"))
    else:  # extend == 2
        # backward attach: a NULL row joins the NEXT window — id is
        # _wida when the next non-NULL row continues the current run,
        # _wida+1 when it starts a new one (trailing NULLs: none)
        out = tagged.withColumn(
            "_isdata", F.col("_state").isNotNull()
        ).withColumn("_next", nxt).withColumn(
            WINDOW_ID,
            F.when(F.col("_state").isNotNull(), F.col("_wida")).when(
                F.col("_next").isNotNull(),
                F.col("_wida")
                + F.when(
                    F.col("_prev").isNull()
                    | (F.col("_prev") != F.col("_next")),
                    1,
                ).otherwise(0),
            ),
        ).withColumn(
            "_state", F.coalesce("_state", "_next")
        ).drop("_next")
    return out.drop("_prev", "_wida")


def assign_state_windows_multi(
    df: DataFrame,
    ts_col: str,
    member_cols: "list[str]",
    partition_by: "list[str] | None" = None,
    extend: int = 0,
) -> DataFrame:
    """Multi-column STATE_WINDOW (sql.y state_window column list) with
    the reference's sequential pendingVals semantics
    (statewindowoperator multi-col):

      - a row whose non-null members all match the current window's
        KNOWN members continues it, filling in unknown members;
      - any non-null member mismatch cuts a new window seeded from the
        row's non-null members (so a run of partial-NULL rows can open
        a window whose state stays partly unknown — reported NULL);
      - all-NULL rows attach only when the same window continues across
        them (extend 0), or per EXTEND(1/2) fill.

    This is a stateful scan — applyInPandas per key, exactly the
    per-child-table sequential pass the reference makes; the single-
    column path keeps the streaming window-function kernel."""
    import pandas as pd

    from pyspark.sql import types as T

    keys = _keyed(partition_by)
    base_fields = list(df.schema.fields)
    member_types = {f.name: f.dataType for f in base_fields}
    struct_t = T.StructType(
        [
            T.StructField(f"_s{i}", member_types[c])
            for i, c in enumerate(member_cols)
        ]
    )
    out_schema = T.StructType(
        base_fields
        + [
            T.StructField("_state", struct_t),
            T.StructField(WINDOW_ID, T.LongType()),
            T.StructField("_isdata", T.BooleanType()),
        ]
    )
    n = len(member_cols)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(ts_col).reset_index(drop=True)
        N = len(g)
        mcols = [g[c] for c in member_cols]
        wid = [None] * N
        isdata = [False] * N
        win_members: dict = {}
        cur = None  # committed state of the open window
        cur_id = 0
        # deferred partial-NULL rows (reference pendingVals): a partial
        # row compatible with the open window is NOT attached until a
        # fully-defined row (or a cut / end-of-scan) decides its home.
        # ``shadow`` carries the values the deferred group proposes —
        # cut comparisons test against committed ∪ shadow
        # (stCompareStateValuesWithRow pending-init-mismatch fix).
        deferred: list = []
        shadow = [None] * n

        def _commit_to_cur():
            # deferred rows join the OPEN window; their shadow values
            # fill its undefined members (stCommitPendingToState)
            for j in range(n):
                if cur[j] is None and shadow[j] is not None:
                    cur[j] = shadow[j]
            for p in deferred:
                wid[p] = cur_id
                isdata[p] = True

        def _resolve_cut(new_vals):
            """Place the deferred group when ``new_vals`` cuts:
            EXTEND(0/1) → old window; EXTEND(2) → the NEW window when
            the group's shadow is compatible with its seed, else the
            OLD window when the group was completing undefined members
            of it, else a STANDALONE window between the two
            (splitStandalone + the stateKeysAllDefined guard)."""
            nonlocal cur_id, cur
            if not deferred:
                return None
            if extend == 2:
                new_compat = all(
                    shadow[j] is None
                    or new_vals[j] is None
                    or shadow[j] == new_vals[j]
                    for j in range(n)
                )
                completing = any(
                    cur[j] is None and shadow[j] is not None
                    for j in range(n)
                )
                if new_compat:
                    return "new"
                if not completing:
                    # standalone split of the deferred group
                    cur_id += 1
                    members = [
                        cur[j] if shadow[j] is None else shadow[j]
                        for j in range(n)
                    ]
                    win_members[cur_id] = members
                    for p in deferred:
                        wid[p] = cur_id
                        isdata[p] = True
                    return None
            _commit_to_cur()
            return None

        for i in range(N):
            vals = [
                None if pd.isna(mcols[j].iloc[i]) else mcols[j].iloc[i]
                for j in range(n)
            ]
            if all(v is None for v in vals):
                # all-NULL: no state row — home decided by the extend
                # fill pass over final assignments
                continue
            if cur is not None:
                eff = [
                    cur[j] if cur[j] is not None else shadow[j]
                    for j in range(n)
                ]
                compatible = all(
                    v is None or eff[j] is None or v == eff[j]
                    for j, v in enumerate(vals)
                )
            if cur is not None and compatible:
                if all(v is not None for v in vals):
                    # fully-defined continuation: commit the deferred
                    # group and fill remaining unknowns from this row
                    _commit_to_cur()
                    deferred, shadow = [], [None] * n
                    for j, v in enumerate(vals):
                        if cur[j] is None:
                            cur[j] = v
                    wid[i] = cur_id
                    isdata[i] = True
                else:
                    # partial-NULL compatible row: defer (even when it
                    # adds no information — EXTEND(2) may standalone-
                    # split it at the next cut)
                    deferred.append(i)
                    for j, v in enumerate(vals):
                        if v is not None and shadow[j] is None:
                            shadow[j] = v
            else:
                target = _resolve_cut(vals) if cur is not None else None
                deferred_rows, deferred = deferred, []
                old_shadow, shadow = shadow, [None] * n
                cur_id += 1
                cur = list(vals)
                win_members[cur_id] = cur
                wid[i] = cur_id
                isdata[i] = True
                if target == "new":
                    # the deferred group rides into the NEW window; its
                    # shadow seeds the new state's unknowns
                    for p in deferred_rows:
                        wid[p] = cur_id
                        isdata[p] = True
                    for j in range(n):
                        if cur[j] is None and old_shadow[j] is not None:
                            cur[j] = old_shadow[j]
        if cur is not None and deferred:
            # trailing deferred rows close with the open window
            _commit_to_cur()
        # extend fill for all-NULL rows over FINAL data assignments:
        # EXTEND(0) absorbs only when the same window continues across,
        # EXTEND(1) follows the previous data row, EXTEND(2) the next
        prev_fill = [None] * N
        last = None
        for i in range(N):
            if isdata[i]:
                last = wid[i]
            prev_fill[i] = last
        nxt_fill = [None] * N
        nxt = None
        for i in range(N - 1, -1, -1):
            if isdata[i]:
                nxt = wid[i]
            nxt_fill[i] = nxt
        for i in range(N):
            if not isdata[i] and wid[i] is None:
                if extend == 1:
                    wid[i] = prev_fill[i]
                elif extend == 2:
                    wid[i] = nxt_fill[i]
                elif prev_fill[i] is not None and prev_fill[i] == nxt_fill[i]:
                    wid[i] = prev_fill[i]

        def to_py(v):
            return v.item() if hasattr(v, "item") else v

        g["_state"] = [
            None
            if wid[i] is None
            else {
                f"_s{j}": to_py(win_members[wid[i]][j]) for j in range(n)
            }
            for i in range(N)
        ]
        g[WINDOW_ID] = pd.array(
            [wid[i] for i in range(N)], dtype="Int64"
        )
        g["_isdata"] = isdata
        return g

    return df.groupBy(*keys).applyInPandas(run, out_schema)


def assign_event_windows(
    df: DataFrame,
    ts_col: str,
    start_cond: Column,
    end_cond: Column,
    partition_by: "list[str] | None" = None,
    order_by=None,
) -> DataFrame:
    """EVENT_WINDOW START WITH <cond> END WITH <cond>. ``order_by``:
    scan in an ordered subquery's presented order (orderbyOtherTS).

    Reference semantics (eventwindowoperator.c): a window opens at a row
    satisfying start_cond (if none is open) and closes at the first
    subsequent row satisfying end_cond (inclusive). Rows outside any
    window get ``_wid`` NULL.  A window that never sees its END condition
    before the data runs out is DISCARDED — the reference emits nothing
    for it (golden: 13-TimeSeriesExt/09-WindowProjection
    test_window_projection_edge, unclosed d_single event window → empty).

    Kernel: running count of closed windows -> segment id; within a
    segment, rows from the first start_cond row onward are in the window;
    a segment with no END row anywhere is the trailing unclosed window.

    Scale: one shuffle on ``partition_by`` + one ascending sort. All
    analytic passes are O(n) growing frames over that same (keys, ts)
    order — "started" is derived from running start/end counters
    instead of a per-segment sort, and "closed" from the per-key total
    END count (an unordered pass whose required clustering+ordering the
    sorted child already satisfies), so no (keys, segment) re-sort and
    no per-segment whole-partition frame exist in the plan.
    """
    keys = _keyed(partition_by)
    order = Window.partitionBy(*keys).orderBy(*_order_keys(ts_col, order_by))
    run_prev = order.rowsBetween(Window.unboundedPreceding, -1)
    run = order.rowsBetween(Window.unboundedPreceding, 0)

    df2 = df.withColumn("_s", start_cond.cast("int")).withColumn(
        "_e", end_cond.cast("int")
    )
    # segment = number of END rows strictly before this row → rows between
    # one close and the next close share a segment; the closing row belongs
    # to its own (earlier) segment.
    seg = F.coalesce(F.sum("_e").over(run_prev), F.lit(0))
    # running count of START rows up to and including this row
    s_run = F.coalesce(F.sum("_s").over(run), F.lit(0))
    df2 = df2.withColumn("_seg", seg).withColumn("_srun", s_run)
    # start-counter value at the most recent END row strictly before =
    # the segment's baseline; a window is open from the first START row
    # of the segment onward ⇔ starts have occurred since that baseline
    base = F.last(
        F.when(F.col("_e") == 1, F.col("_srun")), ignorenulls=True
    ).over(run_prev)
    # a segment is a real (closed) window only if an END row exists in
    # it; every END row terminates exactly one segment (0.._e_total-1),
    # so the trailing segment(s) ≥ the per-key END total are unclosed.
    # The per-key total uses the SAME (keys, ts) window spec with an
    # unbounded-both frame, so Catalyst folds it into base's WindowExec
    # — two window passes total instead of three (r10 profile: the 3rd
    # pass was ~1/3 of this operator's wall)
    tot = F.sum("_e").over(
        order.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    df3 = df2.select("*", base.alias("_base"), tot.alias("_etot"))
    started = (
        F.col("_srun") - F.coalesce(F.col("_base"), F.lit(0))
    ) > 0
    closed = F.col("_seg") < F.col("_etot")
    return (
        df3.withColumn(
            WINDOW_ID,
            F.when(started & closed, F.col("_seg") + 1).otherwise(
                F.lit(None)
            ),
        )
        .drop("_s", "_e", "_seg", "_srun", "_base", "_etot")
    )


def assign_count_windows(
    df: DataFrame,
    ts_col: str,
    count: int,
    sliding: "int | None" = None,
    partition_by: "list[str] | None" = None,
    order_by=None,
) -> DataFrame:
    """COUNT_WINDOW(n[, sliding]): fixed-row-count windows per key.
    ``order_by``: number rows in an ordered subquery's presented order.

    Tumbling (sliding is None or == n): ``floor((row_number-1)/n)``.
    Sliding: each row belongs to multiple windows — rows are exploded into
    their window ids (window j covers rows [j*s, j*s + n)).
    """
    keys = _keyed(partition_by)
    w = Window.partitionBy(*keys).orderBy(*_order_keys(ts_col, order_by))
    rn = F.row_number().over(w) - 1
    if not sliding or sliding == count:
        return df.withColumn(WINDOW_ID, F.floor(rn / count) + 1)
    s = sliding
    # window ids j with j*s <= rn < j*s + n  →  j in [ceil((rn-n+1)/s), rn/s]
    staged = df.withColumn("_rn", rn)
    lo = F.greatest(
        F.ceil((F.col("_rn") - count + 1) / s).cast("long"), F.lit(0).cast("long")
    )
    hi = F.floor(F.col("_rn") / s).cast("long")
    return (
        staged.withColumn("_wid0", F.explode(F.sequence(lo, hi)))
        .withColumn(WINDOW_ID, F.col("_wid0") + 1)
        .drop("_rn", "_wid0")
    )


def window_agg(
    assigned: DataFrame,
    ts_col: str,
    aggs: list[Column],
    partition_by: "list[str] | None" = None,
    true_for: "str | int | Duration | None" = None,
    min_rows: "int | None" = None,
    keep_state: bool = False,
    extend: int = 0,
    bounds_by: "str | None" = None,
    ordered: bool = True,
) -> DataFrame:
    """Aggregate rows by assigned window id; emit _wstart/_wend.
    ``bounds_by``: window bounds follow ARRIVAL order instead of the
    ts values — _wstart/_wend = the ts of the first/last row by this
    position column (degraded-timeline sessions: the reference's
    doSessionWindowAgg keeps the opening row's ts as skey even when
    the stream runs backwards — timeline_fallback.ans t_rev_ts).

    ``true_for`` implements ``TRUE_FOR(duration)`` (state/event windows):
    drop windows whose duration < the minimum. ``min_rows`` drops count
    windows' trailing partial window if desired. ``extend`` (state
    windows): interior window bounds stretch across the inter-window gap
    — forward (1): _wend = next window's first data ts − 1ms; backward
    (2): _wstart = previous window's last data ts + 1ms (boundary
    windows keep their absorbed extremes)."""
    keys = _keyed(partition_by)
    group = [*keys, WINDOW_ID] + (["_state"] if keep_state else [])
    extra = []
    if extend == 1:
        # the window's own first DATA row: absorbed (forward-filled)
        # null-state rows always sort after it
        extra = [F.min(ts_col).alias("_dstart")]
    elif extend == 2:
        extra = [
            F.max(F.when(F.col("_isdata"), F.col(ts_col))).alias("_dend")
        ]
    if bounds_by is not None:
        ws_agg = F.min_by(ts_col, bounds_by).alias(WSTART)
        we_agg = F.max_by(ts_col, bounds_by).alias(WEND)
    else:
        ws_agg = F.min(ts_col).alias(WSTART)
        we_agg = F.max(ts_col).alias(WEND)
    out = (
        assigned.where(F.col(WINDOW_ID).isNotNull())
        .groupBy(*group)
        .agg(
            ws_agg,
            we_agg,
            F.count(F.lit(1)).alias("_wrows"),
            *extra,
            *aggs,
        )
    )
    if extend in (1, 2):
        ww = Window.partitionBy(*keys).orderBy(WSTART)
        tick = F.expr("INTERVAL 1 MILLISECOND")
        if extend == 1:
            nxt = F.lead("_dstart").over(ww)
            out = out.withColumn(
                WEND,
                F.coalesce((nxt - tick).cast("timestamp"), F.col(WEND)),
            ).drop("_dstart")
        else:
            prv = F.lag("_dend").over(ww)
            out = out.withColumn(
                WSTART,
                F.coalesce((prv + tick).cast("timestamp"), F.col(WSTART)),
            ).drop("_dend")
    if true_for is not None:
        dur_us = parse_duration(true_for).microseconds
        out = out.where(
            F.unix_micros(F.col(WEND)) - F.unix_micros(F.col(WSTART)) >= dur_us
        )
    if min_rows:
        out = out.where(F.col("_wrows") >= min_rows)
    if not ordered:
        # ordered=False skips the global sort: a range-partition
        # exchange costs an extra boundary-sampling pass over the
        # child (~0.2-0.4 s per query at sf0.1). The dialect/replay
        # paths keep the reference's ordered output (default); the
        # registry gates opt out — the driver's value hash is
        # order-insensitive by convention (see queries.py header).
        return out
    return out.orderBy(*keys, WSTART)
