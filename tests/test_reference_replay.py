"""Run the reference's OWN 13-TimeSeriesExt pytest files on this engine.

Each entry replays one reference test method verbatim through the
tdSql shim (tests/reference_replay.py): its DDL/inserts build parquet
fixtures, its queries go through dialect.translate, and its
checkRows/checkData assertions are enforced — reference parity at the
statement level for the TSDB-core window suites the golden-file corpora
don't cover.
"""

import os

import pytest

from reference_replay import ReplayCheckError, TdSqlShim, load_reference_test

REF = "/root/reference/test/cases/13-TimeSeriesExt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference test tree not present"
)


def _replay(spark, relpath, methods, tz_shift_hours=8, min_checks=20,
            known=(), session_tz=None, engine_tz=False):
    """Replay ``methods`` of a reference test file. ``known``: substrings
    of check-failure messages that are accepted (documented reference
    quirks — e.g. statements the reference's own file marks
    '# bug need fix'); any other failure raises. ``session_tz``: run in
    wall-to-wall mode for the reference CI's local timezone (epoch-int
    literals and interval alignment shifted to the wall clock).
    ``engine_tz``: SET TIMEZONE flows through to the engine — absolute
    epochs, session-zone literal parsing and rendering."""
    shim = TdSqlShim(spark, tz_shift_hours=tz_shift_hours,
                     soft=bool(known), session_tz=session_tz,
                     engine_tz=engine_tz)
    try:
        obj = load_reference_test(f"{REF}/{relpath}", shim)
        for m in methods:
            getattr(obj, m)()
    finally:
        shim.close()
    unexpected = [
        f for f in shim.failures if not any(k in f for k in known)
    ]
    assert not unexpected, unexpected[:5]
    assert shim.stats["checks"] >= min_checks, shim.stats
    return shim.stats


def test_replay_fill_parser(spark):
    """02-Fill/test_ts_fill.py ParserFill — tsim/parser/fill.sim
    migration: VALUE/PREV/NULL/LINEAR/NONE fill over 5m intervals,
    WHERE-range spines, error statements."""
    stats = _replay(spark, "02-Fill/test_ts_fill.py", ["ParserFill"],
                    min_checks=200)
    print(stats)


def test_replay_fill_stb(spark):
    """02-Fill/test_ts_fill.py FillStb — super-table fill with partition
    and group semantics."""
    stats = _replay(spark, "02-Fill/test_ts_fill.py", ["FillStb"],
                    min_checks=50)
    print(stats)


def test_replay_session(spark):
    """06-SessionWindow/test_session.py — tsim/query/session.sim
    migration: SESSION over ms gaps, child + super tables (wall-clock
    string inserts → wall-to-wall compare)."""
    stats = _replay(spark, "06-SessionWindow/test_session.py",
                    ["test_session"], tz_shift_hours=0, min_checks=60)
    print(stats)


def test_replay_count_window(spark):
    """07-CountWindow/test_count.py Count0+Count1 — COUNT_WINDOW
    tumbling/sliding over epoch-ms fixtures."""
    stats = _replay(spark, "07-CountWindow/test_count.py",
                    ["Count0", "Count1"], min_checks=60)
    print(stats)


def test_replay_partitionby(spark):
    """01-PartitionBy/test_ts_partitonby.py — PARTITION BY over plain
    projections, tags, ordinary columns and expressions; companion
    columns with max/top; twa/irate/sample/diff/csum/mavg grouped;
    SLIMIT/SOFFSET; multi-table CREATE/INSERT. Known-tolerated:
    the reference's own '# bug need fix' sample(c1,2) row count, and
    its ORDER-BY+SLIMIT partition passthrough."""
    stats = _replay(
        spark, "01-PartitionBy/test_ts_partitonby.py",
        ["test_ts_partitionby"], tz_shift_hours=0, min_checks=75,
        known=(
            "sample(c1,2)",
            "slimit 5 soffset 0",
        ),
    )
    print(stats)


def test_replay_interval_basic(spark):
    """03-TimeWindow/test_interval_basic.py do_interval — the eight
    tsim-migrated interval suites (QueryInterval, QueryIntervalOffset,
    QueryEmptyTsRange, ParserSliding, ParserFunction, ComputeInterval,
    ComputeInterval1, WithoutAggInterval): interval/sliding/offset,
    calendar 1n/1y with offsets, FILL over WHERE ranges, twa with
    window-boundary interpolation, derivative/diff over subqueries,
    _qstart/_qend. Runs in wall-to-wall session mode (reference CI tz
    Asia/Shanghai)."""
    stats = _replay(
        spark, "03-TimeWindow/test_interval_basic.py", ["do_interval"],
        min_checks=400, session_tz="Asia/Shanghai",
    )
    print(stats)


def test_replay_state_window(spark):
    """04-StateWindow/test_state_window.py — expression states
    (cast/CASE WHEN), multi-column states, ZEROTH_STATE filters,
    grouped states, null-start runs, backtick identifiers, pk-qualified
    child inserts. orderbyOtherTS is excluded: its windows-over-ordered-
    subqueries semantics (state/session assignment in the subquery's
    ORDER BY row order) is not implemented."""
    stats = _replay(
        spark, "04-StateWindow/test_state_window.py",
        ["ts6079", "test_state_window_start_with_null",
         "test_state_window_logic_expr", "test_state_window_group",
         "test_multi_column_state_window_zeroth",
         "test_multi_column_state_window_invalid"],
        min_checks=120, session_tz="Asia/Shanghai",
    )
    print(stats)


def test_replay_state_window_extend(spark):
    """04-StateWindow/test_state_window_extend.py (batch sections) —
    EXTEND(0/1/2) gap absorption with boundary stretching, interior
    NULL-state rows inside runs, cols(sel_fn, expr) companions."""
    stats = _replay(
        spark, "04-StateWindow/test_state_window_extend.py",
        ["prepare_data", "check_wrong_input",
         "check_extend_normal_table", "check_extend_super_table"],
        tz_shift_hours=0, min_checks=350,
    )
    print(stats)


def test_replay_state_window_multi_col(spark):
    """04-StateWindow/test_state_window_multi_col.py — multi-column
    state tuples, partial-NULL deferral (pendingVals: a row with some
    NULL state members joins the compatible adjacent window), EXTEND
    over tuples, window-level ZEROTH_STATE suppression."""
    stats = _replay(
        spark, "04-StateWindow/test_state_window_multi_col.py",
        ["test_state_window_multi_col"], tz_shift_hours=0, min_checks=150,
    )
    print(stats)


def test_replay_state_window_zeroth(spark):
    """04-StateWindow/test_state_window_zeroth.py (batch sections) —
    ZEROTH_STATE literals convert C-style to the state column's type
    ('true' vs BOOL = atoi → false; '1.5' vs INT truncates to 1) and
    suppress matching windows."""
    stats = _replay(
        spark, "04-StateWindow/test_state_window_zeroth.py",
        ["prepare_data", "check_zeroth_state_query"],
        tz_shift_hours=0, min_checks=140,
    )
    print(stats)


def test_replay_state_window_null_block(spark):
    """04-StateWindow/test_state_window_null_block.py — NULL-state data
    blocks: INSERT FROM FILE fixtures, all-null 5k benchmark seed
    (taosBenchmark json shim), sequential multi-column pendingVals
    (partial-NULL runs seed their own window with partly-unknown
    state), EXTEND over border/interior null blocks, partitioned
    states."""
    stats = _replay(
        spark, "04-StateWindow/test_state_window_null_block.py",
        ["test_state_window_null_block"], tz_shift_hours=0,
        min_checks=550,
    )
    print(stats)


def test_replay_interval_bugfix(spark):
    """03-TimeWindow/test_interval_bugfix.py (batch sections) — nested
    interval-over-interval subqueries (scalar expressions over
    pseudo-columns deferred to post-aggregation projection), last/
    last_row over sliding windows vs subquery equivalence."""
    stats = _replay(
        spark, "03-TimeWindow/test_interval_bugfix.py",
        ["test_interval_data_order_level",
         "test_last_row_sliding_interval_matches_subquery"],
        min_checks=12, session_tz="Asia/Shanghai",
    )
    print(stats)


def test_replay_event_window(spark):
    """05-EventWindow/test_event.py — EVENT_WINDOW start/end conditions
    over mixed-type trigger columns."""
    stats = _replay(spark, "05-EventWindow/test_event.py",
                    ["test_event"], tz_shift_hours=0, min_checks=15)
    print(stats)


def test_replay_tz_interval(spark):
    """03-TimeWindow/test_tz_interval.py — SET TIMEZONE session-zone
    INTERVAL: natural units (1d/1n/1y/1q) truncate the SESSION zone's
    calendar (DST days are 23/25 h and _wduration shows it), 1w anchors
    at firstDayOfWeek (SET FIRST_DAY_OF_WEEK L2 / ALTER LOCAL L3 with
    reconnect reset), POSIX sign semantics for bare fixed offsets
    ('+08:00' = UTC-08:00), 1q == 3n equivalence. Engine-tz mode: the
    statements' SET TIMEZONE flows straight into the dialect."""
    stats = _replay(
        spark, "03-TimeWindow/test_tz_interval.py",
        ["test_interval_natural", "test_interval_week",
         "test_interval_quarter"],
        engine_tz=True, tz_shift_hours=0, min_checks=15,
    )
    # this file asserts mostly via bare `assert` (uncounted); the 60
    # queries it drives are the coverage measure
    assert stats["queries"] >= 55, stats
    print(stats)
