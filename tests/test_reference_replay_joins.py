"""Replay the reference's 14-JoinQueries pytest files on this engine.

Complements the golden-file corpora (test_dialect_corpus.py: asof
pushdown + pk const-condition) with the join suites' procedural checks:
tbname-tag joins over subqueries, cross-database joins (ns precision),
window clauses over join results, many-block/multi-vnode row parity,
and indef functions (diff) over asof-join streams.
"""

import os

import pytest

from test_reference_replay import _replay

REF = "/root/reference/test/cases/14-JoinQueries"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference test tree not present"
)


def _jreplay(spark, relpath, methods, **kw):
    return _replay(spark, f"../14-JoinQueries/{relpath}", methods, **kw)


def test_replay_join_tbname(spark):
    """test_join_tbname.py — TS-7170: join of two super-table subqueries
    on timetruncate(ts, 1m) + tbname-backed tag equality."""
    stats = _jreplay(spark, "test_join_tbname.py", ["test_join"],
                     tz_shift_hours=0, min_checks=3)
    print(stats)


def test_replay_join_ns_db(spark):
    """test_join_ns_db.py — TS-6319: two ns-precision databases with
    same-named stables, cross-db INNER JOIN on timetruncate(ts,1a) and
    tag equality; ns epoch VALUES literals; timestamp/int arithmetic in
    the ns db precision."""
    stats = _jreplay(spark, "test_join_ns_db.py", ["test_join_ns_db"],
                     tz_shift_hours=0, min_checks=1)
    print(stats)


def test_replay_join_interval(spark):
    """test_join_interval.py — INTERVAL(1a) window over an implicit
    comma join across two databases (tsim/query/join_interval.sim), plus
    TS-5803: 1M-row self-consistent join/limit counts over the
    taosBenchmark default grid (CLI form)."""
    stats = _jreplay(spark, "test_join_interval.py",
                     ["test_join_interval"], tz_shift_hours=0,
                     min_checks=6)
    print(stats)


def test_replay_join_order(spark):
    """test_join_order.py — join output ordering with mixed asc/desc
    subqueries and limits."""
    stats = _jreplay(spark, "test_join_order.py", ["test_join_order"],
                     tz_shift_hours=0, min_checks=25)
    print(stats)


def test_replay_join_manyblocks(spark):
    """test_join_manyblocks.py — join row parity when each side spans
    many data blocks (6k buffered multi-table inserts)."""
    stats = _jreplay(spark, "test_join_manyblocks.py",
                     ["test_join_manyblocks"], tz_shift_hours=0,
                     min_checks=1)
    print(stats)


def test_replay_join_multivnode(spark):
    """test_join_multivnode.py — join row parity across multi-vnode
    (multi-partition) child-table layouts."""
    stats = _jreplay(spark, "test_join_multivnode.py",
                     ["test_join_multivnode"], tz_shift_hours=0,
                     min_checks=1)
    print(stats)


def test_replay_join_6604237597(spark):
    """test_join_6604237597.py — join condition regression matrix
    (56 checkData asserts)."""
    stats = _jreplay(spark, "test_join_6604237597.py",
                     ["test_join"], tz_shift_hours=0,
                     min_checks=50)
    print(stats)


def test_replay_join_sim(spark):
    """test_join.py do_sim_join + do_sim_join2 — tsim/parser/join.sim:
    1000-row-per-child comma joins, count(tb.*) windowed over the join,
    qualified first/last (ts-keyed selection), ts-vs-numeric comparison
    promotion, error-statement parity."""
    stats = _jreplay(spark, "test_join.py",
                     ["do_sim_join", "do_sim_join2"], min_checks=45)
    print(stats)


def test_replay_join_system_test(spark):
    """test_join.py do_system_test_join — cross-db child/stable/normal
    joins (db × db1), semi/anti/asof/window join semantic matrix,
    nested-ON multi-join grouping, INSERT INTO … (SELECT …), ts5863
    tag-filtered self left-join with SMA table options. all_test is
    patched out: its ~1000-statement generated error matrix is the
    reference's parser fuzz, ~25 min of wall for zero checkData."""
    stats = _jreplay(spark, "test_join.py", ["do_system_test_join"],
                     min_checks=60, patch_out=("all_test",))
    print(stats)


def test_replay_join_stb(spark):
    """test_join.py init_data + do_stbJoin + do_join_hint — super-table
    × super-table joins with tag predicates, windowed join counts,
    planner-hint statements (hints stripped, Catalyst plans)."""
    stats = _jreplay(spark, "test_join.py",
                     ["init_data", "do_stbJoin", "do_join_hint"],
                     min_checks=30)
    print(stats)


def test_replay_join_compare(spark):
    """test_join_compare.py — the full 75-method type-comparison matrix
    over timetruncate self-joins (int8..uint64 × int/float/double,
    varbinary hex literals, NOT IN over binary), 211 checkRows."""
    stats = _jreplay(spark, "test_join_compare.py",
                     ["test_join_compare"], tz_shift_hours=0,
                     min_checks=200)
    print(stats)


def test_replay_join_multitables(spark):
    """test_join_multitables.py — tsim/parser/join_multitables.sim:
    8 same-schema super tables joined on ts + each tag type, star
    expansion over joins (data+tags, agg-star data-only), top/bottom
    over join rows, windowed last(*)."""
    stats = _jreplay(spark, "test_join_multitables.py",
                     ["test_join_multitables"], tz_shift_hours=0,
                     min_checks=240)
    print(stats)


def test_replay_left_asof_join_diff_64bit(spark):
    """test_left_asof_join_diff_64bit.py — abs(diff(x, opt)) computed
    over LEFT ASOF JOIN results (64-bit unsigned diff regression):
    filtered/unfiltered/outer-subquery variants, count + range-boundary
    asserts via getFirstValue."""
    stats = _jreplay(spark, "test_left_asof_join_diff_64bit.py",
                     ["test_left_asof_join_diff_64bit"],
                     tz_shift_hours=0, min_checks=25)
    print(stats)
