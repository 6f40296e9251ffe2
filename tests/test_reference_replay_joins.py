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


def test_replay_left_asof_join_diff_64bit(spark):
    """test_left_asof_join_diff_64bit.py — abs(diff(x, opt)) computed
    over LEFT ASOF JOIN results (64-bit unsigned diff regression):
    filtered/unfiltered/outer-subquery variants, count + range-boundary
    asserts via getFirstValue."""
    stats = _jreplay(spark, "test_left_asof_join_diff_64bit.py",
                     ["test_left_asof_join_diff_64bit"],
                     tz_shift_hours=0, min_checks=25)
    print(stats)
