"""Replay the reference's 10-Operators and 09-DataQuerying pytest files.

Coverage: comparison operators (IN with epoch/bool/decimal promotion,
BETWEEN with string-atof and bool-int coercion, MATCH/NMATCH with POSIX
bracket classes, LIKE wildcards + SHOW TABLES/VIEWS LIKE), logical
operators, SELECT DISTINCT (incl. the DISTINCT(col) call form and
distinct over aggregate subqueries).
"""

import os

import pytest

from test_reference_replay import _replay

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/test/cases/10-Operators"),
    reason="reference test tree not present",
)


def _oreplay(spark, relpath, methods, **kw):
    # _replay anchors at test/cases/13-TimeSeriesExt — hop one level up
    return _replay(spark, f"../{relpath}", methods, **kw)


def test_replay_op_in(spark):
    """10-Operators/05-Comparison/test_in.py — IN over every column
    type incl. a ts IN list mixing datetime strings, epoch ints, bools
    and decimals (tsim/scalar/in.sim). The reference's own
    explain-verbose plan-text asserts (Time Range lines) have no Spark
    analog — tolerated."""
    stats = _oreplay(
        spark, "10-Operators/05-Comparison/test_in.py", ["test_in"],
        min_checks=15, known=("explain verbose",),
    )
    print(stats)


def test_replay_op_null(spark):
    """10-Operators/05-Comparison/test_null.py — untyped-NULL filters
    (WHERE NULL = no rows) and NULL scalar comparisons."""
    stats = _oreplay(
        spark, "10-Operators/05-Comparison/test_null.py",
        ["test_func_scalar_null"], tz_shift_hours=0, min_checks=10,
    )
    print(stats)


def test_replay_op_match(spark):
    """10-Operators/05-Comparison/test_match.py — MATCH/NMATCH regex
    filters over columns and tbname, POSIX bracket classes, error
    parity (242 checks)."""
    stats = _oreplay(
        spark, "10-Operators/05-Comparison/test_match.py",
        ["test_match"], tz_shift_hours=0, min_checks=100,
    )
    print(stats)


def test_replay_op_between_and(spark):
    """10-Operators/05-Comparison/test_between_and.py — BETWEEN over
    every type: short signed epoch ranges on ts, bool-as-int ranges,
    string operands via C strtod on numeric columns, tag betweens."""
    stats = _oreplay(
        spark, "10-Operators/05-Comparison/test_between_and.py",
        ["test_and_or"], tz_shift_hours=0, min_checks=60,
    )
    print(stats)


def test_replay_op_like(spark):
    """10-Operators/05-Comparison/test_like.py — LIKE wildcard matrix
    (%, _, escaped \\_ and \\%), information_schema LIKE filters, SHOW
    TABLES/VIEWS LIKE, CREATE VIEW + LIKE over views."""
    stats = _oreplay(
        spark, "10-Operators/05-Comparison/test_like.py", ["test_like"],
        tz_shift_hours=0, min_checks=50,
    )
    print(stats)


def test_replay_op_if_smoking(spark):
    """10-Operators/06-Logical/test_if_smoking.py — logical expression
    smoke set."""
    stats = _oreplay(
        spark, "10-Operators/06-Logical/test_if_smoking.py",
        ["test_if_smoking"], tz_shift_hours=0, min_checks=30,
    )
    print(stats)


def test_replay_query_distinct(spark):
    """09-DataQuerying/10-Distinct/test_query_distinct.py — DISTINCT
    over columns/tags/tbname, the DISTINCT(col) call form, distinct
    over aggregate subqueries (alias-shadowed group keys), error
    parity (71 checks)."""
    stats = _oreplay(
        spark, "09-DataQuerying/10-Distinct/test_query_distinct.py",
        ["test_query_distinct"], tz_shift_hours=0, min_checks=60,
    )
    print(stats)
