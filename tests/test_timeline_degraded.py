"""Degraded-timeline + v3.4.x function semantics (TS-5791 timeline
fallback; reference test_fun_ts_timeline_fallback.py goldens):

- a derived table projecting no pk falls back to its first TIMESTAMP
  column as the timeline; with NO timestamp column, timeline functions
  run in row (presentation) order;
- NULL-timeline rows are skipped by timeline ops — unless the subquery
  has an explicit ORDER BY (then presentation order keeps them);
- fill_forward(x): per-row forward fill (builtins.c:8187);
- all-NULL first/last/min/max input emits NO row (numOfElems = 0);
- SLIDING interval projection fans each row into its covering windows;
- EXTERNAL_WINDOW accepts a subquery fact.
"""

import tempfile

import pytest
from pyspark.sql import functions as F  # noqa: F401


@pytest.fixture(scope="module")
def db(spark):
    from tdengine_spark.catalog import Database
    from tdengine_spark.dialect import execute

    d = Database(root=tempfile.mkdtemp(prefix="tds_degraded_"))
    execute(spark, d, "create table t1 (ts timestamp, event_time timestamp, val int)")
    execute(
        spark, d,
        "insert into t1 values"
        "('2022-05-15 00:00:01','2022-05-15 00:00:05',10)"
        "('2022-05-15 00:00:02','2022-05-15 00:00:04',20)"
        "('2022-05-15 00:00:03','2022-05-15 00:00:03',30)"
        "('2022-05-15 00:00:04','2022-05-15 00:00:02',40)"
        "('2022-05-15 00:00:05','2022-05-15 00:00:01',50)",
    )
    execute(spark, d, "create table t_null_ts (ts timestamp, event_time timestamp, val int)")
    execute(
        spark, d,
        "insert into t_null_ts values"
        "('2022-05-15 00:00:01', null, 10)"
        "('2022-05-15 00:00:02', '2022-05-15 00:00:05', 20)"
        "('2022-05-15 00:00:03', null, 30)"
        "('2022-05-15 00:00:04', '2022-05-15 00:00:02', 40)"
        "('2022-05-15 00:00:05', null, 50)",
    )
    execute(spark, d, "create table t_allnull (ts timestamp, val int)")
    execute(
        spark, d,
        "insert into t_allnull values"
        "('2022-05-15 00:00:01', NULL)('2022-05-15 00:00:02', NULL)",
    )
    execute(spark, d, "create table t_ff (ts timestamp, val int)")
    execute(
        spark, d,
        "insert into t_ff values('2022-05-15 00:00:01', 10)"
        "('2022-05-15 00:00:02', NULL)('2022-05-15 00:00:03', NULL)"
        "('2022-05-15 00:00:04', 40)('2022-05-15 00:00:05', NULL)",
    )
    return d


def _run(spark, db, sql):
    from tdengine_spark.dialect import execute

    return execute(spark, db, sql)


def test_degraded_first_timestamp_timeline(spark, db):
    # no pk projected → event_time becomes the timeline: last = the
    # max-event_time row's value, first = the min's
    assert _run(spark, db,
                "select last(val) from (select event_time, val from t1)"
                ).first()[0] == 10
    assert _run(spark, db,
                "select first(val) from (select event_time, val from t1)"
                ).first()[0] == 50


def test_degraded_row_order_no_timestamp(spark, db):
    # NO timestamp column: row (presentation) order is the timeline
    # diff keeps NULL-input rows as NULL output (option 0 chain); the
    # delta chain skips them — 40 - 10 = 30 at the 4th row
    out = _run(spark, db, "select diff(val) from (select val from t_ff)")
    assert [r[0] for r in out.collect()] == [None, None, 30, None]
    out2 = _run(spark, db, "select last(val) from (select val from t_ff)")
    assert out2.first()[0] == 40


def test_null_timeline_rows_skipped(spark, db):
    # windows over a degraded timeline skip NULL-timeline rows: only
    # et=05 (20) and et=02 (40) remain; streaming assignment puts both
    # in one merged-bucket pass → count reflects non-null rows only
    out = _run(
        spark, db,
        "select first(val) from (select event_time, val from t_null_ts)",
    )
    assert out.first()[0] == 40  # min event_time 00:00:02 → val 40


def test_null_timeline_kept_under_explicit_order(spark, db):
    # explicit subquery ORDER BY: NULLs ride along (NULLS FIRST) and
    # the diff chain runs in presentation order
    out = _run(
        spark, db,
        "select csum(val) from"
        " (select event_time, val from t_null_ts order by event_time)",
    )
    assert [r[0] for r in out.collect()] == [10, 40, 90, 130, 150]


def test_fill_forward(spark, db):
    out = _run(spark, db, "select fill_forward(val) from t_ff")
    assert [r[0] for r in out.collect()] == [10, 10, 10, 40, 40]


def test_all_null_first_last_no_row(spark, db):
    assert _run(spark, db, "select last(val) from t_allnull").count() == 0
    assert _run(spark, db, "select first(val) from t_allnull").count() == 0
    assert _run(
        spark, db, "select last(val) from (select val from t_allnull)"
    ).count() == 0
    # last_row DOES emit a NULL row (saved nullTuple)
    assert _run(spark, db, "select last_row(val) from t_allnull").count() == 1


def test_sliding_projection_fanout(spark, db):
    # csum per hopping window: each row belongs to width/slide windows
    out = _run(
        spark, db,
        "select _wstart as ws, csum(val) as cv from t_ff"
        " interval(4s) sliding(2s)",
    )
    rows = [(r.ws.second, r.cv) for r in out.orderBy("ws", "cv").collect()]
    # row@01(10) covers windows starting 58, 00; row@04(40) covers 02, 04
    assert (58, 10) in rows and (0, 10) in rows
    assert (2, 40) in rows and (4, 40) in rows


def test_external_window_subquery_fact(spark, db):
    from tdengine_spark.dialect import execute

    execute(spark, db, "create table t_b (ts timestamp, endtime timestamp)")
    execute(
        spark, db,
        "insert into t_b values('2022-05-15 00:00:01','2022-05-15 00:00:02')",
    )
    out = _run(
        spark, db,
        "SELECT _wstart, _wend, count(*) FROM"
        " (SELECT * FROM t_ff ORDER BY val)"
        " external_window((SELECT ts, endtime FROM t_b) w)",
    )
    r = out.first()
    assert r[2] == 2  # rows @01 and @02 fall inside the window
