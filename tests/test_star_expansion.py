"""``SELECT *`` column-order regression pins.

The reference expands ``*`` in the parser (parTranslater.c
createAllColumns): a child table's ``*`` is its data columns in declared
order (ts first); a super table's ``*`` is data columns then tags;
``tbname`` and internal bookkeeping columns are never part of ``*``.
Every index-based checkData assert in the replay corpus depends on this
order (e.g. test/cases/13-TimeSeriesExt/02-Fill/test_ts_fill.py:251-252),
so pin it with a unit test.
"""

import shutil
import tempfile

import pytest

from tdengine_spark import dialect
from tdengine_spark.catalog import Database


@pytest.fixture()
def db():
    d = tempfile.mkdtemp(prefix="tds_star_")
    yield Database(root=d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def populated(spark, db):
    dialect.execute(
        spark, db,
        "create stable st (ts timestamp, c1 int, c2 double, c3 binary(16),"
        " c4 nchar(16), c5 bool) tags (t1 int, t2 binary(8))",
    )
    dialect.execute(spark, db, "create table tb0 using st tags(0, 'tag0')")
    dialect.execute(spark, db, "create table tb1 using st tags(1, 'tag1')")
    dialect.execute(
        spark, db,
        "insert into tb0 values('2024-01-01 00:00:00', 1, 1.5, 'BINARY',"
        " 'NCHAR', true)",
    )
    dialect.execute(
        spark, db,
        "insert into tb1 values('2024-01-01 00:00:01', 2, 2.5, 'binary1',"
        " 'nchar1', false)",
    )
    return db


def test_child_table_star_is_data_columns_only(spark, populated):
    out = dialect.execute(spark, populated, "select * from tb0")
    assert out.columns == ["ts", "c1", "c2", "c3", "c4", "c5"]
    row = out.collect()[0]
    # ordinal layout drives the replay corpus' checkData(i, j) asserts
    assert row[1] == 1 and row[3] == "BINARY" and row[4] == "NCHAR"


def test_super_table_star_is_data_then_tags(spark, populated):
    out = dialect.execute(
        spark, populated, "select * from st order by ts"
    )
    assert out.columns == ["ts", "c1", "c2", "c3", "c4", "c5", "t1", "t2"]
    rows = out.collect()
    assert rows[0][3] == "BINARY" and rows[0][7] == "tag0"
    assert rows[1][3] == "binary1" and rows[1][6] == 1


def test_normal_table_star_declared_order(spark, db):
    dialect.execute(
        spark, db, "create table nt (ts timestamp, b int, a int)"
    )
    dialect.execute(
        spark, db, "insert into nt values('2024-01-01 00:00:00', 1, 2)"
    )
    out = dialect.execute(spark, db, "select * from nt")
    assert out.columns == ["ts", "b", "a"]
    assert tuple(out.collect()[0])[1:] == (1, 2)


def test_windowed_star_expansion_no_group_by_error(spark, populated):
    # deferred pseudo-column projection: scalar exprs over _wstart/_wend
    # must become a post-agg select, never an Aggregate without grouping
    out = dialect.execute(
        spark, populated,
        "select _wstart, cast(_wend as bigint) - cast(_wstart as bigint)"
        " as dur, count(*) as n from st interval(1h)",
    )
    assert out.count() >= 1
