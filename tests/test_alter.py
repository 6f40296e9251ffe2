"""ALTER TABLE / ALTER STABLE schema evolution.

Mirrors the reference's 03-Tables ALTER flows
(test/cases/03-Tables/01-NormalTables/test_normaltable_alter_1.py:30-120:
create → insert → add column → describe reflects it → insert with the
new column → old rows read NULL; 04-SuperTables tag alters;
02-SubTables/test_subtable_set_tag_vals.py SET TAG).
"""

import shutil
import tempfile

import pytest

from tdengine_spark import dialect
from tdengine_spark.catalog import Database


@pytest.fixture()
def db():
    d = tempfile.mkdtemp(prefix="tds_alter_")
    yield Database(root=d)
    shutil.rmtree(d, ignore_errors=True)


def _describe(spark, db, tb):
    return [
        (r.field, r.type)
        for r in dialect.execute(spark, db, f"describe {tb}").collect()
    ]


def test_add_column_flow(spark, db):
    dialect.execute(spark, db, "create table tb (ts timestamp, a int)")
    dialect.execute(
        spark, db,
        "insert into tb values('2024-01-01 00:00:00', -28)"
        "('2024-01-02 00:00:00', -27)('2024-01-03 00:00:00', -26)",
    )
    assert dialect.execute(spark, db, "select * from tb").count() == 3

    dialect.execute(spark, db, "alter table tb add column b smallint")
    assert _describe(spark, db, "tb") == [
        ("ts", "TIMESTAMP"), ("a", "INT"), ("b", "SMALLINT"),
    ]
    # old rows read NULL for the new column; new inserts carry it
    rows = dialect.execute(
        spark, db, "select a, b from tb order by ts"
    ).collect()
    assert [r.b for r in rows] == [None, None, None]
    dialect.execute(
        spark, db, "insert into tb values('2024-01-04 00:00:00', -25, 7)"
    )
    rows = dialect.execute(
        spark, db, "select a, b from tb order by ts"
    ).collect()
    assert [r.b for r in rows] == [None, None, None, 7]


def test_drop_modify_rename_column(spark, db):
    dialect.execute(
        spark, db, "create table tb (ts timestamp, a int, b smallint)"
    )
    dialect.execute(
        spark, db, "insert into tb values('2024-01-01 00:00:00', 1, 2)"
    )
    dialect.execute(spark, db, "alter table tb drop column b")
    assert _describe(spark, db, "tb") == [("ts", "TIMESTAMP"), ("a", "INT")]
    assert "b" not in dialect.execute(spark, db, "select * from tb").columns

    # MODIFY COLUMN widens the type (reference: bytes/type widening)
    dialect.execute(spark, db, "alter table tb modify column a bigint")
    assert _describe(spark, db, "tb") == [
        ("ts", "TIMESTAMP"), ("a", "BIGINT"),
    ]
    # RENAME COLUMN
    dialect.execute(spark, db, "alter table tb rename column a a2")
    rows = dialect.execute(spark, db, "select a2 from tb").collect()
    assert [r.a2 for r in rows] == [1]

    # re-adding a dropped name starts fresh (NULL), reference semantics
    dialect.execute(spark, db, "alter table tb add column b int")
    rows = dialect.execute(spark, db, "select b from tb").collect()
    assert [r.b for r in rows] == [None]


def test_stable_tag_alters(spark, db):
    dialect.execute(
        spark, db,
        "create stable st (ts timestamp, v double) tags (grp int)",
    )
    dialect.execute(spark, db, "alter stable st add tag region varchar(16)")
    t = db.table("st")
    assert t.tag_cols == ("grp", "region")
    dialect.execute(spark, db, "alter stable st rename tag grp grp2")
    assert t.tag_cols == ("grp2", "region")
    dialect.execute(spark, db, "alter stable st drop tag region")
    assert t.tag_cols == ("grp2",)
    cols = dialect.execute(spark, db, "select * from st").columns
    assert "grp2" in cols and "region" not in cols


def test_set_tag_rewrites_child(spark, db):
    dialect.execute(
        spark, db,
        "create stable st (ts timestamp, v double) tags (city varchar(16))",
    )
    dialect.execute(
        spark, db,
        "insert into c1 using st tags('old') values"
        "('2024-01-01 00:00:00', 1.0)('2024-01-02 00:00:00', 2.0)",
    )
    dialect.execute(spark, db, "alter table c1 set tag city = 'new'")
    rows = dialect.execute(spark, db, "select city from c1").collect()
    assert {r.city for r in rows} == {"new"}


def test_evolution_survives_reload(spark, db):
    """The overlay is a sidecar file: a fresh Database over the same
    directory sees the evolved schema (the reference persists ALTERs in
    mnode metadata)."""
    dialect.execute(spark, db, "create table tb (ts timestamp, a int)")
    dialect.execute(
        spark, db, "insert into tb values('2024-01-01 00:00:00', 5)"
    )
    dialect.execute(spark, db, "alter table tb add column b double")
    dialect.execute(spark, db, "alter table tb rename column a a_renamed")

    db2 = Database(root=db.root)
    rows = dialect.execute(spark, db2, "select a_renamed, b from tb").collect()
    assert [(r.a_renamed, r.b) for r in rows] == [(5, None)]


def test_rename_keeps_star_position(spark, db):
    # mndStb.c renames the schema slot in place — SELECT * order must keep
    # the renamed column at its declared ordinal (ADVICE r9)
    dialect.execute(spark, db, "create table tb (ts timestamp, c1 int, c2 int)")
    dialect.execute(spark, db, "insert into tb values('2024-01-01 00:00:00', 1, 2)")
    dialect.execute(spark, db, "alter table tb rename column c1 x1")
    assert dialect.execute(spark, db, "select * from tb").columns == [
        "ts", "x1", "c2",
    ]
    # chained rename keeps the slot too
    dialect.execute(spark, db, "alter table tb rename column x1 y1")
    assert dialect.execute(spark, db, "select * from tb").columns == [
        "ts", "y1", "c2",
    ]


def test_drop_readd_appends_at_end(spark, db):
    # a re-added column gets a new colId in the reference → appended after
    # the surviving data columns, and old data stays masked (ADVICE r9)
    dialect.execute(
        spark, db, "create table tb (ts timestamp, c1 int, c2 int)"
    )
    dialect.execute(spark, db, "insert into tb values('2024-01-01 00:00:00', 1, 2)")
    dialect.execute(spark, db, "alter table tb drop column c1")
    dialect.execute(spark, db, "alter table tb add column c1 int")
    out = dialect.execute(spark, db, "select * from tb")
    assert out.columns == ["ts", "c2", "c1"]
    assert [r.c1 for r in out.collect()] == [None]


def test_insert_using_named_tag_subset(spark, db):
    # INSERT … USING with a reordered/subset named TAGS list must register
    # tag_values in declared tag order (ADVICE r9)
    dialect.execute(
        spark, db,
        "create table st (ts timestamp, v double) tags (t1 int, t2 binary(16))",
    )
    dialect.execute(
        spark, db,
        "insert into ct0 using st (t2, t1) tags ('red', 7) "
        "values ('2024-01-01 00:00:00', 1.5)",
    )
    # a later plain INSERT INTO the child zips declared tag order
    dialect.execute(
        spark, db, "insert into ct0 values ('2024-01-01 00:01:00', 2.5)"
    )
    rows = dialect.execute(
        spark, db, "select ts, v, t1, t2 from st order by ts"
    ).collect()
    assert [(r.t1, r.t2) for r in rows] == [(7, "red"), (7, "red")]


def test_insert_using_partial_tags(spark, db):
    dialect.execute(
        spark, db,
        "create table st2 (ts timestamp, v double) tags (t1 int, t2 int)",
    )
    dialect.execute(
        spark, db,
        "insert into ct1 using st2 (t2) tags (9) "
        "values ('2024-01-01 00:00:00', 1.0)",
    )
    dialect.execute(
        spark, db, "insert into ct1 values ('2024-01-01 00:01:00', 2.0)"
    )
    rows = dialect.execute(
        spark, db, "select ts, t1, t2 from st2 order by ts"
    ).collect()
    assert [(r.t1, r.t2) for r in rows] == [(None, 9), (None, 9)]
