"""as-of/window join variants + function semantics the oracle can't pin
(strict/forward/tolerance, JLIMIT, twa edge cases, dedup-keep-last)."""

from datetime import datetime

from pyspark.sql import functions as F

from tdengine_spark.catalog import dedup_keep_last
from tdengine_spark.functions.aggregate import twa
from tdengine_spark.operators.asofjoin import asof_join, window_join


def ts(s):
    return datetime.fromisoformat(s)


def _sides(spark):
    left = spark.createDataFrame(
        [
            ("a", ts("2024-01-01 00:00:10"), 1.0),
            ("a", ts("2024-01-01 00:00:20"), 2.0),
        ],
        "k string, ts timestamp, lv double",
    )
    right = spark.createDataFrame(
        [
            ("a", ts("2024-01-01 00:00:05"), 10.0),
            ("a", ts("2024-01-01 00:00:10"), 20.0),  # ts-equal to left row 1
            ("a", ts("2024-01-01 00:00:15"), 30.0),
        ],
        "k string, ts timestamp, rv double",
    )
    return left, right


def test_asof_backward_nonstrict(spark):
    left, right = _sides(spark)
    out = {r.lv: r.r_rv for r in asof_join(left, right, ["k"], "ts").collect()}
    assert out == {1.0: 20.0, 2.0: 30.0}  # >= includes the ts-equal row


def test_asof_backward_strict(spark):
    left, right = _sides(spark)
    out = {
        r.lv: r.r_rv
        for r in asof_join(left, right, ["k"], "ts", strict=True).collect()
    }
    assert out == {1.0: 10.0, 2.0: 30.0}  # > excludes the ts-equal row


def test_asof_forward(spark):
    left, right = _sides(spark)
    out = {
        r.lv: r.r_rv
        for r in asof_join(left, right, ["k"], "ts", direction="forward").collect()
    }
    assert out == {1.0: 20.0, 2.0: None}  # <= : equal counts; nothing after 20s


def test_asof_tolerance(spark):
    left, right = _sides(spark)
    # strict-backward matches are 10.0@05 for left@10 and 30.0@15 for
    # left@20 — both exactly 5s away
    within = {
        r.lv: r.r_rv
        for r in asof_join(
            left, right, ["k"], "ts", strict=True, tolerance="5s"
        ).collect()
    }
    assert within == {1.0: 10.0, 2.0: 30.0}
    beyond = {
        r.lv: r.r_rv
        for r in asof_join(
            left, right, ["k"], "ts", strict=True, tolerance="3s"
        ).collect()
    }
    assert beyond == {1.0: None, 2.0: None}


def test_window_join_jlimit(spark):
    left, right = _sides(spark)
    out = window_join(
        left, right, ["k"], "-10s", "10s", ts_col="ts", jlimit=2
    ).collect()
    by_left = {}
    for r in out:
        by_left.setdefault(r.lv, []).append(r.r_rv)
    # JLIMIT 2 keeps the 2 earliest right rows in each window:
    # left@10 window [00,20] → rights @05,@10 (of @05,@10,@15);
    # left@20 window [10,30] → rights @10,@15
    assert sorted(by_left[1.0]) == [10.0, 20.0]
    assert sorted(by_left[2.0]) == [20.0, 30.0]


def test_window_join_asymmetric_offsets(spark):
    left, right = _sides(spark)
    out = window_join(left, right, ["k"], "0s", "5s", ts_col="ts").collect()
    matches = {(r.lv, r.r_rv) for r in out if r.r_rv is not None}
    assert matches == {(1.0, 20.0), (1.0, 30.0)}  # [ts, ts+5s]
    # left 2.0 has no match in [20,25] → left-outer NULL row survives
    assert any(r.lv == 2.0 and r.r_rv is None for r in out)


def test_twa_constant_series(spark):
    df = spark.createDataFrame(
        [("a", ts(f"2024-01-01 00:00:{s:02d}"), 7.5) for s in (0, 10, 25, 59)],
        "k string, ts timestamp, v double",
    )
    out = twa(df, "ts", "v", ["k"]).first()
    assert abs(out.twa - 7.5) < 1e-9  # twa(constant) == constant


def test_twa_single_sample(spark):
    df = spark.createDataFrame(
        [("a", ts("2024-01-01 00:00:00"), 3.0)], "k string, ts timestamp, v double"
    )
    assert twa(df, "ts", "v", ["k"]).first().twa == 3.0


def test_twa_linear_ramp(spark):
    # v goes 0→10 linearly over 10s: twa = 5
    df = spark.createDataFrame(
        [("a", ts("2024-01-01 00:00:00"), 0.0), ("a", ts("2024-01-01 00:00:10"), 10.0)],
        "k string, ts timestamp, v double",
    )
    assert abs(twa(df, "ts", "v", ["k"]).first().twa - 5.0) < 1e-9


def test_dedup_keep_last(spark):
    df = spark.createDataFrame(
        [
            ("a", ts("2024-01-01 00:00:00"), 1.0, 1),
            ("a", ts("2024-01-01 00:00:00"), 2.0, 2),  # same (k, ts), newer version
            ("a", ts("2024-01-01 00:00:01"), 3.0, 1),
        ],
        "tbname string, ts timestamp, v double, _version int",
    )
    out = dedup_keep_last(df, ["tbname", "ts"], version_col="_version").collect()
    got = {(r.ts, r.v) for r in out}
    assert got == {(ts("2024-01-01 00:00:00"), 2.0), (ts("2024-01-01 00:00:01"), 3.0)}
    # implicit _version column is picked up; anything else refuses to guess
    out2 = dedup_keep_last(df, ["tbname", "ts"]).collect()
    assert {(r.ts, r.v) for r in out2} == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="version column"):
        dedup_keep_last(df.drop("_version"), ["tbname", "ts"])


def test_asof_jlimit_backward(spark):
    left, right = _sides(spark)
    rows = asof_join(left, right, ["k"], "ts", jlimit=2).collect()
    got = {(r.lv, r._jrank): r.r_rv for r in rows}
    # lv=1.0 (ts 00:10): closest = 20.0 (ts-equal), then 10.0
    # lv=2.0 (ts 00:20): closest = 30.0, then 20.0
    assert got == {
        (1.0, 1): 20.0, (1.0, 2): 10.0,
        (2.0, 1): 30.0, (2.0, 2): 20.0,
    }


def test_asof_jlimit_fewer_matches_and_unmatched(spark):
    left, right = _sides(spark)
    # k=5 > available matches: lv=1.0 has only 2 eligible rows
    rows = asof_join(left, right, ["k"], "ts", jlimit=5).collect()
    per_left = {}
    for r in rows:
        per_left.setdefault(r.lv, []).append(r.r_rv)
    assert sorted(per_left[1.0]) == [10.0, 20.0]
    assert sorted(per_left[2.0]) == [10.0, 20.0, 30.0]
    # unmatched left row -> single NULL row with NULL _jrank
    lonely = spark.createDataFrame(
        [("a", ts("2024-01-01 00:00:01"), 9.0)], "k string, ts timestamp, lv double"
    )
    out = asof_join(lonely, right, ["k"], "ts", jlimit=3).collect()
    assert len(out) == 1 and out[0].r_rv is None and out[0]._jrank is None


def test_asof_jlimit_forward_strict(spark):
    left, right = _sides(spark)
    rows = asof_join(
        left, right, ["k"], "ts", direction="forward", strict=True, jlimit=2
    ).collect()
    got = {(r.lv, r._jrank): r.r_rv for r in rows if r.r_rv is not None}
    # lv=1.0 (ts 00:10) strict forward: 30.0 only (20.0 is ts-equal)
    assert got == {(1.0, 1): 30.0}
    nulls = [r.lv for r in rows if r.r_rv is None]
    assert nulls == [2.0]  # no right row after 00:20


def test_asof_jlimit_tolerance(spark):
    left, right = _sides(spark)
    rows = asof_join(left, right, ["k"], "ts", jlimit=2, tolerance="5s").collect()
    per_left = {}
    for r in rows:
        per_left.setdefault(r.lv, []).append((r._jrank, r.r_rv))
    # lv=1.0: 20.0 (0s) and 10.0 (5s) both within 5s
    assert sorted(per_left[1.0]) == [(1, 20.0), (2, 10.0)]
    # lv=2.0: 30.0 (5s) within, 20.0 (10s) dropped
    assert per_left[2.0] == [(1, 30.0)]


def test_asof_jlimit_tolerance_null_left_columns(spark):
    """Tolerance restore must be NULL-safe: a matched left row carrying a
    NULL payload column must NOT also emit a spurious NULL-extended row
    (the old all-columns anti-join never matched NULL = NULL)."""
    left = spark.createDataFrame(
        [("a", ts("2024-01-01 00:00:10"), None),
         ("a", ts("2024-01-01 00:02:00"), 2.0)],
        "k string, ts timestamp, lv double",
    )
    right = spark.createDataFrame(
        [("a", ts("2024-01-01 00:00:08"), 10.0)],
        "k string, ts timestamp, rv double",
    )
    rows = asof_join(left, right, ["k"], "ts", jlimit=2, tolerance="5s").collect()
    # NULL-lv row matches within tolerance → exactly ONE row, rv=10
    null_lv = [r for r in rows if r.lv is None]
    assert len(null_lv) == 1 and null_lv[0].r_rv == 10.0
    # 2.0 row: match at 112s distance fails tolerance → one NULL-extended row
    far = [r for r in rows if r.lv == 2.0]
    assert len(far) == 1 and far[0].r_rv is None and far[0]._jrank is None


def test_asof_jlimit_tolerance_duplicate_left_rows(spark):
    """Identical duplicate left rows each keep their own restored row."""
    dup = [("a", ts("2024-01-01 00:02:00"), 5.0)] * 2
    left = spark.createDataFrame(dup, "k string, ts timestamp, lv double")
    right = spark.createDataFrame(
        [("a", ts("2024-01-01 00:00:00"), 10.0)],
        "k string, ts timestamp, rv double",
    )
    rows = asof_join(left, right, ["k"], "ts", jlimit=3, tolerance="5s").collect()
    # both duplicates lose their only match to tolerance → 2 NULL rows
    assert len(rows) == 2
    assert all(r.r_rv is None and r._jrank is None for r in rows)


def test_window_join_jlimit_duplicate_left_ts(spark):
    """JLIMIT budgets per left ROW: two left rows sharing (key, ts) but
    different payloads each get their own k matches."""
    left = spark.createDataFrame(
        [("a", ts("2024-01-01 00:00:10"), 1.0),
         ("a", ts("2024-01-01 00:00:10"), 2.0)],
        "k string, ts timestamp, lv double",
    )
    right = spark.createDataFrame(
        [("a", ts("2024-01-01 00:00:08"), 10.0),
         ("a", ts("2024-01-01 00:00:09"), 20.0),
         ("a", ts("2024-01-01 00:00:11"), 30.0)],
        "k string, ts timestamp, rv double",
    )
    rows = window_join(
        left, right, ["k"], "-10s", "10s", ts_col="ts", jlimit=2
    ).collect()
    per_left = {}
    for r in rows:
        per_left.setdefault(r.lv, []).append(r.r_rv)
    assert sorted(per_left[1.0]) == [10.0, 20.0]
    assert sorted(per_left[2.0]) == [10.0, 20.0]


def test_jlimit_ids_survive_upstream_repartition(spark):
    """The JLIMIT/tolerance surrogate row ids are deterministic
    row_numbers, not monotonically_increasing_id — an upstream
    repartition (which renumbers mono-ids arbitrarily) must not change
    any result."""
    left, right = _sides(spark)
    # duplicate a left row at the same (key, ts) to exercise the
    # per-instant numbering
    left = left.union(
        spark.createDataFrame(
            [("a", ts("2024-01-01 00:00:10"), 99.0)],
            "k string, ts timestamp, lv double",
        )
    )

    def canon(df):
        return sorted(map(tuple, df.collect()))

    for mangle in (lambda d: d, lambda d: d.repartition(7, "lv"),
                   lambda d: d.repartition(13)):
        l2 = mangle(left)
        a = asof_join(l2, right, ["k"], "ts", jlimit=2, tolerance="6s")
        w = window_join(l2, right, ["k"], "-10s", "10s", ts_col="ts", jlimit=2)
        assert canon(a) == canon(
            asof_join(left, right, ["k"], "ts", jlimit=2, tolerance="6s")
        )
        assert canon(w) == canon(
            window_join(left, right, ["k"], "-10s", "10s", ts_col="ts", jlimit=2)
        )
