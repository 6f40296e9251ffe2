"""interp/TimeSlice semantics: exact-sample hits, all fill modes,
_isfilled, out-of-range behavior."""

from datetime import datetime

from tdengine_spark.operators.interp import interp


def ts(s):
    return datetime.fromisoformat(s)


def _series(spark):
    rows = [
        ("a", ts("2024-01-01 00:00:10"), 10.0),
        ("a", ts("2024-01-01 00:00:30"), 30.0),
        ("b", ts("2024-01-01 00:00:20"), 5.0),
    ]
    return spark.createDataFrame(rows, "k string, t timestamp, v double")


def _run(spark, mode, **kw):
    out = interp(
        _series(spark), "t", "v",
        "2024-01-01 00:00:00", "2024-01-01 00:00:40", "10s",
        mode=mode, partition_by=["k"], **kw,
    ).collect()
    return {
        (r.k, r._irowts.second): (r.v, r._isfilled) for r in out
    }


def test_interp_linear(spark):
    # reference edge semantics (12-Interp goldens): LINEAR emits no row
    # outside [first, last] sample — not NULL rows
    got = _run(spark, "linear")
    assert ("a", 0) not in got                 # before first sample: dropped
    assert got[("a", 10)] == (10.0, False)     # exact sample
    assert got[("a", 20)] == (20.0, True)      # midpoint interpolation
    assert got[("a", 30)] == (30.0, False)
    assert ("a", 40) not in got                # after last sample: dropped
    assert got[("b", 20)] == (5.0, False)
    assert ("b", 30) not in got


def test_interp_prev_next(spark):
    prev = _run(spark, "prev")
    assert ("a", 0) not in prev                # no prev sample: dropped
    assert prev[("a", 20)] == (10.0, True)
    assert prev[("a", 40)] == (30.0, True)
    nxt = _run(spark, "next")
    assert nxt[("a", 0)] == (10.0, True)
    assert nxt[("a", 20)] == (30.0, True)
    assert ("a", 40) not in nxt                # no next sample: dropped


def test_interp_near(spark):
    got = _run(spark, "near")
    assert got[("a", 0)] == (10.0, True)    # only next exists
    # 20s: prev@10 is 10s away, next@30 is 10s away → tie goes prev
    assert got[("a", 20)] == (10.0, True)
    assert got[("a", 40)] == (30.0, True)   # only prev exists


def test_interp_null_value(spark):
    nul = _run(spark, "null")
    assert nul[("a", 10)] == (10.0, False)
    assert nul[("a", 20)] == (None, True)
    val = _run(spark, "value", fill_value=-1.0)
    assert val[("a", 10)] == (10.0, False)
    assert val[("a", 20)] == (-1.0, True)


def test_interp_global_no_partition(spark):
    out = interp(
        _series(spark).where("k = 'a'"), "t", "v",
        "2024-01-01 00:00:00", "2024-01-01 00:00:40", "20s",
        mode="linear",
    ).collect()
    # 00 (no prev) and 40 (no next) drop under reference edge
    # semantics; only the interpolable instant remains
    assert len(out) == 1
    assert out[0]._irowts.second == 20 and out[0].v == 20.0


def test_interp_numeric_bounds_match_string_bounds(spark):
    """Integer RANGE bounds: Spark's F.lit(int).cast('timestamp') reads
    epoch-SECONDS, so the plan-time bucket origin must agree or refuse
    (pd.Timestamp would read the same int as nanoseconds — the r14
    bucketed kernel gates numeric bounds back to the union kernel)."""
    base = 1704067200  # 2024-01-01 00:00:00 UTC, epoch seconds
    num = interp(
        _series(spark), "t", "v", base, base + 40, "10s",
        mode="prev", partition_by=["k"],
    ).collect()
    s = interp(
        _series(spark), "t", "v",
        "2024-01-01 00:00:00", "2024-01-01 00:00:40", "10s",
        mode="prev", partition_by=["k"],
    ).collect()
    key = lambda r: (r.k, r._irowts, r.v, r._isfilled)
    assert sorted(map(key, num)) == sorted(map(key, s))
    assert len(num) > 0
