"""Fluent API end-to-end on real testdata: the flagship dialect shape
SELECT ... PARTITION BY k INTERVAL(w) SLIDING(s) FILL(mode)."""

from pyspark.sql import functions as F

from tdengine_spark.catalog import Database
from tdengine_spark.query_builder import Scan

SF = "/root/testdata/sf0.001"


def _scan(spark):
    return Scan(Database(root=SF), "events", spark)


def test_flagship_interval_fill(spark):
    out = (
        _scan(spark)
        .range("2024-01-05", "2024-01-10")
        .partition_by("event_type")
        .interval("1h")
        .agg(F.round(F.avg("value"), 4).alias("avg_v"))
        .fill("prev")
        .df()
    )
    rows = out.collect()
    assert len(rows) > 0
    # spine covers the full query range per group: 5 days × 24 buckets
    per_group = {}
    for r in rows:
        per_group.setdefault(r.event_type, []).append(r)
    for g, rs in per_group.items():
        assert len(rs) == 5 * 24, g


def test_plain_agg_partition_by(spark):
    out = (
        _scan(spark)
        .partition_by("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    assert out.count() == 15  # sf0.001 has 15 users


def test_session_builder(spark):
    out = (
        _scan(spark)
        .partition_by("user_id")
        .session("30m")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert out.where(F.col("_wend") < F.col("_wstart")).count() == 0
    assert out.count() > 0


def test_event_window_true_for(spark):
    out = (
        _scan(spark)
        .partition_by("user_id")
        .event_window(F.col("value") > 150, F.col("value") < 50)
        .true_for("1h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dur = F.unix_micros("_wend") - F.unix_micros("_wstart")
    assert out.where(dur < 3600 * 1_000_000).count() == 0


def test_where_and_range_compose(spark):
    df = (
        _scan(spark)
        .range("2024-01-10", None)
        .where(F.col("event_type") == "purchase")
        .df()
    )
    assert df.where(F.col("ts") < "2024-01-10").count() == 0
    assert df.select("event_type").distinct().count() == 1


def test_interp_builder(spark):
    out = (
        _scan(spark)
        .partition_by("user_id")
        .interp("value", "2024-01-10", "2024-01-11", "6h", mode="near")
    )
    assert out.count() == 15 * 5  # 15 users × 5 instants


def test_priority_names_all_registered():
    """A _PRIORITY name missing from REGISTRY silently drops out of the
    driver's verification window — fail loudly here instead."""
    from tdengine_spark.queries import REGISTRY, _PRIORITY, _register_extensions

    _register_extensions()
    dangling = [n for n in _PRIORITY if n not in REGISTRY]
    assert not dangling, f"unregistered _PRIORITY names: {dangling}"


def test_builder_asof_and_window_join(spark):
    from pyspark.sql import functions as F

    from tdengine_spark.catalog import Database
    from tdengine_spark.operators.asofjoin import asof_join
    from tdengine_spark.query_builder import Scan

    db = Database(root="/root/testdata/sf0.001")
    left = (
        Scan(db, "events", spark)
        .where(F.col("event_type") == "purchase")
        .partition_by("user_id")
    )
    right = Scan(db, "events", spark).where(F.col("event_type") == "click")
    got = left.asof_join(right)
    expect = asof_join(left.df(), right.df(), ["user_id"], "ts")
    assert got.count() == expect.count()
    assert got.schema == expect.schema
    wj = left.window_join(right, "-5m", "5m", jlimit=2)
    assert wj.count() > 0
