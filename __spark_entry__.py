"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /``oracle_sql()``
expose the full registry in tdengine_spark/queries.py (one entry per
implemented operator from SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tdengine_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: INTERVAL(1h) PARTITION BY event_type with FILL(PREV) on
    sf0.001 events — the reference's headline dialect construct
    (SELECT _wstart, avg(value) ... PARTITION BY tag INTERVAL(1h) FILL(PREV)).
    """
    return Q.REGISTRY["interval_fill_prev"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
