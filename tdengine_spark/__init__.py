"""tdengine_spark — a PySpark-native time-series analytics engine.

Re-expresses the query and data-processing capabilities of TDengine
(taosdata/TDengine, studied read-only at /root/reference) as idiomatic
PySpark: DataFrame/SQL plans optimized by Catalyst, Parquet storage,
Structured Streaming for continuous queries.

Layout:
    session    — SparkSession factory tuned for time-series workloads
    catalog    — super-table registry over Parquet (tags = columns,
                 tbname pseudo-column, dedup-keep-last on read)
    operators/ — time-window family (interval/session/state/event/count),
                 fill engine, interp/time-slice, as-of & window joins
    functions/ — TDengine function library as Column/DataFrame transforms
                 (twa, irate, derivative, diff, mavg, csum, elapsed,
                  spread, top/bottom/tail/unique, histogram, ...)
    pipeline/  — large-scale training-data ops (dedup, similarity search,
                 text analysis, multimodal plumbing)
    streaming/ — CREATE STREAM analogs on Structured Streaming
"""

__version__ = "0.1.0"

from tdengine_spark.session import get_spark  # noqa: F401
