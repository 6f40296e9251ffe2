"""Batch ingest — the INSERT path (SURVEY §3.2).

Reference: INSERT bypasses the planner; rows are encoded per vgroup,
WAL-appended, and committed to columnar files (parInsertSql.c →
tsdbMemTable.c → tsdbCommit2.c). Spark-first equivalent: append
DataFrames to a Parquet dataset laid out for the read path:

  - ``ts_bucket`` partition directories = the reference's DURATION
    filesets (time-partition pruning on every ts-range scan);
  - bucketing/sorting by ``tbname`` within partitions = vgroup
    locality (one child table's rows cluster in few files);
  - a monotonically stamped ``_version`` column = the WAL sequence,
    powering keep-last dedup for duplicate (tbname, ts) overwrites.

At 100 TB: appends are per-micro-batch directory adds (no rewrite);
compaction = per-partition dedup_keep_last rewrite, independent jobs
per ts_bucket.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tdengine_spark.catalog import dedup_keep_last
from tdengine_spark.durations import parse_duration
from tdengine_spark.operators.timewindow import window_start


def append_batch(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    tbname_col: str = "tbname",
    duration: str = "1d",
    version: "int | None" = None,
) -> None:
    """Append one ingest batch, time-partitioned and tbname-clustered."""
    ver = version if version is not None else time.time_ns()
    staged = (
        df.withColumn("ts_bucket", F.date_format(
            window_start(ts_col, duration), "yyyyMMddHHmmss"))
        .withColumn("_version", F.lit(ver))
        # cluster each partition's rows by child table then ts so one
        # series' data is contiguous (TableMergeScan locality)
        .repartition(F.col("ts_bucket"))
        .sortWithinPartitions(tbname_col, ts_col)
    )
    staged.write.mode("append").partitionBy("ts_bucket").parquet(path)


def read_table(
    spark, path: str, ts_col: str = "ts", tbname_col: str = "tbname",
    dedup: bool = True,
) -> DataFrame:
    """Read an ingested table; keep-last dedup resolves duplicate
    (tbname, ts) across append batches (reference overwrite semantics)."""
    df = spark.read.parquet(path)
    if dedup:
        df = dedup_keep_last(df, [tbname_col, ts_col], version_col="_version")
    return df.drop("ts_bucket", "_version")


def compact_partition(spark, path: str, bucket: str, ts_col="ts", tbname_col="tbname"):
    """Compaction job for one time partition: collapse duplicate versions
    (the reference's fileset merge on commit). Safe to run per-partition
    in parallel."""
    part = f"{path}/ts_bucket={bucket}"
    df = spark.read.parquet(part)
    merged = dedup_keep_last(df, [tbname_col, ts_col], version_col="_version")
    tmp = part + "__compact"
    merged.sortWithinPartitions(tbname_col, ts_col).write.mode(
        "overwrite"
    ).parquet(tmp)
    import os
    import shutil

    shutil.rmtree(part)
    os.rename(tmp, part)
