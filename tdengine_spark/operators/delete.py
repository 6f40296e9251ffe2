"""DELETE FROM ... WHERE — the reference's DataDeleter sink
(executor/src/dataDeleter.c; QUERY_NODE_DELETE_STMT).

Parquet has no in-place delete; the standard Spark patterns are:
  - partition rewrite (implemented): rewrite only the time partitions
    that contain matching rows, via anti-filter → temp → atomic-ish swap;
  - Delta Lake DELETE (the production path — row-level with txn log).

At 100 TB the partition pruning step is what makes this viable: a ts-
bounded DELETE touches only the affected ``ts_bucket=`` directories.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def delete_where(
    spark: SparkSession,
    path: str,
    condition: Column,
    partition_col: "str | None" = None,
) -> int:
    """Delete rows matching ``condition``; returns the number deleted.

    With ``partition_col`` (a physical partition directory column), only
    partitions containing matches are rewritten; otherwise the whole
    dataset is rewritten (fine for small/unpartitioned tables).
    """
    df = spark.read.parquet(path)
    n_before = df.count()
    # DELETE removes rows where the predicate is TRUE; rows where it
    # evaluates to NULL (e.g. a NULL compared column) must be KEPT —
    # where(~condition) alone would silently drop them.
    keep = ~F.coalesce(condition, F.lit(False))
    if partition_col is not None:
        hit = (
            df.where(condition)
            .select(partition_col)
            .distinct()
            .toPandas()[partition_col]
            .tolist()
        )
        if not hit:
            return 0
        for part in hit:
            part_path = os.path.join(path, f"{partition_col}={part}")
            # basePath keeps the partition column visible so the
            # predicate may reference it; drop it again before writing
            # (partition dirs don't store their own column).
            pdf = spark.read.option("basePath", path).parquet(part_path)
            kept = pdf.where(keep).drop(partition_col)
            tmp = part_path + "__rewrite"
            kept.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(part_path)
            os.rename(tmp, part_path)
        return n_before - spark.read.parquet(path).count()
    kept = df.where(keep)
    tmp = path + "__rewrite"
    kept.write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_before - n_after
