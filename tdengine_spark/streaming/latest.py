"""Last-row cache analog (reference CACHEMODEL last_row/last_value,
cachescanoperator.c + optimizer rule LastRowScan).

The reference keeps an O(1) per-child-table cache of the newest row,
maintained on ingest. Spark-first equivalent: a compact "latest" table
maintained per micro-batch in foreachBatch — each batch's per-key
max_by(row, ts) is merged into the running latest table, so
``last_row(*)`` queries read |keys| rows instead of scanning history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LatestTable:
    """Maintains /latest as overwrite-on-merge parquet keyed by
    ``key_cols``; newest row per key wins by ``ts_col``."""

    def __init__(self, path: str, key_cols: list[str], ts_col: str = "ts"):
        self.path = path
        self.key_cols = key_cols
        self.ts_col = ts_col

    def merge_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        spark = batch.sparkSession
        others = [c for c in batch.columns if c not in self.key_cols]
        per_key = (
            batch.groupBy(*self.key_cols)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in others]), F.col(self.ts_col)
                ).alias("_r")
            )
            .select(*self.key_cols, *[F.col(f"_r.{c}").alias(c) for c in others])
        )
        if os.path.exists(self.path):
            prev = spark.read.parquet(self.path)
            merged_src = prev.unionByName(per_key, allowMissingColumns=True)
            merged = (
                merged_src.groupBy(*self.key_cols)
                .agg(
                    F.max_by(
                        F.struct(*[F.col(c) for c in others]), F.col(self.ts_col)
                    ).alias("_r")
                )
                .select(
                    *self.key_cols, *[F.col(f"_r.{c}").alias(c) for c in others]
                )
            )
        else:
            merged = per_key
        # tiny table (|keys| rows): single-file overwrite is atomic enough
        # for the cache role; a production deployment uses Delta MERGE
        merged.coalesce(1).write.mode("overwrite").parquet(self.path + "_tmp")
        spark.read.parquet(self.path + "_tmp").write.mode("overwrite").parquet(
            self.path
        )

    def foreach_batch(self):
        return lambda batch, bid: self.merge_batch(batch, bid)

    def read(self, spark) -> DataFrame:
        """The O(|keys|) last_row(*) fast path."""
        return spark.read.parquet(self.path)
