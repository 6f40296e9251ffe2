"""Similarity search over embedding columns (array<float>).

Two tiers:
  - brute-force cosine top-k: exact baseline. Queries are broadcast
    (they're small by construction); the corpus streams through one
    projection + per-query top-k — at 100 TB this is a single scan, no
    shuffle of the corpus.
  - LSH-bucketed ANN (random hyperplanes): sign-bit bucket key per
    vector; queries probe their own bucket (+ optional multi-probe by
    flipping low-order bits). Turns the scan into a bucket-pruned join.

Dot products are F.zip_with + F.aggregate — JVM-side, codegen'd. No
Python UDFs anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: "str | None" = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast; the corpus is scanned once. Per-query top-k
    via row_number over (query, similarity desc) — Spark's WindowGroupLimit
    pushes the k-filter into the sort, so no full materialization.
    Self-matches (same id) are excluded when ids share a namespace.
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                cosine(
                    F.col("_qv").cast("array<double>"),
                    F.col("_cv").cast("array<double>"),
                )
                + F.lit(1e-7),
                4,
            ),
        )
    )
    # rank by the ROUNDED score: raw cosines differing only in the last
    # ulp across engines would otherwise flip tie ranks
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def random_hyperplanes(dim: int, nbits: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket key from random hyperplane projections."""
    key = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        key = key + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return key


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket equi-join, then exact
    cosine rank within the probed bucket.

    Scale path: the corpus is bucketed once (can be materialized as a
    bucketed Parquet table); each query touches one bucket ≈ corpus/2^nbits
    of the data. Equi-join keeps Catalyst on shuffled-hash/SMJ plans.
    """
    planes = random_hyperplanes(dim, nbits, seed)
    vcast = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        vcast.alias("_cv"),
        lsh_bucket(vcast, planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vcast.alias("_qv"),
        lsh_bucket(vcast, planes).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(cosine(F.col("_qv"), F.col("_cv")) + F.lit(1e-7), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
