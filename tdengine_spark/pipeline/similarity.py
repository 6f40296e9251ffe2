"""Similarity search over embedding columns (array<float>).

Two tiers:
  - brute-force cosine top-k: exact baseline. Queries are collected and
    ride the UDF closure as one numpy matrix (they are small by
    construction); the corpus streams through ``mapInPandas`` — each
    Arrow batch is ONE numpy matmul against the query matrix, followed
    by a per-batch partial top-k, so the shuffle carries only
    ``nq × k`` candidate rows per batch, never the b×nq score matrix.
    At 100 TB this is a single corpus scan with map-side top-k combine.
  - LSH-bucketed ANN (random hyperplanes): sign-bit bucket key per
    vector (one matmul per Arrow batch against the hyperplane matrix);
    queries probe their own bucket plus, with ``probe_radius >= 1``,
    every bucket within that Hamming distance (multi-probe — recall
    recovered without extra hash tables; probing fans out the tiny
    query side only). Turns the scan into a bucket-pruned equi-join.

Hot-path math is Arrow-batched numpy (pandas_udf / mapInPandas), NOT
array higher-order functions: Spark evaluates ``F.aggregate`` /
``F.zip_with`` interpreted (no whole-stage codegen), which this repo
profiled at ~an order of magnitude slower per vector — see
pipeline/dedup.py for the same rewrite.

Parity note: the reference engine has no vector type; this module is a
beyond-reference component for LLM training-data pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window


def _mat(series: pd.Series) -> np.ndarray:
    """Stack an Arrow list column into a (batch, dim) float64 matrix."""
    return np.array(series.tolist(), dtype=np.float64)


def _round4_eps(x: np.ndarray) -> np.ndarray:
    """HALF_UP round to 4 decimals with the repo's +1e-7 epsilon shift —
    numpy emulation of ``F.round(c + 1e-7, 4) + 0.0`` so Spark-side and
    oracle-side values keep hash-matching (see queries_pipeline oracle)."""
    xs = x + 1e-7
    return np.sign(xs) * np.floor(np.abs(xs) * 1e4 + 0.5) / 1e4 + 0.0


def pair_cosine(a: Column, b: Column, round4: bool = False) -> Column:
    """Row-wise cosine of two array columns (Arrow batch → one einsum).

    ``round4=True`` applies the module's single rounding kernel
    (``_round4_eps``) inside the UDF so every scoring path in this
    module — brute-force and LSH — produces bit-identical values for
    the same vector pair (F.round's BigDecimal HALF_UP on the shortest
    decimal repr can differ by 1 ulp near .xxxx5 boundaries)."""

    @pandas_udf("double")
    def _pc(sa: pd.Series, sb: pd.Series) -> pd.Series:
        A, B = _mat(sa), _mat(sb)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        out = num / np.maximum(den, 1e-30)
        return pd.Series(_round4_eps(out) if round4 else out)

    # asNondeterministic: stop the optimizer duplicating the UDF when a
    # filter on its output is pushed below the projection (guide §4.4 —
    # the function itself IS deterministic). Trade-off (r14 ADVICE):
    # the marking also blocks pushing OTHER filters/projections past
    # this expression, so callers filtering on downstream columns lose
    # pushdown through it — acceptable here because every call site
    # filters only on the UDF's own output.
    return _pc.asNondeterministic()(a, b)


#: kept name from the first version of this module
cosine = pair_cosine


def pair_cosine_int(a: Column, b: Column,
                    scale: "int | None" = None) -> Column:
    """Cross-engine-EXACT cosine for the quantized-LSH value oracles:
    both vectors are floor-quantized to 1/scale int64 ticks; dot and
    squared norms are exact integer sums (every partial sum is an
    integer < 2^53, so ANY summation order — numpy einsum or a SQL
    engine's sequential list fold — yields the same value); the only
    inexact IEEE ops (one multiply, sqrt, divide, half-up round to 4
    decimals) are correctly-rounded and identical in every engine.
    Eliminates the float path's summation-order divergence near a
    rounding boundary or an exact threshold value."""
    sc = INT_BUCKET_SCALE if scale is None else scale

    @pandas_udf("double")
    def _pci(sa: pd.Series, sb: pd.Series) -> pd.Series:
        A = np.floor(_mat(sa) * sc).astype(np.int64)
        B = np.floor(_mat(sb) * sc).astype(np.int64)
        num = np.einsum("ij,ij->i", A, B).astype(np.float64)
        na = np.einsum("ij,ij->i", A, A).astype(np.float64)
        nb = np.einsum("ij,ij->i", B, B).astype(np.float64)
        out = num / np.maximum(np.sqrt(na * nb), 1e-30)
        return pd.Series(
            np.sign(out) * np.floor(np.abs(out) * 1e4 + 0.5) / 1e4 + 0.0
        )

    # asNondeterministic: single evaluation under pushed filters (§4.4)
    return _pci.asNondeterministic()(a, b)


#: hard cap on the collected query side of cosine_topk — ~100k × 64-dim
#: float64 ≈ 50 MB in the closure, the sane upper bound for
#: broadcast-style shipping
QUERY_SIDE_MAX_ROWS = 100_000


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: "str | None" = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Per corpus Arrow batch: one ``(batch, dim) @ (dim, nq)`` matmul, then
    a per-query partial top-k (same comparator as the global rank:
    rounded score desc, neighbor id asc — a valid combine, since every
    global top-k row is top-k within its batch). The global window then
    ranks only ``batches × nq × k`` candidates. Self-matches (same id)
    are excluded when ids share a namespace.
    """
    qid = query_id_col or id_col
    # the query side rides the task closure (broadcast-style); it must
    # be small. Collect one row over the limit and fail loudly instead
    # of silently OOMing the driver on a mis-sized call.
    q_rows = (
        queries.select(F.col(qid).alias("q"), F.col(vec_col).alias("v"))
        .limit(QUERY_SIDE_MAX_ROWS + 1)
        .collect()
    )
    if len(q_rows) > QUERY_SIDE_MAX_ROWS:
        raise ValueError(
            f"cosine_topk query side exceeds {QUERY_SIDE_MAX_ROWS} rows — "
            "it is broadcast into every task; pre-filter the queries or "
            "batch them (the corpus side is the scalable side)"
        )
    # id dtypes follow the input schemas — string/decimal ids work too
    qid_t = queries.schema[qid].dataType.simpleString()
    nid_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_t}, neighbor_id {nid_t}, cosine double"
    if not q_rows:
        return corpus.sparkSession.createDataFrame([], out_schema + ", rank int")
    qids = np.array([r.q for r in q_rows])
    Q = np.array([np.asarray(r.v, dtype=np.float64) for r in q_rows])
    Qn = (Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)).T

    def topk_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            C = _mat(pdf[vec_col])
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
            sims = _round4_eps(Cn @ Qn)  # (batch, nq)
            out_q, out_n, out_c = [], [], []
            for j in range(len(qids)):
                col = sims[:, j]
                valid = ids != qids[j]
                # top-k by (score desc, neighbor_id asc): lexsort is
                # stable, last key dominates
                order = np.lexsort((ids[valid], -col[valid]))[:k]
                sel = np.flatnonzero(valid)[order]
                out_q.append(np.full(len(sel), qids[j]))
                out_n.append(ids[sel])
                out_c.append(col[sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(topk_batches, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    dim: "int | None" = None,
    nbits: int = 8,
    probe_radius: int = 1,
    seed: int = 42,
    quantized: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ τ) —
    the vector-space member of the dedup family (exact / MinHash /
    SimHash / embedding-cosine).

    ``method="lsh"`` (the 100 TB path): hyperplane-bucket the corpus
    once, equi-join within buckets (plus Hamming-``probe_radius``
    neighbor buckets, fanned out on ONE side only), exact cosine on
    candidates. No all-pairs product: candidate count ≈ Σ bucket².
    Recall < 1 by construction (tunable via nbits/probe_radius).

    ``method="exact"``: full pairwise — O(n²), for verification and
    small corpora only; broadcast self-join so Catalyst still avoids a
    shuffle on the big side.
    """
    vcast = F.col(vec_col).cast("array<double>")
    if method == "exact":
        a = emb.select(F.col(id_col).alias("id_a"), vcast.alias("_va"))
        b = emb.select(F.col(id_col).alias("id_b"), vcast.alias("_vb"))
        pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            raise ValueError("method='lsh' needs dim")
        planes = random_hyperplanes(dim, nbits, seed)
        bucket_fn = lsh_bucket_int if quantized else lsh_bucket
        base = emb.select(
            F.col(id_col).alias("_id"),
            vcast.alias("_v"),
            bucket_fn(vcast, planes).alias("_b0"),
        )
        probed = base.select(
            "_id", "_v",
            F.explode(
                _probe_buckets(F.col("_b0"), nbits, probe_radius)
            ).alias("_bucket"),
        )
        plain = base.select(
            F.col("_id").alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_b0").alias("_bucket"),
        )
        pairs = (
            probed.select(
                F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_bucket"
            )
            .join(plain, "_bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "_va", "_vb")
            .distinct()
        )
    return (
        pairs.withColumn(
            "cosine",
            # quantized tier scores integer-exactly (value-oracle-safe
            # even AT the threshold); float tier keeps the shared
            # rounding kernel
            pair_cosine_int(F.col("_va"), F.col("_vb")) if quantized
            else pair_cosine(F.col("_va"), F.col("_vb"), round4=True),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def random_hyperplanes(dim: int, nbits: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).tolist()


#: quantization scale for the cross-engine-reproducible bucket variant —
#: a power of two so ``v * INT_BUCKET_SCALE`` is an exact exponent shift
#: in IEEE double (no rounding), making floor() identical in every engine
INT_BUCKET_SCALE = 4096


def quantized_planes(planes: list[list[float]],
                     scale: int = INT_BUCKET_SCALE) -> list[list[int]]:
    """Hyperplane coefficients floor-quantized to 1/scale ticks
    (int64). Shared by the Spark kernel and the SQL-oracle builder so
    both engines test the sign of the SAME exact integer dot product."""
    return np.floor(
        np.asarray(planes, dtype=np.float64) * scale
    ).astype(np.int64).tolist()


def lsh_bucket_int(vec: Column, planes: list[list[float]],
                   scale: int = INT_BUCKET_SCALE) -> Column:
    """Integer-quantized hyperplane bucket: plane coefficients AND
    vector components are floor-quantized to 1/scale ticks and the sign
    test runs on exact int64 arithmetic — bit-reproducible in any
    engine. (The float path's dot-product summation order can flip a
    sign-boundary bit between numpy matmul and a SQL engine's
    sequential list_sum, which would silently desync an external
    value-oracle of the bucket join.)"""
    Pq = np.asarray(quantized_planes(planes, scale), dtype=np.int64).T
    weights = (1 << np.arange(Pq.shape[1], dtype=np.int64)).astype(np.int64)

    @pandas_udf("long")
    def _bucket(sv: pd.Series) -> pd.Series:
        V = np.floor(_mat(sv) * scale).astype(np.int64)
        bits = (V @ Pq) > 0
        return pd.Series(bits @ weights)

    # asNondeterministic: the join's pushed isnotnull(bucket) filter
    # otherwise re-evaluates the UDF below the projection — the plan
    # carried TWO ArrowEvalPython nodes per side (guide §4.4)
    return _bucket.asNondeterministic()(vec)


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket key from random hyperplane projections — one
    ``(batch, dim) @ (dim, nbits)`` matmul per Arrow batch."""
    P = np.asarray(planes, dtype=np.float64).T  # (dim, nbits)
    weights = (1 << np.arange(P.shape[1], dtype=np.int64)).astype(np.int64)

    @pandas_udf("long")
    def _bucket(sv: pd.Series) -> pd.Series:
        bits = _mat(sv) @ P > 0
        return pd.Series(bits @ weights)

    # asNondeterministic: the join's pushed isnotnull(bucket) filter
    # otherwise re-evaluates the UDF below the projection — the plan
    # carried TWO ArrowEvalPython nodes per side (guide §4.4)
    return _bucket.asNondeterministic()(vec)


def _probe_buckets(bucket: Column, nbits: int, probe_radius: int) -> Column:
    """Array of bucket keys within Hamming distance ``probe_radius`` of
    ``bucket`` (pure bit-flip expressions — fans out the query side only)."""
    cands = [bucket]
    if probe_radius >= 1:
        cands += [bucket.bitwiseXOR(F.lit(1 << i)) for i in range(nbits)]
    if probe_radius >= 2:
        cands += [
            bucket.bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(nbits)
            for j in range(i + 1, nbits)
        ]
    if probe_radius >= 3:
        raise ValueError("probe_radius > 2 unsupported (use more hash tables)")
    return F.array(*cands)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    probe_radius: int = 0,
    quantized: bool = False,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket equi-join, then exact
    cosine rank within the probed bucket(s). ``quantized=True`` uses the
    integer-exact bucket kernel (``lsh_bucket_int``) so the whole
    algorithm is value-oracle-reproducible in external SQL engines.

    Scale path: the corpus is bucketed once (can be materialized as a
    bucketed Parquet table); each query touches ``1 + nbits + C(nbits,2)``
    buckets at most (probe_radius ≤ 2) ≈ a vanishing corpus fraction.
    The multi-probe explode happens on the (tiny, broadcast) query side;
    the corpus side stays a single-scan equi-join — Catalyst keeps the
    shuffled-hash/SMJ path, no cross join.
    """
    planes = random_hyperplanes(dim, nbits, seed)
    bucket_fn = lsh_bucket_int if quantized else lsh_bucket
    vcast = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        vcast.alias("_cv"),
        bucket_fn(vcast, planes).alias("_bucket"),
    )
    # bucket in its own projection, THEN the probe fan-out: the UDF is
    # evaluated once per query row and the explode works on the plain
    # column (a nondeterministic expression may not sit under Generate)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vcast.alias("_qv"),
        bucket_fn(vcast, planes).alias("_b0"),
    ).select(
        "query_id",
        "_qv",
        F.explode(
            _probe_buckets(F.col("_b0"), nbits, probe_radius)
        ).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            # quantized tier: integer-exact scoring so the DuckDB
            # value-oracle replays bit-identically; float tier: same
            # numpy rounding kernel as cosine_topk
            pair_cosine_int(F.col("_qv"), F.col("_cv")) if quantized
            else pair_cosine(F.col("_qv"), F.col("_cv"), round4=True),
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
