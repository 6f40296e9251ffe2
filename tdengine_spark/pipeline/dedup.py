"""Deduplication at training-data scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale design:
  - exact dedup = one hash-groupBy on a 64-bit fingerprint (map-side
    partial collapse → shuffle carries one row per distinct doc);
  - MinHash+LSH avoids the O(n²) pair space: signatures are computed
    JVM-side (transform/aggregate over shingle hashes — no Python), bands
    bucket the candidates, and only within-bucket pairs are verified;
  - SimHash = 64 weighted bit-sums per doc, again pure expressions;
  - the verify step (exact Jaccard) runs only on LSH candidates.

Everything is expressed so Catalyst sees plain projections + equi-joins:
no UDFs, no driver loops, no cartesian products.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves "pd.Series" hints here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tdengine_spark.pipeline.text import fingerprint, shingles

# MinHash universal-hash parameters: h_i(x) = (a_i * x + b_i) mod p.
# p = 2^31 - 1 (Mersenne prime) keeps a*h < 2^62 — no int64 overflow in
# the JVM expression.
_MERSENNE_P = (1 << 31) - 1


def _hash_params(num: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MERSENNE_P), rnd.randrange(0, _MERSENNE_P))
        for _ in range(num)
    ]


def _shingle_hashes(text_col: str, shingle_n: int) -> Column:
    """array<long> of xxhash64(shingle) mod p, in [0, p).

    ONE hash family for every minhash method: the hashing runs JVM-side
    (codegen'd xxhash64 — no Python), so ``method="arrow"`` and
    ``method="expr"`` signatures are identical by construction and
    persisted signatures stay valid across a method switch. pmod (not
    abs-then-%) so the Long.MIN_VALUE edge can't go negative.
    NULL text folds to "" so the array is never NULL (and always ≥1
    element) — both methods see the same input."""
    sh = shingles(F.coalesce(F.col(text_col), F.lit("")), shingle_n)
    return F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P)))


def _token_hashes(text_col: str) -> Column:
    """array<long> of raw xxhash64(token) — the shared SimHash input.
    Tokenization: lower/trim, collapse whitespace, split (NULL/empty
    text → one "" token, so the array is never NULL/empty)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(F.regexp_replace(F.lower(F.trim(txt)), r"\s+", " "), " ")
    return F.transform(toks, lambda w: F.xxhash64(w))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate removal keyed on the normalized-text fingerprint;
    keeps the smallest id per group, adds the group's duplicate count."""
    fp = fingerprint(text_col)
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("_fp")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    method: str = "arrow",
) -> DataFrame:
    """(id, signature array<long>) — MinHash over word-shingle hashes.

    Shingle hashing ALWAYS runs JVM-side (``_shingle_hashes``: codegen'd
    xxhash64 mod p) so both methods share one hash family — signatures
    from either method are interchangeable, and a persisted signature
    table survives a method switch.

    ``method="arrow"`` (default): the (h·a+b) mod p min-reduction runs
    in numpy — the whole Arrow batch's hashes become ONE
    |shingles|×num_hashes broadcast with ``minimum.reduceat`` per doc.
    Spark's higher-order functions evaluate *interpreted* (no
    whole-stage codegen), so at 64 hashes the JVM fold costs ~2× the
    Arrow round-trip; profiled at sf0.1 on local[32].

    ``method="expr"``: the pure-expression fold (no Python workers, no
    Arrow) — keep for environments where Python UDFs are barred.
    """
    hashed = _shingle_hashes(text_col, shingle_n)
    if method == "arrow":
        return _minhash_signatures_arrow(df, hashed, id_col, num_hashes, seed)
    params = _hash_params(num_hashes, seed)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in params])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in params])
    init = F.array_repeat(F.lit(_MERSENNE_P).cast("long"), num_hashes)
    # h < p < 2^31 and a < p ⇒ h·a + b < 2^62: no int64 overflow
    sig = F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_arr, b_arr, lambda a, b: (h * a + b) % _MERSENNE_P),
            lambda x, y: F.least(x, y),
        ),
    )
    return df.select(F.col(id_col), sig.alias("signature"))


def _minhash_signatures_arrow(
    df: DataFrame,
    hashed: Column,
    id_col: str,
    num_hashes: int,
    seed: int,
) -> DataFrame:
    """Arrow min-reduction over JVM-computed shingle hashes (array<long>
    in [0, p)). No hashing and no per-row Python here — the UDF body is
    a single numpy broadcast + segmented minima per record batch."""
    import numpy as np
    from pyspark.sql import types as T

    params = _hash_params(num_hashes, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.uint64)
    b_vec = np.array([b for _, b in params], dtype=np.uint64)
    p = np.uint64(_MERSENNE_P)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(hash_arrays: pd.Series) -> pd.Series:
        if not len(hash_arrays):
            return pd.Series([], dtype=object)
        # shingles() guarantees ≥1 element per doc, so every reduceat
        # segment is non-empty
        counts = np.fromiter(
            (len(a) for a in hash_arrays), dtype=np.int64, count=len(hash_arrays)
        )
        h = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in hash_arrays]
        ).astype(np.uint64)
        # h < p and a < p ⇒ h·a + b < 2^62: no uint64 wrap
        mat = (h[:, None] * a_vec[None, :] + b_vec[None, :]) % p
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        mins = np.minimum.reduceat(mat, offsets, axis=0).astype(np.int64)
        return pd.Series(list(mins))

    return df.select(F.col(id_col), sig_udf(hashed).alias("signature"))


def _bucket_pairs(
    keyed: DataFrame, key_cols: list[str], id_col: str, extra: "list[str] | None" = None
) -> DataFrame:
    """Distinct (id_a < id_b) pairs of ids sharing a bucket key — ONE
    groupBy + combination explode instead of a bucket self-join: the
    shuffle runs once (collect_list per bucket) and the i<j pair set is
    generated from the sorted id array, so the join, its second
    exchange, and the cache/count materialization the self-join needed
    all disappear (r14). Buckets of size 1 are dropped before any pair
    work. ``extra``: per-id payload columns to carry into the pairs
    (emitted as <name>_a / <name>_b)."""
    extra = extra or []
    payload = F.struct(F.col(id_col).alias("_i"), *[F.col(c) for c in extra])
    buckets = (
        keyed.groupBy(*key_cols)
        .agg(F.collect_list(payload).alias("_m"))
        .where(F.size("_m") > 1)
        .select(F.array_sort("_m").alias("_m"))
    )
    big = 1 << 30
    combos = F.flatten(
        F.transform(
            F.col("_m"),
            lambda x, i: F.transform(
                F.slice(F.col("_m"), i + 2, big),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    out = buckets.select(F.explode(combos).alias("_p")).select(
        F.col("_p.a._i").alias("id_a"),
        F.col("_p.b._i").alias("id_b"),
        *[F.col(f"_p.a.{c}").alias(f"{c}_a") for c in extra],
        *[F.col(f"_p.b.{c}").alias(f"{c}_b") for c in extra],
    )
    return out.distinct()


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: band the signature, bucket the bands.

    posexplode(bands) → groupBy (band_idx, band_hash) — a single shuffle
    whose key cardinality ~ n_docs × bands; pairs are exploded from each
    bucket's sorted id list (skew-safe: genuine mega-buckets mean
    genuine dup clusters, and their pair count is identical to what the
    old within-bucket self-join produced). Returns distinct
    (id_a < id_b) pairs.
    """
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                        .cast("array<string>")
                        .cast("string")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    return _bucket_pairs(banded, ["band_idx", "band_hash"], id_col)


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only (the expensive step
    runs on |candidates|, not n²). Returns pairs ≥ threshold."""
    sh = df.select(
        F.col(id_col), shingles(text_col, shingle_n).alias("_sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sa"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_sb"), "id_b")
    )
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    union = F.size(F.array_union("_sa", "_sb")).cast("double")
    return (
        j.withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1.0)), 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_pairs_bruteforce(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs shingle Jaccard ≥ threshold — the n² verification
    baseline the LSH path approximates. O(n²) by construction: use for
    oracle checks and small corpora only; the scale path is
    ``minhash_dedup`` (same shingles, same verify arithmetic)."""
    sh = df.select(
        F.col(id_col), shingles(text_col, shingle_n).alias("_sh")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    a = sh.select(
        F.col(id_col).alias("id_a"), F.col("_sh").alias("_sa")
    )
    b = sh.select(
        F.col(id_col).alias("id_b"), F.col("_sh").alias("_sb")
    )
    j = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    union = F.size(F.array_union("_sa", "_sb")).cast("double")
    return (
        j.withColumn(
            "jaccard", F.round(inter / F.greatest(union, F.lit(1.0)), 4)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → Jaccard
    verify. Returns confirmed near-dup pairs (id_a, id_b, jaccard)."""
    # repartition: a single large parquet file otherwise serializes the
    # whole signature computation on one core. The bucket-pair
    # candidate kernel consumes the signatures exactly once, so the
    # cache + eager count() the old self-join needed are gone (r14) —
    # every bench reread recomputes from parquet.
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sigs = minhash_signatures(spread, text_col, id_col, num_hashes)
    cands = minhash_lsh_candidates(sigs, id_col, bands, num_hashes // bands)
    return jaccard_verify(spread, cands, text_col, id_col, threshold=threshold)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    method: str = "arrow",
) -> DataFrame:
    """64-bit SimHash: per-bit weighted sums of token hashes.

    tokens → 64-bit hash → for each bit b, sum(sign(bit_b)) → sign → bit.

    Token hashing ALWAYS runs JVM-side (``_token_hashes``: codegen'd
    xxhash64) — both methods share one hash family, so simhashes from
    either method are bit-identical and interchangeable.

    ``method="arrow"`` (default): the sign-matrix reduction runs in
    numpy — the batch's token hashes become one |tokens|×64 sign matrix
    with ``add.reduceat`` per doc (C-speed; shares the python worker
    pool with the MinHash path).

    ``method="expr"``: pure-expression fold — ONE F.aggregate walks the
    token-hash array updating all 64 bit-sums per element via zip_with.
    Higher-order functions evaluate interpreted (not codegen'd); keep
    for environments where Python UDFs are barred.

    Either way the input is repartitioned first so a single-file scan
    doesn't serialize the computation on one core.
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    hashes = _token_hashes(text_col)
    if method == "arrow":
        return _simhash_arrow(df, hashes, id_col, bits)
    def bit_mask(b: int) -> int:
        # bit 63 of a signed long is the sign bit: 1<<63 must be the
        # negative two's-complement value, not a Python bignum
        return (1 << b) if b < 63 else -(1 << 63)

    masks = F.array(*[F.lit(bit_mask(b)).cast("long") for b in range(bits)])
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    bit_sums = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            bit_sums,
            masks,
            lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return df.select(F.col(id_col), sim.alias("simhash"))


def _simhash_arrow(
    df: DataFrame, hashes: Column, id_col: str, bits: int
) -> DataFrame:
    """Arrow sign-matrix reduction over JVM-computed token hashes
    (array<long>, raw xxhash64 bit patterns). No hashing and no per-row
    Python here — numpy bit-unpack + segmented sums per record batch."""
    import numpy as np
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def sim_udf(hash_arrays: pd.Series) -> pd.Series:
        if not len(hash_arrays):
            return pd.Series([], dtype="int64")
        # split("", " ") yields [""] → every doc has ≥1 token hash
        counts = np.fromiter(
            (len(a) for a in hash_arrays), dtype=np.int64, count=len(hash_arrays)
        )
        # .view reinterprets the signed xxhash64 two's-complement bits
        h = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in hash_arrays]
        ).view(np.uint64)
        shifts = np.arange(bits, dtype=np.uint64)
        signs = (((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32) * 2) - 1
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        sums = np.add.reduceat(signs, offsets, axis=0)
        packed = ((sums > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(packed.view(np.int64))

    return df.select(F.col(id_col), sim_udf(hashes).alias("simhash"))


def simhash_near_pairs(
    sims: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ k, using the
    block-permutation trick: split 64 bits into (k+1) blocks — any pair
    within distance k agrees on ≥1 whole block → bucket per block.
    Candidates come from one groupBy + combination explode
    (``_bucket_pairs``) carrying each id's simhash as payload, so the
    simhash lineage is consumed exactly once — no self-join, no cache
    (r14)."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_idx"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("block_val"),
            )
            for i in range(nblocks)
        ]
    )
    exploded = sims.select(id_col, "simhash", F.explode(blocks).alias("b")).select(
        id_col, "simhash", "b.block_idx", "b.block_val"
    )
    cands = _bucket_pairs(
        exploded, ["block_idx", "block_val"], id_col, extra=["simhash"]
    )
    hamming = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    return (
        cands.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
