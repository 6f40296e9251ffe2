"""Precision oracles for the approximate dedup / ANN family.

These five pipelines are permanently rows-only in the driver's DuckDB
gate (their outputs depend on hash seeds / bucket boundaries, so no SQL
oracle can hash-match them). What CAN be checked exactly:

  - precision: every emitted pair/neighbor must appear in the
    brute-force truth set at the same threshold (no false positives);
  - values: the jaccard / cosine reported for an emitted pair must equal
    an independent recomputation;
  - simhash: the block-permutation join is exhaustive for
    hamming <= max_hamming (pigeonhole over max_hamming+1 blocks), so
    there the check is full EQUALITY with brute force, not subset.

Recall remains a separate unit-test concern (test_pipeline.py) — these
tests prove the fast paths never fabricate a pair.

Truth sets are recomputed here in numpy/pure Python from the raw
parquet, sharing no code with the pipeline under test.
"""

import math
import re

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tdengine_spark.pipeline import dedup as dd
from tdengine_spark.pipeline import similarity as sim

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from tdengine_spark.catalog import Database

    return Database(root=SF).read(spark, "documents")


def _emb(spark):
    from tdengine_spark.catalog import Database

    return Database(root=SF).read(spark, "embeddings")


# --------------------------------------------------------------------------
# shingle-jaccard brute force (independent reimplementation of
# pipeline/text.py shingles(): lower, collapse whitespace, word 3-grams
# joined by single spaces, distinct; short docs fall back to the whole
# token string)
# --------------------------------------------------------------------------


def _shingle_set(text: str, n: int = 3) -> set:
    toks = re.sub(r"\s+", " ", (text or "").lower().strip()).split(" ")
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def test_minhash_pairs_subset_of_bruteforce(spark):
    thr = 0.2
    pdf = _docs(spark).select("doc_id", "text").toPandas()
    sets = {r.doc_id: _shingle_set(r.text) for r in pdf.itertuples()}
    ids = sorted(sets)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = _jaccard(sets[a], sets[b])
            # the pipeline reports round-4 jaccard; a pair at
            # thr - epsilon may legitimately round over the threshold
            if j >= thr - 1e-4:
                truth[(a, b)] = j
    emitted = dd.minhash_dedup(_docs(spark), threshold=thr).collect()
    assert emitted, "minhash emitted no pairs at sf0.001 — fixture drifted?"
    for r in emitted:
        key = (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        assert key in truth, f"false positive pair {key} (jaccard={r.jaccard})"
        assert math.isclose(r.jaccard, truth[key], abs_tol=1e-4), (
            f"pair {key}: emitted jaccard {r.jaccard} != truth {truth[key]}"
        )


def test_simhash_pairs_equal_bruteforce(spark):
    """Block-permutation is exhaustive for hamming <= 6 over 7 blocks —
    assert full set equality against all-pairs hamming on the same
    simhash values."""
    max_h = 6
    sims = dd.simhash(_docs(spark))
    vals = {r.doc_id: r.simhash for r in sims.collect()}
    ids = sorted(vals)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            # python ints are unbounded: mask to 64 bits before popcount
            x = (vals[a] ^ vals[b]) & ((1 << 64) - 1)
            if bin(x).count("1") <= max_h:
                truth.add((a, b))
    emitted = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in dd.simhash_near_pairs(sims, max_hamming=max_h).collect()
    }
    assert emitted == truth, (
        f"missing={sorted(truth - emitted)[:5]} extra={sorted(emitted - truth)[:5]}"
    )


# --------------------------------------------------------------------------
# cosine brute force
# --------------------------------------------------------------------------


def _emb_matrix(spark):
    pdf = _emb(spark).select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    M = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    return ids, Mn


def _round4_eps(x):
    return np.round(x + 1e-7, 4)


def test_embedding_lsh_pairs_subset_of_bruteforce(spark):
    thr = 0.35
    ids, Mn = _emb_matrix(spark)
    sims = _round4_eps(Mn @ Mn.T)
    idx = {v: i for i, v in enumerate(ids)}
    truth = {
        (min(a, b), max(a, b)): sims[idx[a], idx[b]]
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if sims[idx[a], idx[b]] >= thr
    }
    emitted = sim.cosine_near_dup_pairs(
        _emb(spark), threshold=thr, method="lsh", dim=64, nbits=8,
        probe_radius=1,
    ).collect()
    assert emitted, "lsh near-dup emitted no pairs at sf0.001"
    for r in emitted:
        key = (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        assert key in truth, f"false positive pair {key} (cosine={r.cosine})"
        assert math.isclose(r.cosine, truth[key], abs_tol=1e-4), (
            f"pair {key}: emitted cosine {r.cosine} != truth {truth[key]}"
        )


@pytest.mark.parametrize("probe_radius", [0, 1])
def test_lsh_ann_scores_match_bruteforce(spark, probe_radius):
    """Every emitted (query, neighbor, cosine) must carry the true
    cosine of that exact pair, exclude self-matches, and rank
    consistently with its scores — LSH may miss true neighbors (recall
    is tested elsewhere) but must never misscore one."""
    ids, Mn = _emb_matrix(spark)
    idx = {v: i for i, v in enumerate(ids)}
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 10)
    out = sim.lsh_ann_topk(
        emb, queries, dim=64, k=5, nbits=8, probe_radius=probe_radius
    ).collect()
    assert out, "lsh ann emitted nothing at sf0.001"
    by_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id, "self-match emitted"
        true_cos = _round4_eps(
            float(Mn[idx[r.query_id]] @ Mn[idx[r.neighbor_id]])
        )
        assert math.isclose(r.cosine, true_cos, abs_tol=1e-4), (
            f"({r.query_id},{r.neighbor_id}): emitted {r.cosine} != {true_cos}"
        )
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine, r.neighbor_id))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        # rank order == (cosine desc, neighbor_id asc)
        resorted = sorted(rows, key=lambda r: (-r[1], r[2]))
        assert rows == resorted, f"rank order inconsistent for query {q}"
