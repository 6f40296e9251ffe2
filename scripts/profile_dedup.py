#!/usr/bin/env python
"""Stage-level profile of the minhash/simhash dedup pipelines (guide
§1.1): time each prefix of the pipeline with the noop sink, min-of-N.

Usage: python scripts/profile_dedup.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    import tdengine_spark.pipeline.dedup as dd
    from tdengine_spark.catalog import Database
    from tdengine_spark.pipeline.text import spread
    from tdengine_spark.session import get_spark

    spark = get_spark("profile-dedup")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = Database(root=sf_dir).read(spark, "documents")

    def bench(label, build):
        spark.sparkContext.setJobDescription(f"profile:{label}")
        try:
            ts = []
            for _ in range(reps):
                t0 = time.time()
                build().write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            print(f"{label:42s} min={min(ts):.3f} all={[round(t,3) for t in ts]}")
        finally:
            spark.sparkContext.setJobDescription(None)

    # warmup
    bench("warmup:scan", lambda: docs.select("doc_id"))

    # --- simhash chain ---
    txt = F.coalesce(F.col("text"), F.lit(""))
    bench("sim:1 scan+spread+text", lambda: spread(docs).select("doc_id", "text"))
    bench(
        "sim:2 +tokenize(split)",
        lambda: spread(docs).select(
            "doc_id", F.split(F.lower(F.trim(txt)), r"\s+").alias("_t")
        ),
    )
    bench(
        "sim:3 +xxhash64 fold",
        lambda: spread(docs).select(
            "doc_id", dd._token_hashes("text").alias("_h")
        ),
    )
    bench("sim:4 +arrow signmatrix", lambda: dd.simhash(docs))
    bench(
        "sim:5 full near_pairs",
        lambda: dd.simhash_near_pairs(dd.simhash(docs), max_hamming=6),
    )

    # --- minhash chain ---
    bench(
        "mh:1 shingle_hashes",
        lambda: spread(docs).select(
            "doc_id", dd._shingle_hashes("text", 3).alias("_h")
        ),
    )

    def mh_bands():
        wide = spread(docs)
        return dd._minhash_bands_arrow(
            wide, dd._shingle_hashes("text", 3), "doc_id", 64, 16, seed=42
        )

    bench("mh:2 +band kernel", mh_bands)

    def mh_cands():
        banded = mh_bands().select(
            F.col("doc_id"), F.posexplode("bands").alias("band_idx", "band_hash")
        )
        return dd._bucket_pairs(banded, ["band_idx", "band_hash"], "doc_id")

    bench("mh:3 +bucket pairs (cands)", mh_cands)
    bench(
        "mh:4 full (verify join)",
        lambda: dd.minhash_dedup(docs, threshold=0.5),
    )
    bench(
        "mh:4b verify alone on precomputed-pairs",
        lambda: dd.jaccard_verify(docs, mh_cands(), threshold=0.5),
    )


if __name__ == "__main__":
    main()
