#!/usr/bin/env python
"""Scale smoke: run the heavy extension operators on corpora 20-200x the
test fixtures to verify the plans hold beyond toy sizes (no OOM, sane
scaling). Results recorded in SCALE.md.

    python scripts/scale_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from laposte_data_engineering_jedha_spark.operators import dedup, similarity
from laposte_data_engineering_jedha_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def blown_up_docs(spark, times: int):
    """documents replicated `times`x with a deterministic per-copy token
    appended, so copies are near-dups (jaccard just under 1) of the
    original — the worst case for LSH candidate volume."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    reps = spark.range(times).select(F.col("id").alias("rep"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" rep"), F.col("rep")).alias("text"),
    )


def blown_up_vecs(spark, times: int):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    reps = spark.range(times).select(F.col("id").alias("rep"))
    return emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"), "embedding"
    )


def timed(label, df):
    t0 = time.perf_counter()
    n = df.count()
    print(f"{label:<44} rows={n:>10,}  {time.perf_counter() - t0:7.1f}s", flush=True)


def main() -> None:
    spark = get_spark(app_name="scale_smoke")
    docs100k = blown_up_docs(spark, 20).cache()
    timed("corpus: documents x20", docs100k)
    timed("exact_dedup @100k docs", dedup.exact_dedup(docs100k))
    timed("minhash_lsh_pairs @100k docs", dedup.minhash_lsh_pairs(docs100k))
    timed("simhash_pairs @100k docs", dedup.simhash_pairs(docs100k, max_hamming=1))
    timed(
        "ngram_jaccard (df cap 100) @100k docs",
        dedup.ngram_jaccard_pairs(docs100k, threshold=0.5, max_shingle_df=100),
    )
    docs100k.unpersist()

    docs1m = blown_up_docs(spark, 200)
    timed("exact_dedup @1M docs", dedup.exact_dedup(docs1m))

    vecs40k = blown_up_vecs(spark, 20).cache()
    timed("corpus: embeddings x20", vecs40k)
    q = vecs40k.where(F.col("vec_id") < 8)
    timed("brute_force_knn @40k vectors", similarity.brute_force_knn(vecs40k, q, k=5))
    timed("lsh_knn @40k vectors", similarity.lsh_knn(vecs40k, q, k=5, dim=64, planes=8))
    vecs40k.unpersist()


if __name__ == "__main__":
    main()
