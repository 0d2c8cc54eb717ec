"""Round-7 session batch 6 — LSH index health + embedding-distribution
profiling, both with full DuckDB oracle twins.

- embedding_bucket_skew: per-band bucket-size distribution of the SAME
  banded hyperplane index dedup_embedding_cosine joins on — bucket
  count, max/mean size, and the implied candidate-pair mass
  sum(c*(c-1)/2). This is the report that PROVES the LSH equi-join is
  shuffle-safe before it runs: a hot bucket here is tomorrow's skewed
  join (the hot-cell lesson from round 5). Integer counts end to end.
- embedding_norm_profile: per-label vector-norm profile (count,
  zero-norm count, min/max/mean of the 1e-6-rounded norm) — the
  degenerate-vector screen run before any cosine-based operator (the
  zero-norm guard every similarity op carries exists because of what
  this report surfaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors
from . import query, table
from .llmops import _EMB_BANDS, _sql_band_key, SQL_NORM, sql_round

# ============================= LSH bucket skew ===============================


@query(
    "embedding_bucket_skew",
    f"""
WITH n AS (SELECT vec_id, embedding AS e FROM embeddings
           WHERE {SQL_NORM} > 0),
keyed AS (
  SELECT vec_id, band, {_sql_band_key('e')} AS key
  FROM (SELECT vec_id, e, CAST(r.range AS BIGINT) AS band
        FROM n CROSS JOIN range(0, {_EMB_BANDS}) r)),
b AS (SELECT band, key, CAST(count(*) AS BIGINT) AS c
      FROM keyed GROUP BY band, key)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(c) AS BIGINT) AS max_bucket,
       CAST(sum(c) AS BIGINT) AS n_vectors,
       CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_cand_pairs,
       round(CAST(sum(c) AS DOUBLE) / count(*) * 1000000) / 1000000
         AS mean_bucket
FROM b GROUP BY band
""",
)
def embedding_bucket_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-size skew report for the banded hyperplane LSH index
    (identical planes/bands to dedup_embedding_cosine): per band, how
    many buckets, the hottest bucket, and the implied candidate-pair
    mass sum(c choose 2) — the exact number of pairs the band
    equi-join will emit. Run this BEFORE the join at a new scale: a
    bucket holding k vectors costs k^2/2 pairs, so max_bucket is the
    skew early-warning the AQE skew-join split otherwise absorbs
    silently. Map-side bucket ids, one (band, key) aggregate, 8-row
    rollup; all counts integral."""
    emb = table(spark, sf_dir, "embeddings")
    src = emb.select(
        "vec_id",
        F.col("embedding").alias("_v"),
        vectors.pd_norm("embedding").alias("_n"),
    ).where(F.col("_n") > 0)
    keyed = src.select(
        "vec_id",
        F.posexplode(vectors.pd_lsh_buckets_banded("_v", 64, _EMB_BANDS, 4)).alias(
            "band", "key"
        ),
    )
    b = keyed.groupBy("band", "key").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return b.groupBy(F.col("band").cast("long").alias("band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("c").cast("long").alias("max_bucket"),
        F.sum("c").cast("long").alias("n_vectors"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("n_cand_pairs"),
        (
            F.round(F.sum("c").cast("double") / F.count(F.lit(1)) * 1000000) / 1000000
        ).alias("mean_bucket"),
    )


# ============================ norm distribution ==============================


@query(
    "embedding_norm_profile",
    f"""
WITH n AS (
  SELECT label, CAST(round({SQL_NORM} * 1000000) AS BIGINT) AS nq
  FROM embeddings)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(*) FILTER (WHERE nq = 0) AS BIGINT) AS n_zero_norm,
       round(CAST(min(nq) AS DOUBLE)) / 1000000 AS min_norm,
       round(CAST(max(nq) AS DOUBLE)) / 1000000 AS max_norm,
       round(CAST(sum(nq) AS DOUBLE) / count(*)) / 1000000 AS mean_norm
FROM n GROUP BY label
""",
)
def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label norm profile of the embedding corpus: vector count,
    zero-norm (degenerate) count, and min/max/mean norm. The screen to
    run before any cosine operator — a zero-norm vector makes cosine
    undefined (every similarity op here filters them; this report says
    HOW MANY were dropped and whether one label is degenerate, e.g. a
    broken encoder shard emitting zeros). One map-side Arrow norm kernel
    + a |labels|-row aggregate. Exactness: the norm (a bit-identical
    left-to-right fold on both engines) is QUANTIZED to integer
    micro-units per row BEFORE aggregating, so sums are order-free
    integers and the mean is one final division — no float accumulation
    crosses the engines."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.select(
        "label",
        F.round(vectors.pd_norm("embedding") * 1000000).cast("long").alias("nq"),
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.when(F.col("nq") == 0, 1).otherwise(0)).cast("long").alias("n_zero_norm"),
        (F.round(F.min("nq").cast("double")) / 1000000).alias("min_norm"),
        (F.round(F.max("nq").cast("double")) / 1000000).alias("max_norm"),
        (F.round(F.sum("nq").cast("double") / F.count(F.lit(1))) / 1000000).alias(
            "mean_norm"
        ),
    )
