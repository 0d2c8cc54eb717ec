"""Round-9 session batch 3 — five new analytic shapes:

- sketch_kmv_union: MERGEABLE distinct sketches — per-source KMV
  sketches unioned by merging the k-min SETS (never re-scanning raw
  data), the distributed-sketch property that lets 1000 executors
  sketch shards independently and a coordinator merge results.
- events_survival_hazard: Kaplan-Meier-style discrete hazard table of
  user lifetime (churn analysis at day-since-first-seen grain) —
  integer at-risk/churn counts, ppm hazard.
- events_hashed_features: the hashing-trick featurizer ((type, hour,
  isodow) -> md5 -> 32 buckets) with per-bucket collision stats — the
  fixed-width feature encoder every large-scale training pipeline uses
  for unbounded categorical crosses.
- embedding_dim_stats: per-dimension quantized first/second moments of
  the embedding matrix (the feature-space health check: dead dims,
  scale drift) — exact BIGINT sums of floor(x*2^20+0.5) on both
  engines (the pinned-Lloyd quantization convention).
- eval_knn_label_precision: retrieval quality — label precision of the
  exact top-5 neighbors per pinned query (the eval loop behind
  embedding-model selection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import similarity
from . import events_table, query, table
from .llmops import _SQL_KNN_BASE, sql_dot, sql_round

# ========================= mergeable KMV union ===============================

_KMVU_K = 16
_KMVU_NUM = (_KMVU_K - 1) * (1 << 52)
_KMVU_HV = "CAST('0x' || substr(md5(text), 1, 13) AS BIGINT)"


@query(
    "sketch_kmv_union",
    f"""
WITH h AS (SELECT DISTINCT source, {_KMVU_HV} AS hv FROM documents),
r AS (SELECT source, hv,
             row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
      FROM h),
mins AS (SELECT source, hv FROM r WHERE rn <= {_KMVU_K}),
per AS (SELECT source AS scope, max(hv) AS kth, count(*) AS kcnt
        FROM mins GROUP BY source),
-- the union sketch merges the per-source k-min SETS, not the raw data
umins AS (SELECT hv FROM (
    SELECT DISTINCT hv FROM mins) u ORDER BY hv LIMIT {_KMVU_K}),
uni AS (SELECT 'ALL' AS scope, max(hv) AS kth, count(*) AS kcnt FROM umins),
ex AS (SELECT source AS scope, count(*) AS n_exact FROM h GROUP BY source
       UNION ALL
       SELECT 'ALL', count(DISTINCT hv) FROM h),
s AS (SELECT * FROM per UNION ALL SELECT * FROM uni)
SELECT ex.scope AS scope, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(CASE WHEN kcnt < {_KMVU_K} THEN kcnt
                 ELSE {_KMVU_NUM} // kth END AS BIGINT) AS kmv_est
FROM ex JOIN s ON ex.scope = s.scope
""",
)
def sketch_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KMV distinct-document sketches plus their UNION, where
    the union sketch is built by merging the per-source k-min sets (the
    k smallest of the merged mins == the k smallest of the merged
    corpora, since every corpus-level minimum is inside its source's
    k-min set). This is the mergeability contract that makes KMV a
    distributed sketch: shards sketch independently, merge cost is
    O(sources * k). Exact counts ride along as the audit column; the
    52-bit md5 hash space makes both engines' sketches identical."""
    docs = table(spark, sf_dir, "documents")
    h = docs.select(
        "source",
        F.conv(F.substring(F.md5("text"), 1, 13), 16, 10).cast("long").alias("hv"),
    ).distinct()
    lvl1 = Window.partitionBy("source", F.pmod("hv", F.lit(16))).orderBy("hv")
    lvl2 = Window.partitionBy("source").orderBy("hv")
    mins = (
        h.withColumn("_r1", F.row_number().over(lvl1))
        .where(F.col("_r1") <= _KMVU_K)
        .withColumn("_r2", F.row_number().over(lvl2))
        .where(F.col("_r2") <= _KMVU_K)
        .select("source", "hv")
    )
    per = mins.groupBy(F.col("source").alias("scope")).agg(
        F.max("hv").alias("kth"), F.count(F.lit(1)).alias("kcnt")
    )
    # union sketch from the sketches only: sources x k rows, driver-tiny
    # relation but kept distributed (sort+limit is a TakeOrdered, no fat task)
    umins = mins.select("hv").distinct().orderBy("hv").limit(_KMVU_K)
    uni = umins.agg(
        F.lit("ALL").alias("scope"),
        F.max("hv").alias("kth"),
        F.count(F.lit(1)).alias("kcnt"),
    )
    ex = h.groupBy(F.col("source").alias("scope")).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    ).unionAll(
        h.select("hv").distinct().agg(
            F.lit("ALL").alias("scope"), F.count(F.lit(1)).cast("long").alias("n_exact")
        )
    )
    s = per.unionAll(uni)
    return ex.join(s, "scope").select(
        "scope",
        "n_exact",
        F.when(F.col("kcnt") < _KMVU_K, F.col("kcnt"))
        .otherwise(F.expr(f"CAST({_KMVU_NUM} AS BIGINT) div kth"))
        .cast("long")
        .alias("kmv_est"),
    )


# ========================= survival hazard ===================================

_SURV_DAY_US = 86_400_000_000
_SURV_CHURN_US = 86_400_000_000  # inactive > 24 h at horizon = churned


@query(
    "events_survival_hazard",
    f"""
WITH u AS (
  SELECT user_id, epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us
  FROM events GROUP BY user_id),
g AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS horizon_us FROM events),
l AS (
  SELECT (last_us - first_us) // {_SURV_DAY_US} AS lifetime_day,
         CASE WHEN last_us < horizon_us - {_SURV_CHURN_US} THEN 1 ELSE 0 END AS churned
  FROM u CROSS JOIN g),
d AS (
  SELECT lifetime_day, CAST(count(*) AS BIGINT) AS n_end,
         CAST(sum(churned) AS BIGINT) AS n_churned
  FROM l GROUP BY lifetime_day),
r AS (
  SELECT lifetime_day, n_churned,
         CAST(sum(n_end) OVER (ORDER BY lifetime_day DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_at_risk
  FROM d)
SELECT CAST(lifetime_day AS BIGINT) AS lifetime_day, n_at_risk, n_churned,
       CAST(n_churned * 1000000 // n_at_risk AS BIGINT) AS hazard_ppm
FROM r
""",
)
def events_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style discrete hazard table over user lifetimes:
    lifetime = whole days between a user's first and last event; a user
    is an EVENT (churned) if their last event predates the corpus
    horizon by more than 24 h, otherwise right-censored (still active —
    counts in the at-risk denominator through their observed lifetime,
    never in the churn numerator: the standard KM treatment). Hazard at
    day d = churners with lifetime d / users with lifetime >= d. One
    user-grain aggregate; the at-risk cumulative runs DESCENDING over
    the day spine — bounded by the corpus time span, not corpus size
    (the round7g day-grain window precedent)."""
    ev = events_table(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.unix_micros(F.max("ts")).alias("last_us"),
    )
    g = ev.agg(F.max(F.unix_micros("ts")).cast("long").alias("horizon_us"))
    life = u.crossJoin(F.broadcast(g)).select(
        F.expr(f"(last_us - first_us) div {_SURV_DAY_US}").alias("lifetime_day"),
        F.when(
            F.col("last_us") < F.col("horizon_us") - _SURV_CHURN_US, 1
        ).otherwise(0).alias("churned"),
    )
    d = life.groupBy("lifetime_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_end"),
        F.sum("churned").cast("long").alias("n_churned"),
    )
    w = Window.orderBy(F.col("lifetime_day").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return d.select(
        F.col("lifetime_day").cast("long").alias("lifetime_day"),
        F.sum("n_end").over(w).cast("long").alias("n_at_risk"),
        "n_churned",
        F.expr("(n_churned * 1000000) div (sum(n_end) OVER (ORDER BY lifetime_day DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))")
        .cast("long")
        .alias("hazard_ppm"),
    )


# ========================= hashing-trick features ============================

_HASH_BUCKETS = 32


@query(
    "events_hashed_features",
    f"""
WITH f AS (
  SELECT user_id,
         CAST('0x' || substr(md5(event_type || '|' ||
                CAST(hour(ts) AS VARCHAR) || '|' ||
                CAST(isodow(ts) AS VARCHAR)), 1, 13) AS BIGINT)
           % {_HASH_BUCKETS} AS bucket
  FROM events)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM f GROUP BY bucket
""",
)
def events_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: the unbounded categorical cross (event_type x
    hour-of-day x iso-weekday) hashed into a FIXED 32-bucket feature
    space (md5, 52-bit prefix, mod buckets) — the encoder that gives
    every row a bounded-width feature vector with no vocabulary fit, no
    dictionary shuffle, and graceful collision degradation. Registered
    at bucket grain (collision/occupancy stats, the encoder audit); the
    per-user feature matrix is the same expression grouped by user.
    Purely map-side hashing + one aggregate; both engines compute the
    identical md5, so bucket ids hash-match."""
    ev = events_table(spark, sf_dir)
    feat = F.concat_ws(
        "|",
        F.col("event_type"),
        F.hour("ts").cast("string"),
        (F.weekday("ts") + 1).cast("string"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(feat), 1, 13), 16, 10).cast("long"),
        F.lit(_HASH_BUCKETS),
    )
    return (
        ev.select(bucket.alias("bucket"), "user_id")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(F.col("bucket").cast("long").alias("bucket"), "n_events", "n_users")
    )


# ========================= embedding dimension stats =========================

_DIMQ = 1 << 20  # the pinned-Lloyd quantization grid
_EMB_DIM_STATS = 64


@query(
    "embedding_dim_stats",
    f"""
WITH x AS (
  SELECT CAST(r.range + 1 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[r.range + 1] AS DOUBLE) * {_DIMQ} + 0.5)
              AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, {_EMB_DIM_STATS}) r)
SELECT dim, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum(q) * 1000000 // count(*) AS BIGINT) AS mean_q_ppm,
       CAST(sum(q * q) // count(*) AS BIGINT) AS m2_q
FROM x GROUP BY dim
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension first/second moments of the embedding matrix — the
    feature-space health check (dead dimensions, scale drift between
    model versions, anisotropy). Components quantize to the pinned-Lloyd
    grid (floor(x * 2^20 + 0.5): exact BIGINT arithmetic on both
    engines, no float-sum order sensitivity); one posexplode + one
    64-group aggregate, fully map-side combinable — the plan is a
    single Exchange carrying 64 rows at any corpus size."""
    emb = table(spark, sf_dir, "embeddings")
    q = F.floor(F.col("x").cast("double") * _DIMQ + F.lit(0.5)).cast("long")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "x"))
        .select((F.col("pos") + 1).cast("long").alias("dim"), q.alias("q"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("q").cast("long").alias("sum_q"),
            F.expr("(sum(q) * 1000000) div count(*)").cast("long").alias("mean_q_ppm"),
            F.expr("sum(q * q) div count(*)").cast("long").alias("m2_q"),
        )
    )


# ========================= kNN label precision ===============================

_PREC_K = 5


@query(
    "eval_knn_label_precision",
    f"""
WITH {_SQL_KNN_BASE},
pairs AS (
  SELECT query_id, c.vec_id AS cand_id,
         {sql_round(f"{sql_dot('qe', 'c.e')} / (qn * c.nrm)", 6)} AS cosine
  FROM n c CROSS JOIN q WHERE c.vec_id <> query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id)
            AS rank
  FROM pairs),
top AS (SELECT query_id, cand_id FROM ranked WHERE rank <= {_PREC_K}),
lab AS (SELECT vec_id, label FROM embeddings)
SELECT t.query_id AS query_id,
       CAST(ql.label AS BIGINT) AS label,
       CAST(sum(CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(sum(CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS precision_ppm
FROM top t
JOIN lab ql ON t.query_id = ql.vec_id
JOIN lab cl ON t.cand_id = cl.vec_id
GROUP BY t.query_id, ql.label
""",
)
def eval_knn_label_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label precision@5 of exact cosine retrieval for the pinned query
    slice (vec_id < 8): the retrieval-eval loop behind embedding-model
    and index-parameter selection ('do my neighbors share my label?').
    Reuses the brute-force top-k operator (broadcast queries, windowed
    per-query top-k — no global sort), then two broadcast label joins
    and an 8-group rollup. Integer ppm, one final integer division."""
    emb = table(spark, sf_dir, "embeddings")
    top = similarity.brute_force_knn(emb, emb.where(F.col("vec_id") < 8), k=_PREC_K)
    lab = emb.select("vec_id", "label")
    ql = lab.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"))
    cl = lab.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("clabel"))
    match = F.when(F.col("clabel") == F.col("qlabel"), 1).otherwise(0)
    return (
        top.join(F.broadcast(ql), "query_id")
        .join(F.broadcast(cl), "cand_id")
        .groupBy("query_id", F.col("qlabel").cast("long").alias("label"))
        .agg(
            F.sum(match).cast("long").alias("n_match"),
            F.expr(
                "(sum(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END) * 1000000)"
                " div count(*)"
            )
            .cast("long")
            .alias("precision_ppm"),
        )
    )
