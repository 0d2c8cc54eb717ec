"""Round-7 session batch 11 — embedding margin eval, engagement breadth,
repeat-purchase cadence, and the shingle-DF boilerplate profile, all with
full DuckDB oracle twins.

- embedding_triplet_violation_rate: margin-based embedding quality —
  for deterministic (anchor, positive, negative) triplets, how often
  cos(a, p) < cos(a, n). The retrieval companion is
  embedding_knn_label_accuracy; this one measures the METRIC structure
  directly (a space can rank neighbors correctly and still have tiny
  margins that quantization will destroy).
- events_engagement_breadth: histogram of users by how many distinct
  event types they touch — the breadth axis of engagement (frequency is
  RFM's job).
- olap_reorder_interval: per-customer consecutive-order gaps rolled up
  to exact p50/p90 cadence percentiles per market segment.
- corpus_shingle_df_profile: document-frequency histogram of 2-token
  shingles in power-of-two bins — the evidence behind every df-cap in
  the dedup family (a fat high-DF tail IS the boilerplate the caps
  guard against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texts
from . import events_table, query, table
from .llmops import SQL_NORM, SQL_SHINGLES, sql_dot, sql_md5i, sql_round, sql_toks

_EMB_DIM = 64

# ===================== triplet margin violation rate =========================

_SQL_TRIPLETS = f"""
n AS (SELECT vec_id, label, embedding AS e, {SQL_NORM} AS nrm FROM embeddings
      WHERE {SQL_NORM} > 0),
pos AS (
  SELECT vec_id, label, e, nrm,
         lead(vec_id) OVER (PARTITION BY label ORDER BY vec_id) AS pos_id
  FROM n),
half AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM n),
ranked AS (
  SELECT vec_id, row_number() OVER (ORDER BY label, vec_id) AS rn FROM n),
neg AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neg_id
  FROM ranked a CROSS JOIN half
  JOIN ranked b ON b.rn = (a.rn - 1 + cnt // 2) % cnt + 1)"""


@query(
    "embedding_triplet_violation_rate",
    f"""
WITH {_SQL_TRIPLETS},
t AS (
  SELECT p.label AS label,
         {sql_round(f"{sql_dot('p.e', 'pp.e', _EMB_DIM)} / (p.nrm * pp.nrm)", 6)}
           AS cos_pos,
         {sql_round(f"{sql_dot('p.e', 'nn.e', _EMB_DIM)} / (p.nrm * nn.nrm)", 6)}
           AS cos_neg
  FROM pos p
  JOIN pos pp ON p.pos_id = pp.vec_id
  JOIN neg ON p.vec_id = neg.vec_id
  JOIN pos nn ON neg.neg_id = nn.vec_id
  WHERE p.pos_id IS NOT NULL AND nn.label <> p.label)
SELECT label, CAST(count(*) AS BIGINT) AS n_triplets,
       CAST(count(*) FILTER (WHERE cos_pos < cos_neg) AS BIGINT) AS n_violations,
       round(CAST(count(*) FILTER (WHERE cos_pos < cos_neg) AS DOUBLE)
             / count(*) * 1000000) / 1000000 AS violation_rate
FROM t GROUP BY label
""",
)
def embedding_triplet_violation_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet margin audit: anchor = each vector, positive = the next
    vec_id within its label, negative = the antipodal vector (rank + n/2
    in (label, vec_id) order; kept only when its label differs — the
    label-major ordering guarantees the antipodal partner lands in a
    DIFFERENT label block whenever no label holds half the corpus, so
    the triplet set stays non-degenerate under replicated or
    label-periodic corpora) — both pairings deterministic, so the
    triplet set is identical across engines and runs. A violation is cos(anchor, positive) <
    cos(anchor, negative) at 1e-6-rounded cosines: random vectors
    violate ~half the time, a trained space far less. Plan: one label
    window + one global-rank join at the VECTOR grain (ids only), then
    three id-keyed joins re-attach vectors; cosines are per-row
    left-to-right folds (linear in corpus size — the gemm kernel is for
    corpus x corpus scans, not row-aligned pairs)."""
    emb = table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    n = emb.select("vec_id", "label", "embedding", norm.alias("nrm")).where(
        F.col("nrm") > 0
    )
    pos = n.select(
        "vec_id",
        "label",
        "embedding",
        "nrm",
        F.lead("vec_id").over(Window.partitionBy("label").orderBy("vec_id")).alias("pos_id"),
    )
    # r9: exact global rank via partition-offset ranking (ranking.py) —
    # the vec-grain Window.orderBy with no partition key was a
    # single-task sort of the whole embedding corpus
    from ..operators import ranking as _ranking

    ranked, _ = _ranking.global_ranks(
        n.select("vec_id", "label"), "label", "vec_id", rank_col="rn"
    )
    ranked = ranked.select("vec_id", "rn")
    cnt = n.agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    a = ranked.crossJoin(F.broadcast(cnt)).select(
        "vec_id",
        ((F.col("rn") - 1 + F.expr("cnt div 2")) % F.col("cnt") + 1).alias("nrn"),
    )
    neg = a.join(
        ranked.select(F.col("vec_id").alias("neg_id"), F.col("rn").alias("nrn")), "nrn"
    ).select("vec_id", "neg_id")

    def fold_dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    pp = pos.select(
        F.col("vec_id").alias("pos_id"),
        F.col("embedding").alias("pe"),
        F.col("nrm").alias("pn"),
    )
    nn = pos.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("ne"),
        F.col("nrm").alias("nn_"),
    )
    t = (
        pos.where(F.col("pos_id").isNotNull())
        .join(pp, "pos_id")
        .join(neg, "vec_id")
        .join(nn, "neg_id")
        .where(F.col("neg_label") != F.col("label"))
        .select(
            "label",
            (F.round(fold_dot(F.col("embedding"), F.col("pe")) / (F.col("nrm") * F.col("pn")) * 1000000) / 1000000).alias("cos_pos"),
            (F.round(fold_dot(F.col("embedding"), F.col("ne")) / (F.col("nrm") * F.col("nn_")) * 1000000) / 1000000).alias("cos_neg"),
        )
    )
    return t.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_triplets"),
        F.sum(F.when(F.col("cos_pos") < F.col("cos_neg"), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
        (
            F.round(
                F.sum(F.when(F.col("cos_pos") < F.col("cos_neg"), 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1))
                * 1000000
            )
            / 1000000
        ).alias("violation_rate"),
    )


# ========================= engagement breadth ================================


@query(
    "events_engagement_breadth",
    """
WITH b AS (
  SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS breadth
  FROM events GROUP BY user_id)
SELECT breadth, CAST(count(*) AS BIGINT) AS n_users
FROM b GROUP BY breadth
""",
)
def events_engagement_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-breadth histogram: how many users touch exactly k
    distinct event types. Breadth complements RFM's frequency/monetary
    axes (a 1-type power user and a 5-type explorer need different
    products). One (user, type) distinct reduce + a |types|-sized
    histogram rollup."""
    ev = events_table(spark, sf_dir)
    b = ev.groupBy("user_id").agg(
        F.count_distinct("event_type").cast("long").alias("breadth")
    )
    return b.groupBy("breadth").agg(F.count(F.lit(1)).cast("long").alias("n_users"))


# ========================= reorder cadence percentiles =======================


@query(
    "olap_reorder_interval",
    """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         lag(CAST(o_orderdate AS DATE)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_d
  FROM orders),
g AS (
  SELECT o_custkey, CAST(datediff('day', prev_d, d) AS BIGINT) AS gap_days
  FROM o WHERE prev_d IS NOT NULL)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_gaps,
       quantile_cont(gap_days, 0.5) AS p50_gap_days,
       quantile_cont(gap_days, 0.9) AS p90_gap_days
FROM g JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def olap_reorder_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: exact p50/p90 of the days between a
    customer's consecutive orders, per market segment. One customer
    window pass (lag, ties broken by orderkey), integer day gaps, a
    broadcast customer-dim join, |segments| percentile groups — the
    dyadic/interpolated percentile pairing the family already pins."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        orders.select(
            "o_custkey",
            F.to_date("o_orderdate").alias("d"),
            F.lag(F.to_date("o_orderdate")).over(w).alias("prev_d"),
        )
        .where(F.col("prev_d").isNotNull())
        .select("o_custkey", F.datediff("d", "prev_d").cast("long").alias("gap_days"))
    )
    return (
        g.join(F.broadcast(cust), g.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.expr("percentile(gap_days, 0.5)").alias("p50_gap_days"),
            F.expr("percentile(gap_days, 0.9)").alias("p90_gap_days"),
        )
    )


# ========================= shingle DF boilerplate profile ====================


@query(
    "corpus_shingle_df_profile",
    f"""
WITH toks AS (SELECT doc_id, {sql_toks('text')} AS t FROM documents),
sh AS (SELECT doc_id, {SQL_SHINGLES} AS s FROM toks),
df AS (
  SELECT h, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest([{sql_md5i('x')} for x in s]) AS h
        FROM sh WHERE len(s) > 0)
  GROUP BY h)
SELECT CAST(length(bin(df)) AS BIGINT) AS df_bucket,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(min(df) AS BIGINT) AS min_df,
       CAST(max(df) AS BIGINT) AS max_df
FROM df GROUP BY df_bucket
""",
)
def corpus_shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency histogram of the dedup family's 2-token
    shingles, in exact power-of-two bins (length(bin(df))): the
    boilerplate evidence behind every df-cap — a key shared by 2^k docs
    fans out 4^k candidate pairs, so the mass sitting in high buckets is
    exactly the quadratic risk the caps (dedup_ngram_jaccard's
    stop-shingle cap, corpus_cross_source_dupes' df-cap) remove.

    Runs over the SAME md5 shingle-hash relation minhash uses
    (texts.pd_shingle_hashes, the Arrow kernel — the JVM string-shingle
    expression measured 123 s at 100k docs, the kernel seconds; the
    hashes are already per-doc-distinct, so df is a plain count). One
    explode + one hash-keyed count shuffle + a <=40-bucket rollup."""
    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", texts.pd_shingle_hashes(texts.tokens("text")).alias("hs")
    ).where(F.size("hs") > 0)
    df = (
        sh.select(F.explode("hs").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return df.groupBy(F.length(F.bin("df")).cast("long").alias("df_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.min("df").cast("long").alias("min_df"),
        F.max("df").cast("long").alias("max_df"),
    )
