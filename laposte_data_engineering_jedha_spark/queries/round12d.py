"""Round-12 session batch 4 — join planning inputs + referential audits
+ deterministic sampling, all integer-exact across engines:

- dq_order_total_drift: does o_totalprice still equal the sum of its
  line items' charges? The classic cross-table consistency audit, in
  exact cents: per-order drift = |sum(round(extprice*(1-disc)*(1+tax),
  2) in cents) - total cents|, reported as drifting-order count plus
  exact drift magnitude buckets (powers of 10 by integer width).
- olap_join_skew_report: per-key frequency skew of the orders->customer
  join key — the number AQE's skew-join and manual salting decisions
  are made from. Top heavy keys by exact count with the max/mean skew
  ratio carried as one rounded division.
- corpus_fixed_n_hash_sample: EXACTLY-N deterministic corpus sample by
  md5 rank (rate-based hash sampling — corpus_hash_sample — returns a
  binomially-varying count; audits and eval panels need exactly N).
  Rank over (md5(doc_id), doc_id) via the gated offsets machinery, so
  the sample is stable under any partitioning and the plan never sorts
  a single partition at scale.
- embedding_cosine_histogram: the corpus's pairwise-cosine geometry
  profile over a deterministic hash-gated pair sample (the
  olap_join_size_estimate gate shape: pairs whose joint hash lands
  under the gate — 1/{_CH_RATE} of the pair space — so the histogram
  costs O(n^2/{_CH_RATE}) instead of O(n^2); bucket ids by truncating
  integer division on 1e-6-rounded cosines, bit-deterministic).

Reference parity note: extension surface (the reference has no join
planner inputs, sampling, or embedding ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors
from ..operators import ranking
from . import query, table
from .llmops import SQL_NORM, sql_dot, sql_round

# ========================== order total drift =================================


@query(
    "dq_order_total_drift",
    """
WITH li AS (
  SELECT l_orderkey AS k,
         CAST(sum(CAST(round(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) * 100)
                       AS BIGINT)) AS BIGINT) AS line_cents
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT o_orderkey,
         abs(CAST(round(o_totalprice * 100) AS BIGINT) - line_cents) AS drift
  FROM orders JOIN li ON o_orderkey = li.k)
SELECT CAST(count(*) AS BIGINT) AS n_orders_joined,
       CAST(sum(CASE WHEN drift = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN drift BETWEEN 1 AND 99 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_drift_under_1,
       CAST(sum(CASE WHEN drift >= 100 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_drift_1_or_more,
       CAST(max(drift) AS BIGINT) AS max_drift_cents
FROM j
""",
)
def dq_order_total_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential consistency: o_totalprice vs the exact
    cents sum of its lines' charges (extprice * (1-disc) * (1+tax),
    rounded to 2dp per line — the TPC-H charge formula). The fixture
    generator draws totals and lines independently, so the drift is
    LARGE by construction; the query's value is the audit shape: one
    keyed aggregate at order grain + one key join, drift carried as an
    exact BIGINT everywhere (the per-line 2dp round happens before the
    cents conversion, so both engines sum identical integers), bucketed
    by magnitude for the report. At 100 TB this is the nightly
    invariant job between a fact table and its rollup."""
    li = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.sum(
                F.round(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax")),
                        2,
                    )
                    * 100
                ).cast("long")
            )
            .cast("long")
            .alias("line_cents")
        )
    )
    j = (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
        )
        .join(li, F.col("o_orderkey") == F.col("k"))
        .select(F.abs(F.col("total_cents") - F.col("line_cents")).alias("drift"))
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders_joined"),
        F.sum(F.when(F.col("drift") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(F.when((F.col("drift") >= 1) & (F.col("drift") <= 99), 1).otherwise(0))
        .cast("long")
        .alias("n_drift_under_1"),
        F.sum(F.when(F.col("drift") >= 100, 1).otherwise(0))
        .cast("long")
        .alias("n_drift_1_or_more"),
        F.max("drift").cast("long").alias("max_drift_cents"),
    )


# ============================ join skew report ================================

_SKEW_TOPK = 10


@query(
    "olap_join_skew_report",
    f"""
WITH oc AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY o_custkey),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(max(n) AS BIGINT) AS max_n
        FROM oc),
top AS (SELECT k, n, row_number() OVER (ORDER BY n DESC, k) AS r FROM oc)
SELECT k AS custkey, n AS n_orders, CAST(r AS BIGINT) AS heavy_rank,
       n_keys, n_rows,
       {sql_round("max_n * 1.0 * n_keys / n_rows", 6)} AS skew_ratio
FROM top CROSS JOIN tot
WHERE r <= {_SKEW_TOPK}
ORDER BY heavy_rank
""",
)
def olap_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for orders.o_custkey — the input to every
    skew mitigation decision (AQE skew-join thresholds, salting factor,
    broadcast cutoffs): the {_SKEW_TOPK} heaviest keys by exact count
    plus the max/mean skew ratio (max_n * n_keys / n_rows — 1.0 means
    perfectly uniform). One key-grain aggregate (map-side partials), a
    top-k TakeOrderedAndProject with (count desc, key) ties, one
    broadcast totals row; nothing scales worse than the key
    cardinality."""
    oc = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = oc.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_n"),
    )
    top = oc.orderBy(F.col("n").desc(), "k").limit(_SKEW_TOPK)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), "k")
    return (
        top.withColumn("heavy_rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").alias("custkey"),
            F.col("n").alias("n_orders"),
            "heavy_rank",
            "n_keys",
            "n_rows",
            (
                F.round(
                    F.col("max_n") * 1.0 * F.col("n_keys") / F.col("n_rows") * 1e6
                )
                / 1e6
            ).alias("skew_ratio"),
        )
        .orderBy("heavy_rank")
    )


# ======================== exactly-N hash sample ===============================

_FIX_N = 64


@query(
    "corpus_fixed_n_hash_sample",
    f"""
WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hv FROM documents),
r AS (SELECT doc_id, hv, row_number() OVER (ORDER BY hv, doc_id) AS rk FROM h)
SELECT doc_id, CAST(rk AS BIGINT) AS sample_rank
FROM r WHERE rk <= {_FIX_N}
ORDER BY sample_rank
""",
)
def corpus_fixed_n_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-{_FIX_N} deterministic document sample: rank by
    (md5(doc_id), doc_id) and keep the first {_FIX_N} — the fixed-size
    eval-panel / audit-sample primitive (rate-based corpus_hash_sample
    gives a binomially-varying count; a human-review queue or a paired
    A/B eval needs exactly N, stable across runs and partitionings).
    The global rank comes from the gated offsets machinery
    (operators/ranking.py): a plain bounded window at fixture scale, a
    repartitionByRange + per-partition-offset plan above the stats gate
    — never a naked single-partition sort over the corpus. The md5 key
    makes the sample uniform and immune to doc_id assignment order."""
    h = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hv")
    )
    ranked, _n = ranking.global_ranks(h, "hv", "doc_id", rank_col="rk")
    return (
        ranked.where(F.col("rk") <= _FIX_N)
        .select("doc_id", F.col("rk").cast("long").alias("sample_rank"))
        .orderBy("sample_rank")
    )


# ======================= pairwise cosine histogram ============================

_CH_RATE = 64  # keep ~1/64 of the pair space
_CH_GATE = (1 << 52) // _CH_RATE
_CH_HV = (
    "CAST('0x' || substr(md5(CAST(a.vec_id AS VARCHAR) || '_' "
    "|| CAST(b.vec_id AS VARCHAR)), 1, 13) AS BIGINT)"
)


@query(
    "embedding_cosine_histogram",
    f"""
WITH n AS (SELECT vec_id, embedding AS e, {SQL_NORM} AS nrm FROM embeddings
           WHERE {SQL_NORM} > 0),
p AS (
  SELECT {sql_round(f"{sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm)", 6)} AS cosine
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE {_CH_HV} < {_CH_GATE})
SELECT CAST(CAST(round(cosine * 1000000) AS BIGINT) // 100000 AS BIGINT)
         AS cos_bucket,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM p GROUP BY 1 ORDER BY cos_bucket
""",
)
def embedding_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine geometry histogram over a deterministic 1-in-
    {_CH_RATE} hash-gated sample of the pair space — the corpus-geometry
    profile that calibrates LSH plane counts and dedup thresholds
    (a mass near 1.0 = duplicate-rich corpus; tight mass near 0 =
    near-orthogonal random cloud). The gate hashes the ID PAIR, so the
    sample is uniform over pairs and reproducible in any engine; pair
    volume is n^2/{_CH_RATE} — at 100 TB the rate scales with n^2 so
    the sampled mass stays constant-size (the knob is one constant).
    Buckets truncate the 1e-6-rounded cosine at 0.1 grain (both engines
    truncate integer division toward zero — identical on negatives).
    NOTE the self-join shuffles both sides once on nothing (cartesian
    with the a<b and gate predicates pushed into the join): the gate
    keeps the OUTPUT bounded, which is what matters — the dot products
    only run on surviving pairs."""
    n = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", vectors.pd_norm("embedding").alias("nrm"))
        .where(F.col("nrm") > 0)
    )
    a = n.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    gate = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("id_a").cast("string"),
                    F.lit("_"),
                    F.col("id_b").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    cos = vectors.pd_dot("ea", "eb") / (F.col("na") * F.col("nb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(gate < _CH_GATE)
        .select((F.round(cos * 1e6) / 1e6).alias("cosine"))
    )
    return (
        pairs.select(
            F.expr("CAST(round(cosine * 1000000) AS BIGINT) div 100000")
            .cast("long")
            .alias("cos_bucket")
        )
        .groupBy("cos_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("cos_bucket")
    )
