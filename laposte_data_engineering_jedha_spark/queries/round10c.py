"""Round-10 session batch 3 — embedding-eval and data-profiling
primitives:

- eval_matryoshka_prefix_recall: recall@k of TRUNCATED-dimension
  retrieval vs full-dimension exact retrieval — the measurement behind
  Matryoshka-style (prefix-nested) embeddings, where a 100 TB ANN tier
  serves the first d' dims and a re-rank tier the full vector. Exact
  top-5 both ways (the corpus never shuffles — queries broadcast), then
  a per-query overlap count.
- dq_functional_dependency: X -> Y functional-dependency audit over the
  denormalized customer->nation->region view: for each candidate
  dependency, how many LHS values map to more than one RHS value (the
  schema-inference / normalization primitive). One groupBy per
  dependency at LHS grain, map-side partials, a few-row report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from .llmops import SQL_NORM, sql_dot, sql_round

# ===================== matryoshka prefix recall ===============================

_MAT_DIM = 16  # prefix dims (full = 64)
_MAT_K = 5
_MAT_Q_LO, _MAT_Q_HI = 16, 24  # a query slice unused by the other knn rows

_SQL_NORM16 = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    f"[CAST(embedding[i] AS DOUBLE) * embedding[i] for i in range(1, {_MAT_DIM + 1})]), "
    "(a, x) -> a + x))"
)


@query(
    "eval_matryoshka_prefix_recall",
    f"""
WITH n AS (SELECT vec_id, embedding AS e, {SQL_NORM} AS nrm,
                  {_SQL_NORM16} AS nrm16
           FROM embeddings WHERE {SQL_NORM} > 0 AND {_SQL_NORM16} > 0),
q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, nrm16 AS qn16 FROM n
      WHERE vec_id >= {_MAT_Q_LO} AND vec_id < {_MAT_Q_HI}),
fp AS (SELECT query_id, c.vec_id AS cand_id,
              {sql_round(f"{sql_dot('qe', 'c.e')} / (qn * c.nrm)", 6)} AS cosine
       FROM n c CROSS JOIN q WHERE c.vec_id <> query_id),
fr AS (SELECT query_id, cand_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rank
       FROM fp),
full_k AS (SELECT query_id, cand_id FROM fr WHERE rank <= {_MAT_K}),
pp AS (SELECT query_id, c.vec_id AS cand_id,
              {sql_round(f"{sql_dot('qe', 'c.e', _MAT_DIM)} / (qn16 * c.nrm16)", 6)}
                AS cosine
       FROM n c CROSS JOIN q WHERE c.vec_id <> query_id),
pr AS (SELECT query_id, cand_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rank
       FROM pp),
pre_k AS (SELECT query_id, cand_id FROM pr WHERE rank <= {_MAT_K}),
ov AS (SELECT f.query_id, count(*) AS n_overlap
       FROM full_k f JOIN pre_k p
         ON f.query_id = p.query_id AND f.cand_id = p.cand_id
       GROUP BY f.query_id)
SELECT q.query_id AS query_id,
       CAST(COALESCE(n_overlap, 0) AS BIGINT) AS n_overlap,
       {sql_round(f"COALESCE(n_overlap, 0) * 1.0 / {_MAT_K}", 6)} AS recall
FROM q LEFT JOIN ov ON q.query_id = ov.query_id
""",
)
def eval_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_MAT_K} of {_MAT_DIM}-dim PREFIX retrieval against
    full-64-dim exact retrieval for the pinned query slice — the
    accuracy/cost curve point that justifies (or kills) serving a
    truncated-embedding ANN tier at 100 TB (prefix dims cost 4x less
    memory bandwidth per probe). Both sides are exact brute-force top-k
    with the corpus never shuffling (queries broadcast, per-query top-k
    window); the overlap join is at (query, cand) grain — {_MAT_K}*|q|
    rows. Rounded-cosine ties break on cand_id in both engines, the
    established knn-oracle construction."""
    from pyspark.sql import Window

    from ..functions import vectors

    emb = table(spark, sf_dir, "embeddings")
    # ONE corpus pass computing BOTH cosines (r11 verdict item 4 follow-up:
    # the two-brute_force_knn form scanned the corpus twice and ran two
    # per-query top-k exchanges; round-12 profiling put it at the top of
    # the cross-round outlier list). Same rounding (1e-6) and tie order
    # (cosine desc, cand_id), so full/prefix top-k sets — and therefore
    # the recall rows — are bit-identical to the previous plan and to the
    # SQL twin; a row in both top-ks is exactly one overlap member.
    sides = []
    for id_alias, v, n, n16 in (
        ("cand_id", "cv", "cn", "cn16"),
        ("query_id", "qv", "qn", "qn16"),
    ):
        sides.append(
            emb.select(
                F.col("vec_id").alias(id_alias),
                F.col("embedding").alias(v),
                vectors.pd_norm("embedding").alias(n),
                F.sqrt(
                    F.aggregate(
                        F.slice("embedding", 1, _MAT_DIM),
                        F.lit(0.0),
                        lambda a, x: a + x.cast("double") * x.cast("double"),
                    )
                ).alias(n16),
            ).where((F.col(n) > 0) & (F.col(n16) > 0))
        )
    cand, qry = sides
    q_pred = (F.col("query_id") >= _MAT_Q_LO) & (F.col("query_id") < _MAT_Q_HI)
    qry = qry.where(q_pred)
    cos_full = vectors.pd_dot("qv", "cv") / (F.col("qn") * F.col("cn"))
    cos_pre = vectors.pd_dot("qv16", "cv16") / (F.col("qn16") * F.col("cn16"))
    pairs = (
        cand.crossJoin(F.broadcast(qry))
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("qv16", F.slice("qv", 1, _MAT_DIM))
        .withColumn("cv16", F.slice("cv", 1, _MAT_DIM))
        .select(
            "query_id",
            "cand_id",
            (F.round(cos_full * 1e6) / 1e6).alias("cos_full"),
            (F.round(cos_pre * 1e6) / 1e6).alias("cos_pre"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("cos_full").desc(), "cand_id")
    wp = Window.partitionBy("query_id").orderBy(F.col("cos_pre").desc(), "cand_id")
    ov = (
        pairs.withColumn("rf", F.row_number().over(wf))
        .withColumn("rp", F.row_number().over(wp))
        .where((F.col("rf") <= _MAT_K) & (F.col("rp") <= _MAT_K))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    queries = qry.select("query_id")
    return (
        queries.join(ov, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (
                F.round(
                    F.coalesce("n_overlap", F.lit(0)) * 1.0 / _MAT_K * 1e6
                )
                / 1e6
            ).alias("recall"),
        )
    )


# ===================== functional-dependency audit ============================

_FD_DEPS = [
    # (name, lhs expr, rhs expr) over the denormalized view — the first
    # two hold by construction (star-schema FKs), the third is planted to
    # violate (a market segment spans many nations)
    ("nation_to_region", "n_name", "r_name"),
    ("custkey_to_nation", "c_custkey", "n_name"),
    ("segment_to_nation", "c_mktsegment", "n_name"),
]


@query(
    "dq_functional_dependency",
    "\nUNION ALL\n".join(
        f"""
SELECT '{name}' AS dependency,
       CAST(count(*) AS BIGINT) AS n_lhs_values,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_lhs,
       CAST(max(n_rhs) AS BIGINT) AS max_rhs_per_lhs
FROM (SELECT {lhs} AS l, count(DISTINCT {rhs}) AS n_rhs
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1)"""
        for name, lhs, rhs in _FD_DEPS
    ),
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit X -> Y over the denormalized
    customer->nation->region view: per candidate dependency, the number
    of LHS values mapping to more than one RHS value (zero == the FD
    holds — the schema-inference / normalization-check primitive; a
    violated 'key' FD is how silently-denormalized 100 TB lakes rot).
    nation->region and custkey->nation hold by star-schema construction;
    segment->nation is planted to violate. Dims broadcast onto the
    customer scan; one LHS-grain aggregate per dependency with map-side
    partials; 3-row report."""
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    base = cust.join(
        F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"]
    ).join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
    parts = []
    for name, lhs, rhs in _FD_DEPS:
        g = base.groupBy(F.col(lhs).alias("l")).agg(
            F.countDistinct(rhs).alias("n_rhs")
        )
        parts.append(
            g.agg(
                F.lit(name).alias("dependency"),
                F.count(F.lit(1)).cast("long").alias("n_lhs_values"),
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_lhs"),
                F.max("n_rhs").cast("long").alias("max_rhs_per_lhs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
