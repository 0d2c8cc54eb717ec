"""Round-10 session batch 4 — training-data packing + exact grouped
quantiles:

- corpus_token_budget_batches: sequential first-fit packing of documents
  into training batches under a token budget — the data-loader step
  between a cleaned corpus and the trainer. The running token total over
  doc_id order comes from the gated ranking.global_prefix_sum (window
  form under the gate at fixture scale, partition-offset above), so the
  batch boundary is exact at any corpus size; batch id is pure
  arithmetic on the running sum.
- olap_exact_grouped_quantiles: EXACT interpolated quartiles of order
  value per order priority (Spark `percentile`, DuckDB `quantile_cont` —
  the same type-7 interpolation) computed on integer cents so the
  interpolation arithmetic is exact in both engines. The exact-sort
  cousin of the approx sketch queries; per-group sorts are partitioned
  by the 5-value priority key, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ranking
from . import query, table
from .llmops import sql_round

# ===================== token-budget batch packing =============================

_TBB_BUDGET = 4096  # tokens per training batch


@query(
    "corpus_token_budget_batches",
    f"""
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t),
b AS (SELECT doc_id, n_tokens, (cum - 1) // {_TBB_BUDGET} AS batch_id FROM c)
SELECT CAST(batch_id AS BIGINT) AS batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM b GROUP BY batch_id
""",
)
def corpus_token_budget_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the corpus into training batches of <= {_TBB_BUDGET} tokens
    (whitespace tokens; the generator's texts are single-space joined)
    by doc_id order: batch_id = (running_total - 1) div budget — the
    deterministic first-fit packing a distributed data loader applies
    before sharding batches to trainers. The running total is the gated
    global prefix sum (operators/ranking.py): exact at any scale, no
    single fat sort task above the gate. Report at batch grain with doc
    spans, so a repacking regression shows as a hash change."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    cum = ranking.global_prefix_sum(docs, "n_tokens", "doc_id", out_col="cum")
    b = cum.withColumn(
        "batch_id", F.expr(f"(cum - 1) div {_TBB_BUDGET}").cast("long")
    )
    return b.groupBy("batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


# ===================== exact grouped quantiles ================================

_EGQ_PROBS = [0.25, 0.5, 0.75]


@query(
    "olap_exact_grouped_quantiles",
    f"""
WITH c AS (SELECT o_orderpriority AS priority,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n,
       {", ".join(
           f"{sql_round(f'quantile_cont(cents, {p})', 2)} AS q{int(p * 100)}"
           for p in _EGQ_PROBS
       )}
FROM c GROUP BY priority
""",
)
def olap_exact_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quartiles of order value (integer cents) per
    order priority — Spark's `percentile` and DuckDB's `quantile_cont`
    share the type-7 linear interpolation, and on BIGINT cents the
    interpolation arithmetic (integer + fraction * integer gap) is
    exactly representable, so the values hash-match without an epsilon.
    The exact cousin of the sketch quantile queries: per-group sort
    partitioned by the 5-value priority key (never a global sort), one
    shuffle, 5-row output. At 100 TB this is the shape where exactness
    is still affordable BECAUSE the group key bounds the sort grain."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for p in _EGQ_PROBS:
        aggs.append(
            (F.round(F.expr(f"percentile(cents, {p})") * 100) / 100).alias(
                f"q{int(p * 100)}"
            )
        )
    return o.groupBy("priority").agg(*aggs)
