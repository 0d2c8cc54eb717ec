"""Round-7 session batch 15 — cross-table status consistency and the
per-source quality mixture view, both with full DuckDB oracle twins.

- dq_order_line_status_consistency: orders whose header status
  contradicts their line statuses (an 'F'inished order with any 'O'pen
  line, an 'O'pen order with no open line) — the cross-table semantic
  DQ gate that row-level checks (dq_orders_checks / dq_lineitem_checks)
  cannot see. The synthetic fixture IS inconsistent here (statuses are
  drawn independently), which is exactly what the report must surface.
- corpus_quality_percentiles_by_source: p25/p50/p75 of the shared
  heuristic quality score per source — the mixture-balance view behind
  per-source quality thresholds (a global cutoff deletes whole sources
  when their quality distributions differ; this report shows by how
  much).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texts
from . import query, table
from .llmops import sql_quality

# ===================== order/line status consistency =========================


@query(
    "dq_order_line_status_consistency",
    """
WITH l AS (
  SELECT l_orderkey,
         CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS n_open,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT o_orderstatus AS status, n_open, n_lines
  FROM orders JOIN l ON o_orderkey = l_orderkey)
SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE status = 'F' AND n_open > 0) AS BIGINT)
         AS n_finished_with_open_lines,
       CAST(count(*) FILTER (WHERE status = 'O' AND n_open = 0) AS BIGINT)
         AS n_open_fully_shipped,
       round(CAST(count(*) FILTER (WHERE (status = 'F' AND n_open > 0)
                                      OR (status = 'O' AND n_open = 0))
                  AS DOUBLE) / count(*) * 1000000) / 1000000
         AS inconsistency_rate
FROM j GROUP BY status
""",
)
def dq_order_line_status_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table status reconciliation: per header status, how many
    orders contradict their own lines ('F' with open lines, 'O' with
    none). Row-level DQ gates validate each table alone; this is the
    JOIN-level invariant a partial load or out-of-order CDC apply
    breaks first. One line-grain aggregate co-partitioned with the
    orderkey join; counts integral, one final rate division. (The
    synthetic fixture draws the two statuses independently, so the
    report correctly shows a large inconsistency mass — the point of
    the gate, same as the lineitem composite-key dup finding.)"""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    l = li.groupBy("l_orderkey").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0))
        .cast("long")
        .alias("n_open"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    j = orders.join(l, orders.o_orderkey == l.l_orderkey).select(
        F.col("o_orderstatus").alias("status"), "n_open", "n_lines"
    )
    bad_f = (F.col("status") == "F") & (F.col("n_open") > 0)
    bad_o = (F.col("status") == "O") & (F.col("n_open") == 0)
    return j.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(bad_f, 1).otherwise(0))
        .cast("long")
        .alias("n_finished_with_open_lines"),
        F.sum(F.when(bad_o, 1).otherwise(0)).cast("long").alias("n_open_fully_shipped"),
        (
            F.round(
                F.sum(F.when(bad_f | bad_o, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
                * 1000000
            )
            / 1000000
        ).alias("inconsistency_rate"),
    )


# ==================== quality percentiles by source ==========================


@query(
    "corpus_quality_percentiles_by_source",
    f"""
WITH q AS (
  SELECT d.source AS source, qq.quality AS quality
  FROM documents d JOIN {sql_quality()} qq USING (doc_id))
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       quantile_cont(quality, 0.25) AS p25,
       quantile_cont(quality, 0.5) AS p50,
       quantile_cont(quality, 0.75) AS p75
FROM q GROUP BY source
""",
)
def corpus_quality_percentiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score quartiles per source (the shared heuristic score,
    rounded at 4 decimals like every quality query): the view that
    justifies per-source thresholds — if web p50 sits where book p25
    does, a single global cutoff silently deletes most of one source.
    One quality pass (pure Catalyst signals) + |sources| percentile
    groups; the dyadic-fraction interpolation over 4dp-stable doubles
    is the established cross-engine pairing."""
    docs = table(spark, sf_dir, "documents")
    q = docs.select(
        "source",
        (F.round(texts.quality_score("text") * 10000) / 10000).alias("quality"),
    )
    return q.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("percentile(quality, 0.25)").alias("p25"),
        F.expr("percentile(quality, 0.5)").alias("p50"),
        F.expr("percentile(quality, 0.75)").alias("p75"),
    )
