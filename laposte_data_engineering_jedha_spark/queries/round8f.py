"""Round-8 session batch 6 — dedup topology + multimodal storage profile:

- corpus_dedup_cluster_size_histogram: the size distribution of MinHash
  near-dup clusters (connected components over verified pairs) — the
  topology view behind dedup savings estimates: many 2-clusters means
  pair-wise drops suffice, a fat tail means template families where
  keep-one-per-component is the only correct policy.
- multimodal_payload_size_percentiles: per media type, payload byte
  quartiles — the storage/layout planner's input (shard sizing, frame
  budget) over the synthetic binary-payload convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from . import query, table
from .llmops import _ROWS, _SQL_SIG, SQL_SHINGLES, sql_md5i, sql_round, sql_toks
from ..functions import texts

# ===================== dedup cluster-size histogram ==========================

_PAIRS_CTES = f"""toks AS (SELECT doc_id, {sql_toks('text')} AS t FROM documents),
sh AS (SELECT doc_id, {SQL_SHINGLES} AS s FROM toks),
sigs AS (
  SELECT doc_id, h, {_SQL_SIG} AS sig
  FROM (SELECT doc_id, [{sql_md5i('x')} for x in s] AS h FROM sh)
  WHERE len(h) > 0),
bands AS (
  SELECT doc_id, sig, h, r.range AS band,
         array_to_string(sig[r.range * {_ROWS} + 1 : r.range * {_ROWS} + {_ROWS}], '_') AS key
  FROM sigs CROSS JOIN range(0, {texts.MINHASH_BANDS}) r),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
pairs AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
      len(list_intersect(sa.h, sb.h)) AS inter, len(sa.h) AS na, len(sb.h) AS nb
    FROM cand JOIN sigs sa ON id_a = sa.doc_id JOIN sigs sb ON id_b = sb.doc_id)
  WHERE {sql_round('CAST(inter AS DOUBLE) / (na + nb - inter)', 4)} >= CAST(0.5 AS DOUBLE))"""


@query(
    "corpus_dedup_cluster_size_histogram",
    f"""
WITH RECURSIVE {_PAIRS_CTES},
sedges AS (SELECT id_a AS u, id_b AS v FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
sreach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sedges) s
  UNION
  SELECT sreach.node, e.v FROM sreach JOIN sedges e ON sreach.r = e.u),
scomp AS (SELECT node, min(r) AS cluster_id FROM sreach GROUP BY node),
sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
          FROM scomp GROUP BY cluster_id)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY cluster_size
""",
)
def corpus_dedup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Connected components over the verified MinHash near-dup pairs,
    rolled up to a (cluster_size, n_clusters) histogram — singleton docs
    (no pair) are by definition absent. Composition of two already-
    oracled operators (minhash_lsh_pairs' banded candidate+verify pass +
    connected_components' bounded label propagation); the histogram adds
    two tiny rollups. The DuckDB twin walks the same edges with a
    recursive CTE — exact reachability, no approximation on either
    side."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).select("id_a", "id_b")
    cc = dedup.connected_components(pairs)
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


# ==================== multimodal payload size quartiles ======================


@query(
    "multimodal_payload_size_percentiles",
    """
WITH b AS (
  SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents)
SELECT media_type, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       quantile_cont(n_bytes, 0.25) AS p25_bytes,
       quantile_cont(n_bytes, 0.5) AS p50_bytes,
       quantile_cont(n_bytes, 0.75) AS p75_bytes
FROM b GROUP BY media_type
""",
)
def multimodal_payload_size_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Payload byte quartiles per media type (the doc_id % 3 synthetic
    media convention shared by multimodal_frame_sample) — what sizes
    shards, frame budgets, and decode batch shapes downstream. Integer
    byte counts, exact percentiles at |media_types| grain."""
    b = table(spark, sf_dir, "documents").select(
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    return b.groupBy("media_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.expr("percentile(n_bytes, 0.25)").alias("p25_bytes"),
        F.expr("percentile(n_bytes, 0.5)").alias("p50_bytes"),
        F.expr("percentile(n_bytes, 0.75)").alias("p75_bytes"),
    )
