"""Round-13 session batch 13 — auto-banded scale twins for the kNN-graph
family (the gap scripts/semdedup_decade.py measured):

The registered knn_graph / dedup_semantic use the FIXTURE-PINNED 4x6
banding (64 buckets per band). The semdedup decade ladder ran that
configuration at 200k vectors and measured the saturation auto-banding
exists to prevent: 3.1k occupancy against the 256-per-bucket candidate
cap, planted-pair capture dropping to 8224/10000
(.scale/semdedup_decade_fixedband.json). Same story — and same fix — as
dedup_embedding_cosine -> dedup_embedding_cosine_auto (round 12):

- knn_graph_auto: the corpus top-3 neighbor graph with planes =
  auto_band_planes(count(*)) — expected bucket occupancy pinned at ~64
  regardless of corpus size, so candidate mass stays ~linear and the
  cap stops biting. count(*) sizes the planes on BOTH engines.
- dedup_semantic_auto: the full SemDeDup composition (auto-banded graph
  -> cosine >= 0.4 edges -> connected components -> survivor
  selection) — the production semantic-dedup surface; the pinned
  dedup_semantic stays registered as the fixture-scale regression row.

At fixture scale (n <= 4096 with floor 4 planes... in fact n/64 <= 64)
auto planes == the pinned 6 only when n == 4096; the fixture sizes give
planes = 4-5, so these twins carry their own hash rows rather than
aliasing the pinned ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, similarity
from . import query, table, table_rowcount
from .llmops import (
    _GRAPH_BANDS,
    SQL_NORM,
    _sql_band_key,
    sql_dot,
    sql_round,
)
from .round12a import _SQL_AUTO_PLANES

# the graph CTE block of llmops._SQL_KNN_GRAPH_CTES with the band width
# COMPUTED from count(*) (np CTE) instead of the pinned constant
_SQL_KNN_AUTO_CTES = f"""np AS ({_SQL_AUTO_PLANES}),
n AS (SELECT vec_id, embedding AS e, {SQL_NORM} AS nrm FROM embeddings),
nb AS (SELECT vec_id, e, nrm, CAST(r.range AS BIGINT) AS band, planes
       FROM n CROSS JOIN np CROSS JOIN range(0, {_GRAPH_BANDS}) r
       WHERE nrm > 0),
cb AS (SELECT vec_id, e, nrm, band, {_sql_band_key('e', 'planes')} AS key
       FROM nb),
capped AS (
  SELECT *, row_number() OVER (
    PARTITION BY band, key ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS _r
  FROM cb),
gpairs AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id,
         {sql_round(f"{sql_dot('a.e', 'b.e')} / (a.nrm * b.nrm)", 6)} AS cosine
  FROM cb a JOIN capped b ON a.band = b.band AND a.key = b.key
  WHERE b._r <= 256 AND a.vec_id <> b.vec_id),
granked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM gpairs),
knn AS (SELECT query_id, cand_id, cosine, rank FROM granked WHERE rank <= 3)"""


def _auto_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    planes = dedup.auto_band_planes(table_rowcount(spark, sf_dir, "embeddings"))
    return similarity.knn_graph(
        emb, k=3, dim=64, bands=_GRAPH_BANDS, band_planes=planes
    )


@query(
    "knn_graph_auto",
    f"""
WITH {_SQL_KNN_AUTO_CTES}
SELECT query_id, cand_id, cosine, rank FROM knn""",
)
def knn_graph_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide approximate top-3 neighbor graph with COUNT-DERIVED
    band width (planes = auto_band_planes(count(*)), the same gate as
    dedup_embedding_cosine_auto): expected bucket occupancy stays ~64
    as the corpus grows, so the 256-cap never saturates and candidate
    mass stays ~linear. The semdedup decade ladder measured the pinned
    twin's failure mode at 200k vectors (capture 0.82,
    .scale/semdedup_decade_fixedband.json) — this is the configuration
    a production SemDeDup run uses. One column-pruned count() sizes the
    planes identically in both engines."""
    return _auto_graph(spark, sf_dir)


@query(
    "dedup_semantic_auto",
    f"""
WITH RECURSIVE {_SQL_KNN_AUTO_CTES},
sedges0 AS (
  SELECT DISTINCT least(query_id, cand_id) AS id_a,
                  greatest(query_id, cand_id) AS id_b
  FROM knn WHERE cosine >= CAST(0.4 AS DOUBLE)),
sedges AS (SELECT id_a AS u, id_b AS v FROM sedges0
           UNION SELECT id_b, id_a FROM sedges0),
sreach(node, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sedges) s
  UNION
  SELECT sreach.node, e.v FROM sreach JOIN sedges e ON sreach.r = e.u),
scomp AS (SELECT node AS vec_id, min(r) AS cluster_id FROM sreach GROUP BY node)
SELECT emb.vec_id, CAST(coalesce(sz.cluster_size, 1) AS BIGINT) AS cluster_size
FROM embeddings emb
LEFT JOIN scomp c ON emb.vec_id = c.vec_id
LEFT JOIN (SELECT cluster_id, count(*) AS cluster_size FROM scomp GROUP BY 1) sz
  ON c.cluster_id = sz.cluster_id
WHERE c.vec_id IS NULL OR c.cluster_id = emb.vec_id""",
)
def dedup_semantic_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the auto-banded graph — the production semantic
    dedup surface (the pinned dedup_semantic stays as the fixture-scale
    regression row). Composition unchanged: cosine >= 0.4 kNN edges ->
    connected components (pointer jumping, localCheckpoint per round)
    -> one survivor per cluster with its cluster size. Decade evidence
    for this exact configuration: scripts/semdedup_decade.py (capture
    recovered vs the pinned twin's 0.82 at 200k vectors)."""
    g = _auto_graph(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    pairs = (
        g.where(F.col("cosine") >= 0.4)
        .select(
            F.least("query_id", "cand_id").alias("id_a"),
            F.greatest("query_id", "cand_id").alias("id_b"),
        )
        .distinct()
    )
    cc = dedup.connected_components(pairs).withColumnRenamed("node", "vec_id")
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        emb.select("vec_id")
        .join(cc, "vec_id", "left")
        .where(F.col("component").isNull() | (F.col("component") == F.col("vec_id")))
        .join(sizes, "component", "left")
        .select("vec_id", F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"))
    )
