"""Round-13 session batch 15 — density-based clustering (DBSCAN-lite):

- embedding_dbscan_lite: DBSCAN over the embedding corpus with the
  cosine >= 0.4 neighborhood relation coming from the AUTO-BANDED
  hyperplane-LSH pair join (dedup_embedding_cosine_auto's exact
  machinery — approximate neighborhoods, exactly the trade every
  at-scale DBSCAN implementation makes): a vector is CORE if it has
  >= 3 neighbors, clusters are connected components over core-core
  edges (min-core-id labels), non-core vectors adjacent to a core are
  BORDER (assigned their minimum adjacent core's cluster — the
  deterministic resolution of DBSCAN's classic border ambiguity), and
  everything else is NOISE. Completes the clustering inventory next to
  the centroid (pq/ivf), medoid (kmedoid_step), and spectral
  (power_iteration) families with the density family — the one that
  finds non-convex clusters and flags outliers for free.

Scale shape: neighborhoods from the banded equi-join (never all-pairs,
count-derived band width), degrees one aggregate, core-core CC a
recursive min-label fold (oracle) / pointer jumping (Spark), border
resolution one join. Everything integer or 4-decimal cosine.

Reference parity note: the reference has no clustering surface;
extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from . import query, table, table_rowcount
from .llmops import _EMB_BANDS, SQL_NORM, _sql_band_key, sql_dot, sql_round
from .round12a import _SQL_AUTO_PLANES

_DB_EPS = 0.4  # cosine neighborhood threshold (shared with the dedup family)
_DB_MINPTS = 3  # neighbors (excluding self) required for a core point


@query(
    "embedding_dbscan_lite",
    f"""
WITH RECURSIVE np AS ({_SQL_AUTO_PLANES}),
n AS MATERIALIZED (SELECT vec_id, embedding AS e, {SQL_NORM} AS nrm FROM embeddings
      WHERE {SQL_NORM} > 0),
keyed AS MATERIALIZED (
  SELECT vec_id, band, {_sql_band_key('e', 'planes')} AS key
  FROM (SELECT vec_id, e, CAST(r.range AS BIGINT) AS band, planes
        FROM n CROSS JOIN np CROSS JOIN range(0, {_EMB_BANDS}) r)),
cand AS MATERIALIZED (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keyed a JOIN keyed b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
pairs AS MATERIALIZED (
  SELECT id_a, id_b
  FROM (SELECT id_a, id_b,
               {sql_round(f"{sql_dot('va.e', 'vb.e')} / (va.nrm * vb.nrm)", 4)}
                 AS cosine
        FROM cand JOIN n va ON id_a = va.vec_id JOIN n vb ON id_b = vb.vec_id)
  WHERE cosine >= CAST({_DB_EPS} AS DOUBLE)),
sym AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
core AS MATERIALIZED (SELECT u FROM deg WHERE d >= {_DB_MINPTS}),
ce AS MATERIALIZED (SELECT s.u, s.v FROM sym s
       WHERE s.u IN (SELECT u FROM core) AND s.v IN (SELECT u FROM core)),
reach(node, r) AS (
  SELECT u, u FROM core
  UNION
  SELECT reach.node, e.v FROM reach JOIN ce e ON reach.r = e.u),
comp AS MATERIALIZED (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
border AS MATERIALIZED (
  SELECT s.u AS node, min(c.cluster_id) AS cluster_id
  FROM sym s JOIN comp c ON s.v = c.node
  WHERE s.u NOT IN (SELECT u FROM core)
  GROUP BY s.u)
SELECT emb.vec_id,
       CASE WHEN comp.node IS NOT NULL THEN 'core'
            WHEN border.node IS NOT NULL THEN 'border'
            ELSE 'noise' END AS label,
       CAST(coalesce(comp.cluster_id, border.cluster_id) AS BIGINT)
         AS cluster_id
FROM embeddings emb
LEFT JOIN comp ON emb.vec_id = comp.node
LEFT JOIN border ON emb.vec_id = border.node""",
)
def embedding_dbscan_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over embeddings (eps: cosine >= {_DB_EPS}, minPts
    {_DB_MINPTS}, neighborhoods from the auto-banded LSH pair join):
    per vector its label (core / border / noise) and cluster id (the
    minimum core vec_id of its component; border points take the
    minimum adjacent core's cluster — deterministic; noise gets NULL).
    Plan: banded candidate equi-join (count-derived planes — never
    all-pairs), one degree aggregate, pointer-jumping connected
    components over core-core edges only (typically a small fraction of
    the corpus), one border-resolution join, and a left-join back to
    every vector. The oracle mirrors it with a recursive min-label
    CTE."""
    emb = table(spark, sf_dir, "embeddings")
    planes = dedup.auto_band_planes(table_rowcount(spark, sf_dir, "embeddings"))
    from ..operators import caches

    # the verified pair relation feeds FOUR consumers (degrees, both
    # core-core semi-joins via sym, border resolution) — persist so the
    # banded candidate join + cosine verify run once (measured 33 s ->
    # ~14 s at sf1); tracked for batch-runner reclamation
    pairs = caches.track(
        dedup.embedding_dup_pairs_lsh(
            emb,
            threshold=_DB_EPS,
            bands=_EMB_BANDS,
            band_planes=planes,
            persist_banded=False,
        )
        .select("id_a", "id_b")
        .persist()
    )
    sym = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).unionAll(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    core = deg.where(F.col("d") >= _DB_MINPTS).select("u")
    ce = (
        sym.join(core.withColumnRenamed("u", "cu"), sym["u"] == F.col("cu"), "left_semi")
        .join(core.withColumnRenamed("u", "cv"), sym["v"] == F.col("cv"), "left_semi")
        .select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    # CC only labels nodes that appear in an edge; a core whose
    # neighbors are all non-core has no core-core edge and forms its
    # own singleton cluster (the oracle's reach seeds from every core)
    cc = dedup.connected_components(ce)
    lone = (
        core.withColumnRenamed("u", "node")
        .join(cc.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    comp = cc.unionByName(lone)
    border = (
        sym.join(comp.withColumnRenamed("node", "v"), "v")
        .join(core.withColumnRenamed("u", "cu"), sym["u"] == F.col("cu"), "left_anti")
        .groupBy("u")
        .agg(F.min("component").alias("b_cluster"))
        .withColumnRenamed("u", "vec_id")
    )
    comp_v = comp.select(
        F.col("node").alias("vec_id"), F.col("component").alias("c_cluster")
    )
    return (
        emb.select("vec_id")
        .join(comp_v, "vec_id", "left")
        .join(border, "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("c_cluster").isNotNull(), "core")
            .when(F.col("b_cluster").isNotNull(), "border")
            .otherwise("noise")
            .alias("label"),
            F.coalesce("c_cluster", "b_cluster").cast("long").alias("cluster_id"),
        )
    )
