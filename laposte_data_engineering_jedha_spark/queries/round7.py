"""Round-7 registry extensions.

Headline: `ivf_knn` graduates from rows-only to a full DuckDB hash row.
The production operator (operators/similarity.py:ivf_knn) keeps its
iterative k-means coarse quantizer; the REGISTERED query now runs the
complete IVF retrieval path — assign -> probe -> exact cosine re-rank ->
top-k — against the closed-form pinned codebook
(similarity.pinned_codebook), which makes every stage SQL-expressible:

- assignment / probe routing reuses the `_spark_d2` / `_spark_argmin`
  Catalyst folds from round5 (bit-identical across engines — proven by
  ivf_assign_pinned's green hash rows since r05);
- the cosine re-rank reuses the Arrow-gemm-kernel + round-to-1e-6
  convention that knn_brute_force / knn_lsh have hash-matched against the
  fold-based DuckDB twin since r04.

This cleared the last rows-only registry entry that had no hash row of
its own end-to-end shape except embedding_pq_codes — which graduated in
round 8 via the pinned Lloyd fit (queries/round4.py,
similarity.pq_fit_lloyd_pinned), leaving zero rows-only entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors
from ..operators import similarity
from . import query, table
from .llmops import SQL_NORM, sql_dot, sql_round
from .round5 import _EMB_DIM, _IVF_K, _spark_argmin, _spark_d2, _sql_argmin, _sql_d2

_IVF_PROBE = 4
_IVF_TOPK = 5

_SQL_PROBES = (
    "list_transform(list_sort(["
    + ", ".join(f"{{'d': {_sql_d2(0, c, _EMB_DIM)}, 'c': {c}}}" for c in range(_IVF_K))
    + f"])[1:{_IVF_PROBE}], s -> CAST(s['c'] AS INTEGER))"
)

_IVF_KNN_SQL = f"""
WITH n AS (SELECT vec_id, embedding, {SQL_NORM} AS nrm FROM embeddings
           WHERE {SQL_NORM} > 0),
cand AS (SELECT vec_id, embedding AS cv, nrm AS cn,
                CAST({_sql_argmin(0, _IVF_K, _EMB_DIM)} AS INTEGER) AS centroid
         FROM n),
qp AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn,
              unnest({_SQL_PROBES}) AS centroid
       FROM n WHERE vec_id < 8),
pairs AS (
  SELECT query_id, c.vec_id AS cand_id,
         {sql_round(f"{sql_dot('qv', 'c.cv', _EMB_DIM)} / (qn * c.cn)", 6)} AS cosine
  FROM cand c JOIN qp USING (centroid) WHERE c.vec_id <> query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id)
            AS rank
  FROM pairs)
SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= {_IVF_TOPK}"""


def _probe_array() -> F.Column:
    """The `n_probe` nearest pinned-centroid ids, nearest first — a struct
    array_sort (lexicographic on (d2, c), same as DuckDB list_sort) over the
    16 Catalyst d2 folds, sliced and projected to ids."""
    structs = F.array(
        *[
            F.struct(_spark_d2(0, c, _EMB_DIM).alias("d"), F.lit(c).alias("c"))
            for c in range(_IVF_K)
        ]
    )
    return F.transform(
        F.slice(F.array_sort(structs), 1, _IVF_PROBE), lambda s: s["c"].cast("int")
    )


@query("ivf_knn", _IVF_KNN_SQL)
def ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 over the PINNED 16-centroid codebook — the
    full retrieval path (coarse assign, probe the query's 4 nearest lists,
    exact cosine re-rank, windowed top-k) as one hash-checkable query.

    Shape is identical to the production operator
    (operators/similarity.py:ivf_knn, which fits its quantizer with
    seeded k-means and routes via the Arrow nearest-centroid kernel): the
    corpus gets one map-side nearest-centroid pass, the tiny probe side is
    broadcast, and the only shuffle is the per-query top-k window. At
    100 TB the corpus never reshuffles and the index "build" is
    embarrassingly parallel. The fitted-quantizer variant stays
    recall-tested against brute force in tests/test_llmops.py."""
    books = similarity.pinned_codebook(1, _IVF_K, _EMB_DIM)[0]
    emb = table(spark, sf_dir, "embeddings")
    n = emb.select(
        "vec_id", "embedding", vectors.pd_norm("embedding").alias("nrm")
    ).where(F.col("nrm") > 0)
    # fold-faithful Arrow kernels (bit-identical to _spark_argmin /
    # _probe_array — tests/test_round5.py pins both) replace the
    # interpreted Catalyst folds: assignment + probe routing were ~90% of
    # this query's 3.7 s at sf0.1.
    cand = n.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        F.col("nrm").alias("cn"),
        vectors.pd_fold_assign_d2("embedding", books)["centroid"].alias("centroid"),
    )
    qry = n.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
        F.explode(
            vectors.pd_fold_topn_centroids("embedding", books, _IVF_PROBE)
        ).alias("centroid"),
    )
    cos = vectors.pd_dot("qv", "cv") / (F.col("qn") * F.col("cn"))
    pairs = (
        cand.join(F.broadcast(qry), "centroid")
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            (F.round(cos * 1000000) / 1000000).alias("cosine"),
        )
    )
    return similarity._ranked_topk(pairs, _IVF_TOPK)
