"""Round-5 registry extensions.

Pinned-codebook verification twins for the vector-quantization operators:
`ivf_knn` / `embedding_pq_codes` stay rows-only (their k-means *fits* are
iterative), but the expensive-at-scale part — the per-row assignment /
encode math — is deterministic given a codebook, so these twins run it
against the closed-form `similarity.pinned_codebook` and earn full DuckDB
hash rows.

Cross-engine float discipline: every distance is a left-to-right fold
(`F.aggregate` with 0.0 init == DuckDB `list_reduce` with 0.0 prepend) over
terms built from exact-in-binary codebook values (multiples of 1/8), so the
doubles are bit-identical across engines and the argmin needs no tolerance.
Ties (impossible with these codebooks, but pinned anyway) resolve to the
lowest centroid id via lexicographic struct min on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from . import query, table

_EMB_DIM = 64  # fixture embedding dimensionality (TESTDATA.md)


def _spark_d2(j: int, c: int, sub: int) -> F.Column:
    """Left-to-right fold of squared diffs between the j-th subvector and
    pinned centroid c: sum_d (emb[j*sub+d] - val(j,c,d))^2 with
    val = (((c*sub + d + j*31) % 17) - 8) / 8."""
    base = c * sub + j * 31

    def step(acc: F.Column, d: F.Column) -> F.Column:
        val = ((F.lit(base) + d) % 17 - 8) / F.lit(8.0)
        diff = F.element_at("embedding", (F.lit(j * sub) + d + 1).cast("int")).cast(
            "double"
        ) - val
        return acc + diff * diff

    return F.aggregate(F.sequence(F.lit(0), F.lit(sub - 1)), F.lit(0.0), step)


def _sql_d2(j: int, c: int, sub: int) -> str:
    base = c * sub + j * 31
    diff = (
        f"(CAST(embedding[{j * sub} + d + 1] AS DOUBLE)"
        f" - ((({base} + d) % 17 - 8) / CAST(8.0 AS DOUBLE)))"
    )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(0, {sub}), d -> {diff} * {diff})), "
        f"(a, b) -> a + b)"
    )


def _spark_argmin(j: int, k: int, sub: int) -> F.Column:
    """Lowest-distance centroid id (ties -> lowest id) via lexicographic
    struct min — Spark and DuckDB both order structs field-by-field."""
    return F.array_min(
        F.array(
            *[
                F.struct(_spark_d2(j, c, sub).alias("d"), F.lit(c).alias("c"))
                for c in range(k)
            ]
        )
    )["c"]


def _sql_argmin(j: int, k: int, sub: int) -> str:
    items = ", ".join(f"{{'d': {_sql_d2(j, c, sub)}, 'c': {c}}}" for c in range(k))
    return f"list_min([{items}])['c']"


_PQ_M, _PQ_K = 4, 16
_PQ_SUB = _EMB_DIM // _PQ_M

_PQ_SQL = "SELECT vec_id, " + ", ".join(
    f"CAST({_sql_argmin(j, _PQ_K, _PQ_SUB)} AS INTEGER) AS code{j}" for j in range(_PQ_M)
) + " FROM embeddings"


@query("embedding_pq_encode_pinned", _PQ_SQL)
def embedding_pq_encode_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode (4 subspaces x 16 centroids) against the closed-form
    pinned codebook — the hash-checkable twin of embedding_pq_codes'
    encode stage (whose fitted codebook has no SQL twin). Pure Catalyst:
    per-row fold + struct-min, no shuffle at any scale; the Arrow kernel
    (similarity.pq_encode) is pinned equal on the same codebook in
    tests/test_round5.py."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        *[
            _spark_argmin(j, _PQ_K, _PQ_SUB).cast("int").alias(f"code{j}")
            for j in range(_PQ_M)
        ],
    )


_IVF_K = 16

_IVF_SQL = (
    "SELECT vec_id, "
    f"CAST({_sql_argmin(0, _IVF_K, _EMB_DIM)} AS INTEGER) AS centroid, "
    f"round(least({', '.join(_sql_d2(0, c, _EMB_DIM) for c in range(_IVF_K))})"
    " * 1000000) / 1000000 AS d2"
    " FROM embeddings"
)


@query("ivf_assign_pinned", _IVF_SQL)
def ivf_assign_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer assignment against 16 pinned 64-dim centroids —
    the hash-checkable twin of ivf_knn's assignment stage (its k-means fit
    is iterative, hence rows-only). Map-side only: at 100 TB this is the
    exact shape of the index build — one narrow pass, codebook in the
    expression tree, no shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    d2s = [_spark_d2(0, c, _EMB_DIM) for c in range(_IVF_K)]
    return emb.select(
        "vec_id",
        _spark_argmin(0, _IVF_K, _EMB_DIM).cast("int").alias("centroid"),
        (F.round(F.least(*d2s) * 1000000) / 1000000).alias("d2"),
    )
