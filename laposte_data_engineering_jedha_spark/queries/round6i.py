"""Round-6 session batch 10 — iterative linear algebra with integer-exact
cross-engine arithmetic:

embedding_power_iteration runs TWO matrix-free power-iteration steps for
the corpus covariance's dominant direction (v <- X^T (X v)), entirely in
integer arithmetic: vectors are grid-quantized (the shared
floor(x*1000+0.5) convention), the start vector is the pinned basis e_1,
and the intermediate vector is rescaled by an integer right-shift
(v div 2^20) between iterations so the second pass stays inside BIGINT —
a deterministic substitute for float normalization that both engines
compute identically. The same trick generalizes: any fixed number of
Krylov/power steps can be made oracle-checkable by pinning the start and
rescaling with integer shifts.

The distributed shape IS the classic map-reduce power iteration: per-row
dot products (map), a 64-key (dim, partial-sum) aggregate (reduce),
result broadcast back for the next step. No driver-side linear algebra,
no collect of anything wider than one 64-long vector per iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

_DIM = 64
_GRID = 1000
_SHIFT = 1 << 20

_SQL_Q = (
    "[CAST(floor(CAST(x AS DOUBLE) * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " for x in embedding]"
)


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[{a}[i] * {b}[i] for i in range(1, {_DIM + 1})]), (s, x) -> s + x)"
    )


_POWER_SQL = f"""
WITH q AS (SELECT vec_id, {_SQL_Q} AS q FROM embeddings),
s1 AS (SELECT vec_id, q, q[1] AS s FROM q),
d1 AS (SELECT u.pos AS pos, CAST(sum(u.x * s) AS BIGINT) AS v
       FROM (SELECT s, unnest(range(1, {_DIM + 1})) AS pos, unnest(q) AS x
             FROM s1) u
       GROUP BY u.pos),
v1 AS (SELECT list(v // {_SHIFT} ORDER BY pos) AS v FROM d1),
s2 AS (SELECT vec_id, q, {_sql_dot('q', 'v1.v')} AS s FROM q, v1),
d2 AS (SELECT u.pos AS pos, CAST(sum(u.x * s) AS BIGINT) AS v
       FROM (SELECT s, unnest(range(1, {_DIM + 1})) AS pos, unnest(q) AS x
             FROM s2) u
       GROUP BY u.pos)
SELECT CAST(pos AS INTEGER) AS dim, v AS component,
       CAST(abs(v) AS BIGINT) AS magnitude
FROM d2 ORDER BY magnitude DESC, dim LIMIT 8
"""


@query("embedding_power_iteration", _POWER_SQL)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two matrix-free power-iteration steps toward the dominant
    eigen-direction of X^T X over grid-quantized embeddings, start vector
    pinned to basis e_1: s_i = x_i . v (map), v'_j = sum_i x_ij * s_i (a
    64-group reduce), integer right-shift rescale (div 2^20) between
    steps to stay in BIGINT. Output: the top-8 dimensions of the
    iteration-2 vector by magnitude — the 'dominant direction' report a
    drift monitor or PCA-whitening pipeline starts from. Overflow budget:
    |q| <= ~1e3, |v1| <= n*64e6 -> shifted <= n*61; |v2| <= n^2 * 64e3 *
    61e3-ish — inside 2^63 up to n ~ 10^6 vectors; beyond that, shift
    wider (the shift amount is the ONLY scale knob, and it is exact)."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _GRID + F.lit(0.5)).cast("long"),
        ).alias("q"),
    )

    def xt_x_v(pts: DataFrame, s: Column) -> DataFrame:
        """One power step: given per-row scalar s = x.v, return the
        64-row (pos, v) relation v_j = sum_i x_ij * s_i."""
        return (
            pts.select(s.alias("s"), F.posexplode("q").alias("pos", "x"))
            .groupBy("pos")
            .agg(F.sum(F.col("x") * F.col("s")).alias("v"))
        )

    d1 = xt_x_v(q, F.col("q")[0])
    # the shifted v1 as a single-row 64-long array (sorted-collect rebuild)
    v1 = (
        d1.select("pos", F.expr(f"v div {_SHIFT}").alias("vs"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "vs"))),
                lambda t: t["vs"],
            ).alias("v")
        )
    )
    s2 = q.crossJoin(F.broadcast(v1)).select(
        "q",
        F.aggregate(
            F.zip_with("q", "v", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("s"),
    )
    d2 = xt_x_v(s2, F.col("s"))
    return (
        d2.select(
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.col("v").alias("component"),
            F.abs("v").cast("long").alias("magnitude"),
        )
        .orderBy(F.col("magnitude").desc(), "dim")
        .limit(8)
    )
