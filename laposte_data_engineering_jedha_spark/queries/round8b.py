"""Round-8 session batch 2 — mixture weighting + vector-index health:

- corpus_sampling_weights_sqrt: temperature-scaled (alpha = 0.5) source
  sampling weights — the multinomial upsampling math every multi-source
  pretraining mix runs (rare sources upweighted, dominant ones damped).
  alpha = 0.5 deliberately: sqrt is IEEE correctly-rounded on BOTH
  engines (pow(x, 0.7) is libm-dependent), and the weights quantize to
  integers BEFORE the normalizing sum, so nothing float ever crosses a
  group boundary.
- embedding_quantization_error_histogram: power-of-two histogram of each
  vector's distance to its nearest pinned IVF centroid — the quantizer
  drift monitor (bit-length bucketing, the olap_order_value_log2_histogram
  idiom: no libm log).
- embedding_centroid_margin_profile: per-vector routing-confidence margin
  (second-nearest minus nearest centroid d2) bucketed the same way — low
  margins are the vectors n_probe must rescue.
- embedding_label_centroid_purity: per pinned cell, size and majority-
  label share (ppm) — clustering purity of the coarse quantizer against
  the fixture labels.

Assignment math runs the fold-faithful Arrow kernels
(vectors.pd_fold_assign_d2 / pd_fold_d2_tables), bit-identical to the
`_sql_d2` folds the oracles mirror (tests/test_round5.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors
from ..operators import similarity
from . import query, table
from .round5 import _EMB_DIM, _IVF_K, _sql_d2

# ========================= sqrt sampling weights =============================


@query(
    "corpus_sampling_weights_sqrt",
    """
WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source),
q AS (SELECT source, n_docs,
             CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS sq
      FROM s),
t AS (SELECT CAST(sum(sq) AS BIGINT) AS total FROM q)
SELECT source, n_docs,
       CAST(sq * 1000000 // total AS BIGINT) AS weight_ppm
FROM q CROSS JOIN t
""",
)
def corpus_sampling_weights_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source multinomial sampling weights at temperature alpha = 0.5:
    weight ∝ sqrt(n_docs), normalized to integer ppm. sqrt of an integer
    is correctly rounded (IEEE) on both engines and each term quantizes
    to a BIGINT before the normalizing sum, so the denominator is an
    exact integer regardless of aggregation order. One |sources|-row
    aggregate + a broadcast 1-row total."""
    s = table(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    q = s.select(
        "source",
        "n_docs",
        F.round(F.sqrt(F.col("n_docs").cast("double")) * 1000000)
        .cast("long")
        .alias("sq"),
    )
    t = q.agg(F.sum("sq").cast("long").alias("total"))
    return q.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.expr("(sq * 1000000) div total").cast("long").alias("weight_ppm"),
    )


# ==================== quantization-error log2 histogram ======================

_SQL_MIN_D2 = "least(" + ", ".join(_sql_d2(0, c, _EMB_DIM) for c in range(_IVF_K)) + ")"


@query(
    "embedding_quantization_error_histogram",
    f"""
WITH a AS (
  SELECT CAST(round({_SQL_MIN_D2} * 1000000) AS BIGINT) AS q
  FROM embeddings),
b AS (SELECT q // 250000 AS bucket FROM a)
SELECT CAST(bucket AS BIGINT) AS bucket,
       round(CAST(bucket AS DOUBLE) / 4 * 100) / 100 AS lo_d2,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM b GROUP BY bucket
""",
)
def embedding_quantization_error_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram of each vector's squared distance to its nearest pinned
    IVF centroid in 0.25-wide d2 buckets (micro-quantized then integer
    floor division — unit-norm vectors put d2 in a ~[1, 4] band, so
    linear buckets resolve what a log scale collapses). The right tail is
    the quantizer-drift signal: vectors far from every centroid are the
    ones a re-train would move. One Arrow kernel pass, one bounded
    rollup."""
    books = similarity.pinned_codebook(1, _IVF_K, _EMB_DIM)[0]
    emb = table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.round(vectors.pd_fold_assign_d2("embedding", books)["d2"] * 1000000)
        .cast("long")
        .alias("q")
    )
    b = a.select(F.expr("q div 250000").alias("bucket"))
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            (F.round(F.col("bucket").cast("double") / 4 * 100) / 100).alias("lo_d2"),
            "n_vectors",
        )
    )


# ======================= routing-margin profile ==============================

_SQL_D2_LIST = "[" + ", ".join(_sql_d2(0, c, _EMB_DIM) for c in range(_IVF_K)) + "]"


@query(
    "embedding_centroid_margin_profile",
    f"""
WITH s AS (SELECT list_sort({_SQL_D2_LIST}) AS d FROM embeddings),
m AS (SELECT greatest(CAST(round((d[2] - d[1]) * 1000000) AS BIGINT), 1) AS q
      FROM s),
b AS (SELECT CAST(length(bin(q)) AS BIGINT) AS bucket FROM m)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors
FROM b GROUP BY bucket
""",
)
def embedding_centroid_margin_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing-confidence margin of the pinned coarse quantizer: per
    vector, (second-nearest - nearest) centroid d2, micro-quantized and
    bucketed by bit length. Vectors in the low buckets sit on Voronoi
    boundaries — exactly the recall n_probe > 1 buys back; the profile
    sizes that trade. The 16 fold distances come from one Arrow kernel
    pass (pd_fold_d2_tables with the 1-subspace codebook); the sort is a
    16-element array op."""
    books = similarity.pinned_codebook(1, _IVF_K, _EMB_DIM)
    emb = table(spark, sf_dir, "embeddings")
    s = emb.select(
        F.array_sort(
            F.element_at(vectors.pd_fold_d2_tables("embedding", books), 1)
        ).alias("d")
    )
    m = s.select(
        F.greatest(
            F.round((F.element_at("d", 2) - F.element_at("d", 1)) * 1000000).cast(
                "long"
            ),
            F.lit(1),
        ).alias("q")
    )
    b = m.select(F.length(F.bin("q")).cast("long").alias("bucket"))
    return b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))


# ======================== label purity per cell ==============================

_SQL_ARGMIN_IVF = (
    "list_min(["
    + ", ".join(f"{{'d': {_sql_d2(0, c, _EMB_DIM)}, 'c': {c}}}" for c in range(_IVF_K))
    + "])['c']"
)


@query(
    "embedding_label_centroid_purity",
    f"""
WITH a AS (
  SELECT CAST({_SQL_ARGMIN_IVF} AS BIGINT) AS cell, label FROM embeddings),
c AS (SELECT cell, label, CAST(count(*) AS BIGINT) AS n
      FROM a GROUP BY cell, label),
p AS (SELECT cell, CAST(sum(n) AS BIGINT) AS cell_size,
             CAST(max(n) AS BIGINT) AS majority_n
      FROM c GROUP BY cell)
SELECT cell, cell_size, majority_n,
       CAST(majority_n * 1000000 // cell_size AS BIGINT) AS purity_ppm
FROM p
""",
)
def embedding_label_centroid_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-quantizer purity against the fixture labels: per pinned IVF
    cell, its size, the majority label's count, and integer-ppm purity —
    the quality scalar for 'do the cells mean anything semantically'.
    Kernel assignment + two bounded rollups ((cell, label) then cell);
    nothing beyond |cells x labels| rows ever shuffles."""
    books = similarity.pinned_codebook(1, _IVF_K, _EMB_DIM)[0]
    emb = table(spark, sf_dir, "embeddings")
    a = emb.select(
        vectors.pd_fold_assign_d2("embedding", books)["centroid"]
        .cast("long")
        .alias("cell"),
        "label",
    )
    c = a.groupBy("cell", "label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    p = c.groupBy("cell").agg(
        F.sum("n").cast("long").alias("cell_size"),
        F.max("n").cast("long").alias("majority_n"),
    )
    return p.select(
        "cell",
        "cell_size",
        "majority_n",
        F.expr("(majority_n * 1000000) div cell_size").cast("long").alias("purity_ppm"),
    )
