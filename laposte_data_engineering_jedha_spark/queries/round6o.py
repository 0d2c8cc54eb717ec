"""Round-6 session batch 16 — distribution-shift measurement with a full
DuckDB oracle twin.

corpus_source_tv_distance: total-variation distance between each source's
unigram distribution and the whole-corpus distribution, over the global
top-64 vocabulary plus an OTHER bucket. TV = 1/2 * sum_i |p_i - q_i| is
the one divergence that needs NO logarithms, so it can be computed
EXACTLY in integers: |c_i/M - g_i/N| = |c_i*N - g_i*M| / (M*N) puts every
term over the common denominator M*N — integer numerators sum exactly,
and the single final division is the only float op. (KL/JS would drag in
log, whose JVM-vs-libm last bits are exactly what this registry avoids.)
The report ranks sources by how far their vocabulary drifts from the
corpus mixture — the distribution-shift gate before a source's weight is
raised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texts
from . import query, table
from .llmops import sql_toks

_TOPK = 64


@query(
    "corpus_source_tv_distance",
    f"""
WITH tok AS (
  SELECT source, unnest({sql_toks('text')}) AS term FROM documents),
g AS (SELECT term, count(*) AS gc FROM tok GROUP BY term),
vocab AS (SELECT term, gc FROM g ORDER BY gc DESC, term LIMIT {_TOPK}),
n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok),
m AS (SELECT source, CAST(count(*) AS BIGINT) AS m_total FROM tok GROUP BY source),
sv AS (SELECT t.source AS source, v.term AS term, count(*) AS sc
       FROM tok t JOIN vocab v ON t.term = v.term
       GROUP BY t.source, v.term),
grid AS (
  SELECT m.source AS source, v.term AS term, v.gc AS gc,
         COALESCE(sv.sc, 0) AS sc, m.m_total AS m_total
  FROM m CROSS JOIN vocab v
  LEFT JOIN sv ON sv.source = m.source AND sv.term = v.term),
terms AS (
  SELECT source, m_total,
         CAST(sum(abs(sc * n.total - gc * m_total)) AS BIGINT) AS vnum,
         CAST(sum(sc) AS BIGINT) AS sc_vocab,
         CAST(sum(gc) AS BIGINT) AS gc_vocab
  FROM grid CROSS JOIN n GROUP BY source, m_total),
o AS (
  SELECT t.source AS source, t.m_total AS m_total,
         t.vnum + abs((t.m_total - t.sc_vocab) * n.total
                      - (n.total - t.gc_vocab) * t.m_total) AS num,
         n.total AS total
  FROM terms t CROSS JOIN n)
SELECT source, m_total AS n_tokens,
       CAST(num AS DOUBLE) / (2 * CAST(m_total AS DOUBLE) * total) AS tv_distance
FROM o
""",
)
def corpus_source_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source total-variation distance from the corpus-wide unigram
    distribution (top-{_TOPK} vocabulary + OTHER bucket). All mass terms
    are integer counts over the common denominator M*N, so the summed
    numerator is exact and order-free; the one division at the end is
    the only float op — a distribution divergence with NO logarithm and
    therefore no cross-engine libm risk. Plan: one tokenize scan feeds
    the global and per-source counts; the {_TOPK}-row vocabulary
    broadcasts into the sparse per-source grid."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(texts.tokens("text")).alias("term"))
    g = tok.groupBy("term").agg(F.count(F.lit(1)).alias("gc"))
    vocab = g.orderBy(F.col("gc").desc(), "term").limit(_TOPK)
    n = tok.agg(F.count(F.lit(1)).cast("long").alias("total"))
    m = tok.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("m_total"))
    sv = (
        tok.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("sc"))
    )
    grid = (
        m.crossJoin(F.broadcast(vocab))
        .join(sv, ["source", "term"], "left")
        .select(
            "source",
            "m_total",
            "term",
            "gc",
            F.coalesce("sc", F.lit(0)).alias("sc"),
        )
    )
    terms = (
        grid.crossJoin(F.broadcast(n))
        .groupBy("source", "m_total")
        .agg(
            F.sum(F.abs(F.col("sc") * F.col("total") - F.col("gc") * F.col("m_total")))
            .cast("long")
            .alias("vnum"),
            F.sum("sc").cast("long").alias("sc_vocab"),
            F.sum("gc").cast("long").alias("gc_vocab"),
        )
    )
    o = terms.crossJoin(F.broadcast(n)).select(
        "source",
        "m_total",
        (
            F.col("vnum")
            + F.abs(
                (F.col("m_total") - F.col("sc_vocab")) * F.col("total")
                - (F.col("total") - F.col("gc_vocab")) * F.col("m_total")
            )
        ).alias("num"),
        "total",
    )
    return o.select(
        "source",
        F.col("m_total").alias("n_tokens"),
        (
            F.col("num").cast("double")
            / (2 * F.col("m_total").cast("double") * F.col("total"))
        ).alias("tv_distance"),
    )
