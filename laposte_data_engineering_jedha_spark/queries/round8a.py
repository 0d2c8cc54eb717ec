"""Round-8 session batch 1 — Gopher/C4-style corpus repetition & quality
gates, the filter family a training-data pipeline runs BEFORE dedup
(Rae et al. 2021 "Scaling Language Models" App. A; Raffel et al. 2020 C4):

- corpus_type_token_ratio: per-source distribution of the type-token
  ratio (distinct tokens / tokens) — the repetition screen that catches
  keyword-stuffed and template docs.
- corpus_top_bigram_share: per-source distribution of the share of the
  doc covered by its single most frequent bigram (the Gopher top-2-gram
  rule).
- corpus_token_count_gate: per-source pass rates of the token-count
  window rule (docs too short to carry signal / long-tail outliers).
- corpus_repeated_token_runs: histogram of each doc's longest immediate
  token repeat run ("batch batch batch") — a pure expression-level fold,
  no shuffle beyond the histogram rollup.

All ratios are integer parts-per-million (BIGINT floor division) so no
cross-group float accumulation exists anywhere; percentiles run on the
integer ppm values (Spark `percentile` == DuckDB `quantile_cont` on
integer inputs, the ship_cycle precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texts
from . import query, table
from .llmops import sql_toks

# Shared non-empty-text predicate: Spark's split and DuckDB's
# string_split_regex both turn '' into [''], which would count 1 token —
# filter identically on both engines instead of special-casing.
_NONEMPTY = "trim(lower(text)) <> ''"


def _toks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .where(F.expr(_NONEMPTY))
        .select("doc_id", "source", texts.tokens("text").alias("t"))
    )


# ============================ type-token ratio ===============================


@query(
    "corpus_type_token_ratio",
    f"""
WITH t AS (
  SELECT doc_id, source, {sql_toks('text')} AS t
  FROM documents WHERE {_NONEMPTY}),
r AS (
  SELECT source,
         CAST(len(list_distinct(t)) * 1000000 AS BIGINT) // len(t) AS ttr_ppm
  FROM t)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       quantile_cont(ttr_ppm, 0.25) AS p25_ttr_ppm,
       quantile_cont(ttr_ppm, 0.5) AS p50_ttr_ppm,
       quantile_cont(ttr_ppm, 0.75) AS p75_ttr_ppm,
       CAST(count(*) FILTER (WHERE ttr_ppm < 300000) AS BIGINT) AS n_low_ttr
FROM r GROUP BY source
""",
)
def corpus_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source type-token-ratio profile (distinct/total tokens, ppm):
    quartiles plus the count under a 30% repetition threshold — the
    filter-calibration view for the TTR screen. Map-side array math per
    doc, one |sources|-row percentile rollup; integers end to end."""
    r = _toks_df(spark, sf_dir).select(
        "source",
        (F.size(F.array_distinct("t")) * F.lit(1000000))
        .cast("long")
        .alias("num"),
        F.size("t").alias("den"),
    ).select("source", F.expr("num div den").alias("ttr_ppm"))
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("percentile(ttr_ppm, 0.25)").alias("p25_ttr_ppm"),
        F.expr("percentile(ttr_ppm, 0.5)").alias("p50_ttr_ppm"),
        F.expr("percentile(ttr_ppm, 0.75)").alias("p75_ttr_ppm"),
        F.count(F.when(F.col("ttr_ppm") < 300000, 1)).cast("long").alias("n_low_ttr"),
    )


# ============================ top-bigram share ===============================


@query(
    "corpus_top_bigram_share",
    f"""
WITH t AS (
  SELECT doc_id, source, {sql_toks('text')} AS t
  FROM documents WHERE {_NONEMPTY}),
b AS (
  SELECT doc_id, source, len(t) AS n,
         unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS gram
  FROM t WHERE len(t) >= 2),
c AS (SELECT doc_id, source, n, gram, count(*) AS cnt
      FROM b GROUP BY doc_id, source, n, gram),
m AS (SELECT doc_id, source,
             CAST(max(cnt) * 1000000 AS BIGINT) // (n - 1) AS share_ppm
      FROM c GROUP BY doc_id, source, n)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       quantile_cont(share_ppm, 0.5) AS p50_share_ppm,
       CAST(count(*) FILTER (WHERE share_ppm >= 200000) AS BIGINT)
         AS n_repetitive
FROM m GROUP BY source
""",
)
def corpus_top_bigram_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher top-2-gram rule: per doc, the fraction of its bigram slots
    covered by the single most frequent bigram (ppm); per source, the
    median and the count at/over the 20% repetition flag. The bigram
    explode is doc-bounded fan-out (n-1 rows per doc) and the count/max
    chain aggregates at (doc, gram) then doc grain — both partial-agg
    friendly; nothing global beyond the |sources| rollup."""
    t = _toks_df(spark, sf_dir).where(F.size("t") >= 2)
    b = t.select(
        "doc_id",
        "source",
        F.size("t").alias("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(" ", F.slice("t", i, 2)),
            )
        ).alias("gram"),
    )
    c = b.groupBy("doc_id", "source", "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    m = c.groupBy("doc_id", "source", "n").agg(F.max("cnt").alias("max_cnt")).select(
        "source",
        F.expr("(max_cnt * 1000000) div (n - 1)").cast("long").alias("share_ppm"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("percentile(share_ppm, 0.5)").alias("p50_share_ppm"),
        F.count(F.when(F.col("share_ppm") >= 200000, 1))
        .cast("long")
        .alias("n_repetitive"),
    )


# ============================ token-count gate ===============================

_MIN_TOKENS, _MAX_TOKENS = 10, 60  # fixture-scaled Gopher length window


@query(
    "corpus_token_count_gate",
    f"""
WITH t AS (
  SELECT source, len({sql_toks('text')}) AS n
  FROM documents WHERE {_NONEMPTY})
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE n < {_MIN_TOKENS}) AS BIGINT) AS n_too_short,
       CAST(count(*) FILTER (WHERE n > {_MAX_TOKENS}) AS BIGINT) AS n_too_long,
       CAST(count(*) FILTER (WHERE n BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS})
            * 1000000 AS BIGINT) // count(*) AS pass_ppm
FROM t GROUP BY source
""",
)
def corpus_token_count_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count window rule (the first Gopher gate): per source, docs
    under/over the [10, 60] fixture-scaled window and the integer ppm
    pass rate. One map-side token count + a |sources|-row rollup."""
    t = _toks_df(spark, sf_dir).select("source", F.size("t").alias("n"))
    return t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(F.col("n") < _MIN_TOKENS, 1)).cast("long").alias("n_too_short"),
        F.count(F.when(F.col("n") > _MAX_TOKENS, 1)).cast("long").alias("n_too_long"),
        F.expr(
            f"(count(CASE WHEN n BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS} THEN 1 END)"
            " * 1000000) div count(*)"
        )
        .cast("long")
        .alias("pass_ppm"),
    )


# ========================== repeated-token runs ==============================


@query(
    "corpus_repeated_token_runs",
    f"""
WITH t AS (
  SELECT {sql_toks('text')} AS t
  FROM documents WHERE {_NONEMPTY}),
b AS (
  -- break positions: 1-based indices where a new run starts (i = 1 or
  -- token differs from its predecessor; t[0] is NULL in DuckDB's 1-based
  -- indexing, so IS DISTINCT FROM handles the first position)
  SELECT t, [i for i in range(1, len(t) + 1) if t[i] IS DISTINCT FROM t[i-1]] AS bp
  FROM t),
r AS (
  SELECT CAST(list_max(
           [coalesce(bp[j+1], len(t) + 1) - bp[j] for j in range(1, len(bp) + 1)]
         ) AS BIGINT) AS max_run
  FROM b)
SELECT CAST(max_run AS BIGINT) AS max_run, CAST(count(*) AS BIGINT) AS n_docs
FROM r GROUP BY max_run
""",
)
def corpus_repeated_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of each doc's longest IMMEDIATE token repeat run — the
    stutter/template screen ("batch batch batch" -> run 3). Run lengths
    come from the BREAK-POSITIONS formulation (indices where the token
    differs from its predecessor; run = distance to the next break), all
    array comprehensions/codegen — deliberately NOT a struct fold:
    DuckDB 1.0's list_reduce miscomputes struct lambdas whose fields
    share a subexpression (measured best=4 on a run of 3), so the twin
    avoids stateful folds entirely. Map-side per doc; the only shuffle
    is the <=max-run-row histogram."""
    t = _toks_df(spark, sf_dir)
    # null-safe inequality against the predecessor: F.get is 0-based and
    # returns NULL out of range, so position 1 (predecessor NULL) breaks.
    b = t.select(
        "t",
        F.filter(
            F.sequence(F.lit(1), F.size("t")),
            lambda i: ~(F.get("t", i - 1).eqNullSafe(F.get("t", i - 2))),
        ).alias("bp"),
    )
    r = b.select(
        F.array_max(
            F.transform(
                F.sequence(F.lit(1), F.size("bp")),
                lambda j: F.coalesce(F.get("bp", j), F.size("t") + 1)
                - F.element_at("bp", j),
            )
        )
        .cast("long")
        .alias("max_run")
    )
    return r.groupBy("max_run").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
