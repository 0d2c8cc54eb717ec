"""Round-7 session batch 13 — experiment-grade test statistics from
integer moments, both with full DuckDB oracle twins.

- events_value_anova_f: one-way ANOVA F statistic of purchase value
  across event types (between-group vs within-group mean square). The
  entire sufficient statistic set (n, sum, sum of squares per group) is
  integer cents in BIGINT, so the F value is a single final double
  expression — no per-row float ever crosses an engine boundary.
- corpus_lang_source_contingency: the (lang x source) contingency table
  with each cell's Pearson chi-square contribution. Expected counts are
  rational (row_total * col_total / grand_total); the contribution is
  computed from INTEGER cross-products — (n*obs - rt*ct)^2 / (n * rt *
  ct) — so the statistic is exact-to-rounding on both engines. The
  sum of contributions is the chi-square statistic a distribution-shift
  monitor thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import events_table, query, table

# ============================ one-way ANOVA F ================================


@query(
    "events_value_anova_f",
    """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS ss
  FROM e GROUP BY event_type),
gq AS (
  SELECT n, s, ss,
         CAST(round(CAST(s AS DOUBLE) * s / n * 1000) AS BIGINT) AS q
  FROM g),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS n_tot,
         CAST(sum(s) AS BIGINT) AS s_tot,
         CAST(sum(ss) AS DECIMAL(38,0)) AS ss_tot,
         CAST(sum(q) AS BIGINT) AS qsum
  FROM gq)
SELECT k AS n_groups, n_tot,
       CASE WHEN k <= 1 THEN NULL
            ELSE round(((qsum / CAST(1000.0 AS DOUBLE))
                 - CAST(CAST(s_tot AS DECIMAL(38,0)) * s_tot AS DOUBLE) / n_tot)
                 / (k - 1) * 1000000) / 1000000 END AS ms_between,
       CASE WHEN n_tot <= k THEN NULL
            ELSE round((CAST(ss_tot AS DOUBLE) - (qsum / CAST(1000.0 AS DOUBLE)))
                 / (n_tot - k) * 1000000) / 1000000 END AS ms_within,
       CASE WHEN k <= 1 OR n_tot <= k
                 OR CAST(ss_tot AS DOUBLE) - (qsum / CAST(1000.0 AS DOUBLE)) = 0
            THEN NULL
            ELSE round((((qsum / CAST(1000.0 AS DOUBLE))
                  - CAST(CAST(s_tot AS DECIMAL(38,0)) * s_tot AS DOUBLE) / n_tot)
                  / (k - 1))
                 / ((CAST(ss_tot AS DOUBLE) - (qsum / CAST(1000.0 AS DOUBLE)))
                    / (n_tot - k))
                 * 1000000) / 1000000 END AS f_stat
FROM t
""",
)
def events_value_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types on value cents: between-group and
    within-group mean squares and their F ratio — "does event type
    explain value variance at all", the gate before any per-type pricing
    analysis. Sufficient statistics are one integer-cents aggregate per
    type (squared sums in DECIMAL(38,0), exact). Cross-group float sums
    never happen: the one rational term per group (s^2/n) is QUANTIZED
    to an integer (milli-cents^2) before summing, so the rollup is
    order-free BIGINT addition and every remaining float op is a single
    deterministic expression over exact operands — a float sum of
    per-group doubles would be partition-order dependent and could
    straddle the 1e-6 rounding across engines."""
    e = events_table(spark, sf_dir).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    dec = "decimal(38,0)"
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast(dec) * F.col("cents")).cast(dec).alias("ss"),
    )
    gq = g.select(
        "n",
        "s",
        "ss",
        F.round(F.col("s").cast("double") * F.col("s") / F.col("n") * 1000)
        .cast("long")
        .alias("q"),
    )
    t = gq.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s").cast("long").alias("s_tot"),
        F.sum("ss").cast(dec).alias("ss_tot"),
        F.sum("q").cast("long").alias("qsum"),
    )
    k, n_tot = F.col("k"), F.col("n_tot")
    sum_sq_over_n = F.col("qsum") / F.lit(1000.0)
    within_ss = F.col("ss_tot").cast("double") - sum_sq_over_n
    between = (
        sum_sq_over_n
        - (F.col("s_tot").cast(dec) * F.col("s_tot")).cast("double") / n_tot
    ) / (k - 1)
    within = within_ss / (n_tot - k)
    r6 = lambda c: F.round(c * 1000000) / 1000000  # noqa: E731
    null_d = F.lit(None).cast("double")
    # ANSI guards: degenerate shapes (one group, no residual df, zero
    # within-variance) report NULL on BOTH engines instead of raising
    return t.select(
        k.alias("n_groups"),
        "n_tot",
        F.when(k <= 1, null_d).otherwise(r6(between)).alias("ms_between"),
        F.when(n_tot <= k, null_d).otherwise(r6(within)).alias("ms_within"),
        F.when((k <= 1) | (n_tot <= k) | (within_ss == 0), null_d)
        .otherwise(r6(between / within))
        .alias("f_stat"),
    )


# ===================== lang x source contingency chi2 ========================


@query(
    "corpus_lang_source_contingency",
    """
WITH c AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
  FROM documents GROUP BY lang, source),
r AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS rt FROM c GROUP BY lang),
k AS (SELECT source, CAST(sum(obs) AS BIGINT) AS ct FROM c GROUP BY source),
t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM c),
grid AS (
  SELECT r.lang AS lang, k.source AS source, rt, ct, n,
         COALESCE(obs, 0) AS obs
  FROM r CROSS JOIN k CROSS JOIN t
  LEFT JOIN c ON c.lang = r.lang AND c.source = k.source)
SELECT lang, source, obs,
       round(CAST(rt * ct AS DOUBLE) / n * 1000000) / 1000000 AS expected,
       round(CAST((n * obs - rt * ct) AS DOUBLE)
             * (n * obs - rt * ct)
             / (CAST(n AS DOUBLE) * rt * ct) * 1000000) / 1000000
         AS chi2_term
FROM grid
""",
)
def corpus_lang_source_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (lang x source) contingency grid with expected counts and each
    cell's Pearson chi-square contribution — summing chi2_term gives the
    independence statistic a corpus-composition monitor thresholds (a
    source suddenly skewing toward one language shows up as that cell's
    term exploding). All counts integral; each cell's term is computed
    from the integer cross-product (n*obs - rt*ct) so the only float is
    the final scaled division. Marginals are tiny broadcast relations;
    the fact table aggregates once."""
    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("long").alias("obs"))
    r = c.groupBy("lang").agg(F.sum("obs").cast("long").alias("rt"))
    kk = c.groupBy("source").agg(F.sum("obs").cast("long").alias("ct"))
    t = c.agg(F.sum("obs").cast("long").alias("n"))
    grid = (
        r.crossJoin(F.broadcast(kk))
        .crossJoin(F.broadcast(t))
        .join(c, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "rt",
            "ct",
            "n",
            F.coalesce("obs", F.lit(0)).alias("obs"),
        )
    )
    diff = F.col("n") * F.col("obs") - F.col("rt") * F.col("ct")
    return grid.select(
        "lang",
        "source",
        "obs",
        (
            F.round((F.col("rt") * F.col("ct")).cast("double") / F.col("n") * 1000000)
            / 1000000
        ).alias("expected"),
        (
            F.round(
                diff.cast("double")
                * diff
                / (F.col("n").cast("double") * F.col("rt") * F.col("ct"))
                * 1000000
            )
            / 1000000
        ).alias("chi2_term"),
    )
