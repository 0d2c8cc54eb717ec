"""Round-6 session batch 12 — inventory economics, journey analytics, and
cross-modal statistics, each with a full DuckDB oracle twin:

- olap_abc_classification: ABC / Pareto inventory bands (A = parts
  covering the first 80% of cumulative revenue, B to 95%, C the tail) —
  DECIMAL-exact cumulative shares, band cut on exact values (no rounding
  before the CASE), per-band rollup.
- events_sankey_edges: the first-3-transition journey flow table
  (step, from_type, to_type, n) — the relation a Sankey/flow diagram
  renders, and the input grain for funnel-shape drift monitoring.
- corpus_length_vs_norm_corr: exact-integer Pearson correlation between
  document length and (grid-quantized) embedding norm^2 across the
  documents-embeddings join — every moment sum is integral (DECIMAL(38)
  where squares overflow BIGINT), ONE final double expression. The
  recipe for oracle-checkable correlation between any two integral
  features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import events_table, query, table

_DEC = "decimal(18,4)"


@query(
    "olap_abc_classification",
    """
WITH p AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
  FROM lineitem GROUP BY l_partkey),
r AS (
  SELECT l_partkey, rev,
         CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(sum(rev) OVER () AS DOUBLE) AS cum_share
  FROM p),
b AS (
  SELECT rev,
         CASE WHEN cum_share <= CAST(0.8 AS DOUBLE) THEN 'A'
              WHEN cum_share <= CAST(0.95 AS DOUBLE) THEN 'B'
              ELSE 'C' END AS band
  FROM r)
SELECT band, count(*) AS n_parts,
       CAST(sum(rev) AS DOUBLE) AS band_revenue
FROM b GROUP BY band
""",
)
def olap_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: rank parts by
    revenue (DECIMAL-exact, partkey tiebreak), take the running share of
    total, and band at 80% / 95% — the classic inventory-priority split
    ('A' parts get the warehouse slots). The cumulative window compares
    EXACT decimal-derived doubles, so the band cut can't flip on engine
    rounding. Scale shape (r9): the running sum comes from
    ranking.global_prefix_sum — partition-offset prefix sums over the
    range-partitioned part relation, bit-identical to the global window
    for DECIMAL (exact associative adds) with no single-partition sort;
    the total is a broadcast 1-row aggregate."""
    from ..operators import ranking

    li = table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)).alias(
            "rev"
        )
    )
    total = p.agg(F.sum("rev").alias("total"))
    r = (
        ranking.global_prefix_sum(
            p, "rev", F.col("rev").desc(), "l_partkey", out_col="cum_rev"
        )
        .crossJoin(F.broadcast(total))
        .select(
            "rev",
            (F.col("cum_rev").cast("double") / F.col("total").cast("double")).alias(
                "cum_share"
            ),
        )
    )
    band = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        r.select("rev", band.alias("band"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").cast("double").alias("band_revenue"),
        )
    )


_SANKEY_STEPS = 3


@query(
    "events_sankey_edges",
    f"""
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events),
e AS (
  SELECT a.i AS step, a.event_type AS from_type, b.event_type AS to_type
  FROM o a JOIN o b ON a.user_id = b.user_id AND b.i = a.i + 1
  WHERE a.i <= {_SANKEY_STEPS})
SELECT CAST(step AS INTEGER) AS step, from_type, to_type, count(*) AS n
FROM e GROUP BY step, from_type, to_type
""",
)
def events_sankey_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey flow edges for the first {_SANKEY_STEPS} transitions of
    every user: (step, from_type, to_type, n) — exactly the relation a
    Sankey diagram renders and the grain funnel-drift monitors compare
    week over week. Implemented with lead() over ONE user_id window (the
    oracle's self-join is the declarative twin); output is bounded by
    steps x |types|^2 regardless of event volume."""
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        F.col("event_type").alias("from_type"),
        F.row_number().over(w).alias("step"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        o.where((F.col("step") <= _SANKEY_STEPS) & F.col("to_type").isNotNull())
        .groupBy(F.col("step").cast("int").alias("step"), "from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SQL_NORM2 = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "[CAST(floor(CAST(x AS DOUBLE) * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " * CAST(floor(CAST(x AS DOUBLE) * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " for x in embedding]), (s, x) -> s + x)"
)


@query(
    "corpus_length_vs_norm_corr",
    f"""
WITH j AS (
  SELECT d.n_chars AS x, {_SQL_NORM2} AS y
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
m AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS sx,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
  FROM j)
SELECT CAST(n AS BIGINT) AS n_rows,
       round((CAST(n * sxy - sx * sy AS DOUBLE)
              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE))) * 1000000) / 1000000
         AS pearson_r
FROM m
""",
)
def corpus_length_vs_norm_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Pearson correlation between document length and the
    grid-quantized embedding norm^2 over the documents-embeddings join —
    the 'does my embedding magnitude leak document length' diagnostic
    (strong correlation means cosine vs dot-product choices matter).
    Every moment (sum x, y, x^2, y^2, xy) is integral, carried in
    DECIMAL(38,0) where squares exceed BIGINT; the Pearson formula is
    ONE final double expression rounded at 6 decimals. The shape
    generalizes: any two integral features get an oracle-checkable
    correlation this way."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    emb = table(spark, sf_dir, "embeddings")
    qn = F.aggregate(
        F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * 1000 + F.lit(0.5)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda s, v: s + v * v,
    )
    j = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), qn.alias("y")), "doc_id"
    ).select(F.col("n_chars").alias("x"), "y")
    dec = "decimal(38,0)"
    m = j.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = F.sqrt(
        (n * F.col("sxx") - sx * sx).cast("double")
        * (n * F.col("syy") - sy * sy).cast("double")
    )
    return m.select(
        n.cast("long").alias("n_rows"),
        (F.round((num / den) * 1000000) / 1000000).alias("pearson_r"),
    )
