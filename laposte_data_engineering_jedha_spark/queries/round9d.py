"""Round-9 session batch 4 — pipeline-infrastructure shapes:

- olap_incremental_agg_merge: incremental view maintenance — a base
  partial aggregate and a delta-day partial aggregate MERGED into the
  full result (count/sum/min/max are algebraic: merge-of-partials ==
  aggregate-of-union, which the oracle proves by computing the single
  pass). This is the daily-refresh pattern that avoids rescanning the
  100 TB history for every new partition.
- eval_score_calibration: reliability-diagram bins for a deterministic
  value-derived score predicting 'purchase' — observed rate vs mean
  score per decile bin, integer ppm (the calibration audit behind any
  learned quality/propensity score).
- embedding_principal_direction: one EXACT power-iteration step toward
  the corpus's principal direction, in quantized integer arithmetic
  (DECIMAL(38,0) == HUGEINT) — the anisotropy/mean-direction probe,
  SQL-reproducible because every product and sum is an integer (no
  float-order sensitivity anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import events_table, query, table

# ========================= incremental aggregate merge =======================

_INC_CUT = "1999-01-01"  # base = orders strictly before; delta = on/after


@query(
    "olap_incremental_agg_merge",
    f"""
WITH src AS (
  SELECT o_orderpriority,
         CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_INC_CUT}'
              THEN 'base' ELSE 'delta' END AS part,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
partials AS (
  SELECT o_orderpriority, part,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(min(cents) AS BIGINT) AS mn,
         CAST(max(cents) AS BIGINT) AS mx
  FROM src GROUP BY o_orderpriority, part),
merged AS (
  SELECT o_orderpriority,
         CAST(sum(n) AS BIGINT) AS n_orders,
         CAST(sum(s) AS BIGINT) AS sum_cents,
         CAST(min(mn) AS BIGINT) AS min_cents,
         CAST(max(mx) AS BIGINT) AS max_cents,
         CAST(count(*) AS BIGINT) AS n_partials
  FROM partials GROUP BY o_orderpriority)
SELECT o_orderpriority, n_orders, sum_cents, min_cents, max_cents,
       CAST(sum_cents // n_orders AS BIGINT) AS avg_cents, n_partials
FROM merged
""",
)
def olap_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the priority-level order aggregate
    maintained as MERGEABLE partials — a 'base' partial (history before
    {_INC_CUT}) and a 'delta' partial (the new arrivals) combined by the
    algebraic merge rules (n+=n, sum+=sum, min=min, max=max; avg derived
    at read). The oracle's merge-of-partials equals a single-pass
    aggregate BY ALGEBRA, so the hash row proves the merge operator is
    lossless — the contract that lets a daily pipeline fold one new
    partition into a stored aggregate instead of rescanning 100 TB.
    n_partials audits that both sides actually contributed. Two
    partial-aggregate passes over a one-scan source; integer cents."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.when(
            F.to_date("o_orderdate") < F.lit(_INC_CUT).cast("date"), "base"
        ).otherwise("delta").alias("part"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    partials = o.groupBy("o_orderpriority", "part").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.min("cents").cast("long").alias("mn"),
        F.max("cents").cast("long").alias("mx"),
    )
    merged = partials.groupBy("o_orderpriority").agg(
        F.sum("n").cast("long").alias("n_orders"),
        F.sum("s").cast("long").alias("sum_cents"),
        F.min("mn").cast("long").alias("min_cents"),
        F.max("mx").cast("long").alias("max_cents"),
        F.count(F.lit(1)).cast("long").alias("n_partials"),
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        "sum_cents",
        "min_cents",
        "max_cents",
        F.expr("sum_cents div n_orders").cast("long").alias("avg_cents"),
        "n_partials",
    )


# ========================= score calibration =================================

_CAL_BINS = 10
_CAL_MAX_CENTS = 50000  # score = cents / 50000, the fixture value ceiling


@query(
    "eval_score_calibration",
    f"""
WITH s AS (
  SELECT least(CAST(round(value * 100) AS BIGINT) * {_CAL_BINS}
               // {_CAL_MAX_CENTS}, {_CAL_BINS - 1}) AS bin,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) * 1000000 // (count(*) * {_CAL_MAX_CENTS}) AS BIGINT)
         AS mean_score_ppm,
       CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS observed_ppm
FROM s GROUP BY bin
""",
)
def eval_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the value-derived pseudo-score
    predicting event_type = 'purchase': decile score bins with the
    bin's mean predicted score and observed positive rate, both integer
    ppm — well-calibrated means the two track. This is the calibration
    audit every learned quality/propensity scorer gets before its
    scores gate data selection. One map-side binning + a 10-group
    aggregate; integer cents end to end, two final integer divisions."""
    ev = events_table(spark, sf_dir).where(F.col("value").isNotNull())
    s = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    ).select(
        F.least(
            F.expr(f"(cents * {_CAL_BINS}) div {_CAL_MAX_CENTS}"),
            F.lit(_CAL_BINS - 1).cast("long"),
        ).cast("long").alias("bin"),
        "cents",
        "y",
    )
    return s.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"(sum(cents) * 1000000) div (count(*) * {_CAL_MAX_CENTS})")
        .cast("long")
        .alias("mean_score_ppm"),
        F.expr("(sum(y) * 1000000) div count(*)").cast("long").alias("observed_ppm"),
    )


# ========================= principal direction (exact) =======================

_PD_Q = 1 << 20
_PD_DIM = 64


@query(
    "embedding_principal_direction",
    f"""
WITH qv AS (
  SELECT vec_id,
         [CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * {_PD_Q} + 0.5) AS BIGINT)
          for i in range(0, {_PD_DIM})] AS q
  FROM embeddings),
d AS (SELECT vec_id, list_reduce(list_prepend(CAST(0 AS HUGEINT),
             [CAST(x AS HUGEINT) for x in q]), (a, b) -> a + b) AS dot1
      FROM qv),
x AS (SELECT CAST(r.range + 1 AS BIGINT) AS dim,
             CAST(qv.q[r.range + 1] AS HUGEINT) * d.dot1 AS term
      FROM qv JOIN d USING (vec_id) CROSS JOIN range(0, {_PD_DIM}) r)
SELECT dim, CAST(sum(term) AS VARCHAR) AS component
FROM x GROUP BY dim
""",
)
def embedding_principal_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EXACT power-iteration step toward the embedding matrix's
    principal direction: v1 = A^T (A 1) over the quantized integer
    matrix q = floor(x * 2^20 + 0.5) with the all-ones start vector —
    every product and sum is an integer (DECIMAL(38,0) == HUGEINT), so
    the iterate is bit-reproducible in SQL with zero float-order
    sensitivity (the anisotropy / dominant-direction probe run before
    whitening decisions; further iterations renormalize and go float,
    which is why the REGISTERED probe pins exactly one step).

    Plan: one map-side row-dot (q . 1), one posexplode, one 64-group
    integer aggregate — a single Exchange carrying 64 rows at any
    corpus size. Output serialized as VARCHAR: the component magnitudes
    exceed BIGINT by construction (driver canon requires atomic
    columns; the string form is exact)."""
    emb = table(spark, sf_dir, "embeddings")
    qv = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _PD_Q + F.lit(0.5)).cast("long"),
        ).alias("q"),
    )
    d = qv.select(
        "vec_id",
        "q",
        F.aggregate(
            "q",
            F.lit(0).cast("decimal(38,0)"),
            lambda a, b: a + b.cast("decimal(38,0)"),
        ).alias("dot1"),
    )
    return (
        d.select(F.posexplode("q").alias("pos", "qd"), "dot1")
        .select(
            (F.col("pos") + 1).cast("long").alias("dim"),
            (F.col("qd").cast("decimal(38,0)") * F.col("dot1")).alias("term"),
        )
        .groupBy("dim")
        .agg(F.sum("term").cast("decimal(38,0)").cast("string").alias("component"))
    )
