"""Round-12 session batch 5 — incremental maintenance + experimentation
guardrails:

- olap_ivm_join_delta: incremental view maintenance for a JOIN — the
  delta-join identity (base JOIN base) + (base JOIN dC) + (dO JOIN base)
  + (dO JOIN dC), aggregated, must equal the full recompute (the
  oracle). olap_ivm_agg covers the aggregate case; this is the join
  case, the one that makes nightly full-join rebuilds unnecessary at
  100 TB: only the three delta terms touch new data, and each delta
  side is broadcast-sized by definition of an increment.
- eval_ab_sample_ratio_mismatch: the SRM guardrail every experimentation
  platform runs BEFORE reading a single metric — deterministic unit
  bucketing (user_id parity), exact per-variant unit counts, chi-square
  against the 50/50 design carried as the integer identity
  chi2 = (na-nb)^2 / n, and the 5%-level flag evaluated as the exact
  integer cross-multiplication 100*(na-nb)^2 > 384*n (3.841 rounded to
  the 2dp the comparison needs) so the verdict can never flip on a
  float boundary.

Reference parity note: extension surface (the reference has no
incremental maintenance or experimentation ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, sort_report, sql_round2, table
from ..functions import exprs

# ========================== IVM for a join ====================================

_IVM_O_MOD = 10  # orders with o_orderkey % 10 == 0 arrive as the delta
_IVM_C_MOD = 7  # customers with c_custkey % 7 == 0 arrive as the delta


@query(
    "olap_ivm_join_delta",
    f"""
SELECT c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       {sql_round2("sum(o_totalprice)")} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY mktsegment
""",
)
def olap_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment maintained INCREMENTALLY under the
    delta-join identity: with orders = O + dO and customer = C + dC,
    (O+dO) JOIN (C+dC) = O JOIN C  +  O JOIN dC  +  dO JOIN C
    + dO JOIN dC — the four terms are computed separately, unioned, and
    aggregated; the oracle is the plain full join, so the identity is
    hash-checked end to end. The fixture split is deterministic
    (o_orderkey % {_IVM_O_MOD} == 0 / c_custkey % {_IVM_C_MOD} == 0
    arrive as the increments). At 100 TB the O JOIN C term is the
    yesterday's materialization read back (here recomputed — the
    identity is what's under test); the three delta terms are the only
    work per refresh, each with one broadcast-sized side. Catalyst
    broadcasts dC/dO below the auto-broadcast threshold on its own;
    partial aggregation merges the four terms map-side before the one
    segment-grain shuffle."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o_base = o.where(F.col("o_orderkey") % _IVM_O_MOD != 0)
    o_delta = o.where(F.col("o_orderkey") % _IVM_O_MOD == 0)
    c_base = c.where(F.col("c_custkey") % _IVM_C_MOD != 0)
    c_delta = c.where(F.col("c_custkey") % _IVM_C_MOD == 0)
    terms = [
        o_base.join(c_base, o_base.o_custkey == c_base.c_custkey),
        o_base.join(c_delta, o_base.o_custkey == c_delta.c_custkey),
        o_delta.join(c_base, o_delta.o_custkey == c_base.c_custkey),
        o_delta.join(c_delta, o_delta.o_custkey == c_delta.c_custkey),
    ]
    unioned = terms[0]
    for t in terms[1:]:
        unioned = unioned.unionByName(t)
    return (
        unioned.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            exprs.round2(F.sum("o_totalprice")).alias("revenue"),
        )
        .transform(sort_report, "mktsegment")
    )


# ===================== A/B sample-ratio mismatch ==============================


@query(
    "eval_ab_sample_ratio_mismatch",
    """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM u)
SELECT na AS n_variant_a, nb AS n_variant_b,
       round((na - nb) * (na - nb) * 1.0 / (na + nb) * 1e6) / 1e6 AS chi_square,
       CASE WHEN 100 * (na - nb) * (na - nb) > 384 * (na + nb)
            THEN 1 ELSE 0 END AS srm_flag
FROM v
""",
)
def eval_ab_sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for a 50/50 experiment bucketed on
    user_id parity: exact distinct-unit counts per variant, the
    chi-square statistic via the 2-cell identity (na-nb)^2/(na+nb)
    (one rounded division — the only float in the query), and the
    5%-level flag (critical value 3.84) as the exact integer comparison
    100*(na-nb)^2 > 384*n. An SRM means the bucketing itself is broken
    (bot filtering, logging loss, assignment bias) and every downstream
    metric read is invalid — which is why the check is integer-exact
    and runs before anything else. One distinct + one fold; the
    distinct is the only shuffle and it's on the unit key."""
    from . import events_table

    u = events_table(spark, sf_dir).select("user_id").distinct()
    v = u.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    na, nb = F.col("na"), F.col("nb")
    d = na - nb
    return v.select(
        na.alias("n_variant_a"),
        nb.alias("n_variant_b"),
        (F.round(d * d * 1.0 / (na + nb) * 1e6) / 1e6).alias("chi_square"),
        F.when(100 * d * d > 384 * (na + nb), 1).otherwise(0).alias("srm_flag"),
    )
