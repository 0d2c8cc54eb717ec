"""Round-6 session batch 11 — windowed finance analytics, market
concentration, ML feature engineering, and Markov conversion math, each
with a full DuckDB oracle twin:

- olap_cumulative_revenue_share: per-nation monthly revenue with the
  running share of the nation's total — DECIMAL-exact cumulative window
  (partition-order-immune), ONE double division at the end.
- olap_supplier_hhi: Herfindahl-Hirschman concentration of supplier
  revenue per nation — squared cents summed in DECIMAL(38,0) so the
  quadratic mass is exact, one final double expression.
- events_lag_features: the feature-store shape — per event lag/gap/
  trailing-window features (previous value, inter-arrival micros,
  5-event rolling sum/avg in integer cents).
- events_markov_absorb2: probability of reaching 'purchase' within 1 and
  2 transitions from each starting event type, from the empirical
  transition matrix — the t-sum runs as a STRICT ascending-key left fold
  on both engines (the shared sql_reduce_sum discipline), so chained
  double arithmetic hash-matches at 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import events_table, query, table

_DEC = "decimal(18,4)"


@query(
    "olap_cumulative_revenue_share",
    """
WITH m AS (
  SELECT n_name,
         CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, date_trunc('month', l_shipdate))
SELECT n_name, month,
       CAST(rev AS DOUBLE) AS revenue,
       round((CAST(sum(rev) OVER (PARTITION BY n_name ORDER BY month
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
              / CAST(sum(rev) OVER (PARTITION BY n_name) AS DOUBLE)) * 10000)
         / 10000 AS cum_share
FROM m
""",
)
def olap_cumulative_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running share of each supplier nation's revenue by ship month —
    the 'how far through the year are we' finance view. Revenue
    accumulates as DECIMAL inside both windows (cumulative + total), so
    no partition or frame order can perturb low bits; the single
    decimal->double division is rounded at 4 decimals. One shuffle keyed
    on n_name serves both windows."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    m = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.date_trunc("month", "l_shipdate").cast("date").alias("month"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            .alias("rev")
        )
    )
    wcum = (
        Window.partitionBy("n_name")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("n_name")
    return m.select(
        "n_name",
        "month",
        F.col("rev").cast("double").alias("revenue"),
        (
            F.round(
                (
                    F.sum("rev").over(wcum).cast("double")
                    / F.sum("rev").over(wall).cast("double")
                )
                * 10000
            )
            / 10000
        ).alias("cum_share"),
    )


@query(
    "olap_supplier_hhi",
    """
WITH s AS (
  SELECT n_name, l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, l_suppkey)
SELECT n_name,
       count(*) AS n_suppliers,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       round((CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE)
              / (CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)))
             * 10000 * 10000) / 10000 AS hhi
FROM s GROUP BY n_name
""",
)
def olap_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation (0..10000 scale; >2500 = highly concentrated — the
    single-point-of-failure supply report). Per-supplier revenue is
    integer cents; the squared mass sums in DECIMAL(38,0) so it is exact
    and order-free; HHI is one final double expression rounded at 4
    decimals. Two map-side-combined aggregates over one (nation,
    supplier) shuffle."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    s = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    sq = F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
    tot = F.sum("cents")
    return s.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        tot.cast("long").alias("total_cents"),
        (
            F.round(
                (sq.cast("double") / (tot.cast("double") * tot.cast("double")))
                * 10000
                * 10000
            )
            / 10000
        ).alias("hhi"),
    )


@query(
    "events_lag_features",
    """
WITH c AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT event_id, user_id,
       lag(cents) OVER w AS lag1_cents,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS roll5_cents,
       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         AS roll5_avg
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-store projection every sequence model trains on:
    previous event value, inter-arrival gap in integer micros, and
    trailing-5-event rolling sum/avg — value snapped to integer cents
    FIRST so every window aggregate is exact (the rolling avg is one
    division of two exact window results). One user_id shuffle serves
    all four window expressions (same partitioning + ordering)."""
    ev = events_table(spark, sf_dir)
    c = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w5 = w.rowsBetween(-4, 0)
    return c.select(
        "event_id",
        "user_id",
        F.lag("cents").over(w).alias("lag1_cents"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
        F.sum("cents").over(w5).cast("long").alias("roll5_cents"),
        (
            F.sum("cents").over(w5).cast("double") / F.count(F.lit(1)).over(w5)
        ).alias("roll5_avg"),
    )


@query(
    "events_markov_absorb2",
    """
WITH o AS (
  SELECT user_id, event_type AS s,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM events),
c AS (SELECT s, t, count(*) AS n FROM o WHERE t IS NOT NULL GROUP BY s, t),
tot AS (SELECT s, CAST(sum(n) AS BIGINT) AS ns FROM c GROUP BY s),
p1 AS (SELECT tot.s AS s, ns,
              COALESCE(CAST((SELECT n FROM c WHERE c.s = tot.s AND c.t = 'purchase')
                            AS DOUBLE) / ns, CAST(0.0 AS DOUBLE)) AS p1
       FROM tot),
terms AS (SELECT c.s AS s, c.t AS t,
                 (CAST(c.n AS DOUBLE) / tot.ns) * pt.p1 AS term
          FROM c JOIN tot ON c.s = tot.s
                 JOIN p1 pt ON c.t = pt.s
          WHERE c.t != 'purchase'),
step AS (SELECT s,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                         list(term ORDER BY t)),
                            (a, x) -> a + x) AS add2
         FROM terms GROUP BY s)
SELECT p1.s AS event_type, ns AS n_transitions,
       round(p1.p1 * 1000000) / 1000000 AS p_convert_1,
       round((p1.p1 + COALESCE(add2, CAST(0.0 AS DOUBLE))) * 1000000) / 1000000
         AS p_convert_2
FROM p1 LEFT JOIN step ON p1.s = step.s
""",
)
def events_markov_absorb2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion probability within 1 and 2 transitions of the empirical
    event-type Markov chain: p1(s) = c(s, purchase)/n(s), p2(s) = p1(s) +
    sum_t!=purchase (c(s,t)/n(s)) * p1(t) — the first two steps of the
    absorbing-chain fundamental series attribution models iterate. The
    cross-type sum folds in STRICT ascending-t order on both engines
    (sorted collect + left fold == DuckDB list_reduce over an ordered
    list), so the chained double arithmetic is bit-identical before the
    6-decimal rounding. State space = the type vocabulary: every relation
    after the pair-count is tiny and broadcastable."""
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        F.col("event_type").alias("s"), F.lead("event_type").over(w).alias("t")
    ).where(F.col("t").isNotNull())
    c = o.groupBy("s", "t").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("s").agg(F.sum("n").cast("long").alias("ns"))
    pur = c.where(F.col("t") == "purchase").select("s", F.col("n").alias("np"))
    p1 = (
        tot.join(pur, "s", "left")
        .select(
            "s",
            "ns",
            F.coalesce(
                F.col("np").cast("double") / F.col("ns"), F.lit(0.0)
            ).alias("p1"),
        )
    )
    terms = (
        c.where(F.col("t") != "purchase")
        .join(tot, "s")
        .join(
            F.broadcast(p1.select(F.col("s").alias("t"), F.col("p1").alias("pt"))),
            "t",
        )
        .select(
            "s",
            "t",
            ((F.col("n").cast("double") / F.col("ns")) * F.col("pt")).alias("term"),
        )
    )
    step = terms.groupBy("s").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "term"))),
                lambda x: x["term"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("add2")
    )
    return (
        p1.join(step, "s", "left")
        .select(
            F.col("s").alias("event_type"),
            F.col("ns").alias("n_transitions"),
            (F.round(F.col("p1") * 1000000) / 1000000).alias("p_convert_1"),
            (
                F.round(
                    (F.col("p1") + F.coalesce(F.col("add2"), F.lit(0.0))) * 1000000
                )
                / 1000000
            ).alias("p_convert_2"),
        )
    )
