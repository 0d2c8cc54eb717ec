"""Round-6 session batch 13 — fulfillment SLAs, product analytics, and
referential integrity, each with a full DuckDB oracle twin:

- olap_ship_cycle_percentiles: order-to-ship cycle time percentiles per
  order priority (integer day lags, exact dyadic percentiles) — the
  fulfillment SLA dashboard.
- events_new_vs_returning: daily active users split into first-ever-day
  vs returning — the growth-accounting table every product review reads.
- dq_referential_orphans: FK orphan report across the star schema
  (lineitem->orders, orders->customer, customer->nation, supplier->
  nation) via broadcast anti-joins — the referential half of the DQ gate
  family (dq_*_checks cover value constraints, dq_table_checksums
  replication, this one covers joins that would silently drop rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import events_table, query, table


@query(
    "olap_ship_cycle_percentiles",
    """
WITH lag AS (
  SELECT o_orderpriority AS priority,
         date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
           AS lag_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT priority, count(*) AS n_lines,
       quantile_cont(lag_days, 0.5) AS p50_days,
       quantile_cont(lag_days, 0.95) AS p95_days,
       CAST(max(lag_days) AS BIGINT) AS max_days
FROM lag GROUP BY priority
""",
)
def olap_ship_cycle_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship cycle time (days between order date and line ship
    date) percentiles per order priority — the fulfillment SLA readout.
    Lags are integer days, so the exact interpolated percentiles are
    dyadic rationals both engines agree on bit-for-bit (the
    events_value_quantiles convention). The join shuffles on orderkey
    once; the percentile groups are |priorities|-sized."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("lag_days"),
    )
    return lag.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.expr("percentile(lag_days, 0.5)").alias("p50_days"),
        F.expr("percentile(lag_days, 0.95)").alias("p95_days"),
        F.max("lag_days").cast("long").alias("max_days"),
    )


@query(
    "events_new_vs_returning",
    """
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id),
d AS (
  SELECT DISTINCT CAST(e.ts AS DATE) AS day, e.user_id, f.first_day
  FROM events e JOIN f ON e.user_id = f.user_id)
SELECT day,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users
FROM d GROUP BY day
""",
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: each day's active users split into first-ever-day
    (new) vs returning. The first-activity relation is one user_id
    aggregate joined back (AQE broadcasts the |users| side when small;
    co-partitioned on user_id when not); daily actives are a distinct at
    (day, user) grain. Integer counts throughout."""
    ev = events_table(spark, sf_dir)
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    d = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .join(f, "user_id")
    )
    return d.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("returning_users"),
    )


_FK_RELATIONS = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]

_ORPHANS_SQL = " UNION ALL ".join(
    f"""
SELECT '{name}' AS relation,
       (SELECT count(*) FROM {child}) AS n_child_rows,
       (SELECT count(*) FROM {child}
        WHERE {fk} IS NOT NULL
          AND {fk} NOT IN (SELECT {pk} FROM {parent})) AS n_orphans"""
    for name, child, fk, parent, pk in _FK_RELATIONS
)


@query("dq_referential_orphans", _ORPHANS_SQL)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity orphan report over the star schema's four FK
    edges: child rows whose key has no parent (the rows an inner join
    silently drops, and the first thing to audit after any partial
    load). Each edge is ONE left join against the parent's distinct key
    projection, with total and orphan counts read off the same pass —
    dimension keys broadcast; the lineitem->orders edge co-partitions on
    the key. One row per relation."""
    frames = []
    for name, child, fk, parent, pk in _FK_RELATIONS:
        c = table(spark, sf_dir, child).select(F.col(fk).alias("_fk"))
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("_pk")).distinct()
        joined = c.join(p, c["_fk"] == p["_pk"], "left")
        frames.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_child_rows"),
                F.sum(
                    F.when(F.col("_fk").isNotNull() & F.col("_pk").isNull(), 1)
                    .otherwise(0)
                )
                .cast("long")
                .alias("n_orphans"),
            ).select(
                F.lit(name).alias("relation"),
                F.col("n_child_rows").cast("long"),
                "n_orphans",
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
