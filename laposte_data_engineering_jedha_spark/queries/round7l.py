"""Round-7 session batch 12 — dedup-graph transitivity audit, Benford
fraud screen, revenue concentration, and the traffic heatmap grain, all
with full DuckDB oracle twins.

- dedup_transitivity_gap: of all (a,b),(b,c) chains in the verified
  MinHash pair set, how many are NOT closed by a direct (a,c) pair —
  the measured justification for running connected components instead
  of pairwise keep-earliest (a gap of zero would mean pairs alone
  partition the corpus; a positive gap is exactly the mass only the
  component view deduplicates correctly).
- dq_value_first_digit: first-significant-digit histogram of event
  values (the Benford screen) — pure integer digit extraction, shares
  as single final divisions.
- olap_customer_concentration: revenue share of each nation's top-3
  customers — the key-account concentration risk readout.
- events_weekday_hour_heatmap: the (weekday, hour) traffic grid in long
  format — the standard ops heatmap feed, integer counts plus a
  per-cell share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exprs
from ..operators import dedup
from . import SQL_WEEKDAY_NAME, events_table, query, table
from .llmops import _ROWS, _SQL_SHINGLE_CTES, _SQL_SIG, sql_md5i

# ======================== dedup transitivity audit ===========================

_SQL_VERIFIED_PAIRS = f"""
sigs AS (
  SELECT doc_id, h, {_SQL_SIG} AS sig
  FROM (SELECT doc_id, [{sql_md5i('x')} for x in s] AS h FROM sh)
  WHERE len(h) > 0),
bands AS (
  SELECT doc_id, sig, h, r.range AS band,
         array_to_string(sig[r.range * {_ROWS} + 1 : r.range * {_ROWS} + {_ROWS}], '_') AS key
  FROM sigs CROSS JOIN range(0, 4) r),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
pairs AS (
  SELECT id_a, id_b
  FROM cand JOIN sigs sa ON id_a = sa.doc_id JOIN sigs sb ON id_b = sb.doc_id
  WHERE round(CAST(len(list_intersect(sa.h, sb.h)) AS DOUBLE)
        / (len(sa.h) + len(sb.h) - len(list_intersect(sa.h, sb.h))) * 10000) / 10000
        >= CAST(0.5 AS DOUBLE))"""


@query(
    "dedup_transitivity_gap",
    f"""
WITH {_SQL_SHINGLE_CTES},
{_SQL_VERIFIED_PAIRS},
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
chains AS (
  SELECT DISTINCT least(x.u, y.v) AS a, greatest(x.u, y.v) AS c
  FROM und x JOIN und y ON x.v = y.u AND x.u <> y.v),
closed AS (
  SELECT a, c, CASE WHEN p.id_a IS NULL THEN 0 ELSE 1 END AS is_closed
  FROM chains LEFT JOIN pairs p ON p.id_a = a AND p.id_b = c)
SELECT CAST(count(*) AS BIGINT) AS n_chains,
       CAST(sum(is_closed) AS BIGINT) AS n_closed,
       CAST(count(*) - sum(is_closed) AS BIGINT) AS n_open,
       round(CAST(count(*) - sum(is_closed) AS DOUBLE) / count(*) * 1000000)
         / 1000000 AS gap_rate
FROM closed
""",
)
def dedup_transitivity_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the verified MinHash near-dup pairs: count
    two-hop chains a~b~c (a != c) and how many lack the direct a~c pair.
    A positive gap is the exact reason dedup_clusters/survivors run
    CONNECTED COMPONENTS instead of pairwise keep-earliest — every open
    chain is a doc pair the pair view would treat as unrelated. The
    chain join is bounded by the pair set's degree (already df-capped by
    banding), not the corpus; all joins are id-keyed equi-joins over the
    (small) verified pair relation."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).select("id_a", "id_b")
    und = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).unionAll(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    x = und.alias("x")
    y = und.select(F.col("u").alias("v2"), F.col("v").alias("w")).alias("y")
    chains = (
        x.join(y, F.col("x.v") == F.col("y.v2"))
        .where(F.col("x.u") != F.col("y.w"))
        .select(
            F.least(F.col("x.u"), F.col("y.w")).alias("a"),
            F.greatest(F.col("x.u"), F.col("y.w")).alias("c"),
        )
        .distinct()
    )
    p = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"), F.lit(1).alias("hit"))
    closed = chains.join(p, ["a", "c"], "left").select(
        F.coalesce("hit", F.lit(0)).alias("is_closed")
    )
    return closed.agg(
        F.count(F.lit(1)).cast("long").alias("n_chains"),
        F.sum("is_closed").cast("long").alias("n_closed"),
        (F.count(F.lit(1)) - F.sum("is_closed")).cast("long").alias("n_open"),
        (
            F.round(
                (F.count(F.lit(1)) - F.sum("is_closed")).cast("double")
                / F.count(F.lit(1))
                * 1000000
            )
            / 1000000
        ).alias("gap_rate"),
    )


# =========================== Benford first digit =============================


@query(
    "dq_value_first_digit",
    """
WITH c AS (
  SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM events WHERE CAST(round(value * 100) AS BIGINT) > 0),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM c)
SELECT digit, CAST(count(*) AS BIGINT) AS n,
       round(CAST(count(*) AS DOUBLE) / max(total) * 1000000) / 1000000 AS share
FROM c CROSS JOIN t GROUP BY digit
""",
)
def dq_value_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit histogram of event value cents — the
    Benford screen (organic money amounts lean hard on 1s and 2s; a
    flat or spiked distribution flags synthetic or manipulated values).
    Digit extraction is integer/string work (first char of the decimal
    cents), shares one final division; zero/negative values excluded on
    both engines."""
    ev = events_table(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    c = ev.select(cents.alias("cents")).where(F.col("cents") > 0).select(
        F.substring(F.col("cents").cast("string"), 1, 1).cast("long").alias("digit")
    )
    t = c.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        c.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            (F.round(F.col("n").cast("double") / F.col("total") * 1000000) / 1000000).alias(
                "share"
            ),
        )
    )


# ======================== customer concentration =============================

_TOP_K_CUST = 3


@query(
    "olap_customer_concentration",
    f"""
WITH r AS (
  SELECT c_nationkey AS nk, o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey),
rk AS (
  SELECT nk, cents,
         row_number() OVER (PARTITION BY nk ORDER BY cents DESC, o_custkey) AS rnk
  FROM r)
SELECT n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN rnk <= {_TOP_K_CUST} THEN cents ELSE 0 END) AS BIGINT)
         AS top{_TOP_K_CUST}_cents,
       round(CAST(sum(CASE WHEN rnk <= {_TOP_K_CUST} THEN cents ELSE 0 END) AS DOUBLE)
             / sum(cents) * 1000000) / 1000000 AS top{_TOP_K_CUST}_share
FROM rk JOIN nation ON nk = n_nationkey
GROUP BY n_name
""",
)
def olap_customer_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-account concentration: the revenue share of each nation's
    top-{_TOP_K_CUST} customers (by order totalprice cents,
    deterministic custkey tie-break) — the complement of supplier_hhi on
    the demand side. One customer-grain aggregate, a per-nation rank
    window at that grain, integer cents until the one share division;
    nation dim broadcast."""
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    r = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("nk").orderBy(F.col("cents").desc(), "o_custkey")
    rk = r.select("nk", "cents", F.row_number().over(w).alias("rnk"))
    return (
        rk.join(F.broadcast(nat), rk.nk == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.sum(F.when(F.col("rnk") <= _TOP_K_CUST, F.col("cents")).otherwise(0))
            .cast("long")
            .alias(f"top{_TOP_K_CUST}_cents"),
            (
                F.round(
                    F.sum(
                        F.when(F.col("rnk") <= _TOP_K_CUST, F.col("cents")).otherwise(0)
                    ).cast("double")
                    / F.sum("cents")
                    * 1000000
                )
                / 1000000
            ).alias(f"top{_TOP_K_CUST}_share"),
        )
    )


# =========================== weekday-hour heatmap ============================


@query(
    "events_weekday_hour_heatmap",
    f"""
WITH g AS (
  SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS weekday_num,
         {SQL_WEEKDAY_NAME.format(ts='CAST(ts AS DATE)')} AS weekday,
         CAST(hour(ts) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2, 3),
t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM g)
SELECT weekday_num, weekday, hour, n_events,
       round(CAST(n_events AS DOUBLE) / total * 1000000) / 1000000 AS share
FROM g CROSS JOIN t
""",
)
def events_weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (weekday, hour) traffic grid in long format — the feed behind
    every ops heatmap (when to schedule maintenance, where the peak
    lives). At most 168 cells regardless of corpus size; integer counts
    plus a per-cell share of total traffic."""
    ev = events_table(spark, sf_dir)
    g = ev.groupBy(
        (F.weekday(F.to_date("ts")) + 1).cast("long").alias("weekday_num"),
        exprs.weekday_name(F.to_date("ts")).alias("weekday"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    t = g.agg(F.sum("n_events").cast("long").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "weekday_num",
        "weekday",
        "hour",
        "n_events",
        (F.round(F.col("n_events").cast("double") / F.col("total") * 1000000) / 1000000).alias(
            "share"
        ),
    )
