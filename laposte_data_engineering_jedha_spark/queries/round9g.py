"""Round-9 session batch 7 — distributed-systems primitives:

- dq_merkle_bucket_diff: anti-entropy table reconciliation — find WHERE
  two 100 TB replicas differ by comparing hierarchical bucket digests
  (coarse level first, fine level only inside dirty coarse buckets)
  instead of shipping rows. The "replica" here is the events table with
  one deterministic row mutated, so the dirty-path result is stable and
  oracle-checkable.
- olap_join_size_estimate: sketch-based join-cardinality estimation —
  the exact |orders JOIN customer on custkey| computed from key-grain
  count products, next to a hash-gated 1/16 key-sample estimate scaled
  back up (the optimizer primitive that prices a join before running
  it). Both paths integer-exact, so even the ESTIMATE hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import events_table, query, table

# ========================= Merkle bucket diff =================================

_MRK_COARSE = 16
_MRK_FINE = 256  # fine buckets within each dirty coarse bucket
_MRK_MUT_ID = 17  # the deterministically mutated event_id in the "replica"
_HV52 = "CAST('0x' || substr(md5({x}), 1, 13) AS BIGINT)"


@query(
    "dq_merkle_bucket_diff",
    f"""
WITH a AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
b AS (  -- replica with one deterministic mutation
  SELECT event_id, ts_us, user_id, event_type,
         CASE WHEN event_id = {_MRK_MUT_ID} THEN cents + 1 ELSE cents END AS cents
  FROM a),
da AS (SELECT event_id % {_MRK_COARSE} AS coarse,
              (event_id // {_MRK_COARSE}) % {_MRK_FINE} AS fine,
              {_HV52.format(x="CAST(event_id AS VARCHAR) || '|' || CAST(ts_us AS VARCHAR) || '|' || CAST(user_id AS VARCHAR) || '|' || event_type || '|' || CAST(cents AS VARCHAR)")} AS h
       FROM a),
db AS (SELECT event_id % {_MRK_COARSE} AS coarse,
              (event_id // {_MRK_COARSE}) % {_MRK_FINE} AS fine,
              {_HV52.format(x="CAST(event_id AS VARCHAR) || '|' || CAST(ts_us AS VARCHAR) || '|' || CAST(user_id AS VARCHAR) || '|' || event_type || '|' || CAST(cents AS VARCHAR)")} AS h
       FROM b),
ca AS (SELECT coarse, CAST(bit_xor(h) AS BIGINT) AS dig, CAST(count(*) AS BIGINT) AS n
       FROM da GROUP BY coarse),
cb AS (SELECT coarse, CAST(bit_xor(h) AS BIGINT) AS dig, CAST(count(*) AS BIGINT) AS n
       FROM db GROUP BY coarse),
dirty AS (
  SELECT ca.coarse AS coarse FROM ca JOIN cb ON ca.coarse = cb.coarse
  WHERE ca.dig <> cb.dig OR ca.n <> cb.n),
fa AS (SELECT coarse, fine, CAST(bit_xor(h) AS BIGINT) AS dig FROM da
       WHERE coarse IN (SELECT coarse FROM dirty) GROUP BY coarse, fine),
fb AS (SELECT coarse, fine, CAST(bit_xor(h) AS BIGINT) AS dig FROM db
       WHERE coarse IN (SELECT coarse FROM dirty) GROUP BY coarse, fine)
SELECT fa.coarse AS coarse, fa.fine AS fine,
       CAST(1 AS BIGINT) AS n_dirty_fine
FROM fa JOIN fb ON fa.coarse = fb.coarse AND fa.fine = fb.fine
WHERE fa.dig <> fb.dig
""",
)
def dq_merkle_bucket_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy reconciliation: locate replica divergence by
    comparing hierarchical bucket DIGESTS (bit_xor of 52-bit md5 row
    digests: order-free, mergeable, width-stable at any bucket size —
    a single-row difference flips the digest with probability
    1 - 2^-52; counts ride along to catch xor-cancelling pair
    anomalies). Level 1 compares {_MRK_COARSE}
    coarse digests; level 2 re-digests ONLY the dirty coarse buckets at
    {_MRK_FINE}-way granularity — at 100 TB the comparison ships two
    digest relations of a few KB, then scans only the divergent slice,
    never the table. The replica is the same table with event_id
    {_MRK_MUT_ID}'s value bumped one cent, so exactly one fine bucket
    reports dirty. One scan per side per level; integer-exact."""
    ev = events_table(spark, sf_dir).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    rep = ev.withColumn(
        "cents",
        F.when(F.col("event_id") == _MRK_MUT_ID, F.col("cents") + 1).otherwise(
            F.col("cents")
        ),
    )

    def digested(df: DataFrame) -> DataFrame:
        payload = F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.col("ts_us").cast("string"),
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.col("cents").cast("string"),
        )
        return df.select(
            (F.col("event_id") % _MRK_COARSE).alias("coarse"),
            F.expr(f"(event_id div {_MRK_COARSE}) % {_MRK_FINE}").alias("fine"),
            F.conv(F.substring(F.md5(payload), 1, 13), 16, 10)
            .cast("long")
            .alias("h"),
        )

    da, db = digested(ev), digested(rep)

    def coarse(d: DataFrame, dig: str, n: str) -> DataFrame:
        return d.groupBy("coarse").agg(
            F.expr("bit_xor(h)").cast("long").alias(dig),
            F.count(F.lit(1)).cast("long").alias(n),
        )

    dirty = (
        coarse(da, "dig_a", "n_a")
        .join(coarse(db, "dig_b", "n_b"), "coarse")
        .where((F.col("dig_a") != F.col("dig_b")) | (F.col("n_a") != F.col("n_b")))
        .select("coarse")
    )

    def fine(d: DataFrame, dig: str) -> DataFrame:
        return (
            d.join(F.broadcast(dirty), "coarse")
            .groupBy("coarse", "fine")
            .agg(F.expr("bit_xor(h)").cast("long").alias(dig))
        )

    return (
        fine(da, "dig_a")
        .join(fine(db, "dig_b"), ["coarse", "fine"])
        .where(F.col("dig_a") != F.col("dig_b"))
        .select("coarse", "fine", F.lit(1).cast("long").alias("n_dirty_fine"))
    )


# ========================= join size estimation ==============================

_JSE_RATE = 16  # hash-gate: keep keys with hv < 2^52 / RATE
_JSE_GATE = (1 << 52) // _JSE_RATE


@query(
    "olap_join_size_estimate",
    f"""
WITH oc AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_o
            FROM orders GROUP BY o_custkey),
cc AS (SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS n_c
       FROM customer GROUP BY c_custkey),
j AS (SELECT oc.k AS k, n_o * n_c AS contrib,
             {_HV52.format(x="CAST(oc.k AS VARCHAR)")} AS hv
      FROM oc JOIN cc ON oc.k = cc.k)
SELECT CAST(sum(contrib) AS BIGINT) AS exact_rows,
       CAST(sum(CASE WHEN hv < {_JSE_GATE} THEN contrib ELSE 0 END)
            * {_JSE_RATE} AS BIGINT) AS estimated_rows,
       CAST(count(*) AS BIGINT) AS n_join_keys,
       CAST(sum(CASE WHEN hv < {_JSE_GATE} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled_keys
FROM j
""",
)
def olap_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation, the optimizer primitive that prices
    a join before running it: |orders JOIN customer| = sum over join
    keys of n_orders(k) * n_customers(k), computed (a) exactly from the
    two key-grain count relations, and (b) from the 1/{_JSE_RATE}
    hash-gated key sample scaled back up — the estimator a planner runs
    on sketches when the key-grain relations are themselves too big to
    join (sample-by-KEY, not by row: per-key contributions stay intact,
    the estimator is unbiased over the hash choice). Deterministic md5
    gate -> even the estimate hash-matches. Aggregates at key grain, one
    co-partitioned join, a 1-row result."""
    o = table(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_o"))
    c = table(spark, sf_dir, "customer").groupBy(
        F.col("c_custkey").alias("k")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_c"))
    j = o.join(c, "k").select(
        (F.col("n_o") * F.col("n_c")).alias("contrib"),
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .alias("hv"),
    )
    sampled = F.when(F.col("hv") < _JSE_GATE, F.col("contrib")).otherwise(0)
    return j.agg(
        F.sum("contrib").cast("long").alias("exact_rows"),
        (F.sum(sampled) * _JSE_RATE).cast("long").alias("estimated_rows"),
        F.count(F.lit(1)).cast("long").alias("n_join_keys"),
        F.sum(F.when(F.col("hv") < _JSE_GATE, 1).otherwise(0))
        .cast("long")
        .alias("n_sampled_keys"),
    )
