"""Round-6 session batch 6 — operational reconciliation + audience
analytics, each with a full DuckDB oracle twin:

- dq_table_checksums: order-independent per-table key checksums — the
  anti-entropy primitive replication/migration audits diff between two
  systems (count + SUM of a portable key hash commutes over partitioning,
  so two engines / two clusters can compare without moving rows). Here
  the two systems are literally Spark and DuckDB over the same files.
- events_audience_overlap: pairwise Jaccard of event-type audiences
  (distinct-user sets) — the channel-overlap matrix; integer set sizes
  with one final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texts
from . import events_table, query, spread_table, table

# table -> portable key expression (string) used for the checksum; the
# lineitem composite key mirrors its (orderkey, linenumber) primary key.
_CHECKSUM_KEYS = {
    "region": "CAST(r_regionkey AS VARCHAR)",
    "nation": "CAST(n_nationkey AS VARCHAR)",
    "customer": "CAST(c_custkey AS VARCHAR)",
    "supplier": "CAST(s_suppkey AS VARCHAR)",
    "part": "CAST(p_partkey AS VARCHAR)",
    "orders": "CAST(o_orderkey AS VARCHAR)",
    "lineitem": "CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR)",
    "events": "CAST(event_id AS VARCHAR)",
    "documents": "CAST(doc_id AS VARCHAR)",
    "embeddings": "CAST(vec_id AS VARCHAR)",
}

_CHECKSUM_SQL = " UNION ALL ".join(
    f"""
SELECT '{t}' AS tbl, count(*) AS n_rows,
       CAST(sum(CAST('0x' || substr(md5({k}), 1, 8) AS BIGINT)) AS BIGINT)
         AS key_checksum
FROM {t}"""
    for t, k in _CHECKSUM_KEYS.items()
)


@query("dq_table_checksums", _CHECKSUM_SQL)
def dq_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy checksum report over every table: row count + the SUM
    of the 32-bit md5 of each primary key (lineitem uses its composite
    key). Because SUM is commutative and the hash is engine-portable, the
    pair (n_rows, key_checksum) can be computed independently on any two
    systems holding supposedly-identical data and diffed without moving a
    row — the replication / migration / backup-restore audit primitive.
    Map-side-combining aggregate per table, no shuffle wider than one row
    per table."""
    frames = []
    for t in _CHECKSUM_KEYS:
        # per-row md5 on a 1-task scan is the whole cost for the big
        # tables — spread (guide §2.5; SUM is commutative by design here,
        # the query's own portability contract). Small tables sit under
        # the byte floor and keep their single-task scan.
        df = spread_table(spark, sf_dir, t)
        if t == "lineitem":
            key = F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit("#"),
                F.col("l_linenumber").cast("string"),
            )
        else:
            pk = {
                "region": "r_regionkey",
                "nation": "n_nationkey",
                "customer": "c_custkey",
                "supplier": "s_suppkey",
                "part": "p_partkey",
                "orders": "o_orderkey",
                "events": "event_id",
                "documents": "doc_id",
                "embeddings": "vec_id",
            }[t]
            key = F.col(pk).cast("string")
        frames.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(texts.md5int32(key)).cast("long").alias("key_checksum"),
            ).select(F.lit(t).alias("tbl"), "n_rows", "key_checksum")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@query(
    "events_audience_overlap",
    """
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
c AS (SELECT event_type, count(*) AS n FROM d GROUP BY event_type),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_inter
      FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type)
SELECT type_a, type_b, ca.n AS n_a, cb.n AS n_b, n_inter,
       CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) AS jaccard
FROM p JOIN c ca ON p.type_a = ca.event_type
       JOIN c cb ON p.type_b = cb.event_type
""",
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel-overlap matrix: Jaccard similarity between the distinct-user
    audiences of every event-type pair. The self-join on user_id fans out
    at most |types|^2 rows per user (bounded by the type vocabulary, not
    the event volume), so the shape survives any event count; all set
    sizes stay integral until the one final division (exact same IEEE op
    on both engines)."""
    ev = events_table(spark, sf_dir)
    d = ev.select("event_type", "user_id").distinct()
    c = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = d.select(F.col("event_type").alias("type_a"), "user_id")
    b = d.select(F.col("event_type").alias("type_b"), "user_id")
    p = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = c.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    cb = c.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        p.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_inter",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
