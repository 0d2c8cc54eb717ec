"""Round-7 session batch 3 — entity resolution + data-quality +
engagement reporting, all with full DuckDB oracle twins.

- dq_part_name_links: blocked fuzzy entity resolution over part names at
  the DISTINCT-NAME grain — the classic record-linkage shape (block ->
  candidate pairs -> edit-distance verify) made scale-proof by matching
  name VALUES (bounded by the vocabulary) and carrying row multiplicities
  as weights, so pair volume never grows with corpus size.
- dq_uniqueness_report: primary-key uniqueness audit across the star
  schema's keyed tables in one row per table — the first DQ gate after
  any load (a dup key silently double-counts every downstream join).
- events_dau_wau_ratio: daily active users, trailing-7-day active users,
  and the DAU/WAU stickiness ratio — computed from the (day, user)
  distinct grain so the trailing window is a bounded 7x fan-out join on
  the day key, never a distinct-count-over-window on the raw stream.

Cross-engine notes: Spark F.levenshtein and DuckDB levenshtein are both
classic unit-cost edit distance (verified on adversarial cases incl.
empty string); counts stay integral until single final divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import events_table, query, spread_table, table

# ====================== blocked fuzzy entity resolution ======================

_LEV_MAX = 3


@query(
    "dq_part_name_links",
    f"""
WITH names AS (
  SELECT p_name AS name, split_part(p_name, ' ', 2) AS blk,
         CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY p_name),
pairs AS (
  SELECT a.blk AS block, a.name AS name_a, b.name AS name_b,
         CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev,
         a.n * b.n AS n_pairs
  FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name)
SELECT block, name_a, name_b, lev, n_pairs
FROM pairs WHERE lev <= {_LEV_MAX}
""",
)
def dq_part_name_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy links between part names: block on the head noun (the
    standard ER blocking key — candidates only form within a block),
    verify candidates with edit distance <= {_LEV_MAX}, and weight each
    link by the product of the two names' row counts.

    Scale design: the join runs at the DISTINCT-NAME grain, so candidate
    volume is bounded by the name vocabulary squared within a block —
    constant as the corpus grows — while `n_pairs` still reports the
    row-level link mass. Matching raw rows instead (the naive ER join)
    would be quadratic in block row count: the same trap the df-capped
    passage matrix guards against. Both engines use unit-cost
    Levenshtein (parity spot-checked incl. the empty-string edge)."""
    names = (
        table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("blk", F.split("name", " ").getItem(1))
    )
    a = names.select(
        F.col("blk").alias("block"),
        F.col("name").alias("name_a"),
        F.col("n").alias("na"),
    )
    b = names.select(
        F.col("blk").alias("block"),
        F.col("name").alias("name_b"),
        F.col("n").alias("nb"),
    )
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "block",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("lev"),
            (F.col("na") * F.col("nb")).alias("n_pairs"),
        )
        .where(F.col("lev") <= _LEV_MAX)
    )


# ========================== PK uniqueness audit ==============================

_PK_TABLES = [
    ("orders", "CAST(o_orderkey AS VARCHAR)"),
    ("customer", "CAST(c_custkey AS VARCHAR)"),
    ("part", "CAST(p_partkey AS VARCHAR)"),
    ("supplier", "CAST(s_suppkey AS VARCHAR)"),
    ("events", "CAST(event_id AS VARCHAR)"),
    ("documents", "CAST(doc_id AS VARCHAR)"),
    ("lineitem", "CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)"),
]

_UNIQ_SQL = " UNION ALL ".join(
    f"""SELECT '{t}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {k}) AS BIGINT) AS n_distinct_keys,
       CAST(count(*) - count(DISTINCT {k}) AS BIGINT) AS n_dup_rows
FROM {t}"""
    for t, k in _PK_TABLES
)

_SPARK_PK = {
    "orders": lambda: F.col("o_orderkey").cast("string"),
    "customer": lambda: F.col("c_custkey").cast("string"),
    "part": lambda: F.col("p_partkey").cast("string"),
    "supplier": lambda: F.col("s_suppkey").cast("string"),
    "events": lambda: F.col("event_id").cast("string"),
    "documents": lambda: F.col("doc_id").cast("string"),
    "lineitem": lambda: F.concat_ws(
        "_", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    ),
}


@query("dq_uniqueness_report", _UNIQ_SQL)
def dq_uniqueness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: one row per keyed table with row
    count, distinct-key count, and the dup surplus. The first gate after
    any ingest — a duplicated key double-counts every downstream join
    and breaks MERGE semantics. Each table costs one count-distinct
    aggregate (map-side partials; the composite lineitem key is
    canonicalized to one string identically on both engines); the seven
    1-row aggregates union into the report."""
    frames = []
    for t, _ in _PK_TABLES:
        # r13 optimization (guide §2.5): the composite-key canonicalization
        # + count-distinct partials over the biggest single-row-group file
        # serialize on one task — spread lineitem only (measured 1.50 ->
        # 0.86 s isolated; events/orders spreads REGRESS, the recorded
        # events-family finding). Distinct counts are
        # partitioning-independent; at 100 TB the scan splits itself.
        if t == "lineitem":
            df = spread_table(spark, sf_dir, t, key="l_orderkey")
        else:
            df = table(spark, sf_dir, t)
        key = _SPARK_PK[t]()
        frames.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count_distinct(key).cast("long").alias("n_distinct_keys"),
            ).select(
                F.lit(t).alias("table_name"),
                "n_rows",
                "n_distinct_keys",
                (F.col("n_rows") - F.col("n_distinct_keys")).alias("n_dup_rows"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


# ============================ DAU / WAU stickiness ===========================


@query(
    "events_dau_wau_ratio",
    """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day),
wau AS (
  SELECT d.day AS day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM days d JOIN du u
    ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day)
SELECT dau.day AS day, dau.dau AS dau, wau.wau AS wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau * 1000000) / 1000000
         AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
""",
)
def events_dau_wau_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day actives, and DAU/WAU
    stickiness per day. The raw stream reduces ONCE to the distinct
    (day, user) grain; the trailing window is then a <=7x fan-out join
    keyed on day over that bounded relation — never a
    distinct-count-over-window on raw events, which Spark cannot
    express and a naive self-join would explode. The tiny day dimension
    broadcasts into the range join."""
    ev = events_table(spark, sf_dir)
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    wau = (
        F.broadcast(days.select(F.col("day").alias("d")))
        .join(
            du.select(F.col("day").alias("uday"), "user_id"),
            (F.col("uday") >= F.date_sub(F.col("d"), 6)) & (F.col("uday") <= F.col("d")),
        )
        .groupBy(F.col("d").alias("day"))
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.round(F.col("dau").cast("double") / F.col("wau") * 1000000) / 1000000).alias(
            "stickiness"
        ),
    )
