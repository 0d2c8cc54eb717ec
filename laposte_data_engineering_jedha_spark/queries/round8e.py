"""Round-8 session batch 5 — warehouse-wide data-quality reports:

- dq_null_rate_report: null counts per (table, column) across the four
  live fact/dim surfaces — the completeness monitor (all-zero on the
  synthetic fixture, which is itself the assertion).
- dq_numeric_range_report: declared-bounds violations per numeric column
  (TPC-H's documented domains) — the validity monitor.
- dq_duplicate_key_report: primary-key uniqueness per table, with the
  lineitem composite key packed into one BIGINT (linenumber < 10) so the
  distinct-count is a plain integer distinct on both engines.
- dq_ship_before_order: lines shipped BEFORE their order was placed, per
  order status — the cross-table temporal sanity rule.

Each report is a union of per-table single-pass aggregates; nothing
shuffles beyond the per-table 1-row combines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import events_table, query, table

# ============================ null-rate report ===============================

_NULL_COLS = [
    ("orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]),
    ("lineitem", ["l_returnflag", "l_linestatus", "l_shipdate"]),
    ("documents", ["text", "lang", "source"]),
    ("events", ["event_type", "value", "props"]),
]

_NULL_SQL = " UNION ALL ".join(
    f"SELECT '{t}' AS table_name, '{c}' AS column_name, "
    f"CAST(count(*) AS BIGINT) AS n_rows, "
    f"CAST(count(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_null "
    f"FROM {t}"
    for t, cols in _NULL_COLS
    for c in cols
)


@query("dq_null_rate_report", _NULL_SQL)
def dq_null_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness monitor: per (table, column), row and NULL counts for
    the columns every downstream query assumes populated. On the
    synthetic fixture every n_null is 0 — the report existing and
    agreeing across engines IS the gate; on a real lake the non-zero rows
    are the incident feed. One aggregate pass per table (the per-column
    counts share it), unioned at 12 rows."""
    out = None
    for t, cols in _NULL_COLS:
        df = events_table(spark, sf_dir) if t == "events" else table(spark, sf_dir, t)
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                F.count(F.when(F.col(c).isNull(), 1)).cast("long").alias(f"null_{i}")
                for i, c in enumerate(cols)
            ],
        )
        for i, c in enumerate(cols):
            row = agg.select(
                F.lit(t).alias("table_name"),
                F.lit(c).alias("column_name"),
                "n_rows",
                F.col(f"null_{i}").alias("n_null"),
            )
            out = row if out is None else out.unionByName(row)
    return out


# =========================== numeric-range report ============================

# (table, column, lo, hi) — TPC-H documented domains + the events value
_RANGE_RULES = [
    ("lineitem", "l_discount", "0.0", "0.1"),
    ("lineitem", "l_tax", "0.0", "0.08"),
    ("lineitem", "l_quantity", "1.0", "50.0"),
    ("orders", "o_totalprice", "0.0", "1000000.0"),
    ("events", "value", "0.0", "10000.0"),
]

_RANGE_SQL = " UNION ALL ".join(
    f"SELECT '{t}' AS table_name, '{c}' AS column_name, "
    f"CAST({lo} AS DOUBLE) AS lo, CAST({hi} AS DOUBLE) AS hi, "
    f"CAST(count(*) AS BIGINT) AS n_rows, "
    f"CAST(count(*) FILTER (WHERE {c} < {lo}) AS BIGINT) AS n_below, "
    f"CAST(count(*) FILTER (WHERE {c} > {hi}) AS BIGINT) AS n_above "
    f"FROM {t}"
    for t, c, lo, hi in _RANGE_RULES
)


@query("dq_numeric_range_report", _RANGE_SQL)
def dq_numeric_range_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity monitor: per declared numeric domain, the count of rows
    below/above it. Raw comparisons only (no arithmetic), so no float
    discipline is even needed; one aggregate per table."""
    out = None
    by_table: dict[str, list] = {}
    for t, c, lo, hi in _RANGE_RULES:
        by_table.setdefault(t, []).append((c, lo, hi))
    for t, rules in by_table.items():
        df = events_table(spark, sf_dir) if t == "events" else table(spark, sf_dir, t)
        agg = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                x
                for i, (c, lo, hi) in enumerate(rules)
                for x in (
                    F.count(F.when(F.col(c) < float(lo), 1))
                    .cast("long")
                    .alias(f"b_{i}"),
                    F.count(F.when(F.col(c) > float(hi), 1))
                    .cast("long")
                    .alias(f"a_{i}"),
                )
            ],
        )
        for i, (c, lo, hi) in enumerate(rules):
            row = agg.select(
                F.lit(t).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.lit(float(lo)).alias("lo"),
                F.lit(float(hi)).alias("hi"),
                "n_rows",
                F.col(f"b_{i}").alias("n_below"),
                F.col(f"a_{i}").alias("n_above"),
            )
            out = row if out is None else out.unionByName(row)
    return out


# ========================== duplicate-key report =============================

# (table, SQL key expr, Spark key column builder) — composite lineitem key
# packs into one BIGINT (l_linenumber in 1..7)
_KEY_RULES = [
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey * 10 + l_linenumber"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]

_DUPKEY_SQL = " UNION ALL ".join(
    f"SELECT '{t}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows, "
    f"CAST(count(DISTINCT {k}) AS BIGINT) AS n_keys, "
    f"CAST(count(*) - count(DISTINCT {k}) AS BIGINT) AS n_dup_rows "
    f"FROM {t}"
    for t, k in _KEY_RULES
)


@query("dq_duplicate_key_report", _DUPKEY_SQL)
def dq_duplicate_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness per table: rows vs distinct keys vs the dup
    excess. The lineitem composite (orderkey, linenumber) packs into one
    BIGINT (linenumber < 10), so every check is a plain integer
    count-distinct with map-side partials."""
    out = None
    for t, k in _KEY_RULES:
        df = events_table(spark, sf_dir) if t == "events" else table(spark, sf_dir, t)
        row = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(F.expr(k)).cast("long").alias("n_keys"),
        ).select(
            F.lit(t).alias("table_name"),
            "n_rows",
            "n_keys",
            (F.col("n_rows") - F.col("n_keys")).cast("long").alias("n_dup_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ========================== ship-before-order rule ===========================


@query(
    "dq_ship_before_order",
    """
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE l_shipdate < o_orderdate) AS BIGINT)
         AS n_ship_before_order,
       CAST(count(*) FILTER (WHERE l_shipdate < o_orderdate) * 1000000
            // count(*) AS BIGINT) AS violation_ppm
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
)
def dq_ship_before_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal sanity across tables: lines whose ship date precedes their
    order's placement date, per order status — the invariant an
    out-of-order CDC apply or timezone bug breaks first. (The synthetic
    fixture draws the two dates independently, so a large violation mass
    is the CORRECT report here — same contract as
    dq_order_line_status_consistency.) One co-partitioned orderkey join,
    raw date comparisons, integer ppm."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderstatus")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    viol = F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1)
    return j.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.count(viol).cast("long").alias("n_ship_before_order"),
        F.expr(
            "(count(CASE WHEN l_shipdate < o_orderdate THEN 1 END) * 1000000)"
            " div count(*)"
        )
        .cast("long")
        .alias("violation_ppm"),
    )
