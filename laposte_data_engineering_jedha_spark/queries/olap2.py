"""TPC-H query-shape completion — the eleven classic join/aggregate shapes
not yet in queries/olap.py / queries/round4.py, adapted to the driver's
slimmer schema (no partsupp table; lineitem has no commit/receipt dates or
shipmode, orders no comment/shippriority — each adaptation is documented on
the query and keeps the SHAPE that makes the original interesting:
correlated EXISTS, scalar-subquery thresholds, disjunctive join predicates,
conditional aggregation, outer-join distributions).

Same cross-engine float discipline as queries/olap.py: money sums pass
through DECIMAL(18,4), quotients happen once in double, every LIMIT sorts
on a unique key, literals are CAST AS DOUBLE on the DuckDB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table

_DEC = "decimal(18,4)"


def _dsum(col) -> F.Column:
    return F.sum(col.cast(_DEC))


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


# ---------------------------------------------------------------------------


@query(
    "olap_shipping_priority",
    f"""
SELECT l_orderkey,
       CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def olap_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the unshipped-orders shipping-priority list. Segment
    filter prunes customer BEFORE its join (pushed to the parquet scan),
    the date filters prune orders and lineitem scans; orders meets lineitem
    on the orderkey shuffle, customer rides a stats-based join (broadcast
    at small SF, shuffle at 100 TB — customer scales, no hint). Group by
    orderkey then deterministic top-10 via TakeOrderedAndProject (revenue
    ties broken by orderkey). o_orderpriority stands in for the schema's
    missing o_shippriority."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(_rev()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "olap_nation_trade_volume",
    f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum({_SQL_REV}) AS DOUBLE) AS volume,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3""",
)
def olap_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. The nation-pair disjunction CANNOT be pushed below the joins (it
    spans the supplier side and the customer side), so the plan filters
    each side to the two-nation universe first — supplier and customer each
    pre-join their 25-row broadcast nation slice, shrinking both SCALING
    tables before the big orderkey/custkey shuffles — and applies the pair
    predicate after, on already-minimal rows. Four output groups."""
    lo, hi = "1996-01-01 00:00:00", "1998-01-01 00:00:00"
    nations = table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _dsum(_rev()).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "olap_product_margin",
    """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     - p_retailprice * CAST(0.6 AS DOUBLE) * l_quantity
                AS DECIMAL(18,4))) AS DOUBLE) AS margin
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2""",
)
def olap_product_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and order
    year. With no partsupp table, unit supply cost is proxied as
    p_retailprice * 0.6 (a fixed deterministic margin assumption — the
    SHAPE is the point: a part-name LIKE filter that can only prune AFTER
    the part scan, a five-way join where part joins before the wide
    revenue expression is computable, and a (nation, year) rollup).

    Scale notes: the LIKE '%red%' filter lands in the part scan
    (PushedFilters StringContains), shrinking the partkey join's build
    side; part SCALES with data so no hint (AQE decides); nation is the
    only hinted broadcast. Margin arithmetic stays in one DECIMAL sum so
    the subtraction can't wobble between engines."""
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _rev() - F.col("p_retailprice") * F.lit(0.6) * F.col("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dsum(amount).cast("double").alias("margin"))
    )


@query(
    "olap_late_lines_by_priority",
    """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus""",
)
def olap_late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (pivoted) counts of late shipments.
    The schema has no shipmode/commitdate/receiptdate, so "late" is
    l_shipdate > o_orderdate + 60 days (a cross-table inequality that —
    like the original receipt/commit comparison — only evaluates AFTER the
    orderkey join, as a join residual) and l_linestatus stands in for
    shipmode. The CASE sums are the classic one-pass pivot: one aggregate,
    two conditional counters, no second scan. Timestamp + INTERVAL is
    exact integer math in both engines."""
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "olap_order_count_distribution",
    """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""",
)
def olap_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    INCLUDING zero-order customers — which forces a LEFT OUTER join (an
    inner join would drop them) with the status filter INSIDE the join
    condition (in a WHERE it would silently turn the outer join inner:
    the classic Q13 trap, o_comment in the original). count(o_orderkey)
    counts non-null matches only, so the null-extended rows land in the
    c_count=0 bucket. Two aggregates: per-customer (reuses the join's
    custkey partitioning — zero extra Exchange) then the tiny histogram."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") != "P")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "olap_promo_revenue_share",
    f"""
SELECT CAST(100.0 AS DOUBLE)
         * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(sum({_SQL_REV}) AS DOUBLE) AS promo_share_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-02-01 00:00:00'""",
)
def olap_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the share of one month's revenue from promotional
    parts — a conditional sum over a join, emitted as a single-row ratio.
    Both the numerator and denominator come out of ONE aggregate pass
    (no second scan, no self-join); both sums are DECIMAL-exact and the
    division happens once in double, so the percentage is bit-stable
    across partitionings. The month filter prunes the lineitem scan before
    the partkey join (part scales — no broadcast hint)."""
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-02-01 00:00:00").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev().cast(_DEC)).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / _dsum(_rev()).cast("double")
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "olap_top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey, sum({_SQL_REV}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1999-04-01 00:00:00'
  GROUP BY l_suppkey),
mx AS (SELECT max(total_rev) AS max_rev FROM rev)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
CROSS JOIN mx
WHERE total_rev = max_rev
ORDER BY s_suppkey""",
)
def olap_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the quarter's maximum
    revenue — an aggregated view compared against its own scalar max.
    The max is a one-row aggregate CROSS-JOINED back with an explicit
    broadcast (never a driver collect), and the equality compares
    DECIMAL against DECIMAL — both engines' decimal sums are exact, so
    the tie set is identical by construction (comparing post-cast doubles
    would be the cross-engine trap). Supplier joins after the aggregate —
    per-supplier rows, not per-line. Ties all surface, ordered by key."""
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-04-01 00:00:00").cast("timestamp"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    rev = li.groupBy("l_suppkey").agg(_dsum(_rev()).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("max_rev"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@query(
    "olap_part_supplier_counts",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 7, 14, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < CAST(0.0 AS DOUBLE))
GROUP BY p_brand, p_type, p_size""",
)
def olap_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many qualified suppliers can furnish each
    (brand, type, size) bucket. The part-supplier relation is derived as
    DISTINCT (l_partkey, l_suppkey) from lineitem (the schema has no
    partsupp); the excluded-supplier subquery (negative account balance
    standing in for Q16's complaint comment) becomes a LEFT ANTI join.

    Scale notes: the distinct collapses the big fact table to the far
    smaller relation FIRST (one shuffle on the pair), the anti join's
    build side is the filtered supplier key list, the part predicates
    (<>, IN) all push to the part scan, and count(DISTINCT) expands
    inside one aggregate. NOT IN's null trap doesn't apply (keys are
    non-null by construction) so anti join is semantics-exact."""
    ps = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#9")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 7, 14, 23, 36, 45))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        ps.join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "olap_large_volume_customers",
    """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > CAST(250.0 AS DOUBLE))
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
)
def olap_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed jumbo orders (sum of line
    quantities over a threshold). The IN-subquery-over-HAVING becomes an
    aggregate-then-join: group lineitem by orderkey FIRST (collapsing the
    fact table before any join — sum(l_quantity) is the driver's doubles,
    but each is a small exact integer-valued double, so the sum is exact
    in both engines), keep the HAVING survivors (~0.1%), and only then
    join orders and customer. Joining before aggregating would shuffle the
    full fact table against orders for rows that mostly get discarded.
    Deterministic top-25 (price ties broken by orderkey)."""
    big = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250.0)
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@query(
    "olap_brand_band_revenue",
    f"""
SELECT CAST(sum({_SQL_REV}) AS DOUBLE) AS revenue, count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= CAST(1.0 AS DOUBLE)  AND l_quantity <= CAST(15.0 AS DOUBLE))
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND l_quantity >= CAST(10.0 AS DOUBLE) AND l_quantity <= CAST(25.0 AS DOUBLE))
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       AND l_quantity >= CAST(20.0 AS DOUBLE) AND l_quantity <= CAST(35.0 AS DOUBLE))""",
)
def olap_brand_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjunctive brand/size/quantity
    bands — the classic OR-of-ANDs join predicate. Naively this is a join
    residual only; the rewrite that matters at scale (and that Catalyst
    derives itself from the CNF — verified in the plan) is that the
    PER-TABLE implications push down: p_brand IN (1,2,3) + size >= 1 prune
    the part scan and quantity BETWEEN 1 AND 35 prunes the lineitem scan
    BEFORE the join; only the cross-table band pairing evaluates as a
    residual. Single-row conditional aggregate output."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 1.0) & (F.col("l_quantity") <= 15.0)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & (F.col("l_quantity") >= 10.0) & (F.col("l_quantity") <= 25.0)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & (F.col("l_quantity") >= 20.0) & (F.col("l_quantity") <= 35.0)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .where(band)
        .agg(
            _dsum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "olap_waiting_suppliers",
    """
WITH stats AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                             THEN l_suppkey END) AS n_late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
SELECT s_name, count(*) AS numwait
FROM late
JOIN stats USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 20""",
)
def olap_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order. The original's correlated EXISTS (some
    other supplier on the order) + NOT EXISTS (no other LATE supplier) is
    re-expressed as ONE aggregate over the order — count distinct
    suppliers and distinct late suppliers per orderkey — followed by a
    filter (n_supp >= 2, n_late_supp = 1). That turns two correlated
    self-joins of the biggest table into a single reduction plus a slim
    rejoin of the late pairs; at 100 TB both lineitem passes share the
    same orderkey shuffle shape. "Late" = shipped > 90 days after the
    order date (schema has no commit/receipt dates). Deterministic
    top-20."""
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    stats = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(is_late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    late = joined.where(is_late).select("l_orderkey", "l_suppkey").distinct()
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late.join(stats, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "olap_regional_min_price_supplier",
    """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         round(min(l_extendedprice / l_quantity) * 10000) / 10000 AS unit_price
  FROM lineitem
  WHERE l_quantity > CAST(0.0 AS DOUBLE)
  GROUP BY 1, 2),
eu AS (
  SELECT o.l_partkey, o.l_suppkey, o.unit_price, s_name, n_name
  FROM offers o
  JOIN supplier ON o.l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
best AS (SELECT l_partkey, min(unit_price) AS best_price FROM eu GROUP BY 1)
SELECT p_partkey, p_name, s_name, n_name, unit_price
FROM eu
JOIN best USING (l_partkey)
JOIN part ON l_partkey = p_partkey
WHERE unit_price = best_price AND p_size = 15
ORDER BY p_partkey, s_name""",
)
def olap_regional_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-15 part, the European supplier(s)
    quoting the minimum unit price — the correlated-min-subquery pattern.
    The offer table is derived from lineitem (min observed unit price per
    part/supplier pair; no partsupp in this schema), restricted to the
    region BEFORE the min (the correlation in Q2 is region-scoped), and
    the correlated `= (SELECT min ...)` becomes a per-part min aggregate
    joined back on partkey. Unit prices quantize through the repo's
    round(x*10000)/10000 double convention (see queries/__init__ module
    docstring; CAST-to-DECIMAL rounds HALF_UP in Spark but not in DuckDB)
    so the min-equality tie set is engine-exact — raw double division
    would make `=` a cross-engine coin flip. Supplier/nation/region prune
    the offer side before the per-part min, part's size filter prunes the
    final join."""
    offers = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 0.0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 10000)
                / 10000
            ).alias("unit_price")
        )
    )
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    eu = offers.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    best = eu.groupBy("l_partkey").agg(F.min("unit_price").alias("best_price"))
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_size") == 15)
        .select("p_partkey", "p_name")
    )
    return (
        eu.join(best, "l_partkey")
        .where(F.col("unit_price") == F.col("best_price"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("unit_price").cast("double").alias("unit_price"),
        )
        .orderBy("p_partkey", "s_name")
    )


@query(
    "olap_important_parts",
    """
WITH vol AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4))
           AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey),
tot AS (SELECT CAST(sum(part_value) * CAST(0.001 AS DECIMAL(18,4)) AS DECIMAL(38,8))
          AS threshold FROM vol)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM vol CROSS JOIN tot
WHERE part_value > threshold
ORDER BY part_value DESC, l_partkey""",
)
def olap_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant fraction of one
    nation's total supplied value — a GROUP BY whose HAVING compares
    against a scalar aggregate OF THE SAME grouped view (sum-over-sum
    with a fraction). partsupp value is proxied by shipped revenue per
    part from that nation's suppliers.

    The grouped view computes once; the total re-aggregates the (already
    tiny) per-part rows — Spark evaluates the reused subtree twice, but
    the second pass runs over the aggregate's output, not the fact
    table. The threshold stays DECIMAL end-to-end (sum * 0.001 exact at
    scale 8), so the > comparison has no float ambiguity; the output cast
    to double happens after the filter. Nation filter prunes supplier
    BEFORE the big join."""
    nation = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(_dsum(_rev()).cast("decimal(38,4)").alias("part_value"))
    )
    tot = vol.agg(
        (F.sum("part_value") * F.lit(0.001).cast(_DEC))
        .cast("decimal(38,8)")
        .alias("threshold")
    )
    return (
        vol.crossJoin(F.broadcast(tot))
        .where(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@query(
    "olap_bulk_part_suppliers",
    """
WITH bulk AS (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > CAST(45.0 AS DOUBLE))
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM bulk)
ORDER BY s_suppkey""",
)
def olap_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved bulk volume of a part family
    in one year — an IN-subquery over a GROUP BY ... HAVING on the fact
    table (the original's availqty comparison, re-anchored to shipped
    quantity; same nesting: name-filtered parts -> per-(supplier, part)
    volume -> qualifying-supplier set -> supplier/nation projection).

    Plan: part's LIKE filter and lineitem's year filter prune their scans,
    the (suppkey, partkey) aggregate collapses the fact table, and the IN
    becomes a LEFT SEMI join of supplier against the distinct qualifying
    keys — supplier never joins the raw fact table. sum(l_quantity) is a
    sum of small integer-valued doubles (exact in IEEE), so the HAVING
    threshold is engine-stable."""
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    bulk = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 45.0)
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(bulk, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "olap_yearly_growth",
    f"""
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         count(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT o_year, revenue, n_orders,
       round(CASE WHEN lag(revenue) OVER (ORDER BY o_year) IS NULL THEN NULL
                  ELSE (revenue / lag(revenue) OVER (ORDER BY o_year)
                        - CAST(1.0 AS DOUBLE)) END * 10000) / 10000
         AS yoy_growth
FROM yearly""",
)
def olap_yearly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth — the canonical reporting window
    (aggregate to one row per year, then lag over the year order). The
    window runs over a handful of pre-aggregated rows, so the global
    ordering costs nothing (the same reporting-scale trade as
    olap_customer_quartiles); the growth ratio divides two DECIMAL-exact
    sums post-cast and quantizes r4 — with lag NULL (first year) kept
    NULL, not zero."""
    from pyspark.sql import Window as W

    orders = table(spark, sf_dir, "orders")
    yearly = orders.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = W.orderBy("o_year")
    growth = F.col("revenue") / F.lag("revenue").over(w) - 1.0
    return yearly.select(
        "o_year",
        "revenue",
        "n_orders",
        (F.round(growth * 10000) / 10000).alias("yoy_growth"),
    )
