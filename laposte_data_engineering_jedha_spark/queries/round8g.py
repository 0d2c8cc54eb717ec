"""Round-8 session batch 7 — mergeable sketches + drift monitors:

- sketch_histogram_quantiles: quantile estimation from a FIXED-WIDTH
  mergeable histogram (the 100 TB shape: per-partition histograms merge
  by cell addition — one tiny rollup replaces a global sort), with the
  estimate's error against the exact percentile on the same run.
- events_count_min_estimate: a Count-Min sketch (4 x 1024, md5 row
  hashes) over event types — the mergeable frequency sketch — with the
  min-over-rows estimate vs the true count per key (CM error is
  one-sided: estimate >= truth, pinned in the output).
- olap_monthly_revenue_anomaly: month-grain revenue z-scores from BIGINT
  moments — the revenue-drop pager.
- dq_cardinality_drift: distinct-cardinality ratio between the two
  orderkey-parity halves of `orders` per column — the cheap drift check
  between "yesterday's load" and "today's" when both halves should look
  alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query, table

# ===================== histogram-sketch quantiles ============================

_HBUCKET = 65_536  # cents per bucket (~$655) — 1k buckets over the domain
_HQS = [("p50", 0.5), ("p95", 0.95), ("p99", 0.99)]


@query(
    "sketch_histogram_quantiles",
    f"""
WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
h AS (SELECT cents // {_HBUCKET} AS bucket, CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY bucket),
c AS (SELECT bucket, n,
             CAST(sum(n) OVER (ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM h),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h),
ex AS (SELECT {", ".join(f"quantile_cont(cents, {p}) AS ex_{lbl}" for lbl, p in _HQS)}
       FROM v),
est AS ({" UNION ALL ".join(
    f"SELECT '{lbl}' AS p_label, CAST({p} AS DOUBLE) AS p, "
    f"CAST(min(bucket) * {_HBUCKET} AS BIGINT) AS est_cents, ex_{lbl} AS exact_cents "
    f"FROM c CROSS JOIN t CROSS JOIN ex "
    f"WHERE cum * 1000000 >= CAST(round({p} * 1000000) AS BIGINT) * total "
    f"GROUP BY ex_{lbl}" for lbl, p in _HQS)})
SELECT p_label, p, est_cents, exact_cents,
       CAST(round(abs(CAST(est_cents AS DOUBLE) - exact_cents)
                  / exact_cents * 1000000) AS BIGINT) AS err_ppm
FROM est
""",
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a fixed-width histogram sketch: bucket = integer
    cents div 65536, estimate = the lower edge of the first bucket whose
    cumulative count reaches p (the integer-exact `cum * 1e6 >=
    round(p*1e6) * total` form — no float thresholds). The histogram is
    the MERGEABLE quantile structure at 100 TB: per-partition cell counts
    add, so the shuffle carries <=|buckets| rows instead of sorting the
    column; error vs the exact percentile (bounded by one bucket width)
    is reported on the same run. The cumsum window runs on the <=1k-row
    histogram only."""
    v = table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    h = v.groupBy(F.expr(f"cents div {_HBUCKET}").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    c = h.select(
        "bucket",
        "n",
        F.sum("n")
        .over(Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
    )
    t = h.agg(F.sum("n").cast("long").alias("total"))
    ex = v.agg(
        *[F.expr(f"percentile(cents, {p})").alias(f"ex_{lbl}") for lbl, p in _HQS]
    )
    out = None
    joined = c.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(ex))
    for lbl, p in _HQS:
        row = (
            joined.where(
                F.col("cum") * 1000000
                >= F.lit(int(round(p * 1000000))) * F.col("total")
            )
            .groupBy(F.col(f"ex_{lbl}").alias("exact_cents"))
            .agg((F.min("bucket") * _HBUCKET).cast("long").alias("est_cents"))
            .select(
                F.lit(lbl).alias("p_label"),
                F.lit(float(p)).alias("p"),
                "est_cents",
                "exact_cents",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "p_label",
        "p",
        "est_cents",
        "exact_cents",
        F.round(
            F.abs(F.col("est_cents").cast("double") - F.col("exact_cents"))
            / F.col("exact_cents")
            * 1000000
        )
        .cast("long")
        .alias("err_ppm"),
    )


# ========================= count-min sketch ==================================

_CM_D, _CM_W = 4, 1024


def _sql_cm_cell(r, key: str) -> str:
    return f"CAST('0x' || substr(md5('{r}_' || {key}), 1, 8) AS BIGINT) % {_CM_W}"


@query(
    "events_count_min_estimate",
    f"""
WITH rows_ AS (
  SELECT event_type, r.range AS r,
         CASE r.range {" ".join(f"WHEN {r} THEN {_sql_cm_cell(r, 'event_type')}" for r in range(_CM_D))} END AS cell
  FROM events CROSS JOIN range(0, {_CM_D}) r),
cm AS (SELECT r, cell, CAST(count(*) AS BIGINT) AS n FROM rows_ GROUP BY r, cell),
keys_ AS (SELECT event_type, CAST(count(*) AS BIGINT) AS true_n
          FROM events GROUP BY event_type),
probe AS (
  SELECT event_type, true_n, r.range AS r,
         CASE r.range {" ".join(f"WHEN {r} THEN {_sql_cm_cell(r, 'event_type')}" for r in range(_CM_D))} END AS cell
  FROM keys_ CROSS JOIN range(0, {_CM_D}) r)
SELECT event_type, true_n,
       CAST(min(cm.n) AS BIGINT) AS cm_estimate,
       CAST(min(cm.n) - true_n AS BIGINT) AS overcount
FROM probe JOIN cm ON probe.r = cm.r AND probe.cell = cm.cell
GROUP BY event_type, true_n
""",
)
def events_count_min_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over event types: 4 md5 row hashes into 1024
    cells each, estimate = min over rows of the landed cell's count —
    with the true count and the (always >= 0) overcount alongside. The
    sketch is the mergeable frequency structure at 100 TB: cells add
    across partitions, so the shuffle carries <=4096 rows regardless of
    key cardinality; the md5 hashing is identically computable on both
    engines (the LSH hyperplane convention). The fixture's key space is
    tiny so collisions are rare — overcount == 0 rows ARE the check that
    the addressing matches across engines."""
    from . import events_table

    ev = events_table(spark, sf_dir)

    def cell(r: int) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{r}_"), F.col("event_type"))), 1, 8),
            16,
            10,
        ).cast("long") % _CM_W

    # posexplode of the precomputed cell array: each row hashes its key
    # exactly _CM_D times (the indexed-array formulation re-evaluated the
    # whole array per exploded row — 4x the md5 work, measured 2.5 s vs
    # 0.7 s at sf0.1)
    rows_ = ev.select(
        F.posexplode(F.array(*[cell(r) for r in range(_CM_D)])).alias("r", "cell")
    )
    cm = rows_.groupBy("r", "cell").agg(F.count(F.lit(1)).cast("long").alias("n"))
    keys_ = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    probe = keys_.select(
        "event_type",
        "true_n",
        F.posexplode(F.array(*[cell(r) for r in range(_CM_D)])).alias("r", "cell"),
    )
    return (
        probe.join(cm, ["r", "cell"])
        .groupBy("event_type", "true_n")
        .agg(F.min("n").cast("long").alias("cm_estimate"))
        .select(
            "event_type",
            "true_n",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("true_n")).cast("long").alias("overcount"),
        )
    )


# ===================== monthly revenue anomaly ===============================


@query(
    "olap_monthly_revenue_anomaly",
    """
WITH m AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY month),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sxx
      FROM m),
z AS (SELECT month, cents,
             CAST(n * cents - sx AS DOUBLE) AS num,
             CAST(n * (n * sxx - sx * sx) AS DOUBLE) AS den2,
             (n * sxx = sx * sx) AS flat
      FROM m CROSS JOIN s)
SELECT month, cents AS revenue_cents,
       CASE WHEN flat THEN CAST(0.0 AS DOUBLE)
            ELSE round(num / sqrt(den2) * 10000) / 10000 END AS zscore,
       CASE WHEN NOT flat AND abs(num / sqrt(den2)) >= 2.0
            THEN 1 ELSE 0 END AS is_anomaly
FROM z
""",
)
def olap_monthly_revenue_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-grain revenue z-scores from exact integer moments — z =
    (n*x - sx) / sqrt(n * (n*sxx - sx^2)), everything integer until the
    one final division, so the flag never depends on float accumulation
    order. Month cents^2 overflows BIGINT even at sf0.01, so the moments
    run in DECIMAL(38,0) on Spark / HUGEINT in DuckDB (the supplier_hhi
    precedent) — both exact, both cast to DOUBLE only inside the final
    expression. |z| >= 2 marks the months a revenue pager would fire on.
    One order-grain aggregate, a broadcast 1-row moment set."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = m.agg(
        dec(F.count(F.lit(1))).alias("n"),
        F.sum(dec(F.col("cents"))).cast("decimal(38,0)").alias("sx"),
        F.sum(dec(F.col("cents")) * F.col("cents")).cast("decimal(38,0)").alias("sxx"),
    )
    j = m.crossJoin(F.broadcast(s))
    num = (F.col("n") * F.col("cents") - F.col("sx")).cast("double")
    var_int = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den2 = (F.col("n") * var_int).cast("double")
    flat = F.col("n") * F.col("sxx") == F.col("sx") * F.col("sx")
    z = num / F.sqrt(den2)
    return j.select(
        "month",
        F.col("cents").alias("revenue_cents"),
        F.when(flat, F.lit(0.0)).otherwise(F.round(z * 10000) / 10000).alias("zscore"),
        F.when(~flat & (F.abs(z) >= 2.0), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_anomaly"
        ),
    )


# ======================== cardinality drift ==================================

_DRIFT_COLS = ["o_custkey", "o_orderstatus", "o_orderpriority"]

_DRIFT_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS column_name, "
    f"CAST(count(DISTINCT CASE WHEN o_orderkey % 2 = 0 THEN {c} END) AS BIGINT) AS n_distinct_a, "
    f"CAST(count(DISTINCT CASE WHEN o_orderkey % 2 = 1 THEN {c} END) AS BIGINT) AS n_distinct_b, "
    f"CAST(least(count(DISTINCT CASE WHEN o_orderkey % 2 = 0 THEN {c} END),"
    f"            count(DISTINCT CASE WHEN o_orderkey % 2 = 1 THEN {c} END)) * 1000000"
    f" // greatest(count(DISTINCT CASE WHEN o_orderkey % 2 = 0 THEN {c} END),"
    f"             count(DISTINCT CASE WHEN o_orderkey % 2 = 1 THEN {c} END), 1)"
    f" AS BIGINT) AS similarity_ppm "
    f"FROM orders"
    for c in _DRIFT_COLS
)


@query("dq_cardinality_drift", _DRIFT_SQL)
def dq_cardinality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-cardinality agreement between the two orderkey-parity
    halves of `orders` — the cheap snapshot-vs-snapshot drift monitor (a
    load that drops a customer segment or a new enum value shows up as a
    similarity dip long before value-level checks fire). similarity =
    min/max of the two distinct counts, integer ppm; one aggregate pass
    per column over one table scan."""
    o = table(spark, sf_dir, "orders")
    out = None
    for c in _DRIFT_COLS:
        a = F.count_distinct(
            F.when(F.col("o_orderkey") % 2 == 0, F.col(c))
        ).cast("long")
        b = F.count_distinct(
            F.when(F.col("o_orderkey") % 2 == 1, F.col(c))
        ).cast("long")
        row = o.agg(a.alias("n_distinct_a"), b.alias("n_distinct_b")).select(
            F.lit(c).alias("column_name"),
            "n_distinct_a",
            "n_distinct_b",
            F.expr(
                "(least(n_distinct_a, n_distinct_b) * 1000000)"
                " div greatest(n_distinct_a, n_distinct_b, 1)"
            )
            .cast("long")
            .alias("similarity_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out
