"""Three-way consistency: for the TPC-H-shape queries whose oracle SQL is
ANSI enough to be valid Spark SQL too, running that SQL through
spark.sql() over registered views must equal the DataFrame-API plan —
Spark-SQL == Spark-DataFrame == (via the oracle gate) DuckDB. Proves the
engine serves BOTH query APIs with identical semantics, not just the
DataFrame surface."""

from __future__ import annotations

import pytest

from laposte_data_engineering_jedha_spark import queries as q

# Queries whose DuckDB oracle text is also valid Spark SQL (no DuckDB-only
# functions like string_split_regex / list comprehensions / epoch_us).
SQL_PORTABLE = [
    "olap_shipping_priority",
    "olap_nation_trade_volume",
    "olap_product_margin",
    "olap_late_lines_by_priority",
    "olap_order_count_distribution",
    "olap_promo_revenue_share",
    "olap_top_supplier",
    "olap_part_supplier_counts",
    "olap_large_volume_customers",
    "olap_brand_band_revenue",
    "olap_waiting_suppliers",
    "olap_important_parts",
    "olap_bulk_part_suppliers",
    "olap_customer_quartiles",
    # round-5 session additions that are also ANSI-portable
    "dq_orders_checks",
    "dq_lineitem_checks",
    "events_salted_spend",
    "events_windowed_topk",
    "stream_windowed_topk",
    "olap_unpivot_metrics",
    # round-6 session additions that are also ANSI-portable
    "events_heavy_hitters",
    "dq_k_anonymity",
    "corpus_length_gini",
    "events_audience_overlap",
    "events_forecast_seasonal_naive",
    # round-7 session additions that are also ANSI-portable
    "events_target_encoding",
    "olap_numeric_corr_matrix",
    "olap_returns_rate_by_brand",
    "olap_order_value_log2_histogram",
    "olap_customer_concentration",
    "events_value_anova_f",
    "corpus_lang_source_contingency",
    "olap_open_order_backlog",
    "dq_part_name_links",
    # dq_value_first_digit / dq_uniqueness_report stay DuckDB-only: their
    # oracles CAST AS VARCHAR (no length), which Spark SQL rejects
]

@pytest.fixture(scope="module")
def sql_views(spark, sf_dir):
    # register_sql_views covers all 10 tables INCLUDING the events
    # timestamp contract (nanos parquet -> TimestampType), which the
    # round-5 portable queries need
    q.register_sql_views(spark, sf_dir)
    yield
    for t in q.TABLE_NAMES:
        spark.catalog.dropTempView(t)


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(row[c]) for c in cols) for row in df.collect())


@pytest.mark.parametrize("name", SQL_PORTABLE)
def test_spark_sql_matches_dataframe_api(name, spark, sf_dir, sql_views):
    sql = q.oracle_sql()[name]
    via_sql = spark.sql(sql)
    via_df = q.queries()[name](spark, sf_dir)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert _canon(via_sql) == _canon(via_df)


def test_register_sql_views_serves_plain_sql(spark, sf_dir):
    """A user can point the engine at a data directory and go straight to
    SQL — including the events timestamp contract."""
    q.register_sql_views(spark, sf_dir)
    try:
        n = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
        assert n > 0
        r = spark.sql(
            "SELECT count(*) AS n FROM events WHERE hour(ts) BETWEEN 0 AND 23"
        ).first()["n"]
        assert r > 0  # ts is a real timestamp, not raw nanos
    finally:
        for t in q.TABLE_NAMES:
            spark.catalog.dropTempView(t)
