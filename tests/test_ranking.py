"""operators/ranking — exact global ranking / ntile banding without a
single-partition window (r8 verdict weak items: the customer-grain ntile
family and the doc-grain row_number were the registry's last fat-task
shapes). The contract under test: bit-identical results to the global
window at ANY partition count."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from laposte_data_engineering_jedha_spark.operators import caches, ranking


@pytest.fixture()
def spend_df(spark):
    # 997 rows, values collide heavily (mod 53) so band boundaries cross
    # tie groups; key breaks ties deterministically
    rows = [(i, float((i * 7919) % 53)) for i in range(1, 998)]
    return spark.createDataFrame(rows, "key long, spend double")


def _window_ranks(df):
    return {
        r["key"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("spend").desc(), "key"))
        ).collect()
    }


def test_global_ranks_matches_global_window(spark, spend_df):
    ranked, total = ranking.global_ranks(
        spend_df, F.col("spend").desc(), "key", rank_col="rn"
    )
    got = {r["key"]: r["rn"] for r in ranked.collect()}
    caches.release_all()
    assert total == 997
    assert got == _window_ranks(spend_df)


@pytest.mark.parametrize("n", [3, 4, 10, 1000])
def test_exact_ntile_matches_window_ntile(spark, spend_df, n):
    """Including n > N (1000 bands over 997 rows: every band is one row —
    the q == 0 branch)."""
    want = {
        r["key"]: r["band"]
        for r in spend_df.withColumn(
            "band",
            F.ntile(n).over(Window.orderBy(F.col("spend").desc(), "key")),
        ).collect()
    }
    got = {
        r["key"]: r["band"]
        for r in ranking.exact_ntile(
            spend_df, n, F.col("spend").desc(), "key"
        ).collect()
    }
    caches.release_all()
    assert got == want


def test_exact_ntile_partition_count_invariance(spark, spend_df):
    """The band assignment must not depend on how many range partitions
    the two-pass ranking used (1 partition == the degenerate global
    case; 64 > distinct values forces empty partitions)."""
    base = {
        r["key"]: r["band"]
        for r in ranking.exact_ntile(
            spend_df, 4, F.col("spend").desc(), "key", n_partitions=8
        ).collect()
    }
    for n_part in (1, 64):
        got = {
            r["key"]: r["band"]
            for r in ranking.exact_ntile(
                spend_df, 4, F.col("spend").desc(), "key", n_partitions=n_part
            ).collect()
        }
        assert got == base, n_part
    caches.release_all()


def test_global_ranks_empty_input(spark):
    df = spark.createDataFrame([], "key long, spend double")
    ranked, total = ranking.global_ranks(df, "spend", rank_col="rn")
    assert total == 0
    assert ranked.count() == 0
    assert "rn" in ranked.columns
    caches.release_all()


def test_exact_ntile_plan_has_no_unpartitioned_window(spark, spend_df):
    """The whole point: the only Window in the plan partitions by the
    range-partition id; ntile never appears."""
    df = ranking.exact_ntile(spend_df, 4, F.col("spend").desc(), "key")
    plan = df._jdf.queryExecution().executedPlan().toString()
    caches.release_all()
    assert "ntile(" not in plan
    assert "__rank_pid" in plan


def test_global_prefix_sum_matches_global_window_decimal_and_long(spark, spend_df):
    """Bit-exact for exact-arithmetic types (DECIMAL, BIGINT) at any
    partition count — including a partition count far above the row
    count (empty partitions) and 1 (the degenerate global case)."""
    df = spend_df.select(
        "key",
        "spend",
        F.col("spend").cast("decimal(20,2)").alias("d"),
        (F.col("key") * 7 % 101).cast("long").alias("v"),
    )
    w = Window.orderBy(F.col("spend").desc(), "key").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        (r["key"]): (str(r["cd"]), r["cv"])
        for r in df.select(
            "key",
            F.sum("d").over(w).alias("cd"),
            F.sum("v").over(w).alias("cv"),
        ).collect()
    }
    for n_part in (1, 8, 2048):
        got_d = ranking.global_prefix_sum(
            df, "d", F.col("spend").desc(), "key", out_col="cd", n_partitions=n_part
        )
        got = {
            r["key"]: (str(r["cd"]), r["cv"])
            for r in ranking.global_prefix_sum(
                got_d,
                "v",
                F.col("spend").desc(),
                "key",
                out_col="cv",
                n_partitions=n_part,
            ).collect()
        }
        caches.release_all()
        assert got == want, n_part


def test_global_prefix_sum_empty_input(spark):
    df = spark.createDataFrame([], "key long, v long")
    out = ranking.global_prefix_sum(df, "v", "key", out_col="cum")
    assert out.count() == 0 and "cum" in out.columns
    caches.release_all()


def test_percentile_bands_descending_semantics(spark, spend_df):
    """Approximate banding: band 1 holds the largest values, bands are
    monotone non-increasing in value, every band in 1..n, and at 0.1%
    relative error on <1k rows the populations match exact quartiles."""
    got = ranking.percentile_bands(spend_df, 4, "spend").collect()
    assert {r["band"] for r in got} <= {1, 2, 3, 4}
    by_band: dict[int, list[float]] = {}
    for r in got:
        by_band.setdefault(r["band"], []).append(r["spend"])
    for lo, hi in ((1, 2), (2, 3), (3, 4)):
        if lo in by_band and hi in by_band:
            assert min(by_band[lo]) >= max(by_band[hi])


def test_percentile_bands_ascending_semantics(spark, spend_df):
    got = ranking.percentile_bands(
        spend_df, 4, "spend", descending=False
    ).collect()
    by_band: dict[int, list[float]] = {}
    for r in got:
        by_band.setdefault(r["band"], []).append(r["spend"])
    for lo, hi in ((1, 2), (2, 3), (3, 4)):
        if lo in by_band and hi in by_band:
            assert max(by_band[lo]) <= min(by_band[hi])
