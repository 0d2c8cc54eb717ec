"""Skew-mitigation operators: salted join/agg must be result-identical to
their plain counterparts on skewed data (salting changes placement, never
values)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from laposte_data_engineering_jedha_spark.operators.skew import salted_join, salted_sum


@pytest.fixture(scope="module")
def skewed(spark):
    """1% of keys carry 90% of rows — the hot-key shape."""
    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.col("id") % 3)  # 90% on 3 hot keys
        .otherwise(F.col("id") % 500)
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    return df


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.range(500).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    plain = skewed.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(skewed, dim, on="k", salt=8).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, skewed):
    dim = spark.range(2).select(F.col("id").alias("k"), F.lit("x").alias("name"))
    plain = skewed.join(dim, "k", "left").where(F.col("name").isNull()).count()
    salted = salted_join(skewed, dim, on="k", salt=4, how="left").where(
        F.col("name").isNull()
    ).count()
    assert plain == salted > 0


def test_salted_sum_equals_plain_sum(spark, skewed):
    plain = {
        r["k"]: (r["total"], r["n"])
        for r in skewed.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    salted = {r["k"]: (r["total"], r["n"]) for r in salted_sum(skewed, "k", "v").collect()}
    assert plain == salted
