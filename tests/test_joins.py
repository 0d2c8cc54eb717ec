"""Custom join operators: as-of join semantics (latest-at-or-before, ties,
no-match nulls, tolerance) and range join vs its naive cross formulation."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from laposte_data_engineering_jedha_spark.operators.joins import asof_join, range_join

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> datetime.datetime:
    return T0 + datetime.timedelta(minutes=minutes)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(10), "b"), (1, _ts(2), "c"), (2, _ts(5), "d")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(5), 200.0), (1, _ts(7), 300.0), (3, _ts(0), 999.0)],
        "k long, ts timestamp, v double",
    )
    out = {r["tag"]: r["asof_v"] for r in asof_join(left, right, on="ts", by="k").collect()}
    assert out["c"] == 100.0  # only the t=0 quote precedes t=2
    assert out["a"] == 200.0  # exact-timestamp match is visible (<=)
    assert out["b"] == 300.0  # latest of the three
    assert out["d"] is None  # key 2 has no right rows at all


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(60), "x")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(0), 7.0)], "k long, ts timestamp, v double")
    fresh = asof_join(left, right, on="ts", by="k", tolerance_s=3601).first()
    stale = asof_join(left, right, on="ts", by="k", tolerance_s=600).first()
    assert fresh["asof_v"] == 7.0
    assert stale["asof_v"] is None  # match exists but exceeds staleness bound


def test_range_join_equals_naive(spark):
    left = spark.createDataFrame(
        [(i, _ts(i * 7)) for i in range(40)], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100 + j, _ts(j * 31), _ts(j * 31 + 45)) for j in range(8)],
        "win_id long, start timestamp, end timestamp",
    )
    got = sorted(
        (r["id"], r["win_id"])
        for r in range_join(left, right, "ts", "start", "end", bucket_s=600).collect()
    )
    naive = sorted(
        (r["id"], r["win_id"])
        for r in left.join(
            right, (F.col("start") <= F.col("ts")) & (F.col("ts") < F.col("end"))
        ).collect()
    )
    assert got == naive and len(got) > 0
