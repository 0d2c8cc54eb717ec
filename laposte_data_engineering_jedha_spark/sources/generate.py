"""Seeded synthetic delivery generator — Spark-native rebuild of the
reference's chunked Faker/numpy generator (core/extract.py:82-119).

Differences by design (SURVEY.md §4.2/§7.3):
- `spark.range(n)` is partitioned by construction, so the reference's
  10k-row chunk loop (a memory workaround) disappears — generation is
  embarrassingly parallel across executors at any scale.
- explicit seed (the reference is seedless): every random column derives
  from `F.rand(seed + i)`, so runs are reproducible given the same
  partitioning. Parity with the reference is distributional, not row-wise.
- the anchor timestamp is an explicit argument (the reference uses
  `now`), so tests and benchmarks are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exprs
from ..schemas import (
    DELIVERY_ZONE_PROBS,
    DELIVERY_ZONES,
    PACKAGE_TYPE_PROBS,
    PACKAGE_TYPES,
    RAW_COLUMNS,
)

DEFAULT_ANCHOR = "2025-09-26 12:00:00"
_30_DAYS_SECONDS = 30 * 86400


def generate_deliveries(
    spark: SparkSession,
    num_rows: int,
    seed: int = 42,
    anchor: str = DEFAULT_ANCHOR,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic 6-column deliveries (reference core/extract.py:94-113):

    - Delivery_ID: "SC{1000+i}" sequential
    - Pickup_DateTime: uniform in [anchor - 30d, anchor], second granularity
    - Delivery_Timestamp: pickup + int(U(20, 360)) minutes
    - Package_Type / Delivery_Zone: categorical with the reference's
      probability vectors (cumulative-threshold CASE over rand)
    - Distance: U(1, 50) rounded to 2 decimals
    """
    base = spark.range(0, num_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
    anchor_ts = F.lit(anchor).cast("timestamp")
    back_secs = (F.rand(seed) * _30_DAYS_SECONDS).cast("int")
    pickup = F.timestamp_add("SECOND", -back_secs, anchor_ts)
    duration_min = (F.lit(20) + F.rand(seed + 1) * 340).cast("int")
    return base.select(
        exprs.sequential_string_id("id").alias("Delivery_ID"),
        pickup.alias("Pickup_DateTime"),
        F.timestamp_add("MINUTE", duration_min, pickup).alias("Delivery_Timestamp"),
        exprs.weighted_choice(F.rand(seed + 2), PACKAGE_TYPES, PACKAGE_TYPE_PROBS).alias(
            "Package_Type"
        ),
        F.round(F.rand(seed + 3) * 49 + 1, 2).alias("Distance"),
        exprs.weighted_choice(F.rand(seed + 4), DELIVERY_ZONES, DELIVERY_ZONE_PROBS).alias(
            "Delivery_Zone"
        ),
    ).select(*RAW_COLUMNS)
