"""Canonical schemas for the deliveries pipeline.

Mirrors the reference's data contract:
- 6-column raw input (reference generator `core/extract.py:106-113`,
  asserted by `tests/test_pipeline.py:27-34`),
- 13-column enriched output (`data/results_manifest.json:16-30`,
  `tests/test_pipeline.py:58`).
"""

from __future__ import annotations

from pyspark.sql import types as T

DELIVERIES_RAW_SCHEMA = T.StructType(
    [
        T.StructField("Delivery_ID", T.StringType(), False),
        T.StructField("Pickup_DateTime", T.TimestampType(), False),
        T.StructField("Delivery_Timestamp", T.TimestampType(), False),
        T.StructField("Package_Type", T.StringType(), False),
        T.StructField("Distance", T.DoubleType(), False),
        T.StructField("Delivery_Zone", T.StringType(), False),
    ]
)

RAW_COLUMNS = [f.name for f in DELIVERIES_RAW_SCHEMA.fields]

# Output = raw + 7 derived columns, in the reference's column order
# (raw cols, then Hour/Weekday from temporal step, Weather_Condition from the
# enrich step, the two duration columns, then Theoretical/Status).
ENRICHED_COLUMNS = RAW_COLUMNS + [
    "Hour",
    "Weekday",
    "Weather_Condition",
    "Actual_Delivery_Time_Minutes",
    "Actual_Delivery_Time_Display",
    "Theoretical_Time_Minutes",
    "Status",
]

# Weather side table produced by flattening the WeatherAPI response
# (reference `core/transform.py:82-85,103`).
WEATHER_HOURLY_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("Hour", T.IntegerType(), False),
        T.StructField("Weather_Condition", T.StringType(), True),
    ]
)

# Events stream table (driver testdata: events.parquet) — explicit schema so
# readStream needs no inference pass.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

PACKAGE_TYPES = ["Small", "Medium", "Large", "Extra Large", "Special"]
PACKAGE_TYPE_PROBS = [0.4, 0.3, 0.15, 0.1, 0.05]
DELIVERY_ZONES = ["Urban", "Suburban", "Rural", "Industrial", "Shopping Center"]
DELIVERY_ZONE_PROBS = [0.35, 0.25, 0.2, 0.1, 0.1]
