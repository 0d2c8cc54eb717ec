"""Golden-value tests for the business-rule kernel.

Reproduces the reference's hand-computed unit test
(/root/reference/tests/test_transform.py:23-41): base 30 + 10*0.8 = 38;
factors 1.5 (Large) * 1.2 (Urban) * 1.3 (Hour 8) * 1.2 (Monday) *
1.2 (Light rain) -> theoretical 128.04; threshold 153.648 -> On-time.
Plus boundary vectors per factor arm (FIXTURES.md §4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from laposte_data_engineering_jedha_spark.operators import transform as tf

KERNEL_SCHEMA = T.StructType(
    [
        T.StructField("Distance", T.DoubleType()),
        T.StructField("Package_Type", T.StringType()),
        T.StructField("Delivery_Zone", T.StringType()),
        T.StructField("Hour", T.IntegerType()),
        T.StructField("Weekday", T.StringType()),
        T.StructField("Weather_Condition", T.StringType()),
        T.StructField("Actual_Delivery_Time_Minutes", T.DoubleType()),
    ]
)


def run_kernel(spark, rows):
    df = spark.createDataFrame(rows, KERNEL_SCHEMA)
    return tf.determine_delay_status(df).collect()


def test_reference_golden_vector(spark):
    [row] = run_kernel(spark, [(10.0, "Large", "Urban", 8, "Monday", "Light rain", 100.0)])
    assert row.Theoretical_Time_Minutes == pytest.approx(128.04, abs=1e-9)
    assert row.Status == "On-time"


@pytest.mark.parametrize(
    "hour,expected_factor",
    [(6, 1.0), (7, 1.3), (9, 1.3), (10, 1.0), (16, 1.0), (17, 1.4), (19, 1.4), (20, 1.0)],
)
def test_peak_hour_boundaries(spark, hour, expected_factor):
    [row] = run_kernel(spark, [(0.0, "Small", "Suburban", hour, "Tuesday", None, 0.0)])
    assert row.Theoretical_Time_Minutes == pytest.approx(30.0 * expected_factor, abs=1e-9)


@pytest.mark.parametrize(
    "weekday,expected_factor",
    [
        ("Monday", 1.2),
        ("Tuesday", 1.0),
        ("Wednesday", 1.0),
        ("Thursday", 1.0),
        ("Friday", 1.2),
        ("Saturday", 0.9),
        ("Sunday", 0.9),
    ],
)
def test_day_factor_all_days(spark, weekday, expected_factor):
    [row] = run_kernel(spark, [(0.0, "Small", "Suburban", 12, weekday, None, 0.0)])
    assert row.Theoretical_Time_Minutes == pytest.approx(30.0 * expected_factor, abs=1e-9)


@pytest.mark.parametrize(
    "weather,expected_factor",
    [
        (None, 1.0),
        ("Sunny", 1.0),
        ("Light rain", 1.2),
        ("Patchy light drizzle", 1.2),  # drizzle hits the rain arm first
        ("Freezing drizzle", 1.2),
        ("RAIN", 1.2),  # case-insensitive
        ("Heavy snow", 1.8),
        ("Blizzard", 1.8),
        ("Sleet", 1.8),
        ("Fog", 1.1),
        ("Mist", 1.1),
        ("light Drizzle", 1.2),
    ],
)
def test_weather_factor_arms(spark, weather, expected_factor):
    [row] = run_kernel(spark, [(0.0, "Small", "Suburban", 12, "Tuesday", weather, 0.0)])
    assert row.Theoretical_Time_Minutes == pytest.approx(30.0 * expected_factor, abs=1e-9)


def test_unknown_categories_default_factor(spark):
    [row] = run_kernel(spark, [(0.0, "Mystery", "Nowhere", 12, "Tuesday", None, 0.0)])
    assert row.Theoretical_Time_Minutes == pytest.approx(30.0, abs=1e-9)


def test_status_threshold_boundary(spark):
    # theoretical = 30.0, threshold = 36.0: at the threshold -> On-time,
    # just above -> Delayed (strict >, core/transform.py:181).
    rows = run_kernel(
        spark,
        [
            (0.0, "Small", "Suburban", 12, "Tuesday", None, 36.0),
            (0.0, "Small", "Suburban", 12, "Tuesday", None, 36.01),
        ],
    )
    by_actual = {r.Actual_Delivery_Time_Minutes: r.Status for r in rows}
    assert by_actual[36.0] == "On-time"
    assert by_actual[36.01] == "Delayed"
