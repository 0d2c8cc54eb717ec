"""Transform stages — the reference's four-step business-logic chain
(`core/transform.py:54-59`) as lazy DataFrame transformations.

Unlike the reference (eager Polars: each step fully materializes), these
compose into ONE Catalyst logical plan; Spark analyzes/optimizes once and a
single job executes the whole chain. The weather side table arrives as a
small DataFrame and is joined with an explicit broadcast hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import exprs


def add_temporal_features(df: DataFrame, ts_col: str = "Pickup_DateTime") -> DataFrame:
    """Hour + English weekday name from the pickup timestamp
    (reference core/transform.py:130-142)."""
    return df.withColumns(
        {
            "Hour": exprs.hour_of(ts_col),
            "Weekday": exprs.weekday_name(ts_col),
        }
    )


def enrich_with_weather(df: DataFrame, weather_df: DataFrame | None) -> DataFrame:
    """Left-join hourly weather on (date, Hour) (reference
    core/transform.py:94-114).

    weather_df is `{date: date, Hour: int, Weather_Condition: string}` and is
    tiny by construction (≤ 31 days × 24 h = 744 rows), so it is broadcast —
    at 100 TB of deliveries this join costs zero shuffle on the fact side.
    None (fetch yielded nothing) degrades to a typed all-null column,
    matching core/transform.py:100-101.
    """
    if weather_df is None:
        return df.withColumn("Weather_Condition", exprs.null_string_lit())
    with_key = df.withColumn("date", exprs.date_of("Pickup_DateTime"))
    return (
        with_key.join(F.broadcast(weather_df), on=["date", "Hour"], how="left")
        .drop("date")
    )


def calculate_delivery_duration(df: DataFrame) -> DataFrame:
    """Numeric minutes + MM.SS display string (reference
    core/transform.py:116-128)."""
    secs = exprs.ts_diff_seconds("Delivery_Timestamp", "Pickup_DateTime")
    return df.withColumns(
        {
            "Actual_Delivery_Time_Minutes": exprs.minutes_from_seconds(secs),
            "Actual_Delivery_Time_Display": exprs.mmss_display(secs),
        }
    )


def determine_delay_status(df: DataFrame) -> DataFrame:
    """Multiplicative rule model -> Theoretical_Time_Minutes (rounded) +
    Status (compared against the UNROUNDED theoretical * 1.2) — reference
    core/transform.py:144-194."""
    theo = exprs.theoretical_time()
    return df.withColumns(
        {
            "Theoretical_Time_Minutes": exprs.round2(theo),
            "Status": exprs.delay_status(theoretical=theo),
        }
    )


def transform_deliveries(df: DataFrame, weather_df: DataFrame | None) -> DataFrame:
    """Full transform chain (reference transform_data, core/transform.py:31-65).

    Empty-input early-exit (core/transform.py:44-45) is unnecessary here —
    the lazy plan on zero rows is already a no-op — but a `df.isEmpty()`
    guard would force an action, so we deliberately skip it.
    """
    out = (
        df.transform(add_temporal_features)
        .transform(lambda d: enrich_with_weather(d, weather_df))
        .transform(calculate_delivery_duration)
        .transform(determine_delay_status)
    )
    # the key-list join floats `Hour` to the front — restore the reference's
    # 13-column output order (schemas.ENRICHED_COLUMNS)
    from ..schemas import ENRICHED_COLUMNS

    return out.select(*ENRICHED_COLUMNS)
