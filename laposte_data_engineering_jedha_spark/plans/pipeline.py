"""Pipeline orchestration — E→T→L with wall-clock timing (reference
pipeline.py:21-63).

The config dict contract is identical to the reference's (§3.1 step 1):
{"source": {"type": "generate", "rows": N} | {"type": "file", "path": P},
 "output": {"path": P, "format": F}}

Unlike the reference (each stage materializes eagerly), extract+transform
here build ONE lazy plan; the only driver-side barrier is the distinct-
dates collect that feeds the weather fetch, and materialization happens at
the load actions — two Spark jobs total.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from ..operators.transform import transform_deliveries
from ..sources.readers import extract_data
from ..sources.weather import WeatherAPIClient, fetch_weather_table
from .load import load_data


class Pipeline:
    def __init__(self, config: dict, spark: SparkSession, weather_client=None):
        self.config = config
        self.spark = spark
        self.weather_client = weather_client or WeatherAPIClient(
            os.getenv("WEATHERAPI_KEY")
        )

    def extract(self) -> DataFrame:
        return extract_data(self.spark, self.config)

    def transform(self, df: DataFrame) -> DataFrame:
        weather = fetch_weather_table(self.spark, df, self.weather_client)
        return transform_deliveries(df, weather)

    def load(self, df: DataFrame) -> dict:
        return load_data(df, self.config)

    def run(self) -> float:
        """Run E→T→L; returns elapsed seconds (reference pipeline.py:23,58-63)."""
        start = time.perf_counter()
        df = self.extract()
        transformed = self.transform(df)
        self.load(transformed)
        return time.perf_counter() - start
