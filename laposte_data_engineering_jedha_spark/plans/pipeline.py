"""Pipeline orchestration — E→T→L with wall-clock timing and per-stage
progress reporting (reference pipeline.py:21-63).

The config dict contract is identical to the reference's (§3.1 step 1):
{"source": {"type": "generate", "rows": N} | {"type": "file", "path": P},
 "output": {"path": P, "format": F}}

Unlike the reference (each stage materializes eagerly), extract+transform
here build ONE lazy plan; the only driver-side barrier is the distinct-
dates collect that feeds the weather fetch, and materialization happens at
the load actions — two Spark jobs total.

Progress: the reference drives rich progress bars through every transform
stage (pipeline.py:21-63). Lazy plans have no per-row progress to report
driver-side (that lives in the Spark UI / SparkListener), so the
equivalent surface here is a per-STAGE callback: `progress(stage, state,
seconds)` fires around extract/transform/load with state "start" or
"done". The default callback prints one line per transition; pass
`progress=None` for silence or your own callable for bars/logging.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.transform import transform_deliveries
from ..sources.readers import extract_data
from ..sources.weather import WeatherAPIClient, fetch_weather_table
from .load import load_data

ProgressFn = Callable[[str, str, float], None]

STAGES = ["extract", "transform", "load"]


def print_progress(stage: str, state: str, seconds: float) -> None:
    """Default progress reporter: one console line per stage transition
    (the no-dependency stand-in for the reference's rich bars)."""
    if state == "start":
        print(f"[pipeline] {stage} ...", flush=True)
    else:
        print(f"[pipeline] {stage} done in {seconds:.2f}s", flush=True)


class Pipeline:
    def __init__(
        self,
        config: dict,
        spark: SparkSession,
        weather_client=None,
        progress: ProgressFn | None = print_progress,
    ):
        self.config = config
        self.spark = spark
        self.weather_client = weather_client or WeatherAPIClient(
            os.getenv("WEATHERAPI_KEY")
        )
        self.progress = progress
        self.stage_seconds: dict[str, float] = {}

    def extract(self) -> DataFrame:
        return extract_data(self.spark, self.config)

    def transform(self, df: DataFrame) -> DataFrame:
        weather = fetch_weather_table(self.spark, df, self.weather_client)
        return transform_deliveries(df, weather)

    def load(self, df: DataFrame) -> dict:
        return load_data(df, self.config)

    def _staged(self, stage: str, thunk):
        if self.progress:
            self.progress(stage, "start", 0.0)
        t0 = time.perf_counter()
        result = thunk()
        self.stage_seconds[stage] = time.perf_counter() - t0
        if self.progress:
            self.progress(stage, "done", self.stage_seconds[stage])
        return result

    def run(self) -> float:
        """Run E→T→L; returns elapsed seconds (reference pipeline.py:23,
        58-63). Per-stage wall clock lands in `self.stage_seconds` — note
        extract/transform are lazy (plan construction + the weather
        barrier), so load carries the execution time; the reference's
        eager per-stage split does not exist in a lazy engine."""
        start = time.perf_counter()
        df = self._staged("extract", self.extract)
        transformed = self._staged("transform", lambda: self.transform(df))
        self._staged("load", lambda: self.load(transformed))
        return time.perf_counter() - start
