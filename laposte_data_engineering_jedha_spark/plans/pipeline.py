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
driver-side, so the equivalent surface here is a per-STAGE callback —
`progress(stage, state, value)` fires around extract/transform/load with
state "start" or "done" (value = seconds) — PLUS an in-flight
"progress" state (value = completed-task fraction, 0..1) sampled from
Spark's StatusTracker while the stage's jobs run: each stage executes
under its own job group, a poller thread aggregates
numCompletedTasks/numTasks across the group's active jobs, and the
callback sees the same task-level signal the Spark UI bar draws — the
driver-side twin of the reference's per-chunk rich bars. The default
callback prints start/done lines and ignores the high-frequency
"progress" ticks; pass your own callable for bars/logging.
"""

from __future__ import annotations

import os
import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.transform import transform_deliveries
from ..sources.readers import extract_data
from ..sources.weather import WeatherAPIClient, fetch_weather_table
from .load import load_data

ProgressFn = Callable[[str, str, float], None]

STAGES = ["extract", "transform", "load"]


def print_progress(stage: str, state: str, value: float) -> None:
    """Default progress reporter: one console line per stage transition
    (the no-dependency stand-in for the reference's rich bars). The
    high-frequency "progress" ticks are ignored here — a bar/logging
    callback consumes them."""
    if state == "start":
        print(f"[pipeline] {stage} ...", flush=True)
    elif state == "done":
        print(f"[pipeline] {stage} done in {value:.2f}s", flush=True)


class _TaskProgressPoller(threading.Thread):
    """Samples Spark's StatusTracker for the jobs of one job group and
    reports the aggregate completed-task fraction through the progress
    callback — the PySpark-side equivalent of a SparkListener
    onTaskEnd bridge (the tracker is the same data, poll-based, with no
    py4j listener subclassing). Daemon thread; `stop()` joins it."""

    def __init__(self, spark: SparkSession, group: str, stage: str,
                 progress: ProgressFn, interval: float = 0.2):
        super().__init__(daemon=True)
        self._sc = spark.sparkContext
        self._group = group
        self._stage = stage
        self._progress = progress
        self._interval = interval
        self._halt = threading.Event()

    def run(self) -> None:
        tracker = self._sc.statusTracker()
        last = -1.0
        while not self._halt.wait(self._interval):
            total = done = 0
            try:
                for jid in tracker.getJobIdsForGroup(self._group):
                    info = tracker.getJobInfo(jid)
                    if info is None:
                        continue
                    for sid in info.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si is not None:
                            total += si.numTasks
                            done += si.numCompletedTasks
            except Exception:  # tracker races with job teardown; next tick
                continue
            if total > 0:
                frac = min(done / total, 1.0)
                if frac != last:
                    last = frac
                    self._progress(self._stage, "progress", frac)

    def stop(self) -> None:
        self._halt.set()
        self.join(timeout=2.0)


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
        poller = None
        if self.progress:
            # run the stage under its own job group so the poller can
            # attribute task counts; extract/transform are lazy (no jobs)
            # and simply produce no ticks
            group = f"pipeline-{stage}-{id(self)}"
            self.spark.sparkContext.setJobGroup(group, f"pipeline {stage}")
            poller = _TaskProgressPoller(self.spark, group, stage, self.progress)
            poller.start()
        try:
            result = thunk()
        finally:
            if poller is not None:
                poller.stop()
                self.spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
                self.spark.sparkContext.setLocalProperty(
                    "spark.job.description", None
                )
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
