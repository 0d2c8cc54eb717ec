"""Benchmark harness (reference benchmarks.py:13-89): rows × format
matrix, one warm-up run, per-run wall-clock seconds, results CSV.

    python -m laposte_data_engineering_jedha_spark.plans.benchmarks \
        --rows 1000 10000 100000 --formats all_but_xlsx --output bench.csv

The default matrix mirrors the reference ({1e3..1e7} × {all,
all_but_xlsx}); xlsx writes through the pure-stdlib codec, so the 'all'
axis always exercises five sinks.
"""

from __future__ import annotations

import argparse
import csv
import shutil
import tempfile
import time

from ..session import get_spark
from ..sources.weather import FakeWeatherClient
from .pipeline import Pipeline

DEFAULT_ROWS = [1_000, 10_000, 100_000, 1_000_000, 10_000_000]
DEFAULT_FORMATS = ["all", "all_but_xlsx"]


def run_matrix(rows_list: list[int], formats: list[str], out_csv: str | None) -> list[dict]:
    spark = get_spark(app_name="laposte_bench_matrix")
    weather = FakeWeatherClient()
    workdir = tempfile.mkdtemp(prefix="laposte_bench_")

    # warm-up (reference benchmarks.py:37-43): 10 rows, preview sink
    Pipeline(
        {"source": {"type": "generate", "rows": 10}, "output": {"path": workdir, "format": "preview"}},
        spark,
        weather_client=weather,
    ).run()

    results = []
    try:
        for rows in rows_list:
            for fmt in dict.fromkeys(formats):
                out_dir = f"{workdir}/run_{rows}_{fmt}"
                config = {
                    "source": {"type": "generate", "rows": rows},
                    "output": {"path": out_dir, "format": fmt},
                }
                t0 = time.perf_counter()
                Pipeline(config, spark, weather_client=weather).run()
                elapsed = round(time.perf_counter() - t0, 3)
                results.append({"rows": rows, "format": fmt, "seconds": elapsed})
                print(f"rows={rows:>10,} format={fmt:<13} {elapsed:.3f}s")
                shutil.rmtree(out_dir, ignore_errors=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    if out_csv:
        with open(out_csv, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=["rows", "format", "seconds"])
            writer.writeheader()
            writer.writerows(results)
    return results


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="laposte-bench")
    parser.add_argument("--rows", type=int, nargs="+", default=DEFAULT_ROWS)
    parser.add_argument("--formats", type=str, nargs="+", default=DEFAULT_FORMATS)
    parser.add_argument("--output", type=str, default="benchmark_results.csv")
    args = parser.parse_args(argv)
    run_matrix(args.rows, args.formats, args.output)


if __name__ == "__main__":
    main()
