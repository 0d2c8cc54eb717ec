"""Driver-layer tests: web-API background job body (fastapi-free) and the
reference-shaped benchmark matrix."""

from __future__ import annotations

import csv
import zipfile

import pytest

from laposte_data_engineering_jedha_spark.plans import webapi


def test_web_job_completes_and_zips(spark, tmp_path, monkeypatch):
    from laposte_data_engineering_jedha_spark.plans import pipeline as pl
    from laposte_data_engineering_jedha_spark.sources.weather import FakeWeatherClient

    # pipeline built inside the job: inject the offline weather client
    orig_init = pl.Pipeline.__init__

    def patched(self, config, spark_, weather_client=None, **kw):
        orig_init(self, config, spark_, weather_client=FakeWeatherClient(), **kw)

    monkeypatch.setattr(pl.Pipeline, "__init__", patched)
    monkeypatch.setattr(webapi, "JOBS", {})

    config = {"source": {"type": "generate", "rows": 50, "seed": 1},
              "output": {"path": "", "format": "parquet"}}
    webapi.run_etl_job(spark, "sess1", config, str(tmp_path))

    job = webapi.JOBS["sess1"]
    assert job["status"] == "completed"
    assert job["download"] == "/download/sess1"
    with zipfile.ZipFile(job["zip"]) as zf:
        names = zf.namelist()
    assert "results_manifest.json" in names
    assert any(n.startswith("deliveries.parquet") for n in names)


def test_web_job_records_failure(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(webapi, "JOBS", {})
    bad = {"source": {"type": "file", "path": "/nonexistent.csv"},
           "output": {"path": "", "format": "parquet"}}
    webapi.run_etl_job(spark, "sess2", bad, str(tmp_path))
    assert webapi.JOBS["sess2"]["status"] == "failed"
    assert webapi.JOBS["sess2"]["error"]


def test_create_app_gates_on_fastapi():
    try:
        import fastapi  # noqa: F401

        pytest.skip("fastapi installed — gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="fastapi"):
        webapi.create_app()


def test_benchmark_matrix_shape(spark, tmp_path, monkeypatch):
    """Reference harness contract (benchmarks.py:13-89): rows x format grid,
    warm-up run, per-run seconds, results CSV."""
    from laposte_data_engineering_jedha_spark.plans import benchmarks

    monkeypatch.setattr(benchmarks, "get_spark", lambda **kw: spark)
    out_csv = str(tmp_path / "bench.csv")
    results = benchmarks.run_matrix([100, 200], ["parquet"], out_csv)
    assert [(r["rows"], r["format"]) for r in results] == [(100, "parquet"), (200, "parquet")]
    assert all(r["seconds"] > 0 for r in results)
    with open(out_csv) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 2 and rows[0]["rows"] == "100"
