"""Structured Streaming equivalence: the tumbling-window aggregation must
produce identical results under readStream (availableNow, watermark) and
plain batch execution — the guarantee that lets one plan serve both."""

from __future__ import annotations

import pytest

from laposte_data_engineering_jedha_spark.queries import events_table
from laposte_data_engineering_jedha_spark.streaming import jobs


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as micro-precision parquet (the raw testdata is
    TIMESTAMP(NANOS), which the streaming file source can't schema-infer)."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    events_table(spark, sf_dir).repartition(4).write.parquet(out)
    return out


def _canon(df):
    return sorted(
        (r["bucket_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in df.collect()
    )


def test_streaming_matches_batch(spark, events_dir):
    batch = jobs.tumbling_counts(spark.read.parquet(events_dir))
    stream = jobs.run_tumbling_counts_available_now(spark, events_dir)
    assert _canon(stream) == _canon(batch)
    assert len(_canon(stream)) > 0


def test_stream_plan_is_incremental(spark, events_dir):
    df = jobs.tumbling_counts(jobs.read_events_stream(spark, events_dir), with_watermark=True)
    assert df.isStreaming
