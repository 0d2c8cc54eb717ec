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
    TIMESTAMP(NANOS), which the streaming file source can't schema-infer),
    sliced into four consecutive TIME RANGES written in order: the file
    stream source processes oldest-mod-time first, so maxFilesPerTrigger=1
    arrives as an in-order stream — the contract a watermarked stateful
    operator assumes (a Kafka source partitioned by key gives the same)."""
    import datetime
    import time

    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    ev = events_table(spark, sf_dir)
    lo, hi = ev.select(F.min("ts"), F.max("ts")).first()
    total = (hi - lo).total_seconds()
    for i in range(4):
        a = lo + datetime.timedelta(seconds=total * i / 4)
        b = hi + datetime.timedelta(seconds=1) if i == 3 else lo + datetime.timedelta(
            seconds=total * (i + 1) / 4
        )
        sl = ev.where((F.col("ts") >= F.lit(a)) & (F.col("ts") < F.lit(b)))
        sl.coalesce(1).write.mode("append").parquet(out)
        time.sleep(0.1)  # distinct mod times -> deterministic arrival order
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


def test_stateful_sessionizer_matches_batch(spark, sf_dir, events_dir):
    """The applyInPandasWithState sessionizer must emit exactly the batch
    window-function sessions for every session that is CLOSED by the end of
    the stream (sessions still open inside the final watermark horizon are
    legitimately unemitted — that's append-mode semantics)."""
    from laposte_data_engineering_jedha_spark.queries.llmops import events_sessionize

    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in events_sessionize(spark, sf_dir).collect()
    }
    streamed = jobs.run_sessionize_available_now(spark, events_dir).collect()
    assert len(streamed) > 0
    emitted = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in streamed
    }
    assert emitted <= batch, f"streamed sessions not in batch: {sorted(emitted - batch)[:3]}"
    # everything closed before the final watermark must have been emitted
    max_ts = max(r["session_end"] for r in streamed)
    horizon = max_ts - __import__("datetime").timedelta(minutes=40)  # watermark+gap slack
    closed_batch = {s for s in batch if s[2] < horizon}
    missing = closed_batch - emitted
    assert not missing, f"batch sessions missing from stream: {sorted(missing)[:3]}"
