"""Shuffled-arrival stream == batch equivalence (VERDICT r7 item 5).

The r8 watermark-buffered folds (rate_alert_stream,
pattern_completions_stream) must produce EXACTLY the batch twin's output
when events arrive out of event-time order across micro-batches, as long
as every arrival stays inside the watermark — the contract the old
per-batch-sort fold could not honor (ADVICE r6).

Fixture: a planted dense-burst timeline sliced into 5-minute files where
every third event is DEFERRED one file (arriving up to 5 minutes late —
half the 10-minute watermark) and rows inside each file are written in
REVERSE timestamp order. A lone sentinel event 10 minutes past the
timeline pushes the final watermark beyond every planted event, so
nothing is withheld and the assertion is plain multiset equality.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F  # noqa: F401  (plan debugging aid)

from laposte_data_engineering_jedha_spark.streaming import jobs

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
SLICE_S = 300  # 5-minute arrival slices, deferral lag < the 10-min watermark


def _plant_rows():
    """Deterministic multi-user timeline over [T0, T0+50min): per user, a
    view -> click -> click -> purchase burst every ~9 min with second-level
    spacing — dense enough that trailing-hour counts and the CEP automaton
    both produce output, with every timestamp a whole second (no
    millisecond-truncation boundary cases against the watermark)."""
    rows = []
    eid = 0
    for u in range(1, 6):
        t = u * 37  # stagger users
        # keep every event strictly below T0+48min: the final watermark is
        # T0+50min (sentinel minus the 10-min delay), so nothing planted
        # is ever withheld and the assertion stays plain equality
        while t + 40 < 48 * 60:
            for off, typ in ((0, "view"), (11, "click"), (23, "click"), (40, "purchase")):
                eid += 1
                rows.append(
                    (eid, T0 + dt.timedelta(seconds=t + off), u, typ, float(u), "{}")
                )
            t += 9 * 60 + u * 13
    # sentinel: advances the final watermark past every planted event
    rows.append((9999, T0 + dt.timedelta(seconds=60 * 60), 99, "noise", 0.0, "{}"))
    return rows


@pytest.fixture(scope="module")
def shuffled_dirs(spark, tmp_path_factory):
    """(stream_dir, batch_dir): batch_dir holds the full plant as one
    events.parquet; stream_dir holds the arrival slices with every third
    event deferred one slice and reverse-ordered rows inside each file."""
    import time

    root = tmp_path_factory.mktemp("shuffled_stream")
    batch_dir = str(root / "batch")
    stream_dir = str(root / "stream")
    rows = _plant_rows()
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{batch_dir}/events.parquet"
    )

    n_slices = (60 * 60) // SLICE_S + 1
    files: list[list] = [[] for _ in range(n_slices + 1)]
    for r in rows:
        k = int((r[1] - T0).total_seconds()) // SLICE_S
        if r[0] % 3 == 0:
            k += 1  # deferred: arrives one slice (<= 5 min) late
        files[min(k, n_slices)].append(r)
    for batch in files:
        if not batch:
            continue
        batch.sort(key=lambda r: r[1], reverse=True)  # shuffle inside the file
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(
            stream_dir
        )
        time.sleep(0.05)  # distinct mod times -> deterministic file order
    return stream_dir, batch_dir


def test_rate_alert_stream_matches_batch_under_shuffled_arrival(spark, shuffled_dirs):
    stream_dir, batch_dir = shuffled_dirs
    batch = sorted(
        (r["user_id"], r["alert_us"], r["n_in_hour"])
        for r in jobs.batch_rate_alerts(
            spark.read.parquet(f"{batch_dir}/events.parquet")
        ).collect()
    )
    streamed = sorted(
        (r["user_id"], r["alert_us"], r["n_in_hour"])
        for r in jobs.run_rate_alert_available_now(
            spark, stream_dir, query_name="rate_alerts_shuffled"
        ).collect()
    )
    assert len(batch) > 0
    assert streamed == batch


def test_cep_stream_matches_batch_under_shuffled_arrival(spark, shuffled_dirs):
    from laposte_data_engineering_jedha_spark.queries import round6e

    stream_dir, batch_dir = shuffled_dirs
    batch = sorted(
        (r["user_id"], r["view_us"], r["purchase_us"])
        for r in round6e.events_cep_completions(spark, batch_dir).collect()
    )
    streamed = sorted(
        (r["user_id"], r["view_us"], r["purchase_us"])
        for r in jobs.run_pattern_completions_available_now(
            spark, stream_dir, query_name="cep_shuffled"
        ).collect()
    )
    assert len(batch) > 0
    assert streamed == batch
