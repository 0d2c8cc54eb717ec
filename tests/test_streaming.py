"""Structured Streaming equivalence: the tumbling-window aggregation must
produce identical results under readStream (availableNow, watermark) and
plain batch execution — the guarantee that lets one plan serve both."""

from __future__ import annotations

import pytest

import conftest
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


def test_sliding_counts_two_buckets_per_event(spark, events_dir):
    batch = jobs.sliding_counts(spark.read.parquet(events_dir))
    total_bucketed = sum(r["n_events"] for r in batch.collect())
    n_events = spark.read.parquet(events_dir).count()
    assert total_bucketed == 2 * n_events  # 10-min window / 5-min slide


def test_late_events_dropped_by_watermark(spark, tmp_path):
    """Append-mode + watermark semantics: an event arriving later than the
    watermark is dropped before the stateful aggregation — its
    already-finalized window is not re-emitted or recounted."""
    import datetime
    import time

    from laposte_data_engineering_jedha_spark.schemas import EVENTS_SCHEMA

    out = str(tmp_path / "late_events")
    t = datetime.datetime(2024, 6, 1, 10, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(i, ts, 1, "click", 1.0, "{}") for i, ts in enumerate(rows)],
            schema=EVENTS_SCHEMA,
        )

    # batch 1: three events 10:00-10:04, one at 10:20
    mk([t, t + datetime.timedelta(minutes=2), t + datetime.timedelta(minutes=4),
        t + datetime.timedelta(minutes=20)]).coalesce(1).write.mode("append").parquet(out)
    time.sleep(0.1)
    # batch 2: 10:40 advances the watermark to 10:30 -> every earlier
    # window is finalized and emitted
    mk([t + datetime.timedelta(minutes=40)]).coalesce(1).write.mode("append").parquet(out)
    time.sleep(0.1)
    # batch 3: a LATE replay of 10:02 — its window is already emitted, the
    # row is beyond the watermark, so it must be dropped (no duplicate
    # emission, no recount)
    mk([t + datetime.timedelta(minutes=2)]).coalesce(1).write.mode("append").parquet(out)

    stream = jobs.tumbling_counts(jobs.read_events_stream(spark, out), with_watermark=True)
    q = (
        stream.writeStream.format("memory").queryName("late_drop_test")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["bucket_start"]: r["n_events"] for r in spark.table("late_drop_test").collect()}
    first_bucket = int(t.replace(tzinfo=datetime.timezone.utc).timestamp())
    # 10:00-10:05 holds events 10:00, 10:02, 10:04 from batch 1 ONLY — the
    # late replay of 10:02 in batch 2 must not inflate it
    assert got[first_bucket] == 3
    assert len([b for b in got if b == first_bucket]) == 1


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
    # the registered stream_sessionize query (the append-mode emission
    # contract: sessions closed BY A SUBSEQUENT EVENT) must be a subset of
    # what the stream actually emitted — the stream is sandwiched between
    # the closed set and the full batch set
    from laposte_data_engineering_jedha_spark.queries.llmops import stream_sessionize

    closed_by_data = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in stream_sessionize(spark, sf_dir).collect()
    }
    assert closed_by_data <= batch
    assert closed_by_data <= emitted, (
        f"contract sessions unemitted: {sorted(closed_by_data - emitted)[:3]}"
    )


def test_stream_stream_attribution_matches_batch(spark, events_dir):
    """The watermarked stream-stream join must emit exactly the batch join's
    attributed pairs: in-order file arrival keeps every click inside the
    watermark horizon of its purchase's buffer, so no pair is dropped."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(events_dir)
    batch = jobs.attribution_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )
    stream = jobs.run_attribution_available_now(spark, events_dir)
    canon = lambda df: sorted(
        (r["purchase_event"], r["user_id"], r["click_ts"]) for r in df.collect()
    )
    got, want = canon(stream), canon(batch)
    assert len(want) > 0
    assert got == want


def test_stream_stream_attribution_is_streaming_plan(spark, events_dir):
    from pyspark.sql import functions as F

    ev = jobs.read_events_stream(spark, events_dir)
    df = jobs.attribution_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        with_watermark=True,
    )
    assert df.isStreaming


@pytest.fixture(scope="module")
def dup_events_dir(spark, sf_dir, tmp_path_factory):
    """Like events_dir, but every slice is delivered TWICE (consecutive
    files with the same time range) — the at-least-once redelivery shape
    dropDuplicatesWithinWatermark exists for."""
    import datetime
    import time

    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("events_dup_stream") / "events")
    ev = events_table(spark, sf_dir)
    lo, hi = ev.select(F.min("ts"), F.max("ts")).first()
    total = (hi - lo).total_seconds()
    for i in range(4):
        a = lo + datetime.timedelta(seconds=total * i / 4)
        b = hi + datetime.timedelta(seconds=1) if i == 3 else lo + datetime.timedelta(
            seconds=total * (i + 1) / 4
        )
        sl = ev.where((F.col("ts") >= F.lit(a)) & (F.col("ts") < F.lit(b)))
        for _ in range(2):  # redelivery: same slice lands twice
            sl.coalesce(1).write.mode("append").parquet(out)
            time.sleep(0.1)
    return out


def test_stream_dedup_matches_batch_distinct(spark, dup_events_dir):
    """Watermarked streaming dedup over a redelivering source restores
    exactly-once: the emitted set equals the batch distinct. On-time
    duplicates are dropped by the key state, duplicates arriving behind
    the watermark are dropped as late — either path deduplicates."""
    stream = jobs.run_dedup_available_now(spark, dup_events_dir)
    got = sorted(r["event_id"] for r in stream.select("event_id").collect())
    want = sorted(
        r["event_id"]
        for r in spark.read.parquet(dup_events_dir).select("event_id").distinct().collect()
    )
    assert got == want
    raw = spark.read.parquet(dup_events_dir).count()
    assert raw == 2 * len(want)  # the source really did redeliver everything


def test_stream_dedup_plan_is_streaming(spark, dup_events_dir):
    df = jobs.dedup_events(jobs.read_events_stream(spark, dup_events_dir), with_watermark=True)
    assert df.isStreaming


def test_stream_enrich_matches_batch(spark, sf_dir, events_dir):
    """Stream-static broadcast enrichment emits exactly the batch join's
    rows (stateless — no watermark, no buffered state)."""
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = jobs.run_enrich_available_now(spark, events_dir, customers)
    want = jobs.enrich_users(spark.read.parquet(events_dir), customers)
    key = lambda r: (r["event_id"], r["segment"], r["nationkey"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_stream_enrich_plan_is_streaming_and_broadcast(spark, sf_dir, events_dir):
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = jobs.enrich_users(jobs.read_events_stream(spark, events_dir), customers)
    assert df.isStreaming
    batch = jobs.enrich_users(spark.read.parquet(events_dir), customers)
    assert "BroadcastHashJoin" in batch._jdf.queryExecution().executedPlan().toString()


def test_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Stop/resume semantics: a watermarked append-mode aggregation driven
    in two availableNow runs over ONE checkpoint must (a) emit every
    finalized window exactly once across both runs (the file-source
    checkpoint must not re-ingest run-1 files) and (b) agree exactly with
    the batch computation over the full data — a double-ingest would
    inflate counts, a lost state would drop windows."""
    import datetime
    import time

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = events_table(spark, sf_dir)
    lo, hi = ev.select(F.min("ts"), F.max("ts")).first()
    total = (hi - lo).total_seconds()

    def write_slice(i):
        a = lo + datetime.timedelta(seconds=total * i / 4)
        b = (
            hi + datetime.timedelta(seconds=1)
            if i == 3
            else lo + datetime.timedelta(seconds=total * (i + 1) / 4)
        )
        ev.where((F.col("ts") >= F.lit(a)) & (F.col("ts") < F.lit(b))).coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(0.1)

    def run_once():
        stream = jobs.tumbling_counts(
            jobs.read_events_stream(spark, src), with_watermark=True
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_slice(0)
    write_slice(1)
    run_once()
    write_slice(2)
    write_slice(3)
    run_once()

    rows = spark.read.parquet(out).collect()
    assert len(rows) > 0
    keys = [(r["bucket_start"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys))  # exactly once per finalized window
    batch = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in jobs.tumbling_counts(spark.read.parquet(src)).collect()
    }
    for r in rows:
        assert batch[(r["bucket_start"], r["event_type"])] == (
            r["n_events"],
            r["total_value"],
        ), r


def test_session_window_stream_matches_batch(spark, sf_dir, events_dir):
    """The native session-window job yields identical sessions in batch
    mode and under the watermarked directory stream (complete mode sees
    every closed session once all files arrive)."""
    batch = jobs.session_window_counts(events_table(spark, sf_dir))
    streamed = jobs.run_session_window_available_now(
        spark, events_dir, query_name="sw_equiv"
    )
    canon = lambda df: sorted(  # noqa: E731
        (r["user_id"], r["session_start_us"], r["session_close_us"], r["n_events"])
        for r in df.collect()
    )
    assert canon(streamed) == canon(batch)
    assert len(canon(batch)) > 0


def test_session_window_plan_is_streaming(spark, events_dir):
    df = jobs.session_window_counts(
        jobs.read_events_stream(spark, events_dir), with_watermark=True
    )
    assert df.isStreaming


def test_foreach_batch_sink_is_idempotent(spark, sf_dir, events_dir, tmp_path):
    """Replaying a micro-batch through the foreachBatch upsert sink must
    not duplicate rows: the batch_id-partitioned dynamic overwrite makes
    re-delivery (at-least-once -> exactly-once) a no-op."""
    out = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    jobs.run_events_to_parquet(spark, events_dir, out, ck)
    once = spark.read.parquet(out)
    n_first = once.count()
    assert n_first == events_table(spark, sf_dir).count()

    # Simulate a post-failure replay of one already-committed batch.
    replay = once.where(once["batch_id"] == 0).drop("batch_id")
    jobs.upsert_batch_to_parquet(replay, 0, out)
    again = spark.read.parquet(out)
    assert again.count() == n_first
    assert again.select("event_id").distinct().count() == n_first

    # Resuming the checkpointed stream with no new files adds nothing.
    jobs.run_events_to_parquet(spark, events_dir, out, ck)
    assert spark.read.parquet(out).count() == n_first


def test_stream_stream_left_outer_null_extends_after_watermark(spark, events_dir):
    """LEFT OUTER stream-stream join: a click with no purchase in its
    window must surface null-extended ONCE THE WATERMARK PASSES the
    window close — withheld (not dropped, not emitted early) until then.
    The inner-join variant can never emit these rows; the outer variant
    is how attribution pipelines count unconverted clicks."""
    from pyspark.sql import functions as F

    ev = jobs.read_events_stream(spark, events_dir)
    joined = jobs.attribution_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        with_watermark=True,
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("attr_outer")
    matched = got.where(F.col("purchase_event").isNotNull()).count()
    unmatched = got.where(F.col("purchase_event").isNull()).count()
    assert matched > 0
    # clicks from early in the stream whose horizon closed before the final
    # watermark MUST have been null-extended
    assert unmatched > 0
    # and the matched set equals the inner-join (batch) attribution exactly
    batch = jobs.attribution_join(
        events_table(spark, conftest.SF_SMOKE).where(F.col("event_type") == "click"),
        events_table(spark, conftest.SF_SMOKE).where(F.col("event_type") == "purchase"),
    )
    assert matched == batch.count()


def test_stateful_funnel_matches_batch(spark, sf_dir, events_dir):
    """The CEP-style funnel detector must emit exactly the users the batch
    funnel counts as fully converted, with identical stage timestamps
    (first view, first click after it, first purchase after that) — minus
    completions whose purchase is still inside the FINAL watermark, which
    the r8 watermark-buffered fold correctly WITHHOLDS (an earlier view
    could still arrive and shift the stage timestamps)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    streamed = jobs.run_funnel_detect_available_now(spark, events_dir)
    got = {
        r["user_id"]: (r["view_us"], r["click_us"], r["purchase_us"])
        for r in streamed.collect()
    }

    ev = events_table(spark, sf_dir).select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    t, typ = F.col("ts"), F.col("event_type")
    df = ev.withColumn("t1", F.min(F.when(typ == "view", t)).over(w))
    df = df.withColumn("t2", F.min(F.when((typ == "click") & (t > F.col("t1")), t)).over(w))
    df = df.withColumn("t3", F.min(F.when((typ == "purchase") & (t > F.col("t2")), t)).over(w))
    per_user = (
        df.groupBy("user_id")
        .agg(F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3"))
        .where(F.col("t3").isNotNull())
        .select(
            "user_id",
            F.unix_micros("t1").alias("v"),
            F.unix_micros("t2").alias("c"),
            F.unix_micros("t3").alias("p"),
        )
    )
    want = {r["user_id"]: (r["v"], r["c"], r["p"]) for r in per_user.collect()}
    max_us = spark.read.parquet(events_dir).agg(F.max(F.unix_micros("ts"))).first()[0]
    wm_us = (max_us // 1000 - 600_000) * 1000  # Spark tracks event time in ms
    closed = {u: t for u, t in want.items() if t[2] < wm_us}
    assert got == closed
    assert len(closed) > 0
    assert all(want[u][2] >= wm_us for u in set(want) - set(got))
    # exactly-once emission: no user appears twice
    assert streamed.count() == streamed.select("user_id").distinct().count()


def test_daily_topk_streaming_matches_batch(spark, events_dir):
    def canon(df):
        return sorted(
            (str(r["day"]), r["event_type"], r["revenue"], r["rnk"])
            for r in df.collect()
        )

    batch = jobs.rank_daily_topk(jobs.daily_type_revenue(spark.read.parquet(events_dir)))
    stream = jobs.run_daily_topk_available_now(spark, events_dir)
    assert canon(stream) == canon(batch)
    assert len(canon(stream)) > 0


def test_rate_alert_stream_matches_batch(spark, sf_dir, events_dir):
    """The sliding-window rate alerter must emit exactly the batch
    RANGE-window alerts — minus alerts whose trigger timestamp is still
    inside the FINAL watermark, which the r8 watermark-buffered fold
    correctly WITHHOLDS (their trailing-hour count could still change):
    the same emitted-rows-are-final contract as
    test_tumbling_dau_chain_matches_batch."""
    from pyspark.sql import functions as F

    from laposte_data_engineering_jedha_spark.queries.round6 import stream_rate_alert

    batch = {
        (r["user_id"], r["alert_us"], r["n_in_hour"])
        for r in stream_rate_alert(spark, sf_dir).collect()
    }
    streamed = jobs.run_rate_alert_available_now(spark, events_dir).collect()
    emitted = {(r["user_id"], r["alert_us"], r["n_in_hour"]) for r in streamed}
    max_us = spark.read.parquet(events_dir).agg(F.max(F.unix_micros("ts"))).first()[0]
    wm_us = (max_us // 1000 - 600_000) * 1000  # Spark tracks event time in ms
    closed = {a for a in batch if a[1] < wm_us}
    assert emitted == closed
    assert len(closed) > 0
    assert all(a[1] >= wm_us for a in batch - emitted)


def test_tumbling_dau_chain_matches_batch(spark, events_dir):
    """The dedup -> windowed-count CHAIN (two stateful operators in one
    streaming query) must equal the batch run of the same plan AND the
    plain distinct count — except windows still OPEN under the final
    watermark (end > max_ts - 10 min), which append mode correctly
    WITHHOLDS rather than emitting a possibly-incomplete count: every
    emitted row must be exactly final."""
    from pyspark.sql import functions as F

    canon = lambda df: sorted((r["bucket_start"], r["dau"]) for r in df.collect())  # noqa: E731
    batch = canon(jobs.tumbling_distinct_users(spark.read.parquet(events_dir)))
    stream = canon(jobs.run_tumbling_dau_available_now(spark, events_dir))
    assert len(stream) > 0
    max_us = spark.read.parquet(events_dir).agg(F.max(F.unix_micros("ts"))).first()[0]
    watermark_s = max_us // 1_000_000 - 600
    closed = [(b, d) for b, d in batch if b + 3600 <= watermark_s]
    withheld = [(b, d) for b, d in batch if b + 3600 > watermark_s]
    assert stream == closed
    assert all(x in withheld for x in set(batch) - set(stream))
    direct = canon(
        spark.read.parquet(events_dir)
        .groupBy(((F.unix_micros("ts") / 3_600_000_000).cast("long") * 3600).alias("bucket_start"))
        .agg(F.count_distinct("user_id").alias("dau"))
    )
    assert batch == direct


def _write_time_slices(spark, sf_dir, src, idxs):
    """Append time-range slices i/4 of the events table to `src` as
    single parquet files with distinct mod times (in-order arrival)."""
    import datetime
    import time

    from pyspark.sql import functions as F

    ev = events_table(spark, sf_dir)
    lo, hi = ev.select(F.min("ts"), F.max("ts")).first()
    total = (hi - lo).total_seconds()
    for i in idxs:
        a = lo + datetime.timedelta(seconds=total * i / 4)
        b = (
            hi + datetime.timedelta(seconds=1)
            if i == 3
            else lo + datetime.timedelta(seconds=total * (i + 1) / 4)
        )
        ev.where((F.col("ts") >= F.lit(a)) & (F.col("ts") < F.lit(b))).coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(0.1)


def _run_ckpt_available_now(spark, stream_fn, src, out, ckpt):
    """One availableNow run of a custom stateful op against a durable
    parquet sink + checkpoint; stopping and calling this again with the
    SAME ckpt resumes from the persisted state store + source offsets."""
    q = (
        stream_fn(jobs.read_events_stream(spark, src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _checkpoint_kill_restart(spark, sf_dir, tmp_path, stream_fn, canon):
    """r11 verdict item 3 harness: drive `stream_fn` over the first half
    of the input, STOP (the availableNow query terminates and the session
    would be free to die here — open per-key state lives only in the
    checkpointed state store), append the second half, RESTART against
    the same checkpoint, and require the union of both runs' emissions to
    equal an uninterrupted single run over the identical full input."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_time_slices(spark, sf_dir, src, [0, 1])
    _run_ckpt_available_now(spark, stream_fn, src, out, ckpt)
    mid = canon(spark.read.parquet(out))
    _write_time_slices(spark, sf_dir, src, [2, 3])
    _run_ckpt_available_now(spark, stream_fn, src, out, ckpt)
    resumed = canon(spark.read.parquet(out))

    out2 = str(tmp_path / "out_uninterrupted")
    ckpt2 = str(tmp_path / "ckpt_uninterrupted")
    _run_ckpt_available_now(spark, stream_fn, src, out2, ckpt2)
    uninterrupted = canon(spark.read.parquet(out2))

    assert len(resumed) > len(mid) >= 0  # the restart did new work
    assert resumed == uninterrupted
    return resumed


def test_sessionizer_checkpoint_kill_restart(spark, sf_dir, tmp_path):
    """The applyInPandasWithState sessionizer's per-user state (open
    session + watermark-pending buffer) must survive stop/restart via the
    checkpoint: a run interrupted halfway and resumed must emit exactly
    the sessions of an uninterrupted run — no session split at the
    restart boundary, none emitted twice, none lost (r11 verdict item 3:
    the reference has no streaming, so recovery is the extension layer's
    own failure mode to prove)."""
    canon = lambda df: sorted(  # noqa: E731
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in df.collect()
    )
    rows = _checkpoint_kill_restart(
        spark, sf_dir, tmp_path, jobs.sessionize_stream, canon
    )
    keys = [(u, s) for u, s, _, _ in rows]
    assert len(keys) == len(set(keys))  # exactly-once per session


def test_topk_trending_checkpoint_kill_restart(spark, sf_dir, tmp_path):
    """The applyInPandasWithState top-k trending aggregation's per-window
    count tables must survive stop/restart: windows OPEN at the stop
    (counted but not finalized) must accumulate the post-restart arrivals
    and finalize once, identically to the uninterrupted run."""
    canon = lambda df: sorted(  # noqa: E731
        (r["window_us"], r["rank"], r["event_type"], r["n"])
        for r in df.collect()
    )
    rows = _checkpoint_kill_restart(
        spark, sf_dir, tmp_path, jobs.topk_trending_stream, canon
    )
    keys = [(w, rk) for w, rk, _, _ in rows]
    assert len(keys) == len(set(keys))  # one finalization per (window, rank)


def test_cusum_control_stream_matches_batch(spark, events_dir):
    """The streaming CUSUM control chart (6th custom stateful op) must
    emit exactly the batch twin's rows for every day FINALIZED under the
    final watermark — same targets, same folds, same alarms; days the
    watermark hasn't passed are correctly withheld, never guessed."""
    import datetime

    from pyspark.sql import functions as F

    canon = lambda df: sorted(  # noqa: E731
        (r["event_type"], r["day"], r["day_count"], r["cusum"], r["alarm"])
        for r in df.collect()
    )
    batch = canon(jobs.batch_cusum_control(spark.read.parquet(events_dir)))
    stream = canon(jobs.run_cusum_control_available_now(spark, events_dir))
    assert len(stream) > 0
    max_us = spark.read.parquet(events_dir).agg(F.max(F.unix_micros("ts"))).first()[0]
    wm_ms = max_us // 1000 - 600_000  # 10-minute watermark
    epoch = datetime.date(1970, 1, 1)
    closed = [
        t for t in batch if ((t[1] - epoch).days + 1) * 86_400_000 <= wm_ms
    ]
    assert stream == closed
    # exactly-once per (type, day)
    keys = [(t[0], t[1]) for t in stream]
    assert len(keys) == len(set(keys))


def test_cusum_control_checkpoint_kill_restart(spark, sf_dir, tmp_path):
    """The CUSUM chart's per-type state (target/slack/cusum + pending
    days) must survive stop/restart via the checkpoint: interrupted and
    resumed == uninterrupted, fold unbroken across the boundary."""
    canon = lambda df: sorted(  # noqa: E731
        (r["event_type"], r["day"], r["day_count"], r["cusum"], r["alarm"])
        for r in df.collect()
    )
    rows = _checkpoint_kill_restart(
        spark, sf_dir, tmp_path, jobs.cusum_control_stream, canon
    )
    keys = [(t[0], t[1]) for t in rows]
    assert len(keys) == len(set(keys))


def test_holt_forecast_stream_matches_batch(spark, events_dir):
    """The streaming Holt trend forecaster (7th custom stateful op) must
    emit exactly the batch twin's rows for every day FINALIZED under the
    final watermark — same forecasts, same fixed-point level/trend folds,
    same alarms; days the watermark hasn't passed are withheld. The batch
    twin itself is oracle-hash-gated (events_holt_forecast,
    queries/round13a.py), so this equivalence chains the STREAM's
    semantics to the DuckDB recursive-CTE oracle."""
    import datetime

    from pyspark.sql import functions as F

    canon = lambda df: sorted(  # noqa: E731
        (r["event_type"], r["day"], r["day_count"], r["forecast"],
         r["level"], r["trend"], r["alarm"])
        for r in df.collect()
    )
    batch = canon(jobs.batch_holt_forecast(spark.read.parquet(events_dir)))
    stream = canon(jobs.run_holt_forecast_available_now(spark, events_dir))
    assert len(stream) > 0
    max_us = spark.read.parquet(events_dir).agg(F.max(F.unix_micros("ts"))).first()[0]
    wm_ms = max_us // 1000 - 600_000  # 10-minute watermark
    epoch = datetime.date(1970, 1, 1)
    closed = [
        t for t in batch if ((t[1] - epoch).days + 1) * 86_400_000 <= wm_ms
    ]
    assert stream == closed
    keys = [(t[0], t[1]) for t in stream]
    assert len(keys) == len(set(keys))  # exactly-once per (type, day)


def test_holt_forecast_checkpoint_kill_restart(spark, sf_dir, tmp_path):
    """The Holt forecaster's per-type state (level/trend + pending days)
    must survive stop/restart via the checkpoint: interrupted and resumed
    == uninterrupted, smoothing fold unbroken across the boundary."""
    canon = lambda df: sorted(  # noqa: E731
        (r["event_type"], r["day"], r["day_count"], r["forecast"],
         r["level"], r["trend"], r["alarm"])
        for r in df.collect()
    )
    rows = _checkpoint_kill_restart(
        spark, sf_dir, tmp_path, jobs.holt_forecast_stream, canon
    )
    keys = [(t[0], t[1]) for t in rows]
    assert len(keys) == len(set(keys))


def test_ivm_view_matches_batch(spark, events_dir, tmp_path):
    """The foreachBatch-maintained counts view must equal the one-shot
    batch aggregate over the same appends — the IVM invariant, held
    through ~31 independent merges (one per micro-batch)."""
    from laposte_data_engineering_jedha_spark.streaming import ivm

    root = str(tmp_path / "view")
    got = ivm.run_ivm_counts_available_now(
        spark, events_dir, root, str(tmp_path / "ckpt")
    )
    canon = lambda df: sorted(  # noqa: E731
        (r["event_type"], r["day"], r["n"]) for r in df.collect()
    )
    want = canon(ivm.batch_counts(spark.read.parquet(events_dir)))
    assert canon(got) == want
    assert len(want) > 0
    assert ivm.last_applied_batch(root) >= 0


def test_ivm_kill_restart_and_replay(spark, sf_dir, tmp_path):
    """Exactly-once under crash-restart: a run interrupted after the
    first half of the input resumes from the checkpoint and lands on the
    uninterrupted answer; a replayed batch_id no-ops on the manifest
    instead of double-counting."""
    from laposte_data_engineering_jedha_spark.streaming import ivm

    src = str(tmp_path / "src")
    root = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    canon = lambda df: sorted(  # noqa: E731
        (r["event_type"], r["day"], r["n"]) for r in df.collect()
    )

    _write_time_slices(spark, sf_dir, src, [0, 1])
    mid = canon(ivm.run_ivm_counts_available_now(spark, src, root, ckpt))
    assert mid == canon(ivm.batch_counts(spark.read.parquet(src)))
    _write_time_slices(spark, sf_dir, src, [2, 3])
    final = canon(ivm.run_ivm_counts_available_now(spark, src, root, ckpt))
    assert final == canon(ivm.batch_counts(spark.read.parquet(src)))
    assert sum(n for *_, n in final) > sum(n for *_, n in mid)

    # replay guard: re-applying the last batch_id must be a no-op
    last = ivm.last_applied_batch(root)
    replay = spark.read.parquet(src).limit(50)
    assert ivm.apply_batch(spark, root, replay, last) is False
    assert canon(ivm.read_view(spark, root)) == final
    # and a NEW batch_id with the same rows does apply (the guard is the
    # id, not the content)
    assert ivm.apply_batch(spark, root, replay.where("1=0"), last + 1) is True
    assert canon(ivm.read_view(spark, root)) == final


def test_holt_winters_stream_matches_batch(spark, events_dir):
    """The streaming Holt-Winters chart (9th custom stateful op) must
    emit exactly the batch twin's rows for every day FINALIZED under the
    final watermark — same forecasts, same fixed-point folds, same
    learned seasonal slots; unfinalized days are withheld. The batch
    twin is oracle-hash-gated (events_holt_winters_daily,
    queries/round13i.py), so this chains the stream's semantics to the
    list-state recursive-CTE oracle."""
    import datetime

    from pyspark.sql import functions as F

    canon = lambda df: sorted(  # noqa: E731
        (r["event_type"], r["day"], r["day_count"], r["forecast"],
         r["level"], r["trend"], r["seasonal"], r["alarm"])
        for r in df.collect()
    )
    batch = canon(jobs.batch_holt_winters(spark.read.parquet(events_dir)))
    stream = canon(jobs.run_holt_winters_available_now(spark, events_dir))
    assert len(stream) > 0
    max_us = spark.read.parquet(events_dir).agg(F.max(F.unix_micros("ts"))).first()[0]
    wm_ms = max_us // 1000 - 600_000  # 10-minute watermark
    epoch = datetime.date(1970, 1, 1)
    closed = [
        t for t in batch if ((t[1] - epoch).days + 1) * 86_400_000 <= wm_ms
    ]
    assert stream == closed
    keys = [(t[0], t[1]) for t in stream]
    assert len(keys) == len(set(keys))  # exactly-once per (type, day)


def test_holt_winters_checkpoint_kill_restart(spark, sf_dir, tmp_path):
    """The Holt-Winters state (level/trend + the 7-slot seasonal vector
    + pending days) must survive stop/restart via the checkpoint:
    interrupted and resumed == uninterrupted, fold and learned season
    unbroken across the boundary."""
    canon = lambda df: sorted(  # noqa: E731
        (r["event_type"], r["day"], r["day_count"], r["forecast"],
         r["level"], r["trend"], r["seasonal"], r["alarm"])
        for r in df.collect()
    )
    rows = _checkpoint_kill_restart(
        spark, sf_dir, tmp_path, jobs.holt_winters_stream, canon
    )
    keys = [(t[0], t[1]) for t in rows]
    assert len(keys) == len(set(keys))
