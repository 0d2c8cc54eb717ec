"""Round-10 hardening: IVF index lifecycle (fingerprint re-key + atomic
publish, r9 verdict item 4 / ADVICE r9) and related operator defaults."""

from __future__ import annotations

import os
import shutil

import pytest

from laposte_data_engineering_jedha_spark.queries import round9a


def _copy_corpus(tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/embeddings.parquet",
        sf / "embeddings.parquet",
    )
    return str(sf)


def _markers_ok(path: str) -> bool:
    return all(
        os.path.exists(os.path.join(path, part, "_SUCCESS"))
        for part in ("centroids.parquet", "postings.parquet")
    )


def test_ivf_index_build_once_then_reuse(spark, tmp_path):
    """Same corpus -> same key -> the second ensure reuses the stored
    index without rebuilding (the _SUCCESS marker is untouched)."""
    sf = _copy_corpus(tmp_path)
    p1 = round9a._ensure_index(spark, sf)
    assert _markers_ok(p1)
    marker = os.path.join(p1, "postings.parquet", "_SUCCESS")
    m1 = os.stat(marker).st_mtime_ns
    assert round9a._ensure_index(spark, sf) == p1
    assert os.stat(marker).st_mtime_ns == m1
    shutil.rmtree(p1, ignore_errors=True)


def test_ivf_index_rekeys_and_rebuilds_on_corpus_mutation(spark, tmp_path):
    """Mutate ONE vector in the embeddings table: the fingerprint must
    re-key the index path and the next ensure must build a fresh index
    there — a mutated corpus can never be served from the stale index
    (ADVICE r9: the old key was (sf_dir, contract) only)."""
    import pyarrow.parquet as pq

    sf = _copy_corpus(tmp_path)
    p1 = round9a._ensure_index(spark, sf)
    assert _markers_ok(p1)

    src = os.path.join(sf, "embeddings.parquet")
    tbl = pq.read_table(src)
    df = tbl.to_pandas()
    vec = list(df.loc[0, "embedding"])
    vec[0] = float(vec[0]) + 1.0
    df.at[0, "embedding"] = vec
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(df, schema=tbl.schema), src)

    p2 = round9a._ensure_index(spark, sf)
    assert p2 != p1, "mutated corpus must re-key the index"
    assert _markers_ok(p2)
    shutil.rmtree(p1, ignore_errors=True)
    shutil.rmtree(p2, ignore_errors=True)


def test_ivf_index_concurrent_publish_loser_discards(spark, tmp_path, monkeypatch):
    """If another process publishes the index between this builder's
    write and its rename, the rename fails (destination exists) and the
    loser must discard its scratch build and serve the winner's —
    overwrite-mode writes can never interleave into the served path."""
    sf = _copy_corpus(tmp_path)
    path = round9a._index_path(sf)
    shutil.rmtree(path, ignore_errors=True)

    real_write = round9a.similarity.ivf_index_write
    scratches: list[str] = []

    def write_and_simulate_winner(df, scratch, **kw):
        scratches.append(scratch)
        real_write(df, scratch, **kw)
        # the "other process" publishes a complete index first
        shutil.copytree(scratch, path)

    monkeypatch.setattr(
        round9a.similarity, "ivf_index_write", write_and_simulate_winner
    )
    got = round9a._ensure_index(spark, sf)
    assert got == path
    assert _markers_ok(path)
    assert len(scratches) == 1
    assert not os.path.exists(scratches[0]), "loser scratch must be removed"
    shutil.rmtree(path, ignore_errors=True)


def test_ivf_fingerprint_missing_corpus(tmp_path):
    """A missing embeddings table fingerprints as a sentinel rather than
    raising — _ensure_index will then fail in the build with Spark's own
    missing-path error, not a confusing os.stat one."""
    assert round9a._corpus_fingerprint(str(tmp_path)) == "missing"


def test_triangles_default_entry_point_is_capped(spark):
    """r9 verdict item 2: omitting the cap args must apply the bounded
    production form (both row_number cap windows present in the plan);
    the exact unbounded form requires explicit None for both. On the
    fixture graph the default caps exceed the true maxima, so the
    default-capped count equals the exact count — bounded by default,
    exact where the caps don't bind."""
    from laposte_data_engineering_jedha_spark.operators import graphs
    from laposte_data_engineering_jedha_spark.queries import events_table

    ev = events_table(spark, "/root/testdata/sf0.001")
    # plan-shape assertions target the DISTRIBUTED branch (the r13 driver
    # fast path collapses small edge lists to a local relation, applying
    # max_out_deg in the driver mirror instead of a window)
    capped_dist = graphs.co_activity_triangles(ev, min_w=2, driver_max_edges=0)
    plan = capped_dist._jdf.queryExecution().executedPlan().toString()
    assert "__br" in plan and "__or" in plan  # both caps applied
    exact_dist = graphs.co_activity_triangles(
        ev, min_w=2, bucket_cap=None, max_out_deg=None, driver_max_edges=0
    )
    exact_plan = exact_dist._jdf.queryExecution().executedPlan().toString()
    assert "__br" not in exact_plan and "__or" not in exact_plan
    # the DEFAULT entry point (fast path engaged) must agree with both
    capped_df = graphs.co_activity_triangles(ev, min_w=2)
    exact_df = graphs.co_activity_triangles(
        ev, min_w=2, bucket_cap=None, max_out_deg=None
    )
    assert capped_df.collect() == capped_dist.collect()
    assert exact_df.collect() == exact_dist.collect()
    capped, exact = capped_df.collect()[0], exact_df.collect()[0]
    assert capped["n_triangles"] == exact["n_triangles"] > 0
    assert (capped["n_edges"], capped["n_nodes"]) == (
        exact["n_edges"], exact["n_nodes"],
    )


_REC_SCHEMA = "k long, name string, grp long, val double"


def _base_rows(n=400):
    return [(i, f"u{i % 37}", i * 3 % 101, float(i % 13)) for i in range(n)]


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_merkle_reconcile_random_mutation_sets(spark, seed):
    """Property test (r9 verdict item 5): for a random mutation set
    (updates + deletes + inserts), merkle_reconcile must return EXACTLY
    the mutated keys with the right change kinds, and the dirty-bucket
    ladder must stay bounded by the mutation count (each mutation dirties
    at most one fine bucket)."""
    import random

    from laposte_data_engineering_jedha_spark.operators import reconcile

    rng = random.Random(seed)
    n = 400
    rows = _base_rows(n)
    updates = set(rng.sample(range(n), rng.randint(1, 12)))
    deletes = set(rng.sample([i for i in range(n) if i not in updates],
                             rng.randint(1, 8)))
    inserts = {n + j for j in range(rng.randint(1, 6))}
    right_rows = [
        (k, name, grp, val + 1.0 if k in updates else val)
        for (k, name, grp, val) in rows
        if k not in deletes
    ] + [(k, "new", 0, 0.0) for k in sorted(inserts)]
    left = spark.createDataFrame(rows, _REC_SCHEMA)
    right = spark.createDataFrame(right_rows, _REC_SCHEMA)

    got = {
        (r["k"], r["change"])
        for r in reconcile.merkle_reconcile(left, right, ["k"]).collect()
    }
    want = (
        {(k, "changed") for k in updates}
        | {(k, "missing_in_right") for k in deletes}
        | {(k, "missing_in_left") for k in inserts}
    )
    assert got == want
    n_dirty = reconcile.merkle_bucket_diff(left, right, ["k"]).count()
    assert 0 < n_dirty <= len(updates) + len(deletes) + len(inserts)


def test_merkle_identical_snapshots_are_clean(spark):
    from laposte_data_engineering_jedha_spark.operators import reconcile

    left = spark.createDataFrame(_base_rows(), _REC_SCHEMA)
    right = spark.createDataFrame(_base_rows(), _REC_SCHEMA)
    assert reconcile.merkle_bucket_diff(left, right, ["k"]).count() == 0
    assert reconcile.merkle_reconcile(left, right, ["k"]).count() == 0


def test_merkle_null_value_is_not_empty_string(spark):
    """The digest payload uses a distinct non-hex token for NULLs — a
    NULL value and an empty string must be detected as a difference, and
    NULL==NULL must be clean (concat_ws alone would collapse both)."""
    from laposte_data_engineering_jedha_spark.operators import reconcile

    schema = "k long, v string"
    left = spark.createDataFrame([(1, None), (2, "x"), (3, None)], schema)
    right = spark.createDataFrame([(1, ""), (2, "x"), (3, None)], schema)
    got = {
        (r["k"], r["change"])
        for r in reconcile.merkle_reconcile(left, right, ["k"]).collect()
    }
    assert got == {(1, "changed")}


def test_merkle_separator_in_value_is_not_a_collision(spark):
    """ADVICE r10 (medium): with a '|'-joined digest payload, values
    ('a|', 'b') and ('a', '|b') encode identically and a genuinely
    different row pair is silently reported clean — a deterministic
    false negative in a data-quality operator. The injective per-column
    md5-token encoding must flag the row as changed, across every
    boundary-shifting variant."""
    from laposte_data_engineering_jedha_spark.operators import reconcile

    schema = "k long, v1 string, v2 string"
    left = spark.createDataFrame(
        [(1, "a|", "b"), (2, "x|", "|y"), (3, "", "|"), (4, "same", "same")],
        schema,
    )
    right = spark.createDataFrame(
        [(1, "a", "|b"), (2, "x||", "y"), (3, "|", ""), (4, "same", "same")],
        schema,
    )
    got = {
        (r["k"], r["change"])
        for r in reconcile.merkle_reconcile(left, right, ["k"]).collect()
    }
    assert got == {(1, "changed"), (2, "changed"), (3, "changed")}
    assert reconcile.merkle_bucket_diff(left, right, ["k"]).count() >= 1


def test_merkle_schema_mismatch_raises(spark):
    from laposte_data_engineering_jedha_spark.operators import reconcile

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        reconcile.merkle_bucket_diff(left, right, ["k"])


def test_sessionize_stream_survives_null_event_times(spark, tmp_path):
    """Found by the sf1 streaming smoke: a NULL ts (NaT after the Arrow
    hop) folded into the pending buffer as int64-min garbage and crashed
    session emission with OutOfBoundsDatetime. Null-ts rows carry no
    event time and must be DROPPED by the fold; the non-null rows still
    sessionize normally."""
    import datetime as dt
    import time

    from laposte_data_engineering_jedha_spark.streaming import jobs

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    stream_dir = str(tmp_path / "stream")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    batches = [
        [
            (1, t0, 1, "view", 1.0, "{}"),
            (2, None, 1, "view", 1.0, "{}"),  # the poison row
            (3, t0 + dt.timedelta(minutes=5), 1, "view", 1.0, "{}"),
        ],
        # sentinel far enough out to close user 1's session
        [(4, t0 + dt.timedelta(hours=2), 99, "noise", 0.0, "{}")],
    ]
    for batch in batches:
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)
        time.sleep(0.05)
    got = {
        (r["user_id"], r["n_events"])
        for r in jobs.run_sessionize_available_now(
            spark, stream_dir, query_name="sessions_null_ts"
        ).collect()
    }
    assert (1, 2) in got  # the two timestamped events, poison row dropped


def test_triangles_tight_caps_undercount_never_overcount(spark):
    """Binding caps must only ever drop triangles (monotone undercount —
    the documented error contract)."""
    from laposte_data_engineering_jedha_spark.operators import graphs
    from laposte_data_engineering_jedha_spark.queries import events_table

    ev = events_table(spark, "/root/testdata/sf0.001")
    exact = graphs.co_activity_triangles(
        ev, min_w=2, bucket_cap=None, max_out_deg=None
    ).collect()[0]
    tight = graphs.co_activity_triangles(
        ev, min_w=2, bucket_cap=8, max_out_deg=3
    ).collect()[0]
    assert tight["n_triangles"] < exact["n_triangles"]
    assert tight["n_edges"] <= exact["n_edges"]
