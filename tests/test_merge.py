"""CDC MERGE semantics (operators/merge.py): delete removes, update
replaces, insert adds, last-writer-wins within a batch, update-as-insert
leniency — on a hand-built micro table where every expectation is spelled
out row by row."""

from __future__ import annotations

from pyspark.sql import functions as F

from laposte_data_engineering_jedha_spark.operators import merge as m


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, x double"
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, x double, op string, seq int")


def test_delete_update_insert(spark):
    ch = _changes(
        spark,
        [
            (1, None, None, "D", 1),
            (2, "b2", 22.0, "U", 1),
            (9, "new", 90.0, "I", 1),
        ],
    )
    got = {r["k"]: (r["v"], r["x"]) for r in m.apply_changes(_snap(spark), ch, ["k"]).collect()}
    assert got == {2: ("b2", 22.0), 3: ("c", 30.0), 9: ("new", 90.0)}


def test_last_writer_wins_within_batch(spark):
    ch = _changes(
        spark,
        [
            (2, "stale", 0.0, "U", 1),
            (2, "final", 2.0, "U", 5),
            (3, "gone", 0.0, "D", 9),
            (3, "earlier", 3.0, "U", 4),
        ],
    )
    got = {r["k"]: (r["v"], r["x"]) for r in m.apply_changes(_snap(spark), ch, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("final", 2.0)}  # 3 deleted by latest seq


def test_update_unmatched_key_behaves_as_insert(spark):
    ch = _changes(spark, [(7, "up", 7.0, "U", 1)])
    got = m.apply_changes(_snap(spark), ch, ["k"]).where(F.col("k") == 7).collect()
    assert [(r["v"], r["x"]) for r in got] == [("up", 7.0)]


def test_idempotent_replay(spark):
    """Re-applying the same batch to the merged result is a no-op — the
    foreachBatch/at-least-once delivery property."""
    ch = _changes(spark, [(1, None, None, "D", 1), (9, "new", 90.0, "I", 1)])
    once = m.apply_changes(_snap(spark), ch, ["k"])
    twice = m.apply_changes(once, ch, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_matches_dict_model_randomized(spark):
    """Differential check against a trivial dict model over a grid of
    seeded random batches: apply_changes == replay the ops into a dict in
    seq order. (Deterministic seeds instead of hypothesis: each case costs
    two Spark jobs, so the suite pins 8 diverse cases.)"""
    import random

    for seed in range(8):
        rng = random.Random(seed)
        snap_rows = [(k, f"v{k}", float(k)) for k in range(10) if rng.random() < 0.7]
        ch_rows = []
        seqs = {}
        for _ in range(rng.randint(1, 15)):
            k = rng.randint(0, 14)
            op = rng.choice(["I", "U", "D"])
            seqs[k] = seqs.get(k, 0) + 1  # unique seq per key by construction
            ch_rows.append((k, f"c{k}_{seqs[k]}", k + seqs[k] / 10.0, op, seqs[k]))

        model = {k: (v, x) for k, v, x in snap_rows}
        latest = {}
        for k, v, x, op, seq in ch_rows:
            if k not in latest or seq > latest[k][3]:
                latest[k] = (v, x, op, seq)
        for k, (v, x, op, _) in latest.items():
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = (v, x)

        snap = spark.createDataFrame(snap_rows or [(99, "z", 0.0)], "k int, v string, x double")
        if not snap_rows:
            snap = snap.where("k < 0")
        ch = spark.createDataFrame(ch_rows, "k int, v string, x double, op string, seq int")
        got = {r["k"]: (r["v"], r["x"]) for r in m.apply_changes(snap, ch, ["k"]).collect()}
        assert got == model, f"seed={seed}"
