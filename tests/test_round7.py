"""Round-7 semantics tests — planted-scenario invariants beyond the
oracle hash gate: the graduated ivf_knn's recall vs brute force on the
pinned codebook, LOO-encoding leakage-freeness, AUC truth table, moment-
matrix corr vs a direct two-pass computation, bot-flag thresholds."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from laposte_data_engineering_jedha_spark.queries import round7, round7b

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _write_events(spark, tmp_path, rows):
    d = str(tmp_path / "mini")
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    return d


def _ts(s: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_ivf_knn_pinned_recall_vs_brute_force(spark, sf_dir):
    """The graduated pinned-codebook IVF search must recover most of the
    exact top-5 (n_probe=4 of 16 lists -> high but not perfect recall),
    and every (query, cand, cosine) it returns must agree exactly with
    the brute-force cosine for that pair — IVF prunes candidates, it
    never changes scores."""
    from laposte_data_engineering_jedha_spark.queries import llmops

    ivf = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in round7.ivf_knn(spark, sf_dir).collect()
    }
    bf = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in llmops.knn_brute_force(spark, sf_dir).collect()
    }
    assert ivf, "ivf returned nothing"
    hits = sum(1 for k in bf if k in ivf)
    assert hits / len(bf) >= 0.5, f"recall {hits}/{len(bf)}"
    for k, cos in ivf.items():
        if k in bf:
            assert cos == bf[k], k


def test_target_encoding_is_leave_one_out(spark, tmp_path):
    """Three clicks valued 1.00/2.00/3.00: each row's encoding is the mean
    of the OTHER two (leakage-free), not the plain category mean 2.00; a
    singleton category encodes NULL."""
    rows = [
        (1, _ts(0), 1, "click", 1.0, "{}"),
        (2, _ts(1), 1, "click", 2.0, "{}"),
        (3, _ts(2), 1, "click", 3.0, "{}"),
        (4, _ts(3), 1, "view", 9.0, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r["event_id"]: r["te_value"] for r in round7b.events_target_encoding(spark, d).collect()}
    assert out[1] == 2.5 and out[2] == 2.0 and out[3] == 1.5
    assert out[4] is None


def test_auc_truth_table(spark, tmp_path):
    """Perfectly separated scores -> AUC 1.0; all-tied scores -> 0.5;
    perfectly inverted -> 0.0."""

    def auc_of(values_labels):
        rows = [
            (i, _ts(i), 1, ("purchase" if pos else "view"), v, "{}")
            for i, (v, pos) in enumerate(values_labels)
        ]
        d = _write_events(spark, tmp_path, rows)
        return round7b.eval_value_auc(spark, d).collect()[0]["auc"]

    assert auc_of([(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]) == 1.0
    assert auc_of([(5.0, 0), (5.0, 0), (5.0, 1), (5.0, 1)]) == 0.5
    assert auc_of([(9.0, 0), (8.0, 0), (1.0, 1), (2.0, 1)]) == 0.0


def test_corr_matrix_matches_two_pass(spark, sf_dir):
    """The one-pass DECIMAL moment matrix must agree (to the 1e-6
    rounding) with Spark's own two-pass corr() for every pair."""
    from laposte_data_engineering_jedha_spark.queries import table

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("quantity"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("extendedprice"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("discount"),
        F.round(F.col("l_tax") * 10000).cast("long").alias("tax"),
    )
    got = {
        (r["col_a"], r["col_b"]): r["pearson_r"]
        for r in round7b.olap_numeric_corr_matrix(spark, sf_dir).collect()
    }
    assert len(got) == 6
    for (a, b), r in got.items():
        ref = li.select(F.corr(a, b)).first()[0]
        assert r == pytest.approx(ref, abs=2e-6), (a, b)


def test_bot_detection_thresholds(spark, tmp_path):
    """User 1 fires 3 events inside an hour -> flagged with burst 3 and
    2 fast gaps; user 2's events are spread past the window -> clean."""
    rows = [
        (1, _ts(0), 1, "click", 0.0, "{}"),
        (2, _ts(10), 1, "click", 0.0, "{}"),
        (3, _ts(20), 1, "click", 0.0, "{}"),
        (4, _ts(0), 2, "view", 0.0, "{}"),
        (5, _ts(4000), 2, "view", 0.0, "{}"),
        (6, _ts(8000), 2, "view", 0.0, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    out = {r["user_id"]: r for r in round7b.events_bot_detection(spark, d).collect()}
    assert out[1]["is_bot"] and out[1]["max_burst_1h"] == 3 and out[1]["n_fast_gaps"] == 2
    assert not out[2]["is_bot"] and out[2]["max_burst_1h"] == 1 and out[2]["n_fast_gaps"] == 0
