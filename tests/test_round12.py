"""Round-12 session tests: the IVF incremental-append lifecycle (r11
verdict item 8) and the auto-banded embedding-LSH oracle surface (item 6).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from laposte_data_engineering_jedha_spark.operators import dedup, similarity
from laposte_data_engineering_jedha_spark.queries import table


def _canon(df):
    return sorted(
        (r["query_id"], r["cand_id"], r["cosine"], r["rank"]) for r in df.collect()
    )


def _search(spark, path, queries_df):
    return similarity.ivf_index_search(
        spark, path, queries_df, k=5, n_probe=4, fold_faithful=True
    )


def test_ivf_append_equals_full_rebuild(spark, sf_dir, tmp_path):
    """The delta path's contract: build-base-then-append must answer every
    search exactly like a from-scratch build over the full corpus —
    append assigns against the same pinned centroids, so the union of
    base + delta postings IS the full posting set."""
    emb = table(spark, sf_dir, "embeddings")
    centers = similarity.pinned_codebook(1, 16, 64)[0]
    grown = str(tmp_path / "grown")
    full = str(tmp_path / "full")
    similarity.ivf_index_write(
        emb.where(F.col("vec_id") % 4 != 0), grown, n_centroids=16,
        centers=centers, fold_faithful=True,
    )
    outcome = similarity.ivf_index_append(
        spark, grown, emb.where(F.col("vec_id") % 4 == 0),
        fold_faithful=True, delta_tag="t1",
    )
    assert outcome == "delta"  # 1/4 of the corpus: under rebuild_fraction
    similarity.ivf_index_write(
        emb, full, n_centroids=16, centers=centers, fold_faithful=True
    )
    queries_df = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding")
    got = _canon(_search(spark, grown, queries_df))
    want = _canon(_search(spark, full, queries_df))
    assert len(got) > 0
    assert got == want


def test_ivf_append_delta_is_idempotent(spark, sf_dir, tmp_path):
    """A duplicate logical append (same delta_tag — the converging-race
    protocol) publishes exactly one delta; search sees no duplicates."""
    emb = table(spark, sf_dir, "embeddings")
    centers = similarity.pinned_codebook(1, 16, 64)[0]
    idx = str(tmp_path / "idx")
    similarity.ivf_index_write(
        emb.where(F.col("vec_id") % 4 != 0), idx, n_centroids=16,
        centers=centers, fold_faithful=True,
    )
    batch = emb.where(F.col("vec_id") % 4 == 0)
    assert similarity.ivf_index_append(
        spark, idx, batch, fold_faithful=True, delta_tag="b1"
    ) == "delta"
    assert similarity.ivf_index_append(
        spark, idx, batch, fold_faithful=True, delta_tag="b1"
    ) == "delta"
    assert similarity._index_delta_dirs(idx) == [os.path.join(idx, "deltas", "b1")]
    assert similarity._index_postings(spark, idx).count() == emb.count()


def test_ivf_append_drift_triggers_compaction(spark, sf_dir, tmp_path):
    """Past rebuild_fraction the LSM stack compacts: one fresh single-base
    index (no deltas left), same search answers as the full build."""
    emb = table(spark, sf_dir, "embeddings")
    centers = similarity.pinned_codebook(1, 16, 64)[0]
    grown = str(tmp_path / "grown")
    full = str(tmp_path / "full")
    # base = 1/4 of the corpus, appended batch = 3/4 -> ratio 3 > 0.5
    similarity.ivf_index_write(
        emb.where(F.col("vec_id") % 4 == 0), grown, n_centroids=16,
        centers=centers, fold_faithful=True,
    )
    outcome = similarity.ivf_index_append(
        spark, grown, emb.where(F.col("vec_id") % 4 != 0), fold_faithful=True
    )
    assert outcome == "rebuild"
    assert similarity._index_delta_dirs(grown) == []  # consumed by compaction
    similarity.ivf_index_write(
        emb, full, n_centroids=16, centers=centers, fold_faithful=True
    )
    queries_df = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding")
    got = _canon(_search(spark, grown, queries_df))
    want = _canon(_search(spark, full, queries_df))
    assert len(got) > 0
    assert got == want


def test_auto_banding_spark_side_planes_match_sql_formula(spark, sf_dir):
    """dedup_embedding_cosine_auto's two engines derive `planes` from the
    same count(*): the Python twin (auto_band_planes) and the SQL
    GREATEST/ceil/log2 formula must agree at every fixture size that the
    oracle can see (the hash row would catch a drift only after the
    mismatch corrupted keys — this pins the formula directly)."""
    import duckdb
    import glob

    for sf_root in sorted(glob.glob("/root/testdata/sf*")):
        pq = os.path.join(sf_root, "embeddings.parquet")
        if not os.path.exists(pq):
            continue
        n = duckdb.sql(f"SELECT count(*) FROM '{pq}'").fetchone()[0]
        sql_planes = duckdb.sql(
            f"SELECT GREATEST(4, CAST(ceil(log2(count(*) / 64.0)) AS BIGINT)) "
            f"FROM '{pq}'"
        ).fetchone()[0]
        assert dedup.auto_band_planes(n) == sql_planes, (sf_root, n)
