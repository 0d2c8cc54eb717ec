"""Partition-count invariance: the driver harness runs the registry in ITS
OWN SparkSession (local[32], its own shuffle settings), so results must be
identical under different shuffle-partition counts. Representative queries
from each risk family — decimal aggregate, window+tie-break top-k, Arrow
kernel fold, integer iteration, global ntile — re-run at 3 partition
settings and must produce byte-identical canonical rows."""

from __future__ import annotations

import pytest

from laposte_data_engineering_jedha_spark import queries as q

from test_oracle_parity import canon_rows

REPRESENTATIVES = [
    "olap_pricing_summary",        # decimal sums
    "olap_returned_items",         # top-k with tie-break
    "text_perplexity_proxy",       # Arrow libm kernel + collected fold
    "events_type_pagerank",        # integer iteration over shuffles
    "corpus_curriculum_order",     # global ntile window
    "dedup_minhash_lsh",           # banded self-join
    # round-5 families
    "events_salted_spend",         # rand-salt layout changes, result must not
    "dedup_passage",               # window-count over (key, doc) + re-agg
    "events_windowed_topk",        # decimal agg + rank window tie-break
    "pq_adc_topk_pinned",          # HOF folds + broadcast BNLJ + rank
    # round-7 families
    "events_value_anova_f",        # quantized per-group terms summed as ints
    "events_holt_linear",          # single-group pandas fold over a shuffled day grain
    "ivf_knn",                     # fold argmin routing + Arrow cosine + rank
    "eval_value_auc",              # global rank window at the score grain
    "text_bpe_merge_step",         # winner limit(1) + vocab-grain replace
    # round-13 families
    "ml_gate_distill_gd",          # iterative GD: quantized gradient sums, the
                                   # headline bit-reproducible-training claim
    "events_holt_winters_daily",   # per-type pandas fold with 7-slot list state
    "sketch_ams_f2",               # signed sketch counters summed as ints
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_under_shuffle_partitions(name, spark, sf_dir):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("3", "8", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results.append(canon_rows(q.queries()[name](spark, sf_dir).toPandas()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1] == results[2]


def test_rng_sample_is_partition_sensitive_hash_sample_is_not(spark, sf_dir):
    """Negative control for the sampling design choice: Bernoulli
    `df.sample(seed=...)` draws from a per-partition RNG stream, so the
    SELECTED SET changes when the partition layout changes — which is
    why every registered sampler here keys on md5(id) instead
    (corpus_hash_sample & friends): content-addressed selection is
    layout-independent and replayable across clusters."""
    from laposte_data_engineering_jedha_spark.functions import texts
    import pyspark.sql.functions as F

    docs = q.queries()["corpus_hash_sample"]  # noqa: F841 (registered twin)
    base = __import__(
        "laposte_data_engineering_jedha_spark.queries", fromlist=["table"]
    ).table(spark, sf_dir, "documents").select("doc_id")

    def rng_ids(parts):
        return {
            r["doc_id"]
            for r in base.repartition(parts).sample(0.3, seed=7).collect()
        }

    def hash_ids(parts):
        bucket = texts.md5int32(F.col("doc_id").cast("string")) % 100
        return {
            r["doc_id"]
            for r in base.repartition(parts).where(bucket < 30).collect()
        }

    assert rng_ids(3) != rng_ids(17)  # layout-dependent: different sets
    assert hash_ids(3) == hash_ids(17)  # content-addressed: identical sets
