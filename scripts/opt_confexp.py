#!/usr/bin/env python
"""Round-13 config experiment: time a fixed query subset under an extra
Spark conf taken from $OPT_EXTRA_CONF (JSON object), fresh process per
variant so static confs apply. Prints per-query medians and the subset
total.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laposte_data_engineering_jedha_spark import queries as q
from laposte_data_engineering_jedha_spark.operators import caches
from laposte_data_engineering_jedha_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# heavy heads + a slice of the mid band + light tail — chosen to expose
# shuffle-count, cached-plan-partitioning, and join-strategy effects
SUBSET = [
    "dedup_semantic", "ml_gate_distill_gd", "dedup_embedding_cosine_auto",
    "dq_merkle_row_pulls", "corpus_clean_pipeline_sem", "dedup_containment",
    "olap_bootstrap_mean_ci", "events_user_triangles_capped",
    "graph_kcore_peel", "olap_numeric_corr_matrix", "corpus_passage_scrub",
    "events_stickiness_hll", "eval_cluster_silhouette", "dedup_minhash_lsh",
    "dedup_simhash", "knn_graph", "corpus_health_report", "dq_uniqueness_report",
    "olap_rollup_revenue", "olap_pricing_summary", "olap_topk_customers",
    "events_sessionize", "events_session_revenue", "text_token_count",
    "text_tfidf_topterms", "corpus_mix_domains", "corpus_pack_bins",
    "olap_basket_affinity", "dq_benford_first_digit", "olap_pareto_frontier",
    "events_interval_overlap", "knn_brute_force", "pipeline_delay_status",
    "olap_revenue_filter", "eval_ndcg_truncated", "multimodal_features",
]


def main() -> None:
    extra = json.loads(os.environ.get("OPT_EXTRA_CONF", "{}"))
    n_runs = int(os.environ.get("OPT_RUNS", "3"))
    spark = get_spark(app_name="opt_confexp", extra_conf=extra)
    registry = q.queries()
    total = 0.0
    out = {}
    for name in SUBSET:
        fn = registry[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        caches.release_all()
        med = statistics.median(samples)
        out[name] = round(med, 3)
        total += med
        print(json.dumps({"q": name, "sec": out[name]}), flush=True)
    print(json.dumps({"conf": extra, "subset_total": round(total, 3)}), flush=True)


if __name__ == "__main__":
    main()
