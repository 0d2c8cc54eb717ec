"""Round-14 optimization tests.

Spread-branch hardening (VERDICT r13 item 7): the scale-adaptive
spread_scan/spread_table sites carry per-site `min_bytes` floors that the
correctness SFs (0.001/0.01) sit UNDER, so the driver's oracle gate never
executes the repartitioned branch — its correctness rested on the
builder's sf0.1 opt_verify runs plus the order-free-algebra argument.
These tests force the spread branch at the smoke SF
(queries._SPREAD_MIN_BYTES_OVERRIDE = 0) for one representative per
spread family and hash-compare the spread output against the unspread
run — any site whose downstream algebra stopped being order-free exact
diverges here.
"""

from __future__ import annotations

import pytest

import laposte_data_engineering_jedha_spark.queries as q
from laposte_data_engineering_jedha_spark.operators import caches

from test_oracle_parity import canon_rows

# one representative per spread family (OPTIMIZATION_r13.md):
# - orders spread w/ key (olap_bootstrap_mean_ci, round9f)
# - lineitem spread w/ key (olap_pricing_summary, olap.py)
# - documents spread w/ key + low floor (corpus_importance_sample, round13c)
# - bare spread_scan over a substituted-table path (text_perplexity_proxy,
#   round4)
# - all-tables loop spread (dq_table_checksums, round6f)
_SPREAD_REPS = [
    "olap_bootstrap_mean_ci",
    "olap_pricing_summary",
    "corpus_importance_sample",
    "text_perplexity_proxy",
    "dq_table_checksums",
]


@pytest.mark.parametrize("name", _SPREAD_REPS)
def test_forced_spread_branch_matches_unspread(name, spark, sf_dir, monkeypatch):
    fn = q.queries()[name]
    base = fn(spark, sf_dir).toPandas()
    caches.release_all()
    monkeypatch.setattr(q, "_SPREAD_MIN_BYTES_OVERRIDE", 0)
    spread = fn(spark, sf_dir).toPandas()
    caches.release_all()
    assert sorted(base.columns) == sorted(spread.columns)
    assert canon_rows(base) == canon_rows(spread)


def test_spread_override_fires_at_smoke_sf(spark, sf_dir, monkeypatch):
    """The forced branch really is the REPARTITIONED plan at the smoke SF
    (guard against the override silently not reaching the gate)."""
    monkeypatch.setattr(q, "_SPREAD_MIN_BYTES_OVERRIDE", 0)
    df = q.spread_table(spark, sf_dir, "lineitem", key="l_orderkey")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" in plan or "Repartition" in plan
