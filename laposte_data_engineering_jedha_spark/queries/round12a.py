"""Round-12 session batch 1 — the embedding-LSH oracle surface moves to
AUTO-BANDING (r11 verdict item 6 / What's-wrong #2):

- dedup_embedding_cosine_auto: the same banded-hyperplane near-dup
  operator as dedup_embedding_cosine, but with the plane count sized by
  `auto_band_planes(count(*))` — the PRODUCTION configuration — instead
  of the fixture-pinned 4 planes. The pinned query was the registry's
  one scale outlier (exponent 1.72 sf0.1→sf1: constant bucket count, so
  candidate mass grows ~n²/2^planes); production auto-banding measured
  0.80 but, until now, had no oracle surface of its own. The DuckDB twin
  computes the SAME planes = max(4, ceil(log2(n/64))) from count(*)
  inside the SQL (the band-key list comprehension takes dynamic bounds),
  so the externally hash-checked plan is exactly the plan a 100 TB run
  executes. The pinned query stays registered as the fixed-parameter
  regression row.

Reference parity note: the reference (supercourier_etl) has no
embedding operators; this is extension surface sized for the
training-data-pipeline mandate.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, similarity
from . import query, table, table_rowcount
from .llmops import _EMB_BANDS, _sql_band_key, SQL_NORM, sql_dot, sql_round
from .round5 import _EMB_DIM, _IVF_K
from .round7 import _IVF_PROBE, _IVF_TOPK
from .round9a import _corpus_fingerprint, _ivf_index_sql

# planes = max(4, ceil(log2(n / 64))) — the exact twin of
# operators/dedup.auto_band_planes (target_bucket=64, floor=4). count(*)
# is over the raw embeddings table on BOTH sides so the two engines can
# never disagree about n.
_SQL_AUTO_PLANES = (
    "SELECT GREATEST(4, CAST(ceil(log2(count(*) / 64.0)) AS BIGINT)) AS planes "
    "FROM embeddings"
)


@query(
    "dedup_embedding_cosine_auto",
    f"""
WITH np AS ({_SQL_AUTO_PLANES}),
n AS (SELECT vec_id, embedding AS e, {SQL_NORM} AS nrm FROM embeddings
      WHERE {SQL_NORM} > 0),
keyed AS (
  SELECT vec_id, band, {_sql_band_key('e', 'planes')} AS key
  FROM (SELECT vec_id, e, CAST(r.range AS BIGINT) AS band, planes
        FROM n CROSS JOIN np CROSS JOIN range(0, {_EMB_BANDS}) r)),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keyed a JOIN keyed b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
SELECT id_a, id_b,
       {sql_round(f"{sql_dot('va.e', 'vb.e')} / (va.nrm * vb.nrm)", 4)} AS cosine
FROM cand JOIN n va ON id_a = va.vec_id JOIN n vb ON id_b = vb.vec_id
WHERE cosine >= CAST(0.4 AS DOUBLE)""",
)
def dedup_embedding_cosine_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup pairs via banded hyperplane LSH with
    CORPUS-SIZED banding: planes = auto_band_planes(count(*)) keeps
    expected bucket occupancy (and therefore per-bucket candidate mass)
    constant as the corpus grows — the ~linear scale path
    (operators/dedup.py:508; measured exponent 0.80 sf0.1→sf1 vs 1.72
    for fixture-pinned planes). Candidates from a (band, bucket)
    equi-join, exact cosine verify, no driver collect; the occupancy
    gate (CARRY_MAX_OCCUPANCY) selects the carried-vector plan in this
    regime — auto-banding's design point. The count() action that sizes
    the planes is one column-pruned scan, amortized across the 8-band
    key generation."""
    emb = table(spark, sf_dir, "embeddings")
    planes = dedup.auto_band_planes(table_rowcount(spark, sf_dir, "embeddings"))
    return dedup.embedding_dup_pairs_lsh(
        emb, threshold=0.4, bands=_EMB_BANDS, band_planes=planes
    )


# =================== IVF incremental append (r11 verdict item 8) ===================

# disjoint query slice from ivf_knn (vec_id<8) and ivf_index_search
# ([8,16)) so the three hash rows are independent evidence
_APD_Q_LO, _APD_Q_HI = 16, 24

# base = vec_id % _APD_MOD != 0 (75% of the corpus), appended batch =
# the remaining 25% — under ivf_index_append's default rebuild_fraction
# (0.5), so the registered lifecycle exercises the DELTA path; the
# compaction path is pinned by tests/test_round12.py instead.
_APD_MOD = 4

#: bump when the append layout or assignment kernel changes
_APD_CONTRACT = "v1-append-pinned16-foldfaithful"


def _append_index_path(sf_dir: str) -> str:
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{_APD_CONTRACT}|{_corpus_fingerprint(sf_dir)}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"laposte_ivf_apidx_{tag}")


def _ensure_appended_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-base-then-append, idempotently: the base index over 3/4 of
    the corpus publishes by atomic rename (the round9a protocol); the
    remaining 1/4 is then appended as the deterministic 'append-v1'
    delta (ivf_index_append publishes it by rename too, and the
    deterministic tag makes a concurrent duplicate append converge).
    Every later run finds both published and goes straight to search."""
    path = _append_index_path(sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    base_done = all(
        os.path.exists(os.path.join(path, part, "_SUCCESS"))
        for part in ("centroids.parquet", "postings.parquet")
    )
    if not base_done:
        scratch = f"{path}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        books = similarity.pinned_codebook(1, _IVF_K, _EMB_DIM)[0]
        similarity.ivf_index_write(
            emb.where(F.col("vec_id") % _APD_MOD != 0),
            scratch,
            n_centroids=_IVF_K,
            centers=books,
            fold_faithful=True,
        )
        try:
            os.rename(scratch, path)
        except OSError:
            published = all(
                os.path.exists(os.path.join(path, part, "_SUCCESS"))
                for part in ("centroids.parquet", "postings.parquet")
            )
            if published:
                shutil.rmtree(scratch, ignore_errors=True)
            else:
                shutil.rmtree(path, ignore_errors=True)
                os.rename(scratch, path)
    delta_done = os.path.exists(
        os.path.join(path, "deltas", "append-v1", "postings.parquet", "_SUCCESS")
    )
    if not delta_done:
        similarity.ivf_index_append(
            spark,
            path,
            emb.where(F.col("vec_id") % _APD_MOD == 0),
            fold_faithful=True,
            delta_tag="append-v1",
        )
    return path


@query("ivf_index_append_search", _ivf_index_sql(_APD_Q_LO, _APD_Q_HI))
def ivf_index_append_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN search over an IVF index grown by INCREMENTAL APPEND (r11
    verdict item 8): the base index is built over 3/4 of the corpus,
    the final 1/4 arrives later as an immutable delta —
    operators/similarity.ivf_index_append assigns the new vectors to
    the EXISTING pinned centroids in one map-side pass and publishes
    hive-partitioned delta postings by atomic rename; nothing in the
    base is rewritten. Search unions base + delta postings with
    centroid partition pruning in every branch, so the oracle — the
    inline recomputation over the WHOLE corpus — must match
    bit-for-bit: append-then-search == build-everything-then-search,
    which is exactly the delta path's contract (the equality against a
    from-scratch rebuild is additionally pinned in
    tests/test_round12.py, along with the drift-triggered compaction)."""
    idx = _ensure_appended_index(spark, sf_dir)
    queries_df = (
        table(spark, sf_dir, "embeddings")
        .where((F.col("vec_id") >= _APD_Q_LO) & (F.col("vec_id") < _APD_Q_HI))
        .select("vec_id", "embedding")
    )
    return similarity.ivf_index_search(
        spark, idx, queries_df, k=_IVF_TOPK, n_probe=_IVF_PROBE, fold_faithful=True
    )
