"""Round-9 session batch 2 — bounded graph analytics:

- events_user_triangles_capped: the PRODUCTION variant of the exact
  triangle count (round4c.py:events_user_triangles, sf1 exponent 1.53 —
  wedge volume is degree^2), with both quadratic stages deterministically
  capped (operators/graphs.py): per-(hour,type) bucket sampling bounds
  pair generation, a per-source out-degree cap bounds wedge enumeration.
  Caps are (md5, id)-ordered so DuckDB reproduces them bit-for-bit — the
  capped count is a full hash-checked oracle row, not a rows-only
  estimate. min_w=2 (vs the exact query's 5) densifies the graph enough
  that the caps BIND at the gate scales: at sf0.01 the capped count is
  131 vs 23,695 uncapped — the cap is doing real work in the oracle
  window, not just at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import graphs
from . import events_table, query

_CTRI_MIN_W = 2
_CTRI_BUCKET_CAP = 8
_CTRI_OUT_DEG = 3

_CAPPED_TRI_SQL = f"""
WITH support0 AS (
  SELECT DISTINCT date_trunc('hour', ts) AS h, event_type AS t, user_id AS u
  FROM events),
support AS (
  SELECT h, t, u FROM (
    SELECT h, t, u,
           row_number() OVER (PARTITION BY h, t
                              ORDER BY md5(CAST(u AS VARCHAR)), u) AS br
    FROM support0) WHERE br <= {_CTRI_BUCKET_CAP}),
co AS (
  SELECT a.u AS x, b.u AS y, count(*) AS w
  FROM support a JOIN support b ON a.h = b.h AND a.t = b.t AND a.u < b.u
  GROUP BY 1, 2),
edges AS (SELECT x, y FROM co WHERE w >= {_CTRI_MIN_W}),
deg AS (
  SELECT u, count(*) AS dg FROM (
    SELECT x AS u FROM edges UNION ALL SELECT y AS u FROM edges) GROUP BY 1),
oriented0 AS (
  SELECT CASE WHEN (dx.dg < dy.dg) OR (dx.dg = dy.dg AND e.x < e.y)
              THEN e.x ELSE e.y END AS src,
         CASE WHEN (dx.dg < dy.dg) OR (dx.dg = dy.dg AND e.x < e.y)
              THEN e.y ELSE e.x END AS dst
  FROM edges e JOIN deg dx ON e.x = dx.u JOIN deg dy ON e.y = dy.u),
o2 AS (
  SELECT src, dst, dst_dg FROM (
    SELECT src, dst, dg AS dst_dg,
           row_number() OVER (PARTITION BY src ORDER BY dg, dst) AS orr
    FROM oriented0 JOIN deg ON dst = u) WHERE orr <= {_CTRI_OUT_DEG}),
wedges AS (
  SELECT w1.dst AS lo, w2.dst AS hi
  FROM o2 w1 JOIN o2 w2 ON w1.src = w2.src
   AND ((w1.dst_dg < w2.dst_dg) OR (w1.dst_dg = w2.dst_dg AND w1.dst < w2.dst))),
tri AS (
  SELECT count(*) AS n_triangles
  FROM wedges w JOIN o2 o ON w.lo = o.src AND w.hi = o.dst)
SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST(n_triangles AS BIGINT) AS n_triangles
FROM tri"""


@query("events_user_triangles_capped", _CAPPED_TRI_SQL)
def events_user_triangles_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically BOUNDED triangle count of the user co-activity
    graph (edge = >= 2 shared (hour, event-type) buckets): per-bucket
    user sampling (cap 8, (md5,id)-ordered) bounds pair generation at
    cap^2 per bucket, a per-source out-degree cap (3, lowest-(deg,id))
    bounds wedges at cap^2 per node — so the whole pipeline is O(edges)
    at ANY scale, the production answer to the exact query's measured
    sf1 exponent of 1.53. Undercounts only (capped subgraph count, no
    phantom triangles); the uncapped exact query stays registered as
    the unbounded-semantics oracle. See operators/graphs.py."""
    return graphs.co_activity_triangles(
        events_table(spark, sf_dir),
        min_w=_CTRI_MIN_W,
        bucket_cap=_CTRI_BUCKET_CAP,
        max_out_deg=_CTRI_OUT_DEG,
    )
