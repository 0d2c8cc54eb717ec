"""Physical data-layout operators — the storage-side half of shuffle
avoidance at 100 TB.

The query-side operators (queries/, operators/) assume whatever layout the
lake has; these write layouts that make the recurring joins and scans
cheap:

- bucketed tables: pre-shuffle ONCE at write time so every later equi-join
  / aggregation on the bucket key plans with ZERO Exchange (asserted in
  tests/test_layout.py against the physical plan);
- range-clustered parquet: repartitionByRange + sortWithinPartitions so
  file- and row-group-level min/max statistics become disjoint and filters
  skip whole files ("poor man's Z-order" for the 1-D case; the test checks
  the written files' parquet footers really are disjoint);
- compaction: rewrite a many-small-files dataset into size-targeted files
  (small files are the classic 100 TB listing/scheduling killer).

All of this is plain public Spark API (DataFrameWriter.bucketBy,
repartitionByRange, parquet footers via pyarrow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed (and optionally sort-within-bucket)
    session-catalog table at an explicit `path`.

    Bucketing hash-partitions rows into `n_buckets` files per task output
    BY KEY at write time; Spark records the bucket spec in the catalog and
    later scans report outputPartitioning = HashPartitioning(keys,
    n_buckets) — so joins/aggregations on `keys` between tables with the
    SAME spec need no Exchange at all. The one-time write shuffle is
    amortized over every downstream query; for a fact table joined daily
    on its key, this converts the cluster's largest recurring shuffle into
    a map-side zip. sort_cols additionally sorts within each bucket file,
    turning SortMergeJoin's per-task sort into a no-op."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def bucketed_equi_join(
    spark: SparkSession, left_name: str, right_name: str, keys: list[str]
) -> DataFrame:
    """Inner equi-join of two same-spec bucketed tables on the bucket key.

    With matching bucket counts Spark aligns bucket i of the left with
    bucket i of the right — the plan contains NO Exchange on either side
    (the test pins this). This is the batch analogue of co-partitioned
    stream joins, and the pattern behind every 'pre-join our two biggest
    tables nightly' layout decision."""
    return spark.table(left_name).join(spark.table(right_name), keys)


def write_range_clustered(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int
) -> None:
    """Write parquet clustered on `cluster_cols`: repartitionByRange gives
    each output file a disjoint value range, sortWithinPartitions orders
    rows inside so row-group min/max stats are tight. A later scan with a
    filter on the cluster column reads the footers (cheap) and skips every
    file whose [min, max] misses the predicate — at 100 TB this is the
    difference between scanning 3 files and 30,000. (True Z-order
    interleaves multiple dimensions; for the dominant-filter-column case
    range clustering is optimal and needs no custom codec.)"""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_to_files(df: DataFrame, path: str, n_files: int) -> None:
    """Rewrite a dataset into exactly `n_files` parquet files.

    Uses round-robin repartition (not coalesce): coalesce(n) would also
    narrow the parallelism of everything upstream of the write, and can
    produce skewed files when input partitions are uneven; a repartition
    shuffle costs one pass and yields uniformly-sized output — the right
    trade for a compaction job whose entire point is output layout. Size
    targeting: callers compute n_files = ceil(input_bytes /
    target_file_bytes) from the source listing."""
    df.repartition(n_files).write.mode("overwrite").parquet(path)


def parquet_file_ranges(path: str, column: str) -> list[tuple]:
    """(file, min, max) of `column` from each parquet footer under `path` —
    the metadata a skipping scan consults, exposed for tests/ops tooling.
    Footer-only reads: no row data is touched."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                col = rgm.column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((os.path.basename(f), lo, hi))
    return out


def zorder_value(df: DataFrame, cols: list[str], bits: int = 6) -> DataFrame:
    """Append `_z`: the Morton (Z-order) code interleaving `bits`
    quantile-bucket bits per column — rows close in _z are close in EVERY
    clustered dimension at once, which single-column range clustering
    cannot give (its second column spans the full range in every file).

    Buckets come from approxQuantile cut points (one tiny driver array per
    column, folded into a chained-comparison expression — 2^bits-1 terms,
    so bits stays small; 6 bits = 64 buckets resolves 4096 cells in 2-D),
    so skew cannot starve bucket resolution; the interleave is pure
    integer bit math, codegen'd."""
    n_buckets = 1 << bits
    out = df
    bucket_cols = []
    for i, c in enumerate(cols):
        cuts = df.approxQuantile(c, [j / n_buckets for j in range(1, n_buckets)], 0.001)
        # strictly increasing cut points (duplicates collapse under skew)
        uniq = sorted(set(cuts))
        expr = F.lit(0)
        for cut in uniq:
            expr = expr + (F.col(c) > F.lit(cut)).cast("int")
        bc = f"_zb{i}"
        out = out.withColumn(bc, expr.cast("long"))
        bucket_cols.append(bc)
    z = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):
        for i in range(len(cols)):
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(F.col(bucket_cols[i]), bit).bitwiseAND(F.lit(1))
            )
    return out.withColumn("_z", z).drop(*bucket_cols)


def write_zorder_clustered(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int, bits: int = 6
) -> None:
    """Write parquet Z-order-clustered on `cluster_cols`: each output file
    covers a small hyper-rectangle of the clustered space, so filters on
    ANY subset of the clustered columns skip most files via footer
    min/max — the multi-dimensional generalization of
    write_range_clustered (Delta/Iceberg OPTIMIZE ZORDER BY, on plain
    parquet). The _z sort key is dropped from the output."""
    (
        zorder_value(df, cluster_cols, bits)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned(df: DataFrame, path: str, cols: list[str]) -> None:
    """Hive-partitioned rewrite: one directory per distinct value tuple
    of `cols`, so a reader filtering on them prunes at PLAN time
    (PartitionFilters — no footer reads, no file opens for excluded
    partitions). The write shuffles on the partition columns first so
    each output directory is written by the tasks that own its rows
    (without it, every task appends a small file to every partition —
    the classic small-files explosion at 100 TB)."""
    df.repartition(*[F.col(c) for c in cols]).write.mode("overwrite").partitionBy(
        *cols
    ).parquet(path)
