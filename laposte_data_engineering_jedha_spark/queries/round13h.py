"""Round-13 session batch 8 — binary-file ingestion (the multimodal
ingest path):

- src_binary_ingest: materialize a directory of small binary payload
  files (one per document, deterministic content) and ingest it through
  Spark's `binaryFile` source — the path a 100 TB multimodal corpus
  actually arrives on (image/audio blobs as opaque bytes + typed
  metadata; see operators/multimodal.py for the decode stage). The
  oracle computes the EXPECTED (file name, byte length, md5) directly
  from the documents table, so the hash row checks the whole
  write -> list -> read -> hash chain without the SQL ever touching the
  filesystem (the same roundtrip-identity shape as src_csv_roundtrip).

Reference parity note: the reference ingests CSV/JSON/XLSX/SQLite
(supercourier_etl extract step); binary ingestion is extension surface
for the multimodal mandate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, table
from .round11a import _scratch

_BIN_N = 64  # files per corpus — enough for real listing/partition work


def _ensure_bin_files(spark: SparkSession, sf_dir: str) -> str:
    """Write one .bin payload file per document (doc_id < {_BIN_N}),
    UTF-8 text bytes, idempotently into a (sf_dir, pid)-keyed scratch
    dir — the single-writer convention of queries/round11a.py (and the
    same sweep cleans it up)."""
    # the round11a layout-scratch convention: pid-keyed location,
    # swept by its dead-sibling/atexit lifecycle
    path = _scratch(sf_dir, 'binin')
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    rows = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _BIN_N)
        .select("doc_id", "text")
        .collect()
    )
    tmp = f"{path}.build-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for r in rows:
        with open(os.path.join(tmp, f"doc{r['doc_id']:04d}.bin"), "wb") as fh:
            fh.write(r["text"].encode("utf-8"))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, path)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path


@query(
    "src_binary_ingest",
    f"""
SELECT 'doc' || lpad(CAST(doc_id AS VARCHAR), 4, '0') || '.bin' AS file_name,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents WHERE doc_id < {_BIN_N}
ORDER BY file_name""",
)
def src_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload ingestion through the `binaryFile` source: write
    {_BIN_N} one-document .bin files (idempotent, pid-keyed scratch),
    then read the DIRECTORY back as (path, length, content) and emit
    (file_name, n_bytes, md5(content)). The oracle derives the same
    triple from the source table, so a mismatch anywhere in the
    write/list/read/hash chain — a truncated file, a mangled byte, a
    lost file — breaks the hash row. The fixture corpus is pure ASCII
    (the multimodal_dedup_bytes byte-exactness note), so DuckDB's
    md5(VARCHAR) equals Spark's md5(BINARY) over the UTF-8 bytes. At
    100 TB this source lists object-store prefixes into file-sized
    tasks (maxPartitionBytes-bounded); the decode stage downstream is
    operators/multimodal.py."""
    path = _ensure_bin_files(spark, sf_dir)
    df = spark.read.format("binaryFile").load(f"{path}/*.bin")
    return (
        df.select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").cast("long").alias("n_bytes"),
            F.md5("content").alias("payload_md5"),
        )
        .orderBy("file_name")
    )
