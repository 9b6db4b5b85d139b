"""Sinks with the reference's overwrite semantics, made safe without Delta.

The reference writes every table as Delta with ``mode('overwrite')`` and
``option('overwriteSchema', True)`` (S2/S3: ipynb:L263-264, L982, L1087-1101)
and relies on Delta snapshot isolation to read a table and overwrite it in
the same job (SURVEY.md §3.4). Plain parquet self-overwrite would delete the
input mid-scan, so the parquet fallback stages to ``<path>.__stage__`` and
swaps — same observable semantics (full overwrite incl. schema change),
no snapshot dependency.

At 100 TB: writers accept ``partition_by`` (the reference writes facts
unpartitioned — SURVEY.md §4 flags this as the first thing to fix at scale)
so fact tables land partitioned by a date column and downstream queries get
partition pruning.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def overwrite_table(
    df: DataFrame,
    name: str,
    fmt: str = "auto",
    partition_by: list[str] | None = None,
) -> None:
    """Managed-table overwrite: the engine equivalent of the reference's
    ``df.write.format('delta').mode('overwrite')
    .option('overwriteSchema', True).saveAsTable(name)`` (S2/S3).

    ``fmt='auto'`` writes REAL Delta when delta-spark is installed
    (reference parity), parquet otherwise."""
    if fmt == "auto":
        from ..session import delta_available

        fmt = "delta" if delta_available() else "parquet"
    w = df.write.format(fmt).mode("overwrite")
    if fmt == "delta":
        w = w.option("overwriteSchema", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.saveAsTable(name)


def overwrite_parquet_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> None:
    """Path-based overwrite that is safe even when ``df`` reads from ``path``
    (stage-and-swap; Delta gets this from snapshots, parquet needs help)."""
    stage = path.rstrip("/") + ".__stage__"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(stage)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(stage, path)


def compact_parquet_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> dict[str, int]:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_file_bytes) files (the OPTIMIZE maintenance
    op Delta users run; the reference never compacts — SURVEY.md §4).

    Streaming sinks and incremental appends accrete kilobyte files; at
    100 TB the scan's file-listing and per-file open overhead then dominate
    the query. One ``repartition(n)`` rewrite restores ~target-size files.
    ``sort_within_by`` optionally clusters rows inside each output file
    (``sortWithinPartitions`` — a local sort, no extra shuffle) so min/max
    footer stats give data-skipping on those columns.

    Returns ``{"files_before": ..., "files_after": ..., "bytes": ...}``.
    """
    before = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, -(-total // target_file_bytes))  # ceil div
    df = spark.read.parquet(path).repartition(n_out)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    overwrite_parquet_table(df, path)
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return {"files_before": len(before), "files_after": len(after), "bytes": total}


def drop_table_if_exists(spark: SparkSession, name: str) -> None:
    """Idempotent re-run hygiene (S5, ipynb:L191-194, cell 3)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def overwrite_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles rows into ``n_buckets`` by hash
    of ``bucket_cols`` at write time so joins/aggregations on those columns
    need NO runtime exchange (SortMergeJoin over co-located buckets).

    The 100 TB pattern for repeatedly-joined fact pairs (e.g. trips and
    payments bucketed by rider_id): pay the shuffle once at ingest, never
    again per query. The reference writes unpartitioned, unbucketed Delta —
    SURVEY.md §4 lists this as the first scale gap."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)
