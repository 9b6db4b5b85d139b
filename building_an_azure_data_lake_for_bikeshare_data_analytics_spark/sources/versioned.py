"""Versioned parquet table store — the engine's stand-in for the two Delta
capabilities the reference actually relies on (SURVEY.md §3.4):

1. **snapshot-isolated self-overwrite**: the reference reads table X and
   overwrites X in the same job (trips -> trips, ipynb:L1074 -> L1098),
   which only works because Delta snapshots the read version. Here each
   write lands in a fresh ``_v<k>`` directory and a tiny ``_CURRENT``
   pointer file flips atomically afterwards — readers of v(k-1) are never
   disturbed, so read-transform-overwrite is always safe.
2. **time travel**: any retained version is addressable for audit /
   reproducibility (``read_version``), with ``vacuum`` to reclaim space.

This is deliberately a minimal log-structured design (one pointer, numbered
snapshot dirs), not a Delta reimplementation: no transaction log, no
concurrent multi-writer protocol. At 100 TB each version directory is a
normal (optionally partitioned) parquet dataset; the pointer flip is O(1)
regardless of data size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"
_PREFIX = "_v"


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith(_PREFIX) and name[len(_PREFIX):].isdigit():
            out.append(int(name[len(_PREFIX):]))
    return sorted(out)


def current_version(path: str) -> int | None:
    ptr = os.path.join(path, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def write_version(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> int:
    """Write ``df`` as the next version of the table and flip the pointer.

    Safe even when ``df`` reads from the table's current version: the new
    snapshot is fully materialized in its own directory before the pointer
    moves (write-then-flip, the essence of snapshot isolation)."""
    os.makedirs(path, exist_ok=True)
    version = (current_version(path) or 0) + 1
    vdir = os.path.join(path, f"{_PREFIX}{version}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(vdir)
    tmp = os.path.join(path, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, _POINTER))  # atomic pointer flip
    return version


def read_current(spark: SparkSession, path: str) -> DataFrame:
    v = current_version(path)
    if v is None:
        raise FileNotFoundError(f"no committed version at {path}")
    return read_version(spark, path, v)


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time travel: read a specific retained snapshot."""
    vdir = os.path.join(path, f"{_PREFIX}{version}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {version} not found (or vacuumed) at {path}")
    return spark.read.parquet(vdir)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str | list[str],
    partition_by: list[str] | None = None,
    allow_new_columns: bool = False,
) -> int:
    """Delta-style MERGE (upsert): rows of ``updates`` replace current rows
    with the same key; unmatched keys are inserted. Writes the result as
    the next snapshot and flips the pointer.

    Implementation is a left-anti join (current rows whose key does NOT
    appear in updates) unioned with the updates — the matched/not-matched
    split of MERGE without row-level file rewrites. Scale shape: updates
    are usually a small delta, so the anti join broadcasts the update keys
    and the big side streams map-only; no fact shuffle.

    ``allow_new_columns=True`` adds schema evolution: columns present in
    only one side are null-filled in the other (``unionByName``).

    Like Delta MERGE, ``updates`` must be key-unique: with duplicate update
    keys the anti-join would drop the current row once and then insert every
    duplicate, silently multiplying rows per key (Delta raises
    ``DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE``); we raise
    ``ValueError`` instead. Dedupe (e.g. last-write-wins by a version
    column) before calling."""
    keys = [key] if isinstance(key, str) else list(key)
    current = read_current(spark, path)
    from pyspark.sql import functions as F

    dup = (
        updates.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"merge_upsert: updates contain duplicate key {tuple(dup[0][k] for k in keys)!r}; "
            "MERGE requires key-unique updates (dedupe before calling)"
        )
    key_set = F.broadcast(updates.select(*keys).distinct())
    untouched = current.join(key_set, on=keys, how="left_anti")
    if allow_new_columns:
        merged = untouched.unionByName(updates, allowMissingColumns=True)
    else:
        merged = untouched.unionByName(updates)
    return write_version(merged, path, partition_by=partition_by)


def vacuum(path: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` versions (never the current one).
    Returns the removed version numbers."""
    import shutil

    cur = current_version(path)
    vs = _versions(path)
    keep_set = set(vs[-max(keep, 1):])
    if cur is not None:
        keep_set.add(cur)
    removed = []
    for v in vs:
        if v not in keep_set:
            shutil.rmtree(os.path.join(path, f"{_PREFIX}{v}"))
            removed.append(v)
    return removed
