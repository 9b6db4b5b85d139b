"""Parallelism primitives: scan-fanout for unsplittable inputs and
overlapped independent Spark jobs (r12 optimization round).

Two distinct idle-core problems measured in the r12 profile
(``tools/profile_stages.py``), with the two standard remedies from the
optimization playbook:

* **spread** — the driver testdata writes each table as ONE parquet file
  with ONE row group. A row group is Spark's minimum split, so every scan
  is a single task and all per-row compute downstream of it (tokenize +
  shingle explode, embedding folds, Arrow kernels) serializes on one core
  while the other 31 idle: q186's two tokenize stages ran 8.0 s and 7.5 s
  as single tasks. The playbook's input-skew rule ("one huge unsplittable
  file — repartition immediately after the read") applies: one cheap
  round-robin exchange of the NARROW scanned rows (documents = 0.6 MB
  compressed at sf0.1) buys full-width execution of the expensive
  downstream stage. The repartition is CONDITIONAL on the actual scan
  partition count, so it never fires at deployment scale — a 100 TB table
  scans as thousands of row-group splits and ``spread`` is the identity
  there; the exchange exists only in the regime where the input layout,
  not the plan, is the parallelism bound. (It also repairs the
  cores-scaling measurement: a single-task stage costs the same wall at
  local[8] and local[32]; a spread stage scales with the core count.)

* **run_parallel** — lifecycle heads (q239/q252/q245/...) materialize
  several INDEPENDENT store artifacts; each ``write_version`` /
  ``localCheckpoint`` is a driver-blocking action, so the head paid every
  job's driver tail (planning, parquet commit, manifest write) serially
  — q252 ran ~17 back-to-back actions. Spark's scheduler happily runs
  several jobs at once inside one application; submitting independent
  actions from a small thread pool lets one job's tasks back-fill
  executors idled by another job's driver-side phases (the playbook's
  "overlap independent jobs" pattern, FIFO scheduling = exactly the
  back-fill behaviour wanted). Store CONTENTS are unchanged — only the
  wall-clock overlap changes; each store still serializes its own commits
  behind the per-store writer lock.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism when its current partitioning is narrower — the
    unsplittable-input fix. Identity when the scan already has enough
    splits (every real-scale deployment), so plans at 100 TB carry no
    extra exchange.

    Round-robin (keyless) repartition is deterministic under retries
    (sort-before-repartition is on by default) and none of the engine's
    relational results depend on physical row placement, so output values
    are unchanged — pinned by the untouched oracle hashes.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def run_parallel(*thunks: Callable[[], Any], max_workers: int = 6) -> list[Any]:
    """Run independent driver-blocking actions as overlapping Spark jobs.

    Each thunk must be independent of the others (different stores /
    different lineages); results return in thunk order. The first raising
    thunk's exception propagates after the pool drains, so a failure is
    never swallowed into a half-materialized state. Job submission from
    plain threads is supported by Spark (job descriptions are
    thread-local; the engine does not set them outside the bench).
    """
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(max_workers, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
