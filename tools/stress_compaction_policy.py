"""Compaction-cadence soak: a long partitioned append chain through the
streaming commit path (``commit_store_batch``) with the
``maybe_compact`` policy on, showing the physical file count
SAWTOOTHING under the bound while drain equality holds.

r10 made the small-file term per-batch (a partitioned append writes up
to tasks x partition-values files per version) and shipped ``compact()``
to bound it, but nothing decided WHEN — a long-lived deployment
accumulated one delta part per append until someone called it. This
tool measures the policy that now decides:

* ``policy off``  — N appends, file count grows linearly (the baseline
  read-amplification curve).
* ``policy on``   — the same N appends with ``compact_max_parts=K``:
  file count climbs for K batches, one compaction folds the chain back
  to one file set, repeat. Peak and mean file counts stay bounded for
  ANY chain length; the rewrite cost is amortized O(corpus/K) per batch.
* ``drain equality`` — after both chains, the policy-on store reads back
  row-multiset-equal to the policy-off store (compaction is physical
  only), asserted in-tool.

Usage: python tools/stress_compaction_policy.py [sf_dir] [n_batches] [K]
       (defaults sf0.1, 24 appends, max_parts=6)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        _parts_of,
        current_version,
        read_current,
        table_files,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        commit_store_batch,
    )

    spark = get_spark("stress-compaction-policy")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # banded rows, the shape every maintained store appends: partitioned
    # on the probe key so each append pays the multi-file hive commit
    rows = docs.select(
        "doc_id",
        F.pmod(F.xxhash64("text"), F.lit(16)).cast("int").alias("band"),
        F.length("text").alias("n_chars"),
    )
    batch_of = lambda e: rows.where(F.pmod(F.col("doc_id"), F.lit(n_batches)) == e)

    work = tempfile.mkdtemp(prefix="compaction_policy_")
    stores = {"off": os.path.join(work, "off"), "on": os.path.join(work, "on")}
    curves: dict[str, list[int]] = {"off": [], "on": []}
    walls: dict[str, float] = {}
    for mode, store in stores.items():
        t0 = time.time()
        for e in range(n_batches):
            commit_store_batch(
                batch_of(e),
                store,
                e,
                dedupe_epochs=True,
                partition_by=["band"],
                compact_max_parts=(k if mode == "on" else None),
            )
            curves[mode].append(len(table_files(store)))
        walls[mode] = time.time() - t0
        depth = len(_parts_of(store, current_version(store)))
        print(
            f"policy {mode:3s}: {n_batches} appends wall {walls[mode]:.1f}s  "
            f"final files {curves[mode][-1]}  peak {max(curves[mode])}  "
            f"chain depth {depth}"
        )
        print(f"  file-count curve: {curves[mode]}")

    assert max(curves["on"]) < curves["off"][-1], "policy did not bound files"
    # sawtooth: the on-curve must come back down at least twice
    drops = sum(
        1 for a, b in zip(curves["on"], curves["on"][1:]) if b < a
    )
    assert drops >= 2, f"expected a sawtooth, got {curves['on']}"

    a = read_current(spark, stores["off"]).groupBy("band").agg(
        F.count("*").alias("n"), F.sum(F.crc32(F.concat_ws("|", "doc_id", "n_chars"))).alias("h")
    )
    b = read_current(spark, stores["on"]).groupBy("band").agg(
        F.count("*").alias("n"), F.sum(F.crc32(F.concat_ws("|", "doc_id", "n_chars"))).alias("h")
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print(
        f"drain equality: ON == OFF ({read_current(spark, stores['on']).count()} rows); "
        f"peak files {max(curves['on'])} (bounded) vs {max(curves['off'])} (unbounded), "
        f"policy wall overhead {walls['on'] / max(walls['off'], 1e-9):.2f}x"
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
