"""Packed-sequence store (q258) lifecycle soak: what the maintained
manifest saves per ingest batch vs repacking, at corpus-growth scale.

Phases (measure/force discipline from stress_soak):

* ``build_v1``   — pack the corpus side (80% by doc_id) into the
  shard-partitioned versioned store. Paid once, with the store.
* ``append``     — the shipped q258 path per ingest batch: |shards|
  stored rows for the offsets, pack the batch ALONE (continued cumsum),
  land contribution rows via ``append_version``. O(batch) everything.
* ``repack``     — the no-store alternative: from-scratch pack of the
  union written as a full snapshot. O(corpus) tokenize + write.

The append-vs-repack claim is the bytes written to the store per batch
(parquet bytes of the delta part vs the full snapshot) plus wall; drain
equality (finalized store == scratch pack) is asserted in-tool.

Usage: python tools/stress_packed_store.py [sf_dir] [workdir] [mults_csv]
       (defaults sf0.1, /tmp/soak, "1,10")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_stress import build  # noqa: E402
from stress_soak import force_full, measure  # noqa: E402


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(root, n))
            except OSError:
                pass
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak"
    mults = (
        tuple(int(m) for m in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else (1, 10)
    )

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        _finalize,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packing_manifest,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        append_version,
        read_current,
        write_version,
    )

    spark = get_spark("stress-packed-store", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for mult in mults:
        tag = f"org{mult}"
        out = os.path.join(work, f"stress_{tag}")
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            build(sf_dir, out, copies=20, shards=mult)
        docs = spark.read.parquet(os.path.join(out, "documents.parquet")).select(
            "doc_id", "text"
        )
        thr = docs.agg((F.max("doc_id") * 4).cast("bigint")).first()[0] // 5
        corpus = docs.where(F.col("doc_id") < thr)
        batch = docs.where(F.col("doc_id") >= thr)
        n_docs, n_batch = docs.count(), batch.count()
        ts = int(time.time())
        store = os.path.join(work, f"packed_{mult}x_{ts}")
        rb = os.path.join(work, f"packed_rb_{mult}x_{ts}")
        print(f"== packed-store lifecycle, {tag} ({n_docs} docs, batch {n_batch}) ==")

        def ph_build_v1():
            write_version(packing_manifest(corpus), store, partition_by=["shard"])
            return {"store_mb": round(_dir_bytes(store) / 1e6, 2)}

        def ph_append():
            b0 = _dir_bytes(store)
            base = (
                read_current(spark, store)
                .groupBy("shard")
                .agg(F.sum("fill").alias("base_toks"))
            )
            append_version(
                packing_manifest(batch, base=base), store, partition_by=["shard"]
            )
            return {"delta_mb": round((_dir_bytes(store) - b0) / 1e6, 2)}

        def ph_repack():
            write_version(packing_manifest(docs), rb, partition_by=["shard"])
            return {"store_mb": round(_dir_bytes(rb) / 1e6, 2)}

        for name, ph in (
            ("build_v1", ph_build_v1),
            ("append", ph_append),
            ("repack", ph_repack),
        ):
            r = measure(spark, f"{tag}_{name}", ph)
            rows.append({**r, "mult": mult, "n_docs": n_docs, "n_batch": n_batch})

        maintained = _finalize(read_current(spark, store))
        scratch = _finalize(read_current(spark, rb))
        assert maintained.exceptAll(scratch).count() == 0
        assert scratch.exceptAll(maintained).count() == 0
        print(f"  drain equality: maintained == repack ({scratch.count()} rows)")

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
