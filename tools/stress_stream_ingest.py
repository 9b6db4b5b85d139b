"""Composed-ingest STREAMING soak: what chunking the same ingest batch
into micro-batches costs over the single-batch composed update.

The batch side (20% doc-hash split) of the stress corpus is staged as N
parquet chunk files and drained through ``composed_ingest_stream``
(maxFilesPerTrigger=1 → N micro-batches, each tokenizing/shingling its
chunk once and committing to all six text-side stores). Fixed per-epoch
cost = 6 store commits + 2 localCheckpoint materializations, so wall
should rise roughly linearly in N at constant total rows — the number a
deployment uses to size its trigger interval.

Usage: python tools/stress_stream_ingest.py [sf_dir] [workdir] [mult] [chunks_csv]
       (defaults sf0.1, /tmp/soak, 1, "1,4,16")
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_stress import build  # noqa: E402
from stress_soak import measure  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    chunk_counts = (
        tuple(int(c) for c in sys.argv[4].split(","))
        if len(sys.argv) > 4
        else (1, 4, 16)
    )

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
        BENCHMARKS,
        bench_shingle_table,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.training import (
        _doc_hash,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import (
        get_spark,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
        write_version,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        composed_ingest_stream,
    )

    spark = get_spark(
        "stress-stream-ingest", extra_conf={"spark.ui.enabled": "true"}
    )
    tag = f"org{mult}"
    corpus_dir = os.path.join(work, f"stress_{tag}")
    if not os.path.exists(os.path.join(corpus_dir, "documents.parquet")):
        build(sf_dir, corpus_dir, copies=20, shards=mult)
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet")).select(
        "doc_id", "source", "text", "n_chars"
    )
    batch = docs.where(_doc_hash() >= 800)
    n_batch = batch.count()
    print(f"{tag}: ingest batch {n_batch} docs")

    # the stored benchmark table the screen reads (registered once,
    # corpus-side — setup, not part of the comparison)
    bench_p = os.path.join(work, f"stream_ingest_{tag}_bench")
    shutil.rmtree(bench_p, ignore_errors=True)
    write_version(
        bench_shingle_table(
            docs.where(_doc_hash() < 800).select(
                "doc_id", "source", tokens("text").alias("ts")
            ),
            BENCHMARKS,
        ),
        bench_p,
        partition_by=["benchmark"],
    )

    rows = []
    for n_chunks in chunk_counts:
        staged = os.path.join(work, f"stream_ingest_{tag}_in{n_chunks}")
        shutil.rmtree(staged, ignore_errors=True)
        batch.repartition(n_chunks).write.parquet(staged)
        root = os.path.join(work, f"stream_ingest_{tag}_stores{n_chunks}")
        # "_packed"/"_spans" too: a leftover offset-continuing store would
        # make the re-run continue each shard's cumsum from the previous
        # run's offsets (doubled/garbage manifests in the measured drain —
        # r11 advice; since r12 the monotone guard would raise instead)
        for suff in ("_sig", "_tf", "_dl", "_stats", "_kmv", "_ledger",
                     "_packed", "_spans"):
            shutil.rmtree(root + suff, ignore_errors=True)
        stream = (
            spark.readStream.schema(
                "doc_id bigint, source string, text string, n_chars bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )

        def drain():
            out = composed_ingest_stream(stream, root, bench_p)
            return {
                "epochs": len(out),
                "sig_rows": read_current(spark, root + "_sig").count(),
                "ledger_rows": read_current(spark, root + "_ledger").count(),
            }

        r = measure(spark, f"{tag}_drain_{n_chunks}chunks", drain)
        rows.append({**r, "n_chunks": n_chunks, "n_batch_docs": n_batch})

    # invariant: the drained stores are chunking-independent
    sig_rows = {r["sig_rows"] for r in rows}
    led_rows = {r["ledger_rows"] for r in rows}
    print(f"chunking-invariant: sig_rows={sig_rows} ledger_rows={led_rows}")
    assert len(sig_rows) == 1 and len(led_rows) == 1, "drain equality violated"
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
