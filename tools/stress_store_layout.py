"""Store physical-layout soak (r10 verdict items 2+3): partition pruning
on the maintained stores' probe paths, and compaction's bound on a long
append chain's read amplification.

The r9 verdict's one remaining corpus-proportional READ term: every
maintained store was written unpartitioned, so each per-batch probe
SCANNED the whole stored table and relied on shuffle/broadcast to
narrow. r10 partitions each store on its probe key (IVF/PQ by ``cell``,
lexical tf by ``tok_bucket`` + dl by ``hb``, decon by ``benchmark``,
signatures by ``band``) and pushes LITERAL filters on those keys through
the probe paths. This tool measures what that buys with the scan's own
post-pruning metrics (``numFiles``/``filesSize`` on the executed plan's
FileSourceScan nodes — the exact files/bytes the scan selected), plus
wall and shuffle deltas:

* ``ivf_probe_part`` vs ``ivf_probe_flat`` — the SAME stored
  cell-assignment table (k=32 cells), partitioned by cell vs
  unpartitioned, probed by a small query sample (nprobe=3). The kernel's
  probed-union literal filter is identical in both plans; only the
  partitioned store can turn it into directory pruning, so
  scan_mb(part)/scan_mb(flat) should track probed_cells/ncells.
* ``lex_query_part`` vs ``lex_query_flat`` — q248's stored BM25 probe
  against partitioned (tok_bucket/hb) vs unpartitioned tf/dl stores
  (probed buckets: 3/16 token prefixes + 2/10 centuries; the corpus-wide
  N/avgdl stats aggregate reads all centuries by definition and is
  included — reported as-is, not hidden).
* ``decon_read_one`` vs ``decon_read_all`` — the benchmark-partitioned
  store read for a single-benchmark screen vs the full suite: one
  partition directory vs all.
* ``chain_read`` / ``compacted_read`` — a 15-append lexical tf chain:
  files selected + wall of a full read before vs after ``compact()``
  (+ vacuum). Row multiset unchanged (pinned in tests/test_versioned.py);
  this isolates the read-amplification delta.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_store_layout.py \
    [sf_dir] [workdir] [mult]    (defaults sf0.1, /tmp/soak, 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_stress import build  # noqa: E402
from stress_soak import shuffle_totals  # noqa: E402


def scan_totals(df) -> tuple[int, int]:
    """(files, bytes) summed over the executed plan's FileSourceScan
    nodes — static post-partition-pruning selection metrics. The df must
    have been executed through ITS OWN QueryExecution (see execute())."""
    files = size = 0

    def walk(node):
        nonlocal files, size
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            k = kv._1()
            if k == "numFiles":
                files += kv._2().value()
            elif k == "filesSize":
                size += kv._2().value()
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next())
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif cls.endswith("QueryStageExec"):
            # AQE stage nodes are leaves whose materialized plan hangs off
            # .plan(), not .children()
            walk(node.plan())
        elif cls == "ReusedExchangeExec":
            pass  # its child was already counted at the original exchange

    walk(df._jdf.queryExecution().executedPlan())
    return files, size


def execute(df) -> int:
    """Run the DataFrame's FULL plan through its own QueryExecution (so
    scan_totals reads the right metrics) without moving rows to Python:
    JVM-side count of the QE's RDD."""
    return df._jdf.queryExecution().toRdd().count()


def measure_scan(spark, label: str, df) -> dict:
    rd0, wr0 = shuffle_totals(spark)
    t0 = time.time()
    n = execute(df)
    dt = time.time() - t0
    time.sleep(3)  # async status-store bus
    rd1, wr1 = shuffle_totals(spark)
    files, size = scan_totals(df)
    row = {
        "label": label,
        "sec": round(dt, 1),
        "scan_files": int(files),
        "scan_mb": round(size / 1e6, 2),
        "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
        "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
        "n": int(n),
    }
    print(
        f"  {label}: {row['sec']}s  scanned {row['scan_files']} files / "
        f"{row['scan_mb']} MB  shuffle r/w {row['shuffle_read_mb']}/"
        f"{row['shuffle_write_mb']} MB  n={row['n']}"
    )
    return row


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import numpy as np
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.similarity import (
        QUANT_SCALE,
        assign_cells,
        ivf_topk_from_index_vectorized,
        kmeans_fit,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
        BENCHMARKS,
        bench_shingle_table,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lexical_maintenance import (
        batch_bm25_from_tables,
        index_rows,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import (
        versioned as V,
    )

    spark = get_spark(
        "stress-store-layout",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "20000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = os.path.join(work, f"org{mult}")
    if not os.path.exists(os.path.join(corpus_dir, "documents.parquet")):
        t0 = time.time()
        nd, ne = build(sf_dir, corpus_dir, copies=1, shards=20 * mult)
        print(f"built {corpus_dir}: {nd} docs / {ne} vectors [{time.time()-t0:.0f}s]")
    ts = int(time.time())
    rows: dict[str, dict] = {}

    # ---- 1) IVF cell store: partitioned vs flat, same probe ----
    emb = spark.read.parquet(os.path.join(corpus_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n_vec = emb.count()
    cents = kmeans_fit(emb, k=32, max_iter=8)
    asn = assign_cells(emb, cents)
    st_part = os.path.join(work, f"layout_ivf_part_{ts}")
    st_flat = os.path.join(work, f"layout_ivf_flat_{ts}")
    V.write_version(asn, st_part, partition_by=["cell"])
    V.write_version(asn, st_flat)
    qs = emb.where(F.col("vec_id") % 9973 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    n_q = qs.count()
    # the probed-cell union, replayed with the kernel's own argmax math
    C = np.array(cents, dtype=np.int64)
    Q = np.array([list(r["qe"]) for r in qs.collect()], dtype=np.float64)
    QQ = np.floor(Q * float(QUANT_SCALE)).astype(np.int64)
    sc_ = (QQ @ C.T).astype(np.float64) / np.sqrt((C * C).sum(axis=1))[None, :]
    probed = sorted(
        {int(c) for i in range(len(Q)) for c in np.argsort(-sc_[i])[:3]}
    )
    print(
        f"== IVF store probe, {n_vec} vectors, k=32 cells, {n_q} queries, "
        f"probed union {len(probed)}/32 cells =="
    )
    rows["ivf_probe_part"] = measure_scan(
        spark,
        "ivf_probe_part",
        ivf_topk_from_index_vectorized(
            V.read_current(spark, st_part), qs, cents, k=5, nprobe=3
        ),
    )
    rows["ivf_probe_flat"] = measure_scan(
        spark,
        "ivf_probe_flat",
        ivf_topk_from_index_vectorized(
            V.read_current(spark, st_flat), qs, cents, k=5, nprobe=3
        ),
    )
    ratio = rows["ivf_probe_part"]["scan_mb"] / max(
        rows["ivf_probe_flat"]["scan_mb"], 0.001
    )
    print(
        f"  -> scan bytes part/flat = {ratio:.2f} "
        f"(probed {len(probed)}/32 = {len(probed)/32:.2f} is the expected floor)"
    )
    rows["ivf_meta"] = {"probed_cells": len(probed), "ncells": 32, "n_q": n_q}

    # ---- 2) lexical stores: partitioned vs flat, q248's stored probe ----
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    tf, dl = index_rows(docs)
    lx = {
        "part_tf": os.path.join(work, f"layout_lex_part_tf_{ts}"),
        "part_dl": os.path.join(work, f"layout_lex_part_dl_{ts}"),
        "flat_tf": os.path.join(work, f"layout_lex_flat_tf_{ts}"),
        "flat_dl": os.path.join(work, f"layout_lex_flat_dl_{ts}"),
    }
    V.write_version(tf, lx["part_tf"], partition_by=["tok_bucket"])
    V.write_version(dl, lx["part_dl"], partition_by=["hb"])
    V.write_version(tf, lx["flat_tf"])
    V.write_version(dl, lx["flat_dl"])
    print("== lexical stored-BM25 probe, partitioned vs flat ==")
    rows["lex_query_part"] = measure_scan(
        spark,
        "lex_query_part",
        batch_bm25_from_tables(
            V.read_current(spark, lx["part_tf"]), V.read_current(spark, lx["part_dl"])
        ),
    )
    rows["lex_query_flat"] = measure_scan(
        spark,
        "lex_query_flat",
        batch_bm25_from_tables(
            V.read_current(spark, lx["flat_tf"]), V.read_current(spark, lx["flat_dl"])
        ),
    )

    # ---- 3) decon store: one-benchmark read vs full-suite read ----
    d = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet")).select(
        "doc_id", "source", tokens("text").alias("ts")
    )
    dstore = os.path.join(work, f"layout_decon_{ts}")
    V.write_version(
        bench_shingle_table(d, BENCHMARKS), dstore, partition_by=["benchmark"]
    )
    print("== decon store read, one benchmark vs full suite (partitioned) ==")
    rows["decon_read_one"] = measure_scan(
        spark,
        "decon_read_one",
        V.read_current(spark, dstore).where(F.col("benchmark") == BENCHMARKS[0][0]),
    )
    rows["decon_read_all"] = measure_scan(
        spark, "decon_read_all", V.read_current(spark, dstore)
    )

    # ---- 4) compaction: 15-append chain read amplification ----
    print("== compaction: 15-append lexical tf chain ==")
    ch = os.path.join(work, f"layout_chain_{ts}")
    tf0, _ = index_rows(docs.where(F.col("doc_id") % 16 == 0))
    V.write_version(tf0, ch, partition_by=["tok_bucket"])
    for k in range(1, 16):
        tfk, _ = index_rows(docs.where(F.col("doc_id") % 16 == k))
        V.append_version(tfk, ch, partition_by=["tok_bucket"])
    files_chain = len(V.table_files(ch))
    rows["chain_read"] = measure_scan(spark, "chain_read", V.read_current(spark, ch))
    t0 = time.time()
    V.compact(spark, ch, partition_by=["tok_bucket"])
    compact_sec = round(time.time() - t0, 1)
    V.vacuum(ch, keep=1)
    files_compact = len(V.table_files(ch))
    rows["compacted_read"] = measure_scan(
        spark, "compacted_read", V.read_current(spark, ch)
    )
    print(
        f"  -> files {files_chain} -> {files_compact} (compact {compact_sec}s); "
        f"full-read wall {rows['chain_read']['sec']} -> "
        f"{rows['compacted_read']['sec']}s"
    )
    rows["compact_meta"] = {
        "files_chain": files_chain,
        "files_compact": files_compact,
        "compact_sec": compact_sec,
    }

    print(json.dumps({"mult": mult, "n_vec": n_vec, "rows": rows}))


if __name__ == "__main__":
    main()
