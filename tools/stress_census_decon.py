"""q249/q250 lifecycle soak: the maintained decontamination index and
the maintained corpus census, each measured maintained-vs-rebuild at
two corpus scales.

q249 phases:

* ``decon_build_v1``    — the first two benchmarks' shingle sets
  derived from their eval sources → versioned store. Paid at suite
  registration.
* ``decon_bench_append``— registering ONE new benchmark through the
  SHIPPED q249 path: its own shingle derivation only, landed via
  ``append_version``'s manifest commit (O(benchmark) physical IO). The
  claim is this row vs decon_rebuild (re-deriving the whole suite).
* ``decon_bench_append_rewrite`` — the pre-lever alternative,
  ``write_version(read_current ∪ new benchmark)``: pays a full-store
  rewrite per registration. Separate phase so the shipped path and the
  rewrite delta are both reproducible from this committed tool (r9
  advice).
* ``decon_rebuild``     — all benchmarks from scratch (no-index
  registration alternative).
* ``decon_screen_batch``— the per-batch cost a deployment pays: the
  NEW batch (20% doc-hash split) shingled once and probed against the
  STORED table (broadcast). vs —
* ``decon_screen_rescan``— the no-index per-batch alternative: the
  FULL corpus shingled and probed (q244's whole-release sweep run per
  batch).

q250 phases:

* ``census_v1``        — census state (stats + KMV retained rows) of
  the corpus side → store. One pass, paid once.
* ``census_batch_merge``— per-batch: batch-only state + algebraic
  merge (sums add, min/max combine, bottom-k re-rank) → v2.
* ``census_rebuild``   — from-scratch census state over the full
  corpus (the no-index alternative).
* ``census_finalize``  — the read path: finalize the census from
  stored state (two tiny stored tables; zero corpus work).

Corpora: the organic documents family (org1 = 100k docs, org10 = 1M).

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_census_decon.py \
    [sf_dir] [workdir] [mults_csv]   (defaults sf0.1, /tmp/soak, "1,10")
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_stress import build  # noqa: E402
from stress_soak import force_full, measure  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak"
    mults = (
        tuple(int(m) for m in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else (1, 10)
    )

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import tokens
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.census_maintenance import (
        _census_state,
        _merge_kmv,
        _merge_stats,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
        BENCHMARKS,
        bench_shingle_table,
        corpus_shingles,
        probe_matrix,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.training import (
        _doc_hash,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        append_version,
        read_current,
        read_version,
        write_version,
    )

    spark = get_spark(
        "stress-census-decon",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "20000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    all_rows: dict[str, dict] = {}
    for mult in mults:
        corpus_dir = os.path.join(work, f"org{mult}")
        if not os.path.exists(os.path.join(corpus_dir, "documents.parquet")):
            t0 = time.time()
            nd, _ = build(sf_dir, corpus_dir, copies=1, shards=20 * mult)
            print(f"built {corpus_dir}: {nd} docs [{time.time()-t0:.0f}s]")
        raw = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
        d = raw.select("doc_id", "source", tokens("text").alias("ts"))
        docs = raw.select("doc_id", "source", "text", "n_chars")
        is_new = _doc_hash() >= 800
        n_docs = raw.count()
        ts = int(time.time())
        dstore = os.path.join(work, f"decon_store_{mult}x_{ts}")
        cstore = os.path.join(work, f"census_store_{mult}x_{ts}")
        print(f"== decon-index + census lifecycles, organic {mult}x ({n_docs} docs) ==")

        rows = {}

        # ---- q249: maintained decontamination index ----
        def ph_decon_build_v1():
            write_version(bench_shingle_table(d, BENCHMARKS[:2]), dstore)
            return {"n": read_current(spark, dstore).count()}

        def ph_decon_bench_append():
            # the SHIPPED q249 append: manifest commit, O(benchmark) IO
            append_version(bench_shingle_table(d, BENCHMARKS[2:]), dstore)
            return {"n": read_current(spark, dstore).count()}

        def ph_decon_bench_append_rewrite():
            # the pre-lever rewrite path, measured for the delta; restores
            # the same logical contents (v1 benchmarks ∪ the new one)
            write_version(
                read_version(spark, dstore, 1).unionByName(
                    bench_shingle_table(d, BENCHMARKS[2:])
                ),
                dstore,
            )
            return {"n": read_current(spark, dstore).count()}

        def ph_decon_rebuild():
            return {"n": force_full(bench_shingle_table(d, BENCHMARKS))["n"]}

        def ph_decon_screen_batch():
            batch = d.where(_doc_hash() >= 800)
            out = probe_matrix(
                spark, corpus_shingles(batch), read_current(spark, dstore), batch
            )
            return {"n": force_full(out)["n"]}

        def ph_decon_screen_rescan():
            out = probe_matrix(
                spark, corpus_shingles(d), read_current(spark, dstore), d
            )
            return {"n": force_full(out)["n"]}

        rows["decon_build_v1"] = measure(
            spark, f"decon_build_v1 {mult}x", ph_decon_build_v1
        )
        rows["decon_bench_append"] = measure(
            spark, f"decon_bench_append {mult}x", ph_decon_bench_append
        )
        rows["decon_bench_append_rewrite"] = measure(
            spark,
            f"decon_bench_append_rewrite {mult}x",
            ph_decon_bench_append_rewrite,
        )
        rows["decon_rebuild"] = measure(
            spark, f"decon_rebuild {mult}x", ph_decon_rebuild
        )
        rows["decon_screen_batch"] = measure(
            spark, f"decon_screen_batch {mult}x", ph_decon_screen_batch
        )
        rows["decon_screen_rescan"] = measure(
            spark, f"decon_screen_rescan {mult}x", ph_decon_screen_rescan
        )

        # ---- q250: maintained corpus census ----
        def ph_census_v1():
            stats, kmv = _census_state(docs.where(~is_new))
            write_version(stats, cstore + "_stats")
            write_version(kmv, cstore + "_kmv")
            return {"n": read_current(spark, cstore + "_stats").count()}

        def ph_census_batch_merge():
            stats_b, kmv_b = _census_state(docs.where(is_new))
            write_version(
                _merge_stats(read_current(spark, cstore + "_stats"), stats_b),
                cstore + "_stats",
            )
            write_version(
                _merge_kmv(read_current(spark, cstore + "_kmv"), kmv_b),
                cstore + "_kmv",
            )
            return {"n": read_current(spark, cstore + "_stats").count()}

        def ph_census_rebuild():
            stats, kmv = _census_state(docs)
            return {"n": force_full(stats)["n"] + force_full(kmv)["n"]}

        def ph_census_finalize():
            stats = read_current(spark, cstore + "_stats")
            sk = (
                read_current(spark, cstore + "_kmv")
                .groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_retained"), F.max("h").alias("kth"))
            )
            return {"n": force_full(stats.join(sk, "source"))["n"]}

        rows["census_v1"] = measure(spark, f"census_v1 {mult}x", ph_census_v1)
        rows["census_batch_merge"] = measure(
            spark, f"census_batch_merge {mult}x", ph_census_batch_merge
        )
        rows["census_rebuild"] = measure(
            spark, f"census_rebuild {mult}x", ph_census_rebuild
        )
        rows["census_finalize"] = measure(
            spark, f"census_finalize {mult}x", ph_census_finalize
        )
        all_rows[f"{mult}x"] = rows

        for a, b, tag in (
            ("decon_bench_append",
            "decon_bench_append_rewrite", "decon_rebuild", "register-one-benchmark"),
            ("decon_screen_batch", "decon_screen_rescan", "screen-per-batch"),
            ("census_batch_merge", "census_rebuild", "census-per-batch"),
        ):
            ra, rb = rows[a], rows[b]
            print(
                f"  -> {a}/{b} ({tag}) {mult}x: wall "
                f"{ra['sec'] / max(rb['sec'], 0.001):.2f}  bytes "
                f"{ra['shuffle_write_mb'] / max(rb['shuffle_write_mb'], 0.001):.2f}"
            )

    if len(mults) >= 2:
        import math

        print("== scaling exponents (first -> last point, wall / write / read) ==")
        a_key, b_key = f"{mults[0]}x", f"{mults[-1]}x"
        span = math.log(mults[-1] / mults[0])
        for ph in (
            "decon_build_v1",
            "decon_bench_append",
            "decon_bench_append_rewrite",
            "decon_rebuild",
            "decon_screen_batch",
            "decon_screen_rescan",
            "census_v1",
            "census_batch_merge",
            "census_rebuild",
            "census_finalize",
        ):
            a, b = all_rows[a_key][ph], all_rows[b_key][ph]

            def ex(k):
                return round(
                    math.log(max(b[k], 0.001) / max(a[k], 0.001)) / span, 2
                )

            print(
                f"  {ph}: wall {ex('sec')}  write {ex('shuffle_write_mb')}  "
                f"read {ex('shuffle_read_mb')}"
            )


if __name__ == "__main__":
    main()
