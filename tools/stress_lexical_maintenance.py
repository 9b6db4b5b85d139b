"""Maintained lexical/inverted-index (q248) lifecycle soak: what the
stored tf/doc-length tables save per ingest batch, at two corpus scales.

The dedup (stress_maintenance) and vector (stress_ann_maintenance /
stress_pq_maintenance) lifecycles have measured maintained-vs-rebuild;
this closes the trio for the retrieval side. The claim under test: a
search deployment tokenizes each document exactly once — per-batch
index work is O(batch), and query-time BM25 reads stored aggregates
only.

Phases (same measure/force discipline as stress_maintenance):

* ``build_v1``        — tokenize the CORPUS side (80% doc-hash split)
  once; tf (doc_id, tok, f) and dl (doc_id, len) written to the
  versioned store. Paid once, with the index.
* ``batch_append``    — what a deployment pays PER INGEST BATCH through
  the SHIPPED q248 path: tokenize the NEW docs only and land their tf/dl
  rows via ``append_version``'s manifest commit (O(batch) physical IO —
  the store-append lever, SCALE_NOTES r9 addendum). Term stats are
  additive, so the maintained index equals a from-scratch build by set
  algebra. The maintained-index claim is this row vs rebuild_full.
* ``batch_append_rewrite`` — the pre-lever alternative,
  ``write_version(read_current ∪ batch)``: snapshot-correct but pays an
  O(corpus) physical rewrite per batch. Kept as its own phase so the
  46.4 -> 22.7 s lever measurement stays reproducible from this committed
  tool (r9 advice — the shipped path and the rewrite are now BOTH
  measured, as separate rows).
* ``rebuild_full``    — from-scratch index build over the full corpus
  to a fresh store: the no-index per-batch alternative.
* ``query_stored``    — the warm read path: top-20 batch docs by BM25
  under corpus-wide maintained statistics, every input relation a
  stored-table aggregate (q248's step 3 — zero tokenization).
* ``query_scratch``   — the same ranking computed from raw text end to
  end (tokenize everything at query time) — the no-index query, for
  read-path context.

Corpora: the organic family's documents (org1 = 100k docs, org10 = 1M;
build_stress replicates sf0.1's docs with deterministic perturbations,
so vocabulary and term statistics stay non-degenerate at every scale).

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_lexical_maintenance.py \
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

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lexical_maintenance import (
        batch_bm25_from_tables,
        index_rows,
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
        "stress-lexical-maintenance",
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
            nd, ne = build(sf_dir, corpus_dir, copies=1, shards=20 * mult)
            print(f"built {corpus_dir}: {nd} docs [{time.time()-t0:.0f}s]")
        docs = spark.read.parquet(
            os.path.join(corpus_dir, "documents.parquet")
        ).select("doc_id", "text")
        is_new = _doc_hash() >= 800
        corpus, batch = docs.where(~is_new), docs.where(is_new)
        n_docs, n_batch = docs.count(), batch.count()
        ts = int(time.time())
        tf_store = os.path.join(work, f"lex_tf_{mult}x_{ts}")
        dl_store = os.path.join(work, f"lex_dl_{mult}x_{ts}")
        rb_tf = os.path.join(work, f"lex_rb_tf_{mult}x_{ts}")
        rb_dl = os.path.join(work, f"lex_rb_dl_{mult}x_{ts}")
        print(
            f"== lexical-index maintenance lifecycle, organic {mult}x "
            f"({n_docs} docs, batch {n_batch}) =="
        )

        def ph_build_v1():
            tf, dl = index_rows(corpus)
            write_version(tf, tf_store)
            write_version(dl, dl_store)
            return {"n": read_current(spark, tf_store).count()}

        def ph_batch_append():
            # the SHIPPED q248 append: manifest commit, O(batch) IO
            tf_b, dl_b = index_rows(batch)
            append_version(tf_b, tf_store)
            append_version(dl_b, dl_store)
            return {"n": read_current(spark, tf_store).count()}

        def ph_batch_append_rewrite():
            # the pre-lever rewrite path, measured for the delta; restores
            # the store to the same logical contents (corpus ∪ batch), so
            # later phases read identical data either way
            tf_b, dl_b = index_rows(batch)
            write_version(
                read_version(spark, tf_store, 1).unionByName(tf_b), tf_store
            )
            write_version(
                read_version(spark, dl_store, 1).unionByName(dl_b), dl_store
            )
            return {"n": read_current(spark, tf_store).count()}

        def ph_rebuild_full():
            tf, dl = index_rows(docs)
            write_version(tf, rb_tf)
            write_version(dl, rb_dl)
            return {"n": read_current(spark, rb_tf).count()}

        def ph_query_stored():
            out = batch_bm25_from_tables(
                read_current(spark, tf_store), read_current(spark, dl_store)
            )
            return {"n": force_full(out)["n"]}

        def ph_query_scratch():
            tf, dl = index_rows(docs)
            return {"n": force_full(batch_bm25_from_tables(tf, dl))["n"]}

        rows = {}
        rows["build_v1"] = measure(spark, f"build_v1 {mult}x", ph_build_v1)
        rows["batch_append"] = measure(
            spark, f"batch_append {mult}x", ph_batch_append
        )
        rows["batch_append_rewrite"] = measure(
            spark, f"batch_append_rewrite {mult}x", ph_batch_append_rewrite
        )
        rows["rebuild_full"] = measure(
            spark, f"rebuild_full {mult}x", ph_rebuild_full
        )
        rows["query_stored"] = measure(
            spark, f"query_stored {mult}x", ph_query_stored
        )
        rows["query_scratch"] = measure(
            spark, f"query_scratch {mult}x", ph_query_scratch
        )
        all_rows[f"{mult}x"] = rows

        ba, rf = rows["batch_append"], rows["rebuild_full"]
        qs_, qx = rows["query_stored"], rows["query_scratch"]
        print(
            f"  -> batch_append/rebuild_full {mult}x: wall "
            f"{ba['sec'] / max(rf['sec'], 0.001):.2f}  bytes "
            f"{ba['shuffle_write_mb'] / max(rf['shuffle_write_mb'], 0.001):.2f}"
        )
        print(
            f"  -> query_stored/query_scratch {mult}x: wall "
            f"{qs_['sec'] / max(qx['sec'], 0.001):.2f}  bytes "
            f"{qs_['shuffle_write_mb'] / max(qx['shuffle_write_mb'], 0.001):.2f}"
        )

    if len(mults) >= 2:
        import math

        print("== scaling exponents (first -> last point, wall / write / read) ==")
        a_key, b_key = f"{mults[0]}x", f"{mults[-1]}x"
        span = math.log(mults[-1] / mults[0])
        for ph in (
            "build_v1",
            "batch_append",
            "batch_append_rewrite",
            "rebuild_full",
            "query_stored",
            "query_scratch",
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
