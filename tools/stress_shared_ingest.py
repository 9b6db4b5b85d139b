"""Composed shared-scan ingest soak (r10 verdict item 4): what q252's
one-tokenize-pass batch update saves over running each maintained
artifact's update independently.

Setup (not part of the comparison): v1 stores for every artifact —
signature (band-partitioned), lexical tf/dl (bucket-partitioned), decon
benchmark table, IVF cell store + stored centroids — built from the
corpus side exactly as the lifecycle heads build them.

Measured phases (same measure/force discipline as stress_maintenance):

* ``independent_updates`` — the per-head status quo: each artifact
  update tokenizes/shingles/hashes the SAME ingest batch from raw text
  independently (signature append, tf/dl appends, decon screen, census
  state, IVF assign+append) — five scans of the batch text + one of the
  batch vectors.
* ``shared_scan``       — q252's shared relation: the batch read +
  tokenized ONCE, localCheckpoint-materialized. Charged to its own row.
* ``composed_update``   — the same five artifact updates, all deriving
  from the shared relation (zero re-tokenization; one embeddings-batch
  scan). The headline: shared_scan + composed_update vs
  independent_updates, wall and shuffle bytes.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_shared_ingest.py \
    [sf_dir] [workdir] [mults_csv]   (defaults sf0.1, /tmp/soak, "1,10")
"""

from __future__ import annotations

import json
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

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        _CKPT_LEVEL,
        banded_signature_table,
        shingle_sets,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.similarity import (
        assign_cells,
        kmeans_fit,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.ann_maintenance import (
        _vec_hash,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.census_maintenance import (
        _census_state,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
        BENCHMARKS,
        bench_shingle_table,
        corpus_shingles,
        probe_matrix,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lexical_maintenance import (
        index_rows,
        index_rows_from_tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.training import (
        _doc_hash,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import (
        versioned as V,
    )

    spark = get_spark(
        "stress-shared-ingest",
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
        raw = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
        emb = spark.read.parquet(
            os.path.join(corpus_dir, "embeddings.parquet")
        ).select("vec_id", "embedding")
        is_new = _doc_hash() >= 800
        vec_new = _vec_hash() >= 800
        n_docs = raw.count()
        ts = int(time.time())
        root = os.path.join(work, f"shared_ingest_{mult}x_{ts}")
        sig_s, tf_s, dl_s = root + "_sig", root + "_tf", root + "_dl"
        dec_s, ivf_s = root + "_decon", root + "_ivf"
        print(f"== shared-scan ingest, organic {mult}x ({n_docs} docs) ==")

        # ---- setup (v1 stores; not part of the comparison) ----
        corpus_docs = raw.where(~is_new)
        corpus_ts = corpus_docs.select(
            "doc_id", "source", tokens("text").alias("ts")
        )
        V.write_version(
            banded_signature_table(
                shingles=shingle_sets(corpus_ts.select("doc_id", "ts"), 3)
            ),
            sig_s,
            partition_by=["band"],
        )
        tf1, dl1 = index_rows(corpus_docs.select("doc_id", "text"))
        V.write_version(tf1, tf_s, partition_by=["tok_bucket"])
        V.write_version(dl1, dl_s, partition_by=["hb"])
        d_all_ts = raw.select("doc_id", "source", tokens("text").alias("ts"))
        V.write_version(
            bench_shingle_table(d_all_ts, BENCHMARKS), dec_s,
            partition_by=["benchmark"],
        )
        cents = kmeans_fit(emb.where(~vec_new), k=8, max_iter=8)
        V.write_version(
            assign_cells(emb.where(~vec_new), cents), ivf_s, partition_by=["cell"]
        )
        print("  (v1 setup done)")

        def batch_updates(shared):
            """The five artifact updates for ONE ingest batch. ``shared``
            is (pre-tokenized batch, pre-shingled tagged batch) in the
            composed path, or None (independent path — every update
            tokenizes/shingles from raw text itself)."""
            if shared is not None:
                b_ts, tagged_b = shared
            else:
                b_ts = raw.where(is_new).select(
                    "doc_id", "source", "text", "n_chars",
                    tokens("text").alias("ts"),
                )
                tagged_b = None
            # 1) signature append (composed: the n=3 slice of the shared
            #    tagged shingle relation IS shingle_sets' relation)
            sig_sh = (
                tagged_b.where(F.col("n") == 3).select(
                    "doc_id", F.col("sh").alias("shingle")
                )
                if tagged_b is not None
                else shingle_sets(b_ts.select("doc_id", "ts"), 3)
            )
            V.append_version(
                banded_signature_table(shingles=sig_sh),
                sig_s,
                partition_by=["band"],
            )
            # 2+3) lexical tf/dl appends
            tf_b, dl_b = index_rows_from_tokens(b_ts.select("doc_id", "ts"))
            V.append_version(tf_b, tf_s, partition_by=["tok_bucket"])
            V.append_version(dl_b, dl_s, partition_by=["hb"])
            # 4) decon screen against the stored table
            m = probe_matrix(
                spark,
                tagged_b
                if tagged_b is not None
                else corpus_shingles(b_ts.select("doc_id", "source", "ts")),
                V.read_current(spark, dec_s),
                b_ts,
            )
            n_m = force_full(m)["n"]
            # 5) census state of the batch
            st, kv = _census_state(
                b_ts.select("doc_id", "source", "text", "n_chars")
            )
            n_c = force_full(st)["n"] + force_full(kv)["n"]
            # 6) IVF assign + append through the (already-trained) quantizer
            V.append_version(
                assign_cells(emb.where(vec_new), cents), ivf_s,
                partition_by=["cell"],
            )
            return {"n": n_m + n_c}

        def ph_independent():
            return batch_updates(None)

        state: dict = {}

        def ph_shared_scan():
            b_ts = (
                raw.where(is_new)
                .select(
                    "doc_id", "source", "text", "n_chars",
                    tokens("text").alias("ts"),
                )
                .localCheckpoint(storageLevel=_CKPT_LEVEL)
            )
            tagged_b = corpus_shingles(
                b_ts.select("doc_id", "source", "ts")
            ).localCheckpoint(storageLevel=_CKPT_LEVEL)
            state["shared"] = (b_ts, tagged_b)
            return {"n": b_ts.count() + tagged_b.count()}

        def ph_composed():
            return batch_updates(state["shared"])

        rows = {}
        rows["independent_updates"] = measure(
            spark, f"independent_updates {mult}x", ph_independent
        )
        rows["shared_scan"] = measure(spark, f"shared_scan {mult}x", ph_shared_scan)
        rows["composed_update"] = measure(
            spark, f"composed_update {mult}x", ph_composed
        )
        ind = rows["independent_updates"]
        comp_sec = rows["shared_scan"]["sec"] + rows["composed_update"]["sec"]
        comp_wr = (
            rows["shared_scan"]["shuffle_write_mb"]
            + rows["composed_update"]["shuffle_write_mb"]
        )
        print(
            f"  -> composed(shared_scan+update)/independent {mult}x: wall "
            f"{comp_sec / max(ind['sec'], 0.001):.2f} "
            f"({comp_sec:.1f}s vs {ind['sec']}s)  shuffle-write "
            f"{comp_wr / max(ind['shuffle_write_mb'], 0.001):.2f}"
        )
        all_rows[f"{mult}x"] = rows

    print(json.dumps(all_rows))


if __name__ == "__main__":
    main()
