"""Maintained IVF-PQ (q247) lifecycle soak: what the stored CODE table
saves per ingest batch, at two corpus scales.

q246's soak (stress_ann_maintenance) measured the cell-assignment
store; this one measures the COMPRESSED variant — the (vec_id, cell,
code) table — where the per-batch work is assign + PQ-encode through
stored quantizers and the query path prunes with integer ADC before
touching any raw floats.

Phases (same measure/force discipline as stress_maintenance):

* ``fits_v1``       — kmeans_fit + pq_fit on the CORPUS side (80%
  vec-hash split), both driver-sample bounded. Paid once.
* ``encode_v1``     — corpus codes written to the versioned store
  (+ centroid/codebook sibling tables). Paid once, with the index.
* ``batch_append``  — what a deployment pays PER INGEST BATCH through
  the SHIPPED q247 path: assign + encode the NEW vectors only through
  the STORED quantizer tables, landed via ``append_version``'s manifest
  commit (O(batch) physical IO). The maintained-index claim is this row
  vs reencode_full.
* ``batch_append_rewrite`` — the pre-lever alternative,
  ``write_version(v1 ∪ batch)``: pays an O(corpus) code-table rewrite
  per batch. Separate phase so both paths stay reproducible from this
  committed tool (r9 advice).
* ``reencode_full`` — full-corpus re-encode: the no-index per-batch
  alternative.
* ``query_probe``   — the warm read path: batch-sampled queries probe
  the stored v2 code table (``ivf_pq_rerank_from_index_vectorized``:
  per-Arrow-batch integer ADC LUT gathers over probed-cell rows → exact
  cosine re-rank; raw floats read for survivors only). The fold twin was
  measured first and ran corpus-proportional at 3.9x brute force at 400k
  vectors — the LUT kernel replaced it in q247 (twin row-equality pinned
  in tests/test_ann_maintenance.py).
* ``brute_force``   — the same queries answered exactly with the BLAS
  kernel — the no-index query, for probe-cost context.

Corpora: the organic family's embeddings (org1 = 40k vectors, org10 =
400k — build_stress replicates sf0.1's vectors with deterministic
perturbations).

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_pq_maintenance.py \
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

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.similarity import (
        brute_force_topk_vectorized,
        ivf_pq_index,
        ivf_pq_rerank_from_index_vectorized,
        kmeans_fit,
        pq_fit,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.ann_maintenance import (
        _vec_hash,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        append_version,
        read_current,
        read_version,
        write_version,
    )

    spark = get_spark(
        "stress-pq-maintenance",
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
        if not os.path.exists(os.path.join(corpus_dir, "embeddings.parquet")):
            t0 = time.time()
            nd, ne = build(sf_dir, corpus_dir, copies=1, shards=20 * mult)
            print(f"built {corpus_dir}: {ne} vectors [{time.time()-t0:.0f}s]")
        emb = spark.read.parquet(
            os.path.join(corpus_dir, "embeddings.parquet")
        ).select("vec_id", "embedding")
        is_new = _vec_hash() >= 800
        corpus, batch = emb.where(~is_new), emb.where(is_new)
        qs = batch.where(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
        n_q = qs.count()
        store = os.path.join(work, f"pq_store_{mult}x_{int(time.time())}")
        print(f"== IVF-PQ maintenance lifecycle, organic {mult}x ({n_q} queries) ==")

        state: dict = {}

        def ph_fits():
            state["cents"] = kmeans_fit(corpus, k=8, max_iter=8)
            state["books"] = pq_fit(corpus, m=4, ksub=8, max_iter=4)
            return {"n": len(state["cents"]) + sum(len(b) for b in state["books"])}

        def ph_encode_v1():
            write_version(ivf_pq_index(corpus, state["cents"], state["books"]), store)
            return {"n": read_current(spark, store).count()}

        def ph_batch_append():
            # the SHIPPED q247 append: manifest commit, O(batch) IO
            append_version(
                ivf_pq_index(batch, state["cents"], state["books"]), store
            )
            return {"n": read_current(spark, store).count()}

        def ph_batch_append_rewrite():
            # the pre-lever rewrite path (write_version(v1 ∪ batch)),
            # measured for the delta; restores the same logical contents
            write_version(
                read_version(spark, store, 1).unionByName(
                    ivf_pq_index(batch, state["cents"], state["books"])
                ),
                store,
            )
            return {"n": read_current(spark, store).count()}

        def ph_reencode_full():
            return {
                "n": force_full(
                    ivf_pq_index(emb, state["cents"], state["books"])
                )["n"]
            }

        def ph_query_probe():
            out = ivf_pq_rerank_from_index_vectorized(
                read_current(spark, store), emb, qs,
                state["cents"], state["books"],
                k=5, nprobe=3, rerank_from=20,
            )
            return {"n": force_full(out)["n"]}

        def ph_brute_force():
            out = brute_force_topk_vectorized(emb, qs, k=5)
            return {"n": force_full(out)["n"]}

        rows = {}
        rows["fits_v1"] = measure(spark, f"fits_v1 {mult}x", ph_fits)
        rows["encode_v1"] = measure(spark, f"encode_v1 {mult}x", ph_encode_v1)
        rows["batch_append"] = measure(spark, f"batch_append {mult}x", ph_batch_append)
        rows["batch_append_rewrite"] = measure(
            spark, f"batch_append_rewrite {mult}x", ph_batch_append_rewrite
        )
        rows["reencode_full"] = measure(
            spark, f"reencode_full {mult}x", ph_reencode_full
        )
        rows["query_probe"] = measure(spark, f"query_probe {mult}x", ph_query_probe)
        rows["brute_force"] = measure(spark, f"brute_force {mult}x", ph_brute_force)
        all_rows[f"{mult}x"] = rows

        ba, rf = rows["batch_append"], rows["reencode_full"]
        qp, bf = rows["query_probe"], rows["brute_force"]
        print(
            f"  -> batch_append/reencode_full {mult}x: wall "
            f"{ba['sec'] / max(rf['sec'], 0.001):.2f}"
        )
        print(
            f"  -> query_probe/brute_force {mult}x: wall "
            f"{qp['sec'] / max(bf['sec'], 0.001):.2f}"
        )

    if len(mults) >= 2:
        import math

        print("== scaling exponents (first -> last point, wall / write / read) ==")
        a_key, b_key = f"{mults[0]}x", f"{mults[-1]}x"
        span = math.log(mults[-1] / mults[0])
        for ph in (
            "fits_v1",
            "encode_v1",
            "batch_append",
            "batch_append_rewrite",
            "reencode_full",
            "query_probe",
            "brute_force",
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
