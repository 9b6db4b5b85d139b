"""Maintained-ANN (q246) lifecycle soak: measure what the stored IVF
index SAVES per ingest batch, at two corpus scales.

Phases (same measure/force discipline as stress_maintenance):

* ``ivf_fit_v1``     — kmeans_fit on the CORPUS side (80% vec-hash
  split). Driver-sample bounded (lowest-id 100k rows) — at 400k vectors
  the sample caps, demonstrating the bounded-fit posture.
* ``assign_v1``      — corpus cell assignment written to the versioned
  store (+ centroid table). The cost paid ONCE, with the index.
* ``batch_append``   — what a deployment pays PER INGEST BATCH through
  the SHIPPED q246 path (``append_version`` manifest commit): assign
  the NEW vectors only (through the stored centroids) and append. The
  maintained-index claim is this row vs reassign_full.
* ``reassign_full``  — full-corpus re-assignment: what a deployment
  WITHOUT the maintained table pays per batch before it can probe.
* ``query_probe``    — the warm read path: the batch's sampled queries
  probe the stored v2 table through the BLAS deployment kernel
  (``ivf_topk_from_index_vectorized`` — the stored ``cell`` column
  skips the per-batch assignment argmax entirely; the fold twin carries
  the oracle and is row-equal, pinned in tests).
* ``brute_force``    — the same queries answered exactly with the BLAS
  kernel — the no-index alternative, for probe-cost context.

Corpora: the organic family's embeddings (org1 = 40k vectors, org10 =
400k; build_stress replicates sf0.1's 4k vectors with deterministic
perturbations, so cell structure is non-degenerate at every scale).

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_ann_maintenance.py \
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
        assign_cells,
        brute_force_topk_vectorized,
        ivf_topk_from_index_vectorized,
        kmeans_fit,
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
        "stress-ann-maintenance",
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
        store = os.path.join(work, f"ann_store_{mult}x_{int(time.time())}")
        print(f"== ANN maintenance lifecycle, organic {mult}x ({n_q} queries) ==")

        state: dict = {}

        def ph_fit():
            state["cents"] = kmeans_fit(corpus, k=8, max_iter=8)
            return {"n": len(state["cents"])}

        def ph_assign_v1():
            write_version(assign_cells(corpus, state["cents"]), store)
            return {"n": read_current(spark, store).count()}

        def ph_batch_append():
            # the SHIPPED q246 append: manifest commit, O(batch) IO
            append_version(assign_cells(batch, state["cents"]), store)
            return {"n": read_current(spark, store).count()}

        def ph_batch_append_rewrite():
            # the pre-lever rewrite path (write_version(v1 ∪ batch)),
            # measured for the delta; restores the same logical contents
            write_version(
                read_version(spark, store, 1).unionByName(
                    assign_cells(batch, state["cents"])
                ),
                store,
            )
            return {"n": read_current(spark, store).count()}

        def ph_reassign_full():
            return {"n": force_full(assign_cells(emb, state["cents"]))["n"]}

        def ph_query_probe():
            out = ivf_topk_from_index_vectorized(
                read_current(spark, store), qs, state["cents"], k=5, nprobe=3
            )
            return {"n": force_full(out)["n"]}

        def ph_brute_force():
            out = brute_force_topk_vectorized(emb, qs, k=5)
            return {"n": force_full(out)["n"]}

        rows = {}
        rows["ivf_fit_v1"] = measure(spark, f"ivf_fit_v1 {mult}x", ph_fit)
        rows["assign_v1"] = measure(spark, f"assign_v1 {mult}x", ph_assign_v1)
        rows["batch_append"] = measure(spark, f"batch_append {mult}x", ph_batch_append)
        rows["batch_append_rewrite"] = measure(
            spark, f"batch_append_rewrite {mult}x", ph_batch_append_rewrite
        )
        rows["reassign_full"] = measure(
            spark, f"reassign_full {mult}x", ph_reassign_full
        )
        rows["query_probe"] = measure(spark, f"query_probe {mult}x", ph_query_probe)
        rows["brute_force"] = measure(spark, f"brute_force {mult}x", ph_brute_force)
        all_rows[f"{mult}x"] = rows

        ba, rf = rows["batch_append"], rows["reassign_full"]
        qp, bf = rows["query_probe"], rows["brute_force"]
        print(
            f"  -> batch_append/reassign_full {mult}x: wall "
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
            "ivf_fit_v1",
            "assign_v1",
            "batch_append",
            "batch_append_rewrite",
            "reassign_full",
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
