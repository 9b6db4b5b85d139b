"""Maintenance-lifecycle soak (r7 verdict item 2): q239 proves the
incremental dedup-index update converges to the from-scratch answer;
this tool proves it is measurably CHEAPER, phase by phase, at 1x and
10x corpus scale.

Phases measured independently (wall + shuffle read/write MB via the UI
REST stage deltas, same discipline as stress_soak):

* ``shingles``   — the (doc_id, shingle) relation over the full corpus
  (localCheckpoint). At 100 TB this is a maintained table alongside the
  index; here it is charged to its own row so neither build nor update
  absorbs it.
* ``build_v1``   — PPJoin pairs over the existing ~80% corpus
  (q71 hash-split arithmetic) + CC + versioned-store write. The cost a
  deployment pays ONCE.
* ``sig_build_v1`` — the corpus side's banded signatures written to the
  versioned store ONCE (alongside the index build; build_v1 +
  sig_build_v1 together = the engine q239's step-1 cost, attributed
  separately here).
* ``incr_update``— what a deployment pays PER INGEST BATCH (~20%),
  measured through the ENGINE DEFAULT path (r9: q239/q103 probe the
  stored signature table — ``incremental_cross_pairs`` with
  ``corpus_banded``): v1 star edges ∪ stored-table cross candidates
  (batch-only signature compute) ∪ batch-internal PPJoin, then CC +
  store write.
* ``incr_update_recompute`` — the pre-r9 fallback (full-union signature
  recompute per batch). The delta incr_update_recompute − incr_update
  is exactly the corpus-proportional byte term the q245 lever removed
  from the per-batch cost.
* ``upd_*`` sub-phases (r8 verdict item 3) — the default update's bytes
  attributed stage by stage: ``upd_star_edges`` (v1 component read, one
  row per indexed doc — O(corpus), tiny constant), ``upd_batch_sigs`` /
  ``upd_probe`` / ``upd_verify`` / ``upd_within`` (the per-batch kernel
  proper), ``upd_cc_write`` (CC + the O(corpus) component-table write).
  The residual super-linearity of the update's byte exponent should sit
  in the O(corpus) rows, with the kernel rows ~linear — that attribution
  is the point of the decomposition.
* ``sig_build_v1_bucketed`` / ``incr_update_sigbucket`` — one lever
  deeper: the stored signatures as a BUCKETED table on (band, sig)
  (``sources/writers.overwrite_bucketed_table``), so the probe join
  needs no Exchange on the stored side — only the batch's signatures
  shuffle. This is the shape that makes update bytes batch-proportional
  end to end: pay the corpus shuffle once at build, never per batch.
* ``census_read``— read_current + the census aggregate: what an
  analysis head pays once the index is maintained.
* ``rebuild_full``— PPJoin + CC over the FULL corpus: the from-scratch
  cost the incremental update replaces. The headline ratio is
  incr_update / rebuild_full per scale; the star-edge argument predicts
  the update side scales with batch + components, not corpus, so its
  1x->10x exponent should track the batch size, and the ratio should
  FALL (or hold) as the corpus grows.

Corpora: the ORGANIC family (/tmp/soak/org1 = 100k docs, org10 = 1M;
built on demand), q163's documented prefix-kernel regime — the replica
family degrades prefix filtering by design and is the LSH path's
regime, not this kernel's (stress_soak module docstring).

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_maintenance.py \
    [sf_dir] [workdir]     (defaults /root/testdata/sf0.1, /tmp/soak)
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

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        _CKPT_LEVEL,
        _verify_jaccard,
        banded_signature_table,
        cross_pairs_from_signature_table,
        incremental_cross_pairs,
        prefix_filter_jaccard_pairs,
        shingle_sets,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.graph import (
        connected_components,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.training import (
        _doc_hash,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
        read_version,
        write_version,
    )

    spark = get_spark(
        "stress-maintenance",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "20000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    all_rows: dict[str, dict] = {}
    for mult in (1, 10):
        corpus = os.path.join(work, f"org{mult}")
        if not os.path.exists(os.path.join(corpus, "documents.parquet")):
            t0 = time.time()
            nd, _ = build(sf_dir, corpus, copies=1, shards=20 * mult)
            print(f"built {corpus}: {nd} docs [{time.time()-t0:.0f}s]")
        print(f"== maintenance lifecycle, organic {mult}x ==")

        docs = (
            spark.read.parquet(os.path.join(corpus, "documents.parquet"))
            .select("doc_id", tokens("text").alias("ts"))
        )
        is_new = _doc_hash() >= 800
        corpus_side, batch = docs.where(~is_new), docs.where(is_new)
        store = os.path.join(work, f"maint_store_{mult}x_{int(time.time())}")

        state: dict = {}

        def ph_shingles():
            state["sh_all"] = shingle_sets(docs, 3).localCheckpoint()
            return {"n": state["sh_all"].count()}

        def ph_build_v1():
            sh_old = state["sh_all"].where(_doc_hash() < 800)
            pairs_v1 = prefix_filter_jaccard_pairs(
                corpus_side, threshold=0.5, shingles=sh_old
            )
            comps_v1 = connected_components(
                pairs_v1.select("doc_a", "doc_b"), "doc_a", "doc_b"
            ).select(F.col("id").alias("doc_id"), "comp")
            write_version(comps_v1, store)
            return {"n": read_current(spark, store).count()}

        def ph_sig_build_v1():
            write_version(
                banded_signature_table(shingles=state["sh_all"].where(_doc_hash() < 800)),
                store + "_sigs",
            )
            return {"n": read_current(spark, store + "_sigs").count()}

        def ph_incr_update():
            # the ENGINE DEFAULT (r9): cross candidates probe the STORED
            # signature table via incremental_cross_pairs(corpus_banded=...)
            # — exactly the path q239 runs, so this row IS the headline
            # per-batch cost
            old = read_current(spark, store)
            star = old.select(
                F.col("doc_id").alias("doc_a"), F.col("comp").alias("doc_b")
            )
            cross = incremental_cross_pairs(
                docs,
                is_new,
                threshold=0.5,
                shingles=state["sh_all"],
                corpus_banded=read_current(spark, store + "_sigs"),
            ).select("doc_a", "doc_b")
            within = prefix_filter_jaccard_pairs(
                batch, threshold=0.5, shingles=state["sh_all"].where(_doc_hash() >= 800)
            ).select("doc_a", "doc_b")
            comps_v2 = connected_components(
                star.unionByName(cross).unionByName(within), "doc_a", "doc_b"
            ).select(F.col("id").alias("doc_id"), "comp")
            write_version(comps_v2, store)
            return {"n": read_current(spark, store).count()}

        def ph_incr_update_recompute():
            # the pre-r9 fallback: per-batch signature recompute over the
            # full union — kept as the comparison variant; the delta vs
            # ph_incr_update is the corpus-proportional term q245 removed.
            # Appends v3; census reads the newest, identical by the q239
            # convergence argument either way.
            old = read_current(spark, store)
            star = old.select(
                F.col("doc_id").alias("doc_a"), F.col("comp").alias("doc_b")
            )
            cross = incremental_cross_pairs(
                docs, is_new, threshold=0.5, shingles=state["sh_all"]
            ).select("doc_a", "doc_b")
            within = prefix_filter_jaccard_pairs(
                batch, threshold=0.5, shingles=state["sh_all"].where(_doc_hash() >= 800)
            ).select("doc_a", "doc_b")
            comps = connected_components(
                star.unionByName(cross).unionByName(within), "doc_a", "doc_b"
            ).select(F.col("id").alias("doc_id"), "comp")
            write_version(comps, store)
            return {"n": read_current(spark, store).count()}

        def ph_sig_build_v1_bucketed():
            import shutil

            from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.writers import (
                drop_table_if_exists,
                overwrite_bucketed_table,
            )

            # a previous SESSION's managed-table directory survives its
            # metadata; clear both or saveAsTable trips LOCATION_ALREADY_EXISTS
            drop_table_if_exists(spark, f"sig_store_bucketed_{mult}x")
            loc = os.path.join(
                spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
                f"sig_store_bucketed_{mult}x",
            )
            shutil.rmtree(loc, ignore_errors=True)
            overwrite_bucketed_table(
                banded_signature_table(shingles=state["sh_all"].where(_doc_hash() < 800)),
                f"sig_store_bucketed_{mult}x",
                ["band", "sig"],
                n_buckets=64,
            )
            return {"n": spark.table(f"sig_store_bucketed_{mult}x").count()}

        def ph_incr_update_sigbucket():
            old = read_current(spark, store)
            star = old.select(
                F.col("doc_id").alias("doc_a"), F.col("comp").alias("doc_b")
            )
            stored_sigs = spark.table(f"sig_store_bucketed_{mult}x")
            batch_sigs = banded_signature_table(
                shingles=state["sh_all"].where(_doc_hash() >= 800)
            )
            cross = cross_pairs_from_signature_table(
                stored_sigs, batch_sigs, state["sh_all"], threshold=0.5
            ).select("doc_a", "doc_b")
            within = prefix_filter_jaccard_pairs(
                batch, threshold=0.5, shingles=state["sh_all"].where(_doc_hash() >= 800)
            ).select("doc_a", "doc_b")
            comps = connected_components(
                star.unionByName(cross).unionByName(within), "doc_a", "doc_b"
            ).select(F.col("id").alias("doc_id"), "comp")
            write_version(comps, store)
            return {"n": read_current(spark, store).count()}

        def ph_census_read():
            maintained = read_current(spark, store)
            census = (
                maintained.select(
                    F.col("comp").alias("component_id"),
                    (_doc_hash() >= 800).cast("int").alias("b"),
                )
                .groupBy("component_id")
                .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("b").alias("n_batch_docs"))
            )
            r = force_full(census)
            return {"n": r["n"]}

        def ph_rebuild_full():
            pairs = prefix_filter_jaccard_pairs(
                docs, threshold=0.5, shingles=state["sh_all"]
            )
            comps = connected_components(
                pairs.select("doc_a", "doc_b"), "doc_a", "doc_b"
            )
            r = force_full(comps)
            return {"n": r["n"]}

        rows = {}
        rows["shingles"] = measure(spark, f"shingles {mult}x", ph_shingles)
        rows["build_v1"] = measure(spark, f"build_v1 {mult}x", ph_build_v1)
        rows["sig_build_v1"] = measure(spark, f"sig_build_v1 {mult}x", ph_sig_build_v1)
        rows["incr_update"] = measure(spark, f"incr_update {mult}x", ph_incr_update)
        rows["incr_update_recompute"] = measure(
            spark, f"incr_update_recompute {mult}x", ph_incr_update_recompute
        )

        # -- update SUB-PHASE decomposition (r8 verdict item 3): attribute
        # the default update's bytes to its internal stages so the
        # per-batch kernel's own exponent is isolated from the two
        # O(corpus)-with-tiny-constant terms (star edges, component-table
        # write). Each stage forced independently; upd_probe materializes
        # the candidate relation so upd_verify times the verify join alone.
        sub_state: dict = {}

        def ph_upd_star_edges():
            star = read_version(spark, store, 1).select(
                F.col("doc_id").alias("doc_a"), F.col("comp").alias("doc_b")
            )
            return {"n": force_full(star)["n"]}

        def ph_upd_batch_sigs():
            sub_state["batch_sigs"] = banded_signature_table(
                shingles=state["sh_all"].where(_doc_hash() >= 800)
            ).localCheckpoint(storageLevel=_CKPT_LEVEL)
            return {"n": sub_state["batch_sigs"].count()}

        def ph_upd_probe():
            stored_sigs = read_current(spark, store + "_sigs")
            b = sub_state["batch_sigs"]
            a, bb = stored_sigs.alias("a"), b.alias("b")
            cand = (
                a.join(
                    bb,
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.sig") == F.col("b.sig"))
                    & (F.col("a.doc_id") != F.col("b.doc_id")),
                )
                .select(
                    F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                    F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
                )
                .distinct()
            )
            sub_state["cand"] = cand.localCheckpoint(storageLevel=_CKPT_LEVEL)
            return {"n": sub_state["cand"].count()}

        def ph_upd_verify():
            v = _verify_jaccard(sub_state["cand"], state["sh_all"], 0.5)
            return {"n": force_full(v)["n"]}

        def ph_upd_within():
            w = prefix_filter_jaccard_pairs(
                batch, threshold=0.5, shingles=state["sh_all"].where(_doc_hash() >= 800)
            )
            return {"n": force_full(w)["n"]}

        def ph_upd_cc_write():
            # CC over (star ∪ cross ∪ within) + the O(corpus) component-
            # table write, into a throwaway store so the main lifecycle's
            # version history stays clean
            star = read_version(spark, store, 1).select(
                F.col("doc_id").alias("doc_a"), F.col("comp").alias("doc_b")
            )
            cross = _verify_jaccard(
                sub_state["cand"], state["sh_all"], 0.5
            ).select("doc_a", "doc_b")
            within = prefix_filter_jaccard_pairs(
                batch, threshold=0.5, shingles=state["sh_all"].where(_doc_hash() >= 800)
            ).select("doc_a", "doc_b")
            comps = connected_components(
                star.unionByName(cross).unionByName(within), "doc_a", "doc_b"
            ).select(F.col("id").alias("doc_id"), "comp")
            write_version(comps, store + "_subphase")
            return {"n": read_current(spark, store + "_subphase").count()}

        for sub, fn in (
            ("upd_star_edges", ph_upd_star_edges),
            ("upd_batch_sigs", ph_upd_batch_sigs),
            ("upd_probe", ph_upd_probe),
            ("upd_verify", ph_upd_verify),
            ("upd_within", ph_upd_within),
            ("upd_cc_write", ph_upd_cc_write),
        ):
            rows[sub] = measure(spark, f"{sub} {mult}x", fn)
        rows["sig_build_v1_bucketed"] = measure(
            spark, f"sig_build_v1_bucketed {mult}x", ph_sig_build_v1_bucketed
        )
        rows["incr_update_sigbucket"] = measure(
            spark, f"incr_update_sigbucket {mult}x", ph_incr_update_sigbucket
        )
        rows["census_read"] = measure(spark, f"census_read {mult}x", ph_census_read)
        rows["rebuild_full"] = measure(spark, f"rebuild_full {mult}x", ph_rebuild_full)
        state["sh_all"].unpersist()
        for k in ("batch_sigs", "cand"):
            if k in sub_state:
                sub_state[k].unpersist()

        rb = rows["rebuild_full"]
        for label in ("incr_update", "incr_update_recompute", "incr_update_sigbucket"):
            ru = rows[label]
            print(
                f"  -> {label}/rebuild ratio {mult}x: wall "
                f"{ru['sec'] / max(rb['sec'], 0.001):.2f}, write "
                f"{ru['shuffle_write_mb'] / max(rb['shuffle_write_mb'], 0.001):.2f}, "
                f"read {ru['shuffle_read_mb'] / max(rb['shuffle_read_mb'], 0.001):.2f}"
            )
        all_rows[f"{mult}x"] = rows

    import math

    print("== 1x -> 10x exponents (wall / write / read) ==")
    for ph in (
        "shingles",
        "build_v1",
        "sig_build_v1",
        "incr_update",
        "incr_update_recompute",
        "upd_star_edges",
        "upd_batch_sigs",
        "upd_probe",
        "upd_verify",
        "upd_within",
        "upd_cc_write",
        "sig_build_v1_bucketed",
        "incr_update_sigbucket",
        "census_read",
        "rebuild_full",
    ):
        a, b = all_rows["1x"][ph], all_rows["10x"][ph]

        def ex(k):
            lo, hi = max(a[k], 0.001), max(b[k], 0.001)
            return round(math.log(hi / lo) / math.log(10), 2)

        print(
            f"  {ph}: wall {ex('sec')}  write {ex('shuffle_write_mb')}  "
            f"read {ex('shuffle_read_mb')}"
        )


if __name__ == "__main__":
    main()
