"""Everything-ON deployment soak (r11 verdict item 3): every policy the
store layer shipped, running TOGETHER through one long drift-shaped
ingest — the integration the per-policy tests can't see.

What runs concurrently in one deployment shape:

* the six-artifact composed text ingest (``composed_ingest_stream``)
  with the compaction CADENCE on every append-chain store
  (sig / tf / dl / ledger / packed, ``compact_max_parts``);
* the IVF vector stream (``maintained_ivf_store_stream``) with BOTH the
  aging refresh (``refresh_factor``) and the cadence on;
* a mid-run KILL/RESTART: after phase A drains, the newest entry in the
  checkpoint's ``commits/`` log is deleted (the crash window between
  store commits and the engine's batch commit), so the restart REPLAYS
  that epoch — every store's ``_EPOCHS`` ledger must dedupe it — then
  continues through phase B's new files.

Asserted at the end, all together:

1. drain equality for all SIX text stores vs their from-scratch batch
   builders (count + xxhash64 content checksums), packed store finalized
   == scratch pack exactly;
2. file counts sawtooth under the bound: per-version part counts show
   >= 1 compaction per chained store and the final chain depth within
   ``compact_max_parts`` + 1;
3. the replayed epoch committed NO second version anywhere (version for
   the replayed epoch_id identical across the kill/restart);
4. the IVF refresh fired mid-stream (quantizer store rotated, post-
   refresh trigger no longer due) with zero vectors lost.

Usage: python tools/stress_deploy_soak.py [sf_dir] [workdir] [n_files]
       (defaults sf0.1, /tmp/soak_deploy, 24)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_deploy"
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 24

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        banded_signature_table,
        shingle_sets,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.similarity import (
        assign_cells,
        kmeans_fit,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.ann_maintenance import (
        refresh_due,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.census_maintenance import (
        _census_state,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
        BENCHMARKS,
        bench_shingle_table,
        corpus_shingles,
        doc_hits,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lexical_maintenance import (
        index_rows,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        _finalize,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packing_manifest,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import (
        get_spark,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import (
        versioned as V,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        composed_ingest_stream,
        maintained_ivf_store_stream,
    )

    spark = get_spark("stress-deploy-soak", extra_conf={"spark.ui.enabled": "true"})
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    src = os.path.join(work, "docs_src")
    vsrc = os.path.join(work, "vec_src")
    os.makedirs(src)
    os.makedirs(vsrc)

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "source", "text", "n_chars")
        .orderBy("doc_id")
    )
    n_docs = docs.count()
    step = (n_docs + n_files - 1) // n_files

    def _stage(df, dest_dir, name):
        staged = os.path.join(work, f"stage_{name}")
        df.coalesce(1).write.parquet(staged)
        part = glob.glob(staged + "/part-*.parquet")[0]
        shutil.move(part, os.path.join(dest_dir, f"{name}.parquet"))
        shutil.rmtree(staged, ignore_errors=True)

    # doc chunks land in doc_id order (monotone-arrival contract of the
    # packed store); distinct mtimes keep the file source oldest-first
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    for i in range(n_files):
        lo = ids[i * step]
        hi = ids[min((i + 1) * step, n_docs) - 1]
        _stage(
            docs.where(F.col("doc_id").between(lo, hi)), src, f"d{i:03d}"
        )
        time.sleep(0.05)

    # vector chunks: first half from the healthy distribution (the
    # baseline), second half drifted into one region so the aging
    # trigger fires mid-stream
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    healthy = emb.where("vec_id % 2 = 0")
    drifted = emb.where("vec_id % 2 = 1").select(
        "vec_id",
        F.transform("embedding", lambda x: x * 0 + F.lit(9.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    n_vfiles = 8
    for i in range(n_vfiles):
        side = healthy if i < n_vfiles // 2 else drifted
        _stage(side.where(f"pmod(vec_id, {n_vfiles // 2}) = {i % (n_vfiles // 2)}"),
               vsrc, f"v{i:03d}")
        time.sleep(0.05)

    # the stored benchmark table the decon screen reads (setup input)
    bench_p = os.path.join(work, "bench")
    V.write_version(
        bench_shingle_table(
            docs.limit(200).select("doc_id", "source", tokens("text").alias("ts")),
            BENCHMARKS,
        ),
        bench_p,
        partition_by=["benchmark"],
    )

    root = os.path.join(work, "stores")
    ckpt = os.path.join(work, "ckpt_docs")
    vck = os.path.join(work, "ckpt_vecs")
    MAX_PARTS = 6

    def _doc_stream():
        return (
            spark.readStream.schema(
                "doc_id bigint, source string, text string, n_chars bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    # ---- phase A: first 60% of the files, everything on ----
    phase_b_names = [f"d{i:03d}.parquet" for i in range(n_files)][
        int(n_files * 0.6):
    ]
    held = os.path.join(work, "held_back")
    os.makedirs(held)
    for n in phase_b_names:
        shutil.move(os.path.join(src, n), os.path.join(held, n))

    t0 = time.time()
    rows_a = composed_ingest_stream(
        _doc_stream(), root, bench_p, checkpoint_dir=ckpt,
        compact_max_parts=MAX_PARTS,
    )
    wall_a = time.time() - t0
    print(f"phase A: {len(rows_a)} epochs, {wall_a:.1f}s")
    assert rows_a, "phase A drained no epochs"
    replay_epoch = rows_a[-1][0]
    replay_versions = rows_a[-1][1:]

    # ---- the KILL: drop the newest engine commit so the restart
    #      replays that epoch against already-committed stores. The
    #      Hadoop local FS keeps a ``.N.crc`` sidecar next to each commit
    #      file — it must go too, or the replayed commit's atomic rename
    #      fails on the stale checksum and Spark misreads it as a
    #      concurrent writer (found by this soak). ----
    commits = sorted(
        (f for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()),
        key=int,
    )
    for name in (commits[-1], f".{commits[-1]}.crc"):
        p = os.path.join(ckpt, "commits", name)
        if os.path.exists(p):
            os.remove(p)
    for n in phase_b_names:
        shutil.move(os.path.join(held, n), os.path.join(src, n))
        time.sleep(0.05)

    # ---- phase B: restart from the same checkpoint, WITH the dl
    #      store's schema evolution flipped on (the q259 posture landing
    #      mid-deployment, under the cadence and the replayed epoch) ----
    t0 = time.time()
    rows_b = composed_ingest_stream(
        _doc_stream(), root, bench_p, checkpoint_dir=ckpt,
        compact_max_parts=MAX_PARTS,
        dl_with_uniq=True,
    )
    wall_b = time.time() - t0
    print(f"phase B: {len(rows_b)} epochs (first replayed), {wall_b:.1f}s")
    assert rows_b[0][0] == replay_epoch, "restart did not replay the killed epoch"
    assert tuple(rows_b[0][1:]) == tuple(replay_versions), (
        f"replayed epoch re-committed: {rows_b[0][1:]} vs {replay_versions}"
    )

    # ---- the vector stream: refresh + cadence on ----
    vstream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(vsrc)
    )
    ivf_p, cen_p = root + "_ivf", root + "_cents"
    cents = kmeans_fit(healthy, k=8, max_iter=4)
    V.write_version(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cell int, centroid array<bigint>"
        ),
        cen_p,
    )
    t0 = time.time()
    rows_v = maintained_ivf_store_stream(
        vstream, ivf_p, cen_p, checkpoint_dir=vck,
        refresh_factor=1.8, refresh_k=8, compact_max_parts=MAX_PARTS,
    )
    wall_v = time.time() - t0
    print(f"vector stream: {len(rows_v)} epochs, {wall_v:.1f}s")

    # ================= assertions, all policies together =================
    def _chk(df):
        cols = sorted(df.columns)
        # decimal(38,0) accumulator: an int64 sum of thousands of 64-bit
        # hashes overflows under ANSI mode
        agg = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        ).first()
        return (agg["n"], str(agg["h"]))

    all_docs = spark.read.parquet(src).select("doc_id", "source", "text", "n_chars")
    ts_all = all_docs.select("doc_id", tokens("text").alias("ts"))

    checks = {
        "sig": (
            _chk(V.read_current(spark, root + "_sig")),
            _chk(banded_signature_table(shingles=shingle_sets(ts_all, 3))),
        ),
    }
    tf_all, dl_all = index_rows(all_docs.select("doc_id", "text"))
    checks["tf"] = (_chk(V.read_current(spark, root + "_tf")), _chk(tf_all))
    # the dl store EVOLVED mid-run: core-column drain equality must be
    # untouched, the evolution boundary must sit exactly at the first
    # non-replayed phase-B doc (the replayed epoch dedupe-skips, so its
    # rows stay pre-evolution), and n_uniq must be exact post-boundary
    dl_store = V.read_current(spark, root + "_dl")
    checks["dl"] = (_chk(dl_store.select("doc_id", "len", "hb")), _chk(dl_all))
    b_lo_id = ids[int(n_files * 0.6) * step]
    assert "n_uniq" in dl_store.columns, "dl store did not evolve"
    n_pre_filled = dl_store.where(
        (F.col("doc_id") < b_lo_id) & F.col("n_uniq").isNotNull()
    ).count()
    n_post_null = dl_store.where(
        (F.col("doc_id") >= b_lo_id) & F.col("n_uniq").isNull()
    ).count()
    assert n_pre_filled == 0 and n_post_null == 0, (n_pre_filled, n_post_null)
    _, dl_evolved = index_rows(
        all_docs.where(F.col("doc_id") >= b_lo_id).select("doc_id", "text"),
        dl_with_uniq=True,
    )
    checks["dl_evolved_cols"] = (
        _chk(dl_store.where(F.col("doc_id") >= b_lo_id)),
        _chk(dl_evolved),
    )
    print(f"  dl schema evolution: boundary doc_id {b_lo_id}, "
          f"pre-rows null-filled, post-rows exact")
    stats_all, kmv_all = _census_state(all_docs)
    checks["stats"] = (_chk(V.read_current(spark, root + "_stats")), _chk(stats_all))
    checks["kmv"] = (_chk(V.read_current(spark, root + "_kmv")), _chk(kmv_all))
    checks["ledger"] = (
        _chk(V.read_current(spark, root + "_ledger")),
        _chk(
            doc_hits(
                corpus_shingles(
                    all_docs.select("doc_id", "source", tokens("text").alias("ts"))
                ),
                V.read_current(spark, bench_p),
            )
        ),
    )
    checks["packed"] = (
        _chk(_finalize(V.read_current(spark, root + "_packed"))),
        _chk(packing_manifest(all_docs.select("doc_id", "text"))),
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packing_spans,
    )

    checks["spans"] = (
        _chk(V.read_current(spark, root + "_spans")),
        _chk(packing_spans(all_docs.select("doc_id", "text"))),
    )
    for name, (got, want) in checks.items():
        status = "OK" if got == want else "MISMATCH"
        print(f"  drain-equality {name}: got {got} want {want} [{status}]")
    assert all(g == w for g, w in checks.values()), "drain equality violated"

    # sawtooth: per-version chain depth for every cadenced store. A
    # compaction shows up as a depth DROP in the version series (an
    # uncontended compact commits a plain _v snapshot — depth 1 — and a
    # reparented one commits _parts/c… + newer deltas).
    report = {}
    n_epochs = len(rows_a) + len(rows_b)
    for suff in ("_sig", "_tf", "_dl", "_ledger", "_packed", "_spans", "_ivf"):
        p = root + suff
        series = [len(V._parts_of(p, v)) for v in V._versions(p)]
        n_compact = sum(1 for a, b in zip(series, series[1:]) if b < a)
        final_depth = len(V._parts_of(p, V.current_version(p)))
        files = len(V.table_files(p))
        print(
            f"  {suff}: chain-depth series {series} -> final {final_depth} "
            f"(bound {MAX_PARTS + 1}), {n_compact} compactions, {files} files"
        )
        assert final_depth <= MAX_PARTS + 1, f"{suff} chain unbounded"
        assert max(series) <= MAX_PARTS + 1, f"{suff} crossed the bound mid-run"
        if n_epochs > MAX_PARTS + 1 and suff != "_ivf":
            # enough appends landed to cross the bound at least once
            assert n_compact >= 1, f"{suff} never compacted"
        report[suff] = {
            "final_depth": final_depth,
            "max_depth": max(series),
            "n_compactions": n_compact,
            "files": files,
        }

    # the refresh fired and re-baselined; no vector lost across
    # refresh + compaction interleave
    assert V.current_version(cen_p) >= 2, "quantizer store did not rotate"
    due, health = refresh_due(spark, ivf_p, factor=1.8)
    assert not due, f"trigger still due after refresh: {health}"
    got_ids = sorted(r["vec_id"] for r in V.read_current(spark, ivf_p).collect())
    want_ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    assert got_ids == want_ids, "vectors lost across refresh/compaction"
    print(
        f"  ivf: quantizer v{V.current_version(cen_p)}, trigger re-baselined, "
        f"{len(got_ids)} vectors intact"
    )

    print(
        json.dumps(
            {
                "docs": n_docs,
                "epochs": len(rows_a) + len(rows_b),
                "replayed_epoch": replay_epoch,
                "wall_a": round(wall_a, 1),
                "wall_b": round(wall_b, 1),
                "wall_vec": round(wall_v, 1),
                "stores": report,
            }
        )
    )


if __name__ == "__main__":
    main()
