"""q253 sequence packing / q254 mixture sampling — semantic invariants
beyond the DuckDB value-hash gate (tools/verify_oracle.py)."""

from pyspark.sql import functions as F

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
    token_count,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
    _NSHARDS,
    _SEQ_CAP,
    q253,
    q254,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.readers import (
    read_parquet_table,
)

from conftest import SF_SMOKE


def test_packing_manifest_invariants(spark):
    rows = q253(spark, SF_SMOKE).collect()
    assert rows, "empty packing manifest"
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)

    docs = read_parquet_table(spark, SF_SMOKE, "documents")
    total_toks = docs.select(F.sum(token_count("text"))).first()[0]
    n_docs = docs.count()

    assert set(by_shard) == set(range(_NSHARDS))
    for shard, rs in by_shard.items():
        seqs = [r["seq_id"] for r in rs]
        # each shard's token stream is chunked contiguously from offset 0
        assert seqs == list(range(len(seqs)))
        # every sequence fills to capacity except the shard's tail
        for r in rs[:-1]:
            assert r["fill"] == _SEQ_CAP, (shard, r)
        assert 1 <= rs[-1]["fill"] <= _SEQ_CAP

    # token conservation: the manifest's fills partition the corpus tokens
    assert sum(r["fill"] for r in rows) == total_toks
    # doc conservation: a doc spanning k sequences appears k times, so the
    # manifest's doc column is >= the doc count and bounded by docs+seqs
    n_appearances = sum(r["n_docs"] for r in rows)
    assert n_docs <= n_appearances <= n_docs + len(rows)


def test_mixture_sampling_invariants(spark):
    out = {r["source"]: r for r in q254(spark, SF_SMOKE).collect()}
    docs = read_parquet_table(spark, SF_SMOKE, "documents")
    per_src = {
        r["source"]: (r["n"], r["toks"])
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(token_count("text")).alias("toks"),
        )
        .collect()
    }
    assert set(out) == set(per_src), "one output row per source, kept or not"
    for src, r in out.items():
        n, toks = per_src[src]
        assert 0 <= r["rate_e6"] <= 1_000_000
        assert 0 <= r["n_docs"] <= n
        assert 0 <= r["n_tokens"] <= toks
        # a full-rate source keeps everything, a zero-rate source nothing
        if r["rate_e6"] == 1_000_000:
            assert (r["n_docs"], r["n_tokens"]) == (n, toks)
        if r["rate_e6"] == 0:
            assert (r["n_docs"], r["n_tokens"]) == (0, 0)
    # the mix must actually downsample overall (budget is half the corpus)
    assert sum(r["n_tokens"] for r in out.values()) < sum(
        t for _, t in per_src.values()
    )

    # deterministic: the sampled realization is reproducible bit-for-bit
    again = {r["source"]: r for r in q254(spark, SF_SMOKE).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_repetition_mixture_invariants(spark):
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        q255,
    )

    out = {r["source"]: r for r in q255(spark, SF_SMOKE).collect()}
    docs = read_parquet_table(spark, SF_SMOKE, "documents")
    per_src = {
        r["source"]: r["toks"]
        for r in docs.groupBy("source")
        .agg(F.sum(token_count("text")).alias("toks"))
        .collect()
    }
    assert set(out) == set(per_src)
    for src, r in out.items():
        toks = per_src[src]
        assert r["epochs"] >= 0 and 0 <= r["rem_rate_e6"] < 1_000_000
        # planned = epochs whole passes + a partial <= one more pass
        assert r["epochs"] * toks <= r["n_tokens_planned"] < (r["epochs"] + 1) * toks + 1
    # the 2x-corpus budget forces genuine upsampling somewhere: at least
    # one source must repeat (epochs >= 1) — the regime q254 cannot express
    assert any(r["epochs"] >= 1 for r in out.values())
    # budget adherence: the whole-epoch part is exact, the remainder is a
    # hash-threshold REALIZATION whose token yield varies with which docs
    # fall under the threshold — so the plan tracks the 2x-corpus budget
    # to within realization noise, not identically
    total = sum(per_src.values())
    planned = sum(r["n_tokens_planned"] for r in out.values())
    assert abs(planned - 2 * total) <= total // 10, (planned, 2 * total)


def test_packed_store_chain_equals_scratch(spark, tmp_path):
    """q258's maintained packed manifest: v1(corpus) + batch append
    (continued per-shard cumsum) finalizes EXACTLY to the from-scratch
    pack of the union — additive state, not a tail rewrite."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        _finalize,
        packed_store_lifecycle,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packing_manifest,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 37) % 90 + 1))) for i in range(400)],
        ["doc_id", "text"],
    )
    corpus, batch = docs.where("doc_id < 320"), docs.where("doc_id >= 320")
    store = str(tmp_path / "packed")
    cur = packed_store_lifecycle(spark, store, corpus, batch)

    # the batch really lands as CONTRIBUTION rows: at least one shard's
    # boundary (shard, seq_id) appears in both the snapshot and the delta
    raw_keys = [(r["shard"], r["seq_id"]) for r in cur.collect()]
    assert len(raw_keys) > len(set(raw_keys)), "no merged tail contribution"

    got = [tuple(r) for r in _finalize(cur).collect()]
    want = [tuple(r) for r in packing_manifest(docs).collect()]
    assert got == want


def test_packed_store_partition_pruning(spark, tmp_path):
    """The store is hive-partitioned by shard across snapshot AND delta
    parts, and a one-shard probe's scans carry shard PartitionFilters."""
    import os

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        packed_store_lifecycle,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        _parts_of,
        current_version,
        read_current,
    )
    from test_store_partitioning import _partition_filters

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 11) % 40 + 1))) for i in range(200)],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "packedp")
    packed_store_lifecycle(
        spark, store, docs.where("doc_id < 160"), docs.where("doc_id >= 160")
    )
    for rel in _parts_of(store, current_version(store)):
        assert any(
            d.startswith("shard=") for d in os.listdir(os.path.join(store, rel))
        ), rel
    probe = read_current(spark, store).where("shard = 3")
    pf = _partition_filters(probe)
    assert pf and all("shard" in f for f in pf), pf
    assert probe.count() > 0


def test_span_store_consistent_with_manifest(spark, tmp_path):
    """q260's span table and q258's manifest are two finals over the same
    stage: per (shard, seq_id), sum(n_span) == fill and count == n_docs —
    through the maintained lifecycles of BOTH stores, with the spans
    store purely additive (no duplicate (shard, seq_id, doc_id) keys)."""
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        _finalize,
        packed_store_lifecycle,
        span_store_lifecycle,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 53) % 70 + 1))) for i in range(300)],
        ["doc_id", "text"],
    )
    corpus, batch = docs.where("doc_id < 240"), docs.where("doc_id >= 240")
    man = _finalize(
        packed_store_lifecycle(spark, str(tmp_path / "m"), corpus, batch)
    )
    spans = span_store_lifecycle(spark, str(tmp_path / "s"), corpus, batch)
    assert spans.count() == spans.select("shard", "seq_id", "doc_id").distinct().count()
    rolled = spans.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_span").cast("bigint").alias("fill"),
    )
    assert rolled.exceptAll(man).count() == 0
    assert man.exceptAll(rolled).count() == 0
    # every span lies inside its sequence and its doc
    bad = spans.where(
        (F.col("seq_off") < 0) | (F.col("doc_off") < 0) | (F.col("n_span") <= 0)
        | (F.col("seq_off") + F.col("n_span") > 256)
    )
    assert bad.count() == 0


def test_packed_append_rejects_out_of_order_batch(spark, tmp_path):
    """The monotone-arrival guard (r11 verdict item 2): a batch whose
    doc_ids fall at or below a shard's stored high-water mark would
    silently produce a manifest that no longer equals the scratch pack —
    the append must reject it loudly, and the store must be untouched."""
    import pytest

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        packed_append,
        span_append,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packing_manifest,
        packing_spans,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        current_version,
        write_version,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 19) % 50 + 1))) for i in range(200)],
        ["doc_id", "text"],
    )
    corpus = docs.where("doc_id >= 100")  # stores docs 100..199
    backfill = docs.where("doc_id < 100")  # arrives LATER with LOWER ids

    store = str(tmp_path / "mono_m")
    write_version(packing_manifest(corpus, with_doc_bounds=True), store,
                  partition_by=["shard"])
    v_before = current_version(store)
    with pytest.raises(ValueError, match="out-of-order batch"):
        packed_append(spark, store, backfill)
    assert current_version(store) == v_before  # nothing committed

    sstore = str(tmp_path / "mono_s")
    write_version(packing_spans(corpus), sstore, partition_by=["shard"])
    with pytest.raises(ValueError, match="out-of-order batch"):
        span_append(spark, sstore, backfill)


def test_packed_append_interleaved_writer_serializes_correctly(spark, tmp_path):
    """The r11 double-fill race, pinned: a derived append whose base was
    superseded must NOT land (ConcurrentWriteError via expected_base) —
    and the retry loop re-derives from the new current, so the final
    store still equals the from-scratch pack of everything."""
    import pytest

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        _finalize,
        packed_append,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packing_manifest,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import (
        versioned as V,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 29) % 60 + 1))) for i in range(300)],
        ["doc_id", "text"],
    )
    c0 = docs.where("doc_id < 100")
    b1 = docs.where("doc_id >= 100 and doc_id < 200")
    b2 = docs.where("doc_id >= 200")

    store = str(tmp_path / "race_pk")
    V.write_version(packing_manifest(c0, with_doc_bounds=True), store,
                    partition_by=["shard"])

    # the losing writer's derivation: contribution rows computed from v1
    base_v = V.current_version(store)
    state = V.read_version(spark, store, base_v).groupBy("shard").agg(
        F.sum("fill").alias("base_toks")
    )
    stale_contrib = packing_manifest(b2, base=state, with_doc_bounds=True)

    # the interleaved writer commits b1 first (continues from v1 correctly)
    packed_append(spark, store, b1)

    # the stale commit must refuse — landing it would double-fill the
    # boundary (shard, seq_id)s that b1 already extended
    with pytest.raises(V.ConcurrentWriteError):
        V.append_version(stale_contrib, store, partition_by=["shard"],
                         expected_base=base_v)

    # the retrying path re-derives from the new current and converges
    packed_append(spark, store, b2)
    got = [tuple(r) for r in _finalize(
        V.read_current(spark, store)).collect()]
    want = [tuple(r) for r in packing_manifest(docs).collect()]
    assert got == want


def test_loader_materialization_produces_training_bytes(spark, tmp_path):
    """q261's contract, pinned end-to-end: for every sequence the
    materialized token stream BYTE-equals the corresponding slice of the
    shard's scratch-pack token stream (concatenate all docs' tokens in
    doc_id order, cut every 256), and n_tokens equals the manifest fill."""
    import hashlib

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        _LOADER_SHARD,
        materialize_sequences,
        span_store_lifecycle,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        _NSHARDS,
        _SEQ_CAP,
        packing_manifest,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range((i * 41) % 80 + 1)))
         for i in range(240)],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "loader")
    span_store_lifecycle(
        spark, store, docs.where("doc_id < 200"), docs.where("doc_id >= 200")
    )
    got = {
        r["seq_id"]: r
        for r in materialize_sequences(spark, store, docs, _LOADER_SHARD).collect()
    }

    # scratch reconstruction on the driver (small fixture): the shard's
    # full token stream in doc_id order, cut every _SEQ_CAP tokens
    stream: list[str] = []
    for i in range(240):
        if i % _NSHARDS == _LOADER_SHARD:
            stream.extend(f"w{i}_{j}" for j in range((i * 41) % 80 + 1))
    want_seqs = {
        k: stream[k * _SEQ_CAP:(k + 1) * _SEQ_CAP]
        for k in range((len(stream) + _SEQ_CAP - 1) // _SEQ_CAP)
    }
    assert set(got) == set(want_seqs)
    for k, toks in want_seqs.items():
        assert got[k]["n_tokens"] == len(toks)
        want_md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[k]["seq_md5"] == want_md5, f"seq {k}: materialized bytes differ"

    # n_tokens == the manifest's fill, per sequence
    fills = {
        r["seq_id"]: r["fill"]
        for r in packing_manifest(docs).where(f"shard = {_LOADER_SHARD}").collect()
    }
    assert {k: r["n_tokens"] for k, r in got.items()} == fills


def test_loader_read_partition_prunes_on_shard(spark, tmp_path):
    """The loader read's span-store scans must carry shard
    PartitionFilters — a loader worker reads ITS slice, not the store."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        materialize_sequences,
        span_store_lifecycle,
    )
    from test_store_partitioning import _partition_filters

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 13) % 50 + 1))) for i in range(160)],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "loaderp")
    span_store_lifecycle(
        spark, store, docs.where("doc_id < 120"), docs.where("doc_id >= 120")
    )
    out = materialize_sequences(spark, store, docs, 5)
    pf = _partition_filters(out)
    assert pf and all("shard" in f for f in pf), pf
    assert out.count() > 0


def test_packed_boundaries_reconcile_with_spans_and_manifest(spark):
    """q267 invariants: per packed sequence the boundary layout starts
    at 0, strictly increases, and its consecutive diffs (plus the tail
    up to fill) equal the per-piece n_span list in splice order — so
    the layout alone reconstructs the segment lengths a block-diagonal
    attention mask needs. n_parts/fill must agree with the q253
    manifest row for the same sequence."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packed_boundaries,
        packing_manifest,
        packing_spans,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 31) % 70 + 1))) for i in range(300)],
        ["doc_id", "text"],
    )
    out = {
        (r["shard"], r["seq_id"]): r for r in packed_boundaries(docs).collect()
    }
    man = {
        (r["shard"], r["seq_id"]): r for r in packing_manifest(docs).collect()
    }
    spans = {}
    for r in packing_spans(docs).collect():
        spans.setdefault((r["shard"], r["seq_id"]), []).append(
            (r["doc_id"], r["seq_off"], r["n_span"])
        )

    assert set(out) == set(man) == set(spans)
    for key, r in out.items():
        bounds = [int(x) for x in r["boundaries_csv"].split(",")]
        assert bounds[0] == 0
        assert bounds == sorted(set(bounds)), (key, bounds)  # strict increase
        # diffs + tail == n_span list in splice order
        segs = [b - a for a, b in zip(bounds, bounds[1:])] + [r["fill"] - bounds[-1]]
        want = [n for _, _, n in sorted(spans[key])]
        assert segs == want, (key, segs, want)
        assert r["n_parts"] == man[key]["n_docs"] == len(want)
        assert r["fill"] == man[key]["fill"] == sum(want)


def test_boundaries_from_span_store_match_scratch(spark, tmp_path):
    """The deployment path for the attention masks: q267's aggregation
    over the MAINTAINED q260 span store's current version — a
    metadata-only store read, zero text scans — equals the from-scratch
    boundary table exactly, including after a batch append continued
    the shards' offsets."""
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        span_store_lifecycle,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        boundaries_from_spans,
        packed_boundaries,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 31) % 70 + 1))) for i in range(300)],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "bound_span_store")
    span_store_lifecycle(
        spark,
        store,
        docs.where(F.col("doc_id") < 240),
        docs.where(F.col("doc_id") >= 240),
    )
    scratch = sorted(tuple(r) for r in packed_boundaries(docs).collect())
    stored = sorted(
        tuple(r)
        for r in boundaries_from_spans(read_current(spark, store)).collect()
    )
    assert stored == scratch and len(stored) > 0
