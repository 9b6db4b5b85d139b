"""Loader-schedule invariants (q262/q263): the deterministic epoch
shuffle must be a true permutation every worker can derive
independently, reshuffled across epochs, with full batches everywhere
but each epoch's tail."""

from pyspark.sql import functions as F

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.loader_schedule import (
    _STEP_B,
    loader_schedule,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
    packing_manifest,
)


def _docs(spark, n=300):
    return spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 31) % 70 + 1))) for i in range(n)],
        ["doc_id", "text"],
    )


def test_schedule_is_a_permutation_and_reshuffles(spark):
    man = packing_manifest(_docs(spark))
    m = man.count()
    e0 = loader_schedule(man, 0)
    e1 = loader_schedule(man, 1)

    # permutation: global ranks step*B + slot cover 0..M-1 exactly once
    ranks = sorted(
        r["g"]
        for r in e0.select(
            (F.col("step") * _STEP_B + F.col("slot")).alias("g")
        ).collect()
    )
    assert ranks == list(range(m))

    # every sequence scheduled exactly once per epoch
    assert e0.select("shard", "seq_id").distinct().count() == m

    # epochs genuinely reshuffle: the (shard, seq_id) -> rank maps differ
    r0 = {(r["shard"], r["seq_id"]): (r["step"], r["slot"]) for r in e0.collect()}
    r1 = {(r["shard"], r["seq_id"]): (r["step"], r["slot"]) for r in e1.collect()}
    assert r0 != r1
    moved = sum(1 for k in r0 if r0[k] != r1[k])
    assert moved > m // 2, f"epoch reshuffle barely moved anything ({moved}/{m})"

    # determinism: recomputing the same epoch yields the identical schedule
    again = {
        (r["shard"], r["seq_id"]): (r["step"], r["slot"])
        for r in loader_schedule(man, 0).collect()
    }
    assert again == r0


def test_steps_full_except_tail(spark):
    man = packing_manifest(_docs(spark))
    m = man.count()
    sizes = {
        r["step"]: r["n"]
        for r in loader_schedule(man, 0)
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    last = max(sizes)
    for step, n in sizes.items():
        if step < last:
            assert n == _STEP_B, f"step {step} not full: {n}"
    assert sizes[last] == m - last * _STEP_B


def test_schedule_rank_window_is_hash_partitioned(spark):
    """The distributed-rank contract: the per-sequence rank window
    partitions by hash bucket (``hashpartitioning(b, ...)``), never over
    one global partition — the scale trap of a bare
    ``row_number() OVER (ORDER BY ...)``, which the oracle twin uses
    precisely BECAUSE it is the single-node exhaustive formulation. The
    only SinglePartition window in the plan is the NB-row bucket-offset
    cumsum (bounded by construction)."""
    man = packing_manifest(_docs(spark))
    plan = loader_schedule(man, 0)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(b" in plan, plan


def test_step_fetch_matches_pure_python_twin(spark):
    """q264's composed fetch (schedule -> spans -> bytes) against a
    pure-Python reimplementation of the whole chain — tokenizer, per-
    shard cumsum pack, slice arithmetic, seeded schedule, md5 — so the
    check shares NO code with the plan under test. Every returned row
    (epoch, step, slot, shard, seq_id, n_parts, n_tokens, seq_md5) must
    match exactly, and the fetch must cover precisely the first
    ``nsteps`` steps of the epoch's schedule."""
    import hashlib
    from collections import defaultdict

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.loader_schedule import (
        _NB,
        _P,
        _P1,
        _P2,
        _P3,
        fetch_steps,
    )

    n, nshards, cap, epoch, nsteps = 600, 8, 256, 1, 3
    rows = [(i, " ".join(f"w{j}" for j in range((i * 31) % 70 + 1))) for i in range(n)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    # ---- pure-Python twin -------------------------------------------------
    toks = {d: t.strip().split() for d, t in rows}
    shard_docs = defaultdict(list)
    for d in sorted(toks):
        if toks[d]:
            shard_docs[d % nshards].append(d)
    seqs: dict[tuple[int, int], list] = defaultdict(list)
    for sh, ds in shard_docs.items():
        off = 0
        for d in ds:
            nt = len(toks[d])
            for seq in range(off // cap, (off + nt - 1) // cap + 1):
                lo, hi = max(off, seq * cap), min(off + nt, (seq + 1) * cap)
                seqs[(sh, seq)].append((d, toks[d][lo - off : hi - off]))
            off += nt
    # seeded schedule over the manifest keys
    order = sorted(
        seqs,
        key=lambda k: (
            (k[0] * _P1 + k[1] * _P2 + epoch * _P3) % _P % _NB,
            (k[0] * _P1 + k[1] * _P2 + epoch * _P3) % _P,
            k,
        ),
    )
    expected = {}
    for rank, (sh, sq) in enumerate(order):
        step, slot = rank // _STEP_B, rank % _STEP_B
        if step >= nsteps:
            continue
        parts = sorted(seqs[(sh, sq)])
        stream = " ".join(" ".join(p) for _, p in parts)
        expected[(epoch, step, slot)] = (
            sh,
            sq,
            len(parts),
            sum(len(p) for _, p in parts),
            hashlib.md5(stream.encode()).hexdigest(),
        )
    assert len(expected) == nsteps * _STEP_B  # enough sequences to fill

    # ---- the plan under test ---------------------------------------------
    got = {
        (r["epoch"], r["step"], r["slot"]): (
            r["shard"],
            r["seq_id"],
            r["n_parts"],
            r["n_tokens"],
            r["seq_md5"],
        )
        for r in fetch_steps(docs, epoch, nsteps).collect()
    }
    assert got == expected


def test_step_fetch_joins_broadcast(spark):
    """q264's scale contract: both fetch joins are broadcast-hash — the
    bounded key set against the span relation, and the bounded span rows
    against the document scan. A SortMergeJoin anywhere means the fetch
    shuffled a corpus-sized side for a B x nsteps read."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.loader_schedule import (
        fetch_steps,
    )

    plan = (
        fetch_steps(_docs(spark), 1, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3, plan  # keys, offsets, docs
    assert "SortMergeJoin" not in plan, plan


def test_schedule_from_maintained_store_matches_scratch(spark, tmp_path):
    """The deployment path: a training run derives its epoch schedule
    from the MAINTAINED q258 packing-manifest store — a metadata-only
    read, zero text scans — and must get the identical (step, slot)
    assignment the from-scratch manifest yields (the gated q262 head
    recomputes from text only so its oracle stays self-contained)."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
        write_version,
    )

    docs = _docs(spark, 400)
    man = packing_manifest(docs)
    store = str(tmp_path / "sched_man_store")
    write_version(man, store, partition_by=["shard"])

    scratch = sorted(
        tuple(r) for r in loader_schedule(man, 1).collect()
    )
    stored = sorted(
        tuple(r)
        for r in loader_schedule(
            read_current(spark, store).select("shard", "seq_id"), 1
        ).collect()
    )
    assert stored == scratch and len(stored) > 0
