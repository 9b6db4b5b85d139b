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
