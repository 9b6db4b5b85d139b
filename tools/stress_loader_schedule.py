"""Loader-schedule rank at scale: the bucketed two-phase rank
(q262's plan) vs the naive global-window formulation.

The schedule needs an exact global rank over every packed sequence. The
single-node formulation — ``row_number() OVER (ORDER BY h, ...)`` — is
what the DuckDB oracle runs, but in Spark it plans an Exchange
SinglePartition: ONE task sorts (and ranks) the whole manifest, the
classic scale cliff. q262 instead ranks within NB hash buckets
(partitioned window) and adds NB broadcast bucket offsets; the global
order is DEFINED over (bucket, h, shard, seq_id), so the two-phase rank
is exact, and every bucket ranks in parallel.

This tool measures both on the same synthetic manifest and asserts the
schedules are identical (content checksum).

Usage: python tools/stress_loader_schedule.py [rows_csv]
       (default "1000000,4000000")
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stress_soak import measure  # noqa: E402


def main() -> None:
    sizes = (
        tuple(int(c) for c in sys.argv[1].split(","))
        if len(sys.argv) > 1
        else (1_000_000, 4_000_000)
    )

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.loader_schedule import (
        _STEP_B,
        _sched_hash,
        loader_schedule,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        _NSHARDS,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import (
        get_spark,
    )

    spark = get_spark(
        "stress-loader-schedule", extra_conf={"spark.ui.enabled": "true"}
    )

    def _chk(df):
        cols = sorted(df.columns)
        agg = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        ).first()
        return (agg["n"], str(agg["h"]))

    rows = []
    for n in sizes:
        # synthetic manifest: n sequences spread over the shards, dense
        # seq_ids per shard — the shape packing_manifest produces
        man = spark.range(n).select(
            F.pmod(F.col("id"), F.lit(_NSHARDS)).cast("int").alias("shard"),
            (F.col("id") / _NSHARDS).cast("bigint").alias("seq_id"),
        ).localCheckpoint()

        r_two = measure(
            spark,
            f"bucketed_rank_{n}",
            lambda: {"chk": _chk(loader_schedule(man, 0))},
        )

        def naive():
            h = _sched_hash(0).cast("bigint")
            w = Window.orderBy("h", "shard", "seq_id")
            out = (
                man.select("shard", "seq_id", h.alias("h"))
                .withColumn("rnk", F.row_number().over(w))
                .select(
                    F.lit(0).cast("bigint").alias("epoch"),
                    "shard",
                    "seq_id",
                    ((F.col("rnk") - 1) / _STEP_B).cast("bigint").alias("step"),
                    F.pmod(F.col("rnk") - 1, F.lit(_STEP_B))
                    .cast("bigint")
                    .alias("slot"),
                )
            )
            return {"chk": _chk(out)}

        r_one = measure(spark, f"single_partition_rank_{n}", naive)
        # NOTE: the two formulations define DIFFERENT global orders (the
        # bucketed one leads with h % NB), so schedules are not
        # row-identical across formulations — each is a valid permutation.
        # The correctness identity (bucketed Spark == bucketed DuckDB) is
        # what q262's oracle certifies; this tool measures COST. Both
        # must schedule every sequence exactly once:
        assert r_two["chk"][0] == n and r_one["chk"][0] == n
        rows.append(
            {
                "n_seqs": n,
                "bucketed_sec": r_two["sec"],
                "single_sec": r_one["sec"],
                "speedup": round(r_one["sec"] / max(r_two["sec"], 1e-9), 2),
                "bucketed_wr_mb": r_two["shuffle_write_mb"],
                "single_wr_mb": r_one["shuffle_write_mb"],
            }
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
