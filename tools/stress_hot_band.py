"""Planted-hot-band stress measurement for the LSH band join (SCALE_NOTES).

Builds a corpus where one band bucket is degenerate — N_HOT documents with
IDENTICAL text, so every band signature collides — alongside unique cold
documents, then measures the candidate-pair join three ways:

  1. plain band join, AQE skew split at DEFAULT thresholds (256 MB / 5x)
  2. plain band join, AQE skew split at AGGRESSIVE thresholds (what it
     takes for detection to fire on compressed hot-band bytes)
  3. salted band join (structural spreading, no detection needed)

Each run reports wall time, whether the final adaptive plan shows
skew=true, and the candidate-pair count (all three must agree).

Usage: python tools/stress_hot_band.py [n_hot] [n_cold]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_candidates,
    minhash_lsh_candidates_salted,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark  # noqa: E402


def build_docs(spark, n_hot: int, n_cold: int):
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.split(
            F.lit("the same boilerplate legal footer repeated on every page of the crawl"),
            " ",
        ).alias("ts"),
    )
    cold = spark.range(n_hot, n_hot + n_cold).select(
        F.col("id").alias("doc_id"),
        F.split(
            F.concat_ws(
                " ",
                F.concat(F.lit("tok"), F.col("id")),
                F.concat(F.lit("unique"), F.col("id") * 7),
                F.concat(F.lit("word"), F.col("id") * 13),
                F.concat(F.lit("tail"), F.col("id") * 29),
                F.concat(F.lit("more"), F.col("id") * 31),
                F.concat(F.lit("body"), F.col("id") * 37),
            ),
            " ",
        ).alias("ts"),
    )
    # repartition so neither variant starts from a conveniently pre-split
    # layout; the band-join shuffle is what distributes the work
    return hot.unionAll(cold).repartition(32, "doc_id")


def run_with_plan(df) -> tuple[float, int, bool]:
    """Execute a global rollup of the candidate relation (never collects the
    pair list to the driver) and read the skew marker from the SAME
    execution's final adaptive plan."""
    total = df.groupBy().agg(F.count(F.lit(1)).alias("n"))
    t0 = time.time()
    n = total.collect()[0]["n"]
    dt = time.time() - t0
    plan = total._jdf.queryExecution().executedPlan().toString()
    return dt, n, "skew=true" in plan


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_cold = int(sys.argv[2]) if len(sys.argv) > 2 else 45000
    spark = get_spark("hot-band-stress")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    docs = build_docs(spark, n_hot, n_cold).localCheckpoint()
    print(f"corpus: {n_hot} hot (identical) + {n_cold} cold docs; expect "
          f"{n_hot * (n_hot - 1) // 2} hot pairs")

    results: dict[str, tuple[float, int, bool]] = {}

    # 1. plain, default AQE skew thresholds
    cand = minhash_lsh_candidates(docs, num_hashes=32, bands=1)
    results["plain+AQE-defaults"] = run_with_plan(cand)

    # 2. plain, aggressive thresholds (compressed-bytes detection headroom)
    for k, v in {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }.items():
        spark.conf.set(k, v)
    cand = minhash_lsh_candidates(docs, num_hashes=32, bands=1)
    results["plain+AQE-aggressive"] = run_with_plan(cand)
    for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ):
        spark.conf.unset(k)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    # 3. salted band join (structural)
    cand = minhash_lsh_candidates_salted(docs, num_hashes=32, bands=1, n_salts=8)
    results["salted-8"] = run_with_plan(cand)

    counts = {r[1] for r in results.values()}
    print(f"\ncandidate counts agree: {len(counts) == 1} ({counts})")
    for label, (dt, rows, skew) in results.items():
        print(f"{label:>22}: {dt:6.1f} s  pairs={rows}  skew_split={'yes' if skew else 'no'}")


if __name__ == "__main__":
    main()
