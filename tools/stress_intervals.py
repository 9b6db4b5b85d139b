"""Scaling soak for the intervals family (q202/q203 operators): bucketed
overlap join and sweep-line stacking at 1x/10x (r6 — the family shipped
in r5 with property tests and a boundedness argument but no measured
second scale point).

Corpus: synthetic closed date intervals with CONSTANT per-key density —
keys grow with N (50 intervals per key at every scale), starts uniform
over a 3650-day span, lengths 0-59 days (bucket_days=30 stays the
documented near-typical-length lever). Everything derives from
xxhash64(id), so both scales are deterministic and rebuildable. With
per-key density constant, overlap pairs per key are constant and the
TOTAL output is linear in N: wall/shuffle exponents near 1.0 are the
pass bar, and the candidate:verified ratio shows what the grid lever
buys over a per-key nested loop (50 intervals/key -> 1,225 pairs/key
for BNLJ vs the measured grid candidates).

Usage: python tools/stress_intervals.py  (~5-10 min; driver mem default ok)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress_soak import force_full, measure  # noqa: E402

PER_KEY = 50
SPAN_DAYS = 3650
MAX_LEN = 60
BUCKET = 30
SCALES = (1_000_000, 10_000_000)


def gen(spark, n: int):
    from pyspark.sql import functions as F

    keys = n // PER_KEY
    return (
        spark.range(n)
        .select(
            (F.col("id") % keys).alias("k"),
            F.col("id").alias("iid"),
            F.date_add(
                F.lit("2020-01-01").cast("date"),
                F.pmod(F.xxhash64("id"), F.lit(SPAN_DAYS)).cast("int"),
            ).alias("s"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(MAX_LEN)).cast("int").alias("len"),
        )
        .select("k", "iid", "s", F.date_add("s", F.col("len")).alias("e"))
    )


def candidates(iv, bucket_days: int):
    """The operator's OWN candidate relation (candidates_only flag, r6
    advice) — what the bucket_days lever controls. Calling the operator
    instead of re-deriving the explode + equi-join by hand keeps this
    telemetry honest if the cell derivation or join predicate changes."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.intervals import (
        interval_overlap_join,
    )

    return interval_overlap_join(
        iv, "k", "iid", "s", "e", bucket_days=bucket_days, candidates_only=True
    )


def main() -> None:
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.intervals import (
        interval_overlap_join,
        interval_stacking,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark(
        "stress-intervals",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for n in SCALES:
        label = f"{n // 1_000_000}M"
        iv = gen(spark, n).localCheckpoint()  # materialize once; measure the operators

        def overlap():
            out = interval_overlap_join(iv, "k", "iid", "s", "e", bucket_days=BUCKET)
            n_cand = candidates(iv, BUCKET).agg(F.count(F.lit(1))).collect()[0][0]
            return {"rows": force_full(out)["n"], "candidates": n_cand}

        def stacking():
            out = interval_stacking(iv, key="k", start="s", end="e", at_least=2)
            return {"rows": force_full(out)["n"]}

        results[n] = {
            "overlap": measure(spark, f"overlap join {label}", overlap),
            "stacking": measure(spark, f"sweep-line stacking {label}", stacking),
        }

    a, b = results[SCALES[0]], results[SCALES[1]]
    ratio = SCALES[1] / SCALES[0]
    print("\n=== scaling exponents (wall / shuffle-write), 1x -> 10x ===")
    for key in ("overlap", "stacking"):
        ew = math.log(b[key]["sec"] / a[key]["sec"]) / math.log(ratio)
        es = math.log(
            max(b[key]["shuffle_write_mb"], 0.1) / max(a[key]["shuffle_write_mb"], 0.1)
        ) / math.log(ratio)
        print(
            f"{key}: {a[key]['sec']}s -> {b[key]['sec']}s (exp {ew:.2f}); "
            f"shuffle {a[key]['shuffle_write_mb']} -> {b[key]['shuffle_write_mb']} MB "
            f"(exp {es:.2f}); rows {a[key]['rows']} -> {b[key]['rows']}"
        )


if __name__ == "__main__":
    main()
