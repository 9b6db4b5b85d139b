"""10x scale soak for the late-r5 LM curation heads: q206 Kneser-Ney
scoring and q209 perplexity buckets (the distributed-ntile corpus split).

Reuses the organic corpus family from tools/stress_soak (base sf0.1 docs
sharded with per-shard token prefixes, no planted replicas): 100k docs at
1x, 1M docs at 10x. The KN pipeline is one corpus pass (pair explode +
bigram count) followed by keyed joins against vocab-BOUNDED model tables,
and q209 adds a rank whose serial component touches only distinct coarse
score buckets — so both should scale ~linearly in wall and shuffle;
``log(t_10x / t_1x) / log(10)`` near 1.0 confirms it, 2.0 would expose a
hidden quadratic (e.g. the vocabulary growing with the corpus faster than
the model joins can bound).

Timing forces the FULL plan with agg(count, bit_xor(xxhash64(*cols)))
(a bare count() lets Catalyst eliminate join subtrees, see stress_soak).
Shuffle bytes come from the Spark UI REST API after a 3 s listener-bus
drain.

Usage: python tools/stress_lm.py [workdir]   (default /tmp/soak;
corpora are built if absent; ~5-15 min; SPARK_GRAFT_DRIVER_MEM=48g
recommended for the 10x point)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_stress import build  # noqa: E402
from stress_soak import force_full, measure  # noqa: E402


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak"
    sf_dir = "/root/testdata/sf0.1"

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
        QUERIES,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark(
        "stress-lm",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def forced(name: str, d: str):
        def thunk():
            return {"rows": force_full(QUERIES[name](spark, d))["n"]}

        return thunk

    results: dict[int, dict[str, dict]] = {}
    for mult in (1, 10):
        organic = os.path.join(work, f"org{mult}")
        if not os.path.exists(os.path.join(organic, "documents.parquet")):
            t0 = time.time()
            nd, _ = build(sf_dir, organic, copies=1, shards=20 * mult)
            print(f"built {organic}: {nd} docs (organic) [{time.time()-t0:.0f}s]")
        print(f"--- scale {mult}x ---")
        rows = {}
        rows["q206"] = measure(
            spark, f"q206 kneser-ney {mult}x", forced("q206_kneser_ney_lm_score", organic)
        )
        rows["q209"] = measure(
            spark, f"q209 ppl-buckets {mult}x", forced("q209_perplexity_buckets", organic)
        )
        results[mult] = rows

    print("\n=== scaling exponents (wall / shuffle-write), 1x -> 10x ===")
    for key in ("q206", "q209"):
        a, b = results[1][key], results[10][key]
        ew = math.log(b["sec"] / a["sec"]) / math.log(10)
        es = (
            math.log(max(b["shuffle_write_mb"], 0.1) / max(a["shuffle_write_mb"], 0.1))
            / math.log(10)
        )
        print(
            f"{key}: {a['sec']}s -> {b['sec']}s (exp {ew:.2f}); shuffle "
            f"{a['shuffle_write_mb']} -> {b['shuffle_write_mb']} MB (exp {es:.2f}); "
            f"rows {a['rows']} -> {b['rows']}"
        )


if __name__ == "__main__":
    main()
