"""Benchmark harness (driver contract): runs every registered query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced end-to-end with a noop-format write (full execution,
no driver collect — the honest way to time a distributed plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
    QUERIES,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not session startup
    QUERIES["q01_avg_price_by_dow"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    per_query: dict[str, float] = {}
    t_suite = time.time()
    for name, fn in sorted(QUERIES.items()):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_suite, 3)

    slowest5 = dict(sorted(per_query.items(), key=lambda kv: -kv[1])[:5])
    payload = {
        # summary keys FIRST: a truncated capture still carries the
        # suite total, count, and worst offenders
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(per_query),
        "slowest5": slowest5,
        "queries": per_query,
    }
    print(json.dumps(payload))
    # the driver's BENCH_r*.json capture truncates before the q100+ tail
    # and leaves `parsed` null, so round-over-round comparison needs a
    # committed artifact: write the full payload (summary keys first,
    # per-query map included) for each round to commit (r3 verdict item 8)
    root = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(root, "BENCH_SUMMARY.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=False)
        f.write("\n")
    # ALSO archive per round (r4 verdict item 8: r4's summary overwrote
    # r3's, losing the per-query deltas) — round = newest gated round + 1,
    # read from the committed CORRECTNESS_r*.json history
    try:
        from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.evidence import (
            latest_gated_round,
        )

        rnd = latest_gated_round(root) + 1
        with open(os.path.join(root, f"BENCH_SUMMARY_r{rnd}.json"), "w") as f:
            json.dump(payload, f, indent=1, sort_keys=False)
            f.write("\n")
    except Exception as e:  # noqa: BLE001 — archival must never fail the bench
        print(f"bench archive skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
