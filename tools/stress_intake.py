"""Stress measurements for the late-r5 intake (q226-q229) and
experimentation (q230-q232) heads, for SCALE_NOTES.md.

Two corpora, matched to each head's deployment regime:

* q163/q226 run on the ORGANIC 100k-doc soak corpus (/tmp/soak/org1,
  built by tools/stress_soak.py) — the prefix join's deployment regime.
  The replica corpus (/tmp/stress documents) is q163's DOCUMENTED
  degradation regime (every doc shares ~all shingles with its 19
  replicas; see SCALE_NOTES "10x soak") and would measure the wrong
  thing. The axis here: the yield sweep must cost ~the q163 prefix join
  it wraps (the 5-threshold BNLJ rides the pair relation, never 5
  dedup runs).
* q227-q229 on /tmp/stress (100k docs / 20x orders replicas) — single-
  scan explode profiles: wall should track bytes scanned times explode
  width.
* q230-q232 on the 20x events replicas — one data-scale hash agg each;
  everything downstream is bounded.

Usage: SPARK_GRAFT_DRIVER_MEM=16g python tools/stress_intake.py \
           [stress_dir] [organic_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress_soak import force_full  # noqa: E402


def main() -> None:
    stress_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
    organic_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak/org1"
    for d, ts in ((stress_dir, ("documents", "events", "orders")),
                  (organic_dir, ("documents",))):
        for t in ts:
            path = f"{d}/{t}.parquet"
            if not os.path.exists(path):
                raise SystemExit(
                    f"{path} missing - run tools/build_stress.py, "
                    "tools/stress_lakehouse.py and tools/stress_soak.py first"
                )

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark("stress-intake")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, d: str) -> None:
        t0 = time.time()
        n = force_full(QUERIES[name](spark, d))["n"]
        print(f"{name}: {time.time() - t0:.2f}s  rows={n}")

    # baseline: the prefix join q226 wraps, so the sweep's overhead is
    # separable from the pair generation it shares with q163
    run("q163_jaccard_prefix_join", organic_dir)
    run("q226_dedup_yield_curve", organic_dir)

    for name in (
        "q227_tokenizer_fertility",
        "q228_functional_dependency_audit",
        "q229_candidate_key_profile",
        "q230_churn_survival_km",
        "q231_cuped_readout",
        "q232_conversion_ztest",
        "q233_embedding_hubness",
        "q234_volume_anomaly_flags",
    ):
        run(name, stress_dir)

    spark.stop()


if __name__ == "__main__":
    main()
