"""Follow-up probes for the 10x soak (r5):

1. q163 organic midpoint (shards=63, ~3.15x) — disambiguates the
   measured 1x->10x shuffle-write exponent 1.82: a TRUE superlinear
   candidate relation keeps the exponent on both segments, while a
   broadcast->sort-merge-join STEP (a small side crossing the 10 MB
   autoBroadcast threshold between scales) shows up as one segment
   near-linear and the other absorbing the step.
2. q139 physical-plan audit at x1 — the soak reads 0.0 MB shuffle for
   the span-dedup batch at BOTH scales (with the listener-bus drain in
   place), so either every join in the plan is broadcast-hash or the
   measurement is wrong; count Exchange/BroadcastExchange nodes to tell.

Usage: python tools/soak_followup.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_stress import build  # noqa: E402
from stress_soak import measure  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak"

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
        QUERIES,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark(
        "soak-followup",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    org3 = os.path.join(work, "org3")
    if not os.path.exists(os.path.join(org3, "documents.parquet")):
        nd, _ = build(sf_dir, org3, copies=1, shards=63)
        print(f"built {org3}: {nd} docs (organic 3.15x)")

    def q163():
        df = QUERIES["q163_jaccard_prefix_join"](spark, org3)
        return {"rows": df.count()}

    row = measure(spark, "q163 prefix-join organic 3.15x", q163)
    print("MIDPOINT", row)

    x1 = os.path.join(work, "x1")
    plan = QUERIES["q139_incremental_span_dedup"](spark, x1)._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")
    n_bx = plan.count("BroadcastExchange")
    print(f"q139 x1 executed plan: {n_ex} shuffle Exchange, {n_bx} BroadcastExchange")
    import re

    for line in plan.splitlines():
        if re.search(r"Exchange", line):
            print("  ", line.strip()[:140])


if __name__ == "__main__":
    main()
