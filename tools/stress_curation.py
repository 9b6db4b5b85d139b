"""Reproduce the SCALE_NOTES 'Curation heads' measurements: q144 DSIR
weights, q145 logistic probe, q146/q147 SemDeDup (fold vs kernel cell
assignment) on the 20x stress corpus.

Usage: python tools/stress_curation.py [stress_dir]   # default /tmp/stress
(build the corpus first: python tools/build_stress.py /root/testdata/sf0.1 /tmp/stress)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    stress = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
        QUERIES,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark("stress-curation", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    for name in (
        "q144_dsir_weights",
        "q145_logreg_probe",
        "q146_semantic_dedup_cells",
        "q147_semantic_dedup_cells_vectorized",
    ):
        t0 = time.time()
        rows = QUERIES[name](spark, stress).collect()
        dt = time.time() - t0
        extra = ""
        if name == "q144_dsir_weights":
            extra = f"target-like={sum(1 for r in rows if r['dsir_logw'] > 0)}"
        elif name == "q145_logreg_probe":
            acc = sum(1 for r in rows if r["pred"] == r["label_true"]) / len(rows)
            extra = f"train-acc={acc:.4f}"
        else:
            extra = f"kept={sum(1 for r in rows if r['kept'] == 1)}"
        print(f"{name}: {len(rows)} rows {dt:.1f}s {extra}")


if __name__ == "__main__":
    main()
