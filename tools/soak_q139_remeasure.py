"""Re-measure the q139 soak rows with join-elimination-proof forcing
(see stress_soak.count_rows) at 1x and 10x on the already-built replica
corpora — the first soak pass timed only the gram build because
``count()`` let Catalyst drop the left-join tail and with it the whole
dup-detection subtree.

Usage: python tools/soak_q139_remeasure.py [workdir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stress_soak import force_full, measure  # noqa: E402


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak"

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
        QUERIES,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark(
        "soak-q139", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = {}
    for mult in (1, 10):
        corpus = os.path.join(work, f"x{mult}")

        def thunk():
            df = QUERIES["q139_incremental_span_dedup"](spark, corpus)
            r = force_full(df, F.sum("n_kept").alias("kept"))
            return {"rows": r["n"], "kept_tokens": int(r["kept"])}

        rows[mult] = measure(spark, f"q139 span-dedup FORCED {mult}x", thunk)

    a, b = rows[1], rows[10]
    ew = math.log(b["sec"] / a["sec"]) / math.log(10)
    es = math.log(
        max(b["shuffle_write_mb"], 0.1) / max(a["shuffle_write_mb"], 0.1)
    ) / math.log(10)
    print(
        f"q139 forced: {a['sec']}s -> {b['sec']}s (exp {ew:.2f}); shuffle "
        f"{a['shuffle_write_mb']} -> {b['shuffle_write_mb']} MB (exp {es:.2f})"
    )


if __name__ == "__main__":
    main()
