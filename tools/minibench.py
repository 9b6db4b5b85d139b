"""Min-of-k wall timer for named queries/index builds — the r12 A/B
harness. This box disperses single-query walls up to 5x run-to-run
(SCALE_NOTES), so before/after claims use min-of-k in ONE session, not
one-shot suite walls.

Usage::

    python tools/minibench.py -k 3 q186_tfidf_doc_pairs q63_winnow_fingerprints
    python tools/minibench.py index:ppjoin
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
    QUERIES,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    k = 3
    if args and args[0] == "-k":
        k = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("minibench")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_avg_price_by_dow"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans import (
        dedup_index,
    )

    builds = {
        "index:ppjoin": dedup_index.dup_pairs,
        "index:cc": dedup_index.dup_components,
        "index:lsh": dedup_index.dup_pairs_lsh,
        "index:sigs": dedup_index.corpus_signatures,
    }
    out = {}
    for name in args:
        fn = builds.get(name) or QUERIES[name]
        walls = []
        for _ in range(k):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        out[name] = {"min": min(walls), "all": walls}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
