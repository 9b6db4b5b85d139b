"""Per-stage profile of one or more registry queries (r12 optimization
round, guide §1: measure first).

Runs each named query against ``$SPARK_GRAFT_SF_DIR`` with the UI status
store enabled, forces it through the noop sink, then dumps every stage
the run submitted — wall, task count, shuffle read/write, input bytes —
sorted by duration. Stage names carry the call site, which maps each
stage back to the operator that scheduled it.

Usage::

    python tools/profile_stages.py q252_composed_ingest_update [q239_...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/profile_stages.py q186_tfidf_doc_pairs
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
    QUERIES,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark


def _fetch(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "20000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the session the same way bench.py does
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
    for name in names:
        fn = builds.get(name) or QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        time.sleep(3)  # listener-bus drain
        stages = _fetch(spark, "stages")
        rows = []
        for s in stages:
            sub = s.get("submissionTime")
            if not sub:
                continue
            import datetime

            t = (
                datetime.datetime.strptime(
                    sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
                )
                .replace(tzinfo=datetime.timezone.utc)
                .timestamp()
            )
            if not (t0 <= t < t1 + 1):
                continue
            comp = s.get("completionTime")
            dur = None
            if comp:
                tc = (
                    datetime.datetime.strptime(
                        comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
                    )
                    .replace(tzinfo=datetime.timezone.utc)
                    .timestamp()
                )
                dur = tc - t
            rows.append(
                (
                    dur or 0.0,
                    s.get("stageId"),
                    s.get("numCompleteTasks", 0),
                    s.get("shuffleWriteBytes", 0) / 1e6,
                    s.get("shuffleReadBytes", 0) / 1e6,
                    s.get("inputBytes", 0) / 1e6,
                    (s.get("name") or "")[:100],
                )
            )
        rows.sort(reverse=True)
        print(f"\n=== {name}: wall {t1 - t0:.2f}s, {len(rows)} stages ===")
        print(f"{'dur_s':>7} {'stage':>6} {'tasks':>6} {'wrMB':>8} {'rdMB':>8} {'inMB':>8}  name")
        for dur, sid, ntask, wr, rd, inp, nm in rows[:40]:
            print(f"{dur:7.2f} {sid:6d} {ntask:6d} {wr:8.2f} {rd:8.2f} {inp:8.2f}  {nm}")
        tot = sum(r[0] for r in rows)
        print(f"sum of stage durations: {tot:.2f}s (wall {t1 - t0:.2f}s; gap = driver/plan/commit time)")


if __name__ == "__main__":
    main()
