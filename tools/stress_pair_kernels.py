"""Third decade for the text pair kernels (r7 verdict item 3): the
graph family has 1M/10M/50M-node evidence; the PPJoin and LSH-verified
pair kernels stopped at the 100k -> 1M-doc pair (exponents 1.01/1.03).
This tool measures both kernels per organic corpus point and adds the
largest disk-feasible third point.

Feasibility is decided from MEASURED bytes, not hope: after the 1M-doc
point, each kernel's next-decade shuffle is extrapolated at exponent
1.05; a kernel only runs at a larger point if that projection fits the
shuffle budget (default 40 GB — the graph soak's 36 GB lesson plus
headroom under this box's ~66 GB free). A skipped point prints the
projection arithmetic so the ceiling is a documented number, not an
omission.

Corpora: the ORGANIC family (no replicas — q163's deployment regime;
the replica family is the LSH path's planted-dup showcase but degrades
prefix filtering by design, see stress_soak). org{N} = sf0.1 docs
sharded 20*N ways with per-shard token prefixes: cross-shard Jaccard
~0, so dup structure per shard is constant and exponents are clean.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/stress_pair_kernels.py \
    [sf_dir] [workdir] [mults_csv] [kernel]
    (defaults /root/testdata/sf0.1, /tmp/soak, "1,10,100", both kernels;
    e.g. ``... /root/testdata/sf0.1 /tmp/soak 10,30 lsh_verified`` runs
    only the LSH kernel at org10/org30 — the follow-up shape when the
    full-decade point exceeds the byte budget but a mid-decade fits)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_stress import build  # noqa: E402
from stress_soak import force_full, measure  # noqa: E402

#: per-kernel shuffle-WRITE budget for attempting the next point (MB)
BUDGET_MB = 40_000
#: conservative scaling exponent for the projection
PROJ_EXP = 1.05


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak"
    mults = (
        tuple(int(m) for m in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else (1, 10, 100)
    )
    only_kernel = sys.argv[4] if len(sys.argv) > 4 else None

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        lsh_verified_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark(
        "stress-pair-kernels",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",
            "spark.ui.retainedStages": "20000",
            "spark.ui.retainedJobs": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    kernels = {
        "ppjoin": lambda d: prefix_filter_jaccard_pairs(d, threshold=0.5),
        "lsh_verified": lambda d: lsh_verified_jaccard_pairs(d, threshold=0.5),
    }
    if only_kernel is not None:
        kernels = {only_kernel: kernels[only_kernel]}
    last: dict[str, dict] = {}  # kernel -> last measured row (+mult)
    skipped: dict[str, str] = {}
    results: list[tuple[str, int, dict]] = []

    for mult in mults:
        live = [k for k in kernels if k not in skipped]
        if not live:
            break
        # decide projections BEFORE paying the corpus build
        attempt = []
        for kname in live:
            prev = last.get(kname)
            if prev is not None:
                proj = prev["shuffle_write_mb"] * (mult / prev["mult"]) ** PROJ_EXP
                if proj > BUDGET_MB:
                    skipped[kname] = (
                        f"{kname} at org{mult}: projected shuffle write "
                        f"{proj/1000:.0f} GB (= {prev['shuffle_write_mb']:.0f} MB "
                        f"at org{prev['mult']} x {mult/prev['mult']:.0f}^{PROJ_EXP}) "
                        f"> {BUDGET_MB/1000:.0f} GB budget — disk ceiling, skipped"
                    )
                    print(f"  SKIP {skipped[kname]}")
                    continue
            attempt.append(kname)
        if not attempt:
            continue
        corpus = os.path.join(work, f"org{mult}")
        if not os.path.exists(os.path.join(corpus, "documents.parquet")):
            t0 = time.time()
            nd, _ = build(sf_dir, corpus, copies=1, shards=20 * mult)
            print(f"built {corpus}: {nd} docs [{time.time()-t0:.0f}s]")
        docs = (
            spark.read.parquet(os.path.join(corpus, "documents.parquet"))
            .select("doc_id", tokens("text").alias("ts"))
        )
        for kname in attempt:
            row = measure(
                spark,
                f"{kname} org{mult}",
                lambda k=kname: {"n": force_full(kernels[k](docs))["n"]},
            )
            row["mult"] = mult
            last[kname] = row
            results.append((kname, mult, row))

    print("== scaling exponents (adjacent measured points) ==")
    by_kernel: dict[str, list[tuple[int, dict]]] = {}
    for kname, mult, row in results:
        by_kernel.setdefault(kname, []).append((mult, row))
    for kname, pts in by_kernel.items():
        for (m0, a), (m1, b) in zip(pts, pts[1:]):
            span = math.log(m1 / m0)

            def ex(key):
                return round(math.log(max(b[key], 1e-3) / max(a[key], 1e-3)) / span, 2)

            print(
                f"  {kname} org{m0}->org{m1}: wall {ex('sec')}  "
                f"write {ex('shuffle_write_mb')}  read {ex('shuffle_read_mb')}"
            )
    for msg in skipped.values():
        print(f"  CEILING {msg}")


if __name__ == "__main__":
    main()
