"""Batch-assembly soak: q253 sequence packing and q254 mixture sampling
at corpus-growth scale points (the r5 shard-growth design: org1 = 100k
docs, org10 = 1M docs — shingle/text structure per shard identical, so
wall/byte exponents read corpus scaling, not content drift).

Phases per scale point (measure/force discipline from stress_soak):

* ``packing``      — the gated shape: NSHARDS=8 window prefix-sums.
* ``packing_wide`` — the deployment lever: nshards scaled with the
  corpus (8 * mult), the way a cluster run sets shards ~ worker count.
  Contrast with ``packing`` shows whether per-shard sort depth (rows
  per shard grows linearly at fixed shards) or shard fan-out dominates.
* ``mixture``      — q254's two-scan rate derivation + realization.

Usage: python tools/stress_packing.py [sf_dir] [workdir] [mults_csv]
       (defaults sf0.1, /tmp/soak, "1,10")
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_stress import build  # noqa: E402
from stress_soak import force_full, measure  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak"
    mults = (
        tuple(int(m) for m in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else (1, 10)
    )

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        mixture_kept,
        mixture_summary,
        packing_manifest,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import (
        get_spark,
    )

    spark = get_spark(
        "stress-packing", extra_conf={"spark.ui.enabled": "true"}
    )
    rows = []
    for mult in mults:
        tag = f"org{mult}"
        out = os.path.join(work, f"stress_{tag}")
        if not os.path.exists(os.path.join(out, "documents.parquet")):
            build(sf_dir, out, copies=20, shards=mult)
        docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
        n = docs.count()
        print(f"{tag}: {n} docs")

        r = measure(
            spark,
            f"{tag}_packing",
            lambda: dict(
                force_full(packing_manifest(docs.select("doc_id", "text")))
                .asDict()
            ),
        )
        rows.append({**r, "mult": mult, "n_docs": n})

        r = measure(
            spark,
            f"{tag}_packing_wide",
            lambda: dict(
                force_full(
                    packing_manifest(
                        docs.select("doc_id", "text"), nshards=8 * mult
                    )
                ).asDict()
            ),
        )
        rows.append({**r, "mult": mult, "n_docs": n})

        r = measure(
            spark,
            f"{tag}_mixture",
            lambda: dict(
                force_full(
                    mixture_summary(docs.select("doc_id", "source", "text"))
                ).asDict()
            ),
        )
        rows.append({**r, "mult": mult, "n_docs": n})

        # q257 composed mix -> pack: the packing window over the SAMPLED,
        # source-skewed set. The claim under soak: the shuffle still
        # carries per-doc metadata only (~bytes/doc constant, never text).
        kept = mixture_kept(docs.select("doc_id", "source", "text")).select(
            "doc_id", "text"
        )
        n_kept = kept.count()
        r = measure(
            spark,
            f"{tag}_mix_pack",
            lambda: dict(force_full(packing_manifest(kept)).asDict()),
        )
        rows.append(
            {
                **r,
                "mult": mult,
                "n_docs": n,
                "n_kept": n_kept,
                "shuffle_bytes_per_kept_doc": round(
                    r.get("shuffle_write_mb", 0.0) * 1e6 / max(n_kept, 1), 2
                ),
            }
        )

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
