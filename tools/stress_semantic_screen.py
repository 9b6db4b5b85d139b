"""q265 embedding-decon screen at scale: corpus-linear, benchmark-capped.

The screen's cost model is the whole point of its design: the benchmark
side is capped at 100 vectors BY CONSTRUCTION (``vec_id < 4700`` modulus
sample — the fixed-eval-suite shape), so the cross join is a broadcast
nested-loop whose build side never grows with the corpus. Cost is then
|corpus| x |bench| dot products computed embarrassingly parallel in the
scan stage, one map-side-combined |corpus|-row shuffle for the per-vector
max, and a |labels|-row label rollup.

This tool runs the screen over synthetic deterministic vectors at two
corpus decades and prints wall + shuffle bytes: the expectation (asserted
by eye in SCALE_NOTES, bytes mechanically) is shuffle bytes ~ |corpus| x
one (vec_id, label, max_cos) row — NOT |corpus| x |bench| — because the
per-vector max combines map-side before the exchange.

Usage: python tools/stress_semantic_screen.py [rows_csv]
       (default "100000,400000")
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stress_soak import measure  # noqa: E402


def main() -> None:
    sizes = (
        tuple(int(c) for c in sys.argv[1].split(","))
        if len(sys.argv) > 1
        else (100_000, 400_000)
    )

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
        _SEM_BENCH_CAP,
        _SEM_BENCH_MOD,
        semantic_screen,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import (
        get_spark,
    )

    spark = get_spark(
        "stress-semantic-screen", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    dim = 64
    rows = []
    for n in sizes:
        # deterministic synthetic vectors: dense, no zero norms, spread
        # across 10 labels — shape-faithful to the embeddings table
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {dim}), "
                f"i -> cast(sin(id * 97 + i * 131) + 0.2 * cos(id * 13 + i) as float))"
            ).alias("embedding"),
            (F.col("id") % 10).cast("int").alias("label"),
        )
        n_bench = emb.where(
            (F.col("vec_id") % _SEM_BENCH_MOD == 0)
            & (F.col("vec_id") < _SEM_BENCH_CAP)
        ).count()
        assert n_bench <= 100, n_bench

        def run(e=emb):
            out = semantic_screen(e).collect()
            return {
                "labels": len(out),
                "n_corpus": int(sum(r["n_corpus"] for r in out)),
                "n_bench": n_bench,
            }

        rows.append(measure(spark, f"screen_{n}", run))

    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
