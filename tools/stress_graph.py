"""Scaling soak for the graph family (q73/q105/q158 operators): min-label
connected components, star-contraction CC, and exact-decimal PageRank at
1x/10x (r6 — iterative operators are where hidden quadratics and
round-count blowups live, and the family had only gate-scale evidence).

Corpus: synthetic dup-graph with CONSTANT component structure — nodes in
groups of 20, each group wired as a ring plus one deterministic chord per
node (~2 edges/node, diameter <= 10), all derived from xxhash64(id). With
component size fixed, min-label CC needs a constant number of rounds and
every per-round join is linear in edges, so wall/shuffle exponents near
1.0 are the pass bar. The component count N/20 rides along as an at-scale
CORRECTNESS probe (a wrong fixed point would change it).

Usage: python tools/stress_graph.py [big_nodes]  (~5-10 min; with the
r7 big point at its default 50M, ~30-40 min and needs
SPARK_GRAFT_DRIVER_MEM=48g)

r7 (verdict item 6): a THIRD scale point for the CC variants — default
50,000,000 nodes, the largest that fits this sandbox's free-disk shuffle
budget (star CC wrote 7.0 GB at 10M; linear scaling projects ~70 GB at
100M vs ~66 GB free — so 50M ≈ 35 GB is the measured ceiling). Pass 0 to
skip the big point (the original 1x/10x panel).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress_soak import measure  # noqa: E402

GROUP = 20
SCALES = (1_000_000, 10_000_000)  # nodes


def gen_edges(spark, n: int):
    from pyspark.sql import functions as F

    ids = spark.range(n)
    grp = (F.col("id") / GROUP).cast("long")
    start = grp * GROUP
    ring = ids.select(
        F.col("id").alias("src"),
        (start + (F.col("id") - start + 1) % GROUP).alias("dst"),
    )
    chord = ids.select(
        F.col("id").alias("src"),
        (start + F.pmod(F.xxhash64("id"), F.lit(GROUP))).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return ring.union(chord)


def main() -> None:
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.graph import (
        connected_components,
        connected_components_star,
        pagerank,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark(
        "stress-graph",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for n in SCALES:
        label = f"{n // 1_000_000}M nodes"
        edges = gen_edges(spark, n).localCheckpoint()

        def cc():
            out = connected_components(edges)
            agg = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("comp").alias("comps"),
            ).collect()[0]
            return {"rows": agg["n"], "components": agg["comps"]}

        def cc_star():
            out = connected_components_star(edges)
            agg = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("comp").alias("comps"),
            ).collect()[0]
            return {"rows": agg["n"], "components": agg["comps"]}

        def pr():
            out = pagerank(edges, n_iter=5)
            agg = out.agg(
                F.count(F.lit(1)).alias("n"), F.sum("pr").alias("mass")
            ).collect()[0]
            return {"rows": agg["n"], "mass": float(agg["mass"])}

        results[n] = {
            "cc": measure(spark, f"min-label CC {label}", cc),
            "cc_star": measure(spark, f"star-contraction CC {label}", cc_star),
            "pagerank": measure(spark, f"pagerank x5 {label}", pr),
        }
        exp_comps = n // GROUP
        for key in ("cc", "cc_star"):
            got = results[n][key]["components"]
            assert got == exp_comps, (key, n, got, exp_comps)
        print(f"  components == {exp_comps} on both CC variants (correct)")

    big = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    if big:
        label = f"{big // 1_000_000}M nodes"
        edges = gen_edges(spark, big).localCheckpoint()

        def cc_big():
            out = connected_components(edges)
            agg = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("comp").alias("comps"),
            ).collect()[0]
            return {"rows": agg["n"], "components": agg["comps"]}

        def cc_star_big():
            out = connected_components_star(edges)
            agg = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("comp").alias("comps"),
            ).collect()[0]
            return {"rows": agg["n"], "components": agg["comps"]}

        results[big] = {
            "cc": measure(spark, f"min-label CC {label}", cc_big),
            "cc_star": measure(spark, f"star-contraction CC {label}", cc_star_big),
        }
        for key in ("cc", "cc_star"):
            got = results[big][key]["components"]
            assert got == big // GROUP, (key, big, got, big // GROUP)
        print(f"  components == {big // GROUP} on both CC variants (correct)")

    a, b = results[SCALES[0]], results[SCALES[1]]
    ratio = SCALES[1] / SCALES[0]
    print("\n=== scaling exponents (wall / shuffle-write), 1x -> 10x ===")
    for key in ("cc", "cc_star", "pagerank"):
        ew = math.log(b[key]["sec"] / a[key]["sec"]) / math.log(ratio)
        es = math.log(
            max(b[key]["shuffle_write_mb"], 0.1) / max(a[key]["shuffle_write_mb"], 0.1)
        ) / math.log(ratio)
        print(
            f"{key}: {a[key]['sec']}s -> {b[key]['sec']}s (exp {ew:.2f}); "
            f"shuffle {a[key]['shuffle_write_mb']} -> {b[key]['shuffle_write_mb']} MB "
            f"(exp {es:.2f})"
        )
    if big:
        c = results[big]
        r2 = big / SCALES[1]
        print(f"\n=== second decade, 10M -> {big // 1_000_000}M ===")
        for key in ("cc", "cc_star"):
            ew = math.log(c[key]["sec"] / b[key]["sec"]) / math.log(r2)
            es = math.log(
                max(c[key]["shuffle_write_mb"], 0.1)
                / max(b[key]["shuffle_write_mb"], 0.1)
            ) / math.log(r2)
            print(
                f"{key}: {b[key]['sec']}s -> {c[key]['sec']}s (exp {ew:.2f}); "
                f"shuffle {b[key]['shuffle_write_mb']} -> {c[key]['shuffle_write_mb']} MB "
                f"(exp {es:.2f})"
            )


if __name__ == "__main__":
    main()
