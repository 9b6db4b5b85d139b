"""Stress measurements for the late-r4 families (SCALE_NOTES evidence):
lakehouse maintenance (q149/q150/q152), product analytics (q155/q156),
sketch merge (q159), retrieval/collocation (q151/q157), MinHash
calibration (q153), dup-graph PageRank (q158), z-order layout (q164),
and the compaction planner (q166).

Extends /tmp/stress (tools/build_stress.py: 100k docs with planted
20-clique dup groups, 40k embeddings) with 20x replicas of the sf0.1
events/orders tables so the event- and fact-keyed operators run at the
same replication factor:

* events: 20 copies, event_id shifted per copy, user_id/ts kept — every
  user's history deepens 20x (the funnel/SCD2/cohort stress axis).
* orders: 20 copies, o_orderkey shifted by copy * 10^7 — the %7/%11
  MERGE change-batch patterns keep firing in every copy.

Usage: python tools/stress_lakehouse.py [stress_dir] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress_soak import force_full  # noqa: E402

COPIES = 20
KEY_SHIFT = 10_000_000


def ensure_tables(stress_dir: str, sf_dir: str) -> None:
    con = duckdb.connect()
    ev = f"{stress_dir}/events.parquet"
    if not os.path.exists(ev):
        con.execute(
            f"""COPY (
              SELECT e.event_id + c.i * {KEY_SHIFT} AS event_id,
                     e.ts, e.user_id, e.event_type, e.value, e.props
              FROM read_parquet('{sf_dir}/events.parquet') e
              CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
            ) TO '{ev}' (FORMAT PARQUET)"""
        )
    o = f"{stress_dir}/orders.parquet"
    if not os.path.exists(o):
        con.execute(
            f"""COPY (
              SELECT o.o_orderkey + c.i * {KEY_SHIFT} AS o_orderkey,
                     o.o_custkey, o.o_orderstatus, o.o_totalprice,
                     o.o_orderdate, o.o_orderpriority
              FROM read_parquet('{sf_dir}/orders.parquet') o
              CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
            ) TO '{o}' (FORMAT PARQUET)"""
        )


def main() -> None:
    stress_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    ensure_tables(stress_dir, sf_dir)

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

    spark = get_spark("stress-lakehouse")
    spark.sparkContext.setLogLevel("ERROR")

    names = [
        "q149_merge_upsert",
        "q150_scd2_history",
        "q152_value_trend_ols",
        "q155_funnel_conversion",
        "q156_retention_cohorts",
        "q159_kmv_merge",
        "q151_bm25_topk",
        "q157_token_pmi_pairs",
        "q153_minhash_jaccard_estimate",
        "q158_dup_graph_pagerank",
        "q164_zorder_layout",
        "q166_compaction_plan",
    ]
    for name in names:
        t0 = time.time()
        df = QUERIES[name](spark, stress_dir)
        # force_full, not a bare count: count() lets Catalyst eliminate
        # an outer-join-vs-unique-keys tail (q149's matched arm is one)
        n = force_full(df)["n"]
        dt = time.time() - t0
        extra = ""
        if name == "q153_minhash_jaccard_estimate":
            row = df.selectExpr(
                "round(avg(abs(est_jaccard - exact_jaccard)), 4) AS mae",
                "round(max(abs(est_jaccard - exact_jaccard)), 4) AS maxerr",
            ).first()
            extra = f"  mae={row['mae']} max_abs_err={row['maxerr']}"
        if name == "q159_kmv_merge":
            bad = df.where("NOT merge_lossless").count()
            extra = f"  lossless_violations={bad}"
        if name == "q158_dup_graph_pagerank":
            row = df.selectExpr(
                "round(max(pagerank), 3) AS mx", "round(min(pagerank), 3) AS mn"
            ).first()
            extra = f"  pr_range=[{row['mn']}, {row['mx']}]"
        if name == "q164_zorder_layout":
            row = df.selectExpr(
                "round(sum(CASE WHEN prunable THEN n_rows ELSE 0 END) / sum(n_rows), 3) AS frac"
            ).first()
            extra = f"  prunable_row_frac={row['frac']}"
        if name == "q166_compaction_plan":
            row = df.selectExpr("count(DISTINCT bin) AS nb").first()
            extra = f"  bins={row['nb']}"
        print(f"{name}: {n} rows in {dt:.1f}s{extra}", flush=True)


if __name__ == "__main__":
    main()
