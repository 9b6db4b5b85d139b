"""Stress-scale measurements for the profiling batch (q169-q183):
20x events/orders (2M / 3M rows) and the 100k-doc / 40k-vector corpus.

Measures, for SCALE_NOTES.md:
* q169 HLL: runtime + per-type relative error vs the exact column
* q176 join-size estimate: exact-vs-sampled runtime + rel_err at 20x keys
* q177 sorted-neighborhood: runtime + candidate pairs on 100k docs
  (planted dup groups), at 1-char and 2-char block keys
* q178 JL projection kernel: runtime on 40k vectors
* q182 checksum: runtime on 3M orders + replica-equality demo
* q183 rolling KMV: runtime + worst/mean accuracy at 20x events

Usage: python tools/stress_profiling.py [/tmp/stress]
(builds the events/orders replicas on first run, like stress_lakehouse)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stress_lakehouse import ensure_tables  # noqa: E402


def t(fn, *a):
    t0 = time.time()
    out = fn(*a)
    return out, time.time() - t0


def main() -> None:
    stress = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
    sf01 = "/root/testdata/sf0.1"
    ensure_tables(stress, sf01)
    for dim in ("customer", "nation", "lineitem"):
        dst = f"{stress}/{dim}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{sf01}/{dim}.parquet", dst)

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.profiling import (
        join_size_estimate_sampled,
    )

    spark = get_spark("stress-profiling")
    spark.sparkContext.setLogLevel("ERROR")

    # q169 HLL at 2M events
    rows, dt = t(lambda: QUERIES["q169_hll_distinct"](spark, stress).collect())
    errs = [abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"] for r in rows]
    print(f"q169_hll 2M events: {dt:.2f}s  max_rel_err={max(errs):.4f} "
          f"mean_rel_err={sum(errs)/len(errs):.4f}")

    # q176 at 20x: gate query (exact+est) vs estimation-only path
    r, dt_full = t(lambda: QUERIES["q176_join_size_estimate"](spark, stress).collect())
    r = r[0]
    _, dt_est = t(lambda: join_size_estimate_sampled(spark, stress).collect())
    print(f"q176 join-size 20x: exact+est {dt_full:.2f}s  est-only {dt_est:.2f}s  "
          f"exact={r['exact_pairs']}  est={r['est_pairs']}  rel_err={r['rel_err']}")

    # q177 SNM on 100k docs (planted 20-copy dup groups)
    rows, dt = t(lambda: QUERIES["q177_sorted_neighborhood"](spark, stress).collect())
    exact0 = sum(1 for x in rows if x["dist"] == 0)
    print(f"q177 snm 100k docs: {dt:.2f}s  pairs={len(rows)}  dist0_pairs={exact0}")

    # q178 JL kernel on 40k vectors
    rows, dt = t(lambda: QUERIES["q178_jl_projection"](spark, stress).collect())
    print(f"q178 jl 40k vecs: {dt:.2f}s  rows={len(rows)}")

    # q182 checksum on 3M orders (+ replica equality: same bytes, shuffled)
    rows, dt = t(lambda: QUERIES["q182_table_checksum"](spark, stress).collect())
    ck = {r["table_name"]: (r["n_rows"], r["checksum"]) for r in rows}
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * FROM read_parquet('{stress}/orders.parquet')
                  ORDER BY md5(CAST(o_orderkey AS VARCHAR)))
            TO '{stress}/orders_replica.parquet' (FORMAT PARQUET)"""
    )
    os.makedirs(f"{stress}/replica", exist_ok=True)
    for name in ("customer", "nation"):
        dst = f"{stress}/replica/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{stress}/{name}.parquet", dst)
    if not os.path.exists(f"{stress}/replica/orders.parquet"):
        os.rename(f"{stress}/orders_replica.parquet", f"{stress}/replica/orders.parquet")
    rows2, dt2 = t(lambda: QUERIES["q182_table_checksum"](spark, f"{stress}/replica").collect())
    ck2 = {r["table_name"]: (r["n_rows"], r["checksum"]) for r in rows2}
    print(f"q182 checksum 3M orders: {dt:.2f}s  replica(re-sorted) {dt2:.2f}s  "
          f"digests_equal={ck == ck2}  orders_ck={ck['orders']}")

    # q183 rolling KMV at 2M events
    rows, dt = t(lambda: QUERIES["q183_rolling_distinct_kmv"](spark, stress).collect())
    errs = [
        abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"] for r in rows if r["n_exact"]
    ]
    print(f"q183 rolling-kmv 2M events: {dt:.2f}s  days={len(rows)}  "
          f"max_rel_err={max(errs):.4f} mean_rel_err={sum(errs)/len(errs):.4f}")

    # q184 bitmap intersection at 2M events (10 type pairs)
    rows, dt = t(lambda: QUERIES["q184_bitmap_intersection"](spark, stress).collect())
    print(f"q184 bitmap 2M events: {dt:.2f}s  pairs={len(rows)}  "
          f"max_jaccard={max(r['jaccard'] for r in rows):.4f}")

    # q185 triangles over the 100k-doc SNM graph (20-cliques planted)
    rows, dt = t(lambda: QUERIES["q185_dup_graph_triangles"](spark, stress).collect())
    r = rows[0]
    print(f"q185 triangles 100k docs: {dt:.2f}s  edges={r['n_edges']}  "
          f"wedges={r['n_wedges']}  triangles={r['n_triangles']}")

    # q186 TF-IDF pairs on 100k docs (planted dup groups share vocabulary)
    rows, dt = t(lambda: QUERIES["q186_tfidf_doc_pairs"](spark, stress).collect())
    print(f"q186 tfidf-pairs 100k docs: {dt:.2f}s  pairs={len(rows)}")


if __name__ == "__main__":
    main()
