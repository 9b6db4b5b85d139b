"""Stress-scale measurements for the q211-q220 evaluation surface on
the /tmp/stress corpus (100k docs / 40k vectors, tools/build_stress.py).

Measures, for SCALE_NOTES.md:
* q211 probe AUC + q218 conformal sets at 40k vectors (8 GD passes +
  rank machinery — the fit dominates; both heads share it)
* q215 Zipf fit + q219 PSI at 100k docs (one-scan linear heads)
* q216 anisotropy at 40k vectors — the O(n·d) identity vs the
  1.6e9-pair relation it replaces
* q213 margin mining at growing bounded alignment batches (A in
  {1k, 2k, 4k} x the full ~8k B side) — measures the quadratic wall of
  the exact cross directly, the data behind the docstring's "swap in
  ANN candidates at scale" clause (a 64M-pair full cross is exactly
  the regime the exact path is NOT for; at ~10 min wall it proves the
  point without a soak)
* q220 MMR: distributed candidate generation over 40k vectors + the
  bounded driver greedy

Usage: python tools/stress_evalmetrics.py [/tmp/stress]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, *a):
    t0 = time.time()
    out = fn(*a)
    return out, time.time() - t0


def main() -> None:
    stress = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

    spark = get_spark("stress-evalmetrics")
    spark.sparkContext.setLogLevel("ERROR")

    n_vec = spark.read.parquet(f"{stress}/embeddings.parquet").count()
    n_doc = spark.read.parquet(f"{stress}/documents.parquet").count()
    print(f"corpus: {n_doc} docs / {n_vec} vectors")

    rows, dt = t(lambda: QUERIES["q211_probe_auc"](spark, stress).collect())
    r = rows[0]
    print(f"q211 probe-auc {n_vec} vecs: {dt:.2f}s  auc={r['auc']}  "
          f"n_pos={r['n_pos']} n_neg={r['n_neg']}")

    rows, dt = t(lambda: QUERIES["q218_conformal_probe_sets"](spark, stress).collect())
    wide = sum(1 for x in rows if x["set_size"] == 2)
    print(f"q218 conformal {n_vec} vecs: {dt:.2f}s  held_out={len(rows)}  "
          f"both_labels={wide}  qhat6={rows[0]['qhat6']}")

    rows, dt = t(lambda: QUERIES["q215_zipf_fit"](spark, stress).collect())
    r = rows[0]
    print(f"q215 zipf {n_doc} docs: {dt:.2f}s  n_terms={r['n_terms']}  "
          f"slope={r['zipf_slope']}")

    rows, dt = t(lambda: QUERIES["q219_source_psi"](spark, stress).collect())
    mx = max(x["psi"] for x in rows)
    print(f"q219 psi {n_doc} docs: {dt:.2f}s  sources={len(rows)}  max_psi={mx}")

    rows, dt = t(lambda: QUERIES["q216_embedding_anisotropy"](spark, stress).collect())
    pairs = sum(x["n_vecs"] * (x["n_vecs"] - 1) for x in rows)
    print(f"q216 anisotropy {n_vec} vecs: {dt:.2f}s  labels={len(rows)}  "
          f"implicit_pairs={pairs}  "
          f"cos_range=[{min(x['mean_pairwise_cos'] for x in rows)}, "
          f"{max(x['mean_pairwise_cos'] for x in rows)}]")

    # margin mining: bounded batch A vs full B, batch doubling to show
    # the exact-cross quadratic wall (the ANN-candidate clause's data)
    import pyspark.sql.functions as F
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.vectors import norm
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.evalmetrics import _margin_mutual_pairs

    emb = spark.read.parquet(f"{stress}/embeddings.parquet").select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    b = emb.where(F.col("label") >= 8).select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("be"),
        F.col("nrm").alias("bnrm"),
    )
    nb = b.count()
    for mod in (8, 4, 2):
        a = emb.where((F.col("label") <= 1) & (F.col("vec_id") % mod == 0)).select(
            F.col("vec_id").alias("va"), F.col("embedding").alias("ae"),
            F.col("nrm").alias("anrm"),
        )
        na = a.count()
        rows, dt = t(lambda: _margin_mutual_pairs(a, b).collect())
        print(f"q213 margin-mining A={na} B={nb} ({na * nb} pairs): {dt:.2f}s  "
              f"mutual_pairs={len(rows)}")

    rows, dt = t(lambda: QUERIES["q220_mmr_rerank"](spark, stress).collect())
    print(f"q220 mmr {n_vec} vecs: {dt:.2f}s  picks={len(rows)}  "
          f"top_rel={rows[0]['rel']}")


if __name__ == "__main__":
    main()
