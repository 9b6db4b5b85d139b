"""ANN recall@5 measurements on the stress corpus (SCALE_NOTES).

Measures each ANN path against the exact BLAS top-5 (brute_force_topk
_vectorized, recall 1.0 by construction) on the tools/build_stress.py
corpus: IVF (KMeans cells, nprobe sweep), PQ/ADC raw top-5, ADC@50 ->
exact re-rank, and the composed IVF-PQ stack (q125's operator).

The ADC prune for the re-rank row runs through the vectorized kernel
(pq_adc_topk_vectorized) — bit-identical scores to the fold formulation
(asserted row-equal in tests), measured-fast; the q118 fold row exists as
the oracle vehicle, not the deployment path.

Usage: python tools/stress_recall.py [stress_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.similarity import (  # noqa: E402
    brute_force_topk_vectorized,
    ivf_pq_rerank_topk,
    ivf_pq_rerank_topk_vectorized,
    ivf_topk,
    ivf_topk_vectorized,
    kmeans_fit,
    pq_adc_topk_vectorized,
    pq_fit,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.vectors import (  # noqa: E402
    dot,
    norm,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark  # noqa: E402
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.readers import (  # noqa: E402
    read_parquet_table,
)


def recall_at_5(exact: dict[int, set[int]], got_rows) -> float:
    got: dict[int, set[int]] = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    return hits / (5 * len(exact))


def exact_rerank(corpus, cand, queries, k: int = 5):
    """Exact cosine re-rank of (query_id, neighbor_id) candidates."""
    from pyspark.sql.window import Window

    withq = cand.join(F.broadcast(queries.select("query_id", "qe")), "query_id")
    ne = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    pairs = ne.join(F.broadcast(withq), "neighbor_id")
    cos = F.round(dot(F.col("qe"), F.col("ne")) / (norm(F.col("qe")) * norm(F.col("ne"))), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_ivf = "--skip-ivf" in sys.argv  # the fold-IVF sweep is the slow part
    stress = args[0] if args else "/tmp/stress"
    spark = get_spark("stress-recall")
    emb = read_parquet_table(spark, stress, "embeddings").select("vec_id", "embedding")
    emb = emb.localCheckpoint()
    q = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    nq = q.count()
    print(f"corpus={emb.count()} queries={nq}")

    t0 = time.time()
    exact_rows = brute_force_topk_vectorized(emb, q, k=5).collect()
    t_exact = time.time() - t0
    exact: dict[int, set[int]] = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    print(f"exact BLAS top-5: {t_exact:.1f} s (baseline, recall 1.000)")

    cents = kmeans_fit(emb, k=16, max_iter=8)
    if not skip_ivf:
        for nprobe in (1, 2, 3):
            t0 = time.time()
            rows = ivf_topk(emb, q, cents, k=5, nprobe=nprobe).collect()
            dt = time.time() - t0
            print(f"IVF k=16 nprobe={nprobe}: {dt:.1f} s recall@5={recall_at_5(exact, rows):.3f}")

    for nprobe in (1, 3):
        t0 = time.time()
        rows = ivf_topk_vectorized(emb, q, cents, k=5, nprobe=nprobe).collect()
        dt = time.time() - t0
        print(f"IVF vectorized kernel (q130 twin) nprobe={nprobe}: {dt:.1f} s "
              f"recall@5={recall_at_5(exact, rows):.3f}")

    books = pq_fit(emb, m=4, ksub=8, max_iter=4)
    t0 = time.time()
    rows = pq_adc_topk_vectorized(emb, q, books, k=5).collect()
    dt = time.time() - t0
    print(f"PQ ADC top-5 (vectorized kernel): {dt:.1f} s recall@5={recall_at_5(exact, rows):.3f}")

    t0 = time.time()
    cand = pq_adc_topk_vectorized(emb, q, books, k=50).select("query_id", "neighbor_id")
    rows = exact_rerank(emb, cand, q, k=5).collect()
    dt = time.time() - t0
    print(f"PQ ADC@50 -> exact re-rank: {dt:.1f} s recall@5={recall_at_5(exact, rows):.3f}")

    if not skip_ivf:
        t0 = time.time()
        rows = ivf_pq_rerank_topk(emb, q, cents, books, k=5, nprobe=3, rerank_from=50).collect()
        dt = time.time() - t0
        print(f"IVF-PQ (nprobe=3, ADC@50 -> re-rank, q125 fold): {dt:.1f} s "
              f"recall@5={recall_at_5(exact, rows):.3f}")

    t0 = time.time()
    rows = ivf_pq_rerank_topk_vectorized(
        emb, q, cents, books, k=5, nprobe=3, rerank_from=50
    ).collect()
    dt = time.time() - t0
    print(f"IVF-PQ vectorized kernel (q129 twin): {dt:.1f} s "
          f"recall@5={recall_at_5(exact, rows):.3f}")


if __name__ == "__main__":
    main()
