"""Similarity search over embedding columns: brute-force cosine top-k and a
random-hyperplane LSH (SimHash-for-vectors) approximate variant.

Scale design (the reason both exist):
* brute force is exact and embarrassingly parallel but O(|corpus|x|queries|);
  right when the query set is small enough to broadcast;
* LSH bucketing replaces the cross product with equi-joins on band
  signatures: corpus shuffles once by bucket key, each query probes only
  its buckets — the 100 TB path. Recall is tunable via bands/bits.

Hyperplanes are deterministic (seeded numpy, rounded to 6 decimals) and
embedded as literals into BOTH the Spark plan and the DuckDB oracle SQL, so
even the approximate variant is value-checkable across engines.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import dot, norm


def hyperplanes(n_planes: int = 16, dim: int = 64, seed: int = 0) -> list[list[float]]:
    """Deterministic LSH hyperplanes, 6-decimal rounded for stable literals."""
    rs = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in row] for row in rs.standard_normal((n_planes, dim))]


def _plane_dot(emb: Column, plane: list[float]) -> Column:
    return dot(emb, F.array(*[F.lit(x) for x in plane]))


def lsh_bands(emb: Column, planes: list[list[float]], bands: int, prefix: str = "band") -> list[Column]:
    """Pack sign-bits of plane dots into ``bands`` integer bucket ids."""
    bits_per = len(planes) // bands
    cols = []
    for b in range(bands):
        acc = F.lit(0)
        for j in range(bits_per):
            bit = (_plane_dot(emb, planes[b * bits_per + j]) > 0).cast("int")
            acc = acc + bit * F.lit(1 << j)
        cols.append(acc.alias(f"{prefix}{b}"))
    return cols


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k. ``corpus``: (vec_id, embedding); ``queries``:
    (query_id, qe). Queries broadcast; corpus never shuffles for the join;
    one window shuffle on query_id for ranking."""
    c = corpus.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    q = queries.select("query_id", "qe", norm(F.col("qe")).alias("qnrm"))
    cos = F.round(dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: list[list[float]] | None = None,
    bands: int = 2,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing >= 1 LSH band with
    the query, ranked by exact cosine. Join keys are (band index, bucket id)
    — pure equi-joins, no cross product anywhere in the plan."""
    planes = planes or hyperplanes()
    c = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm"),
        *lsh_bands(F.col("embedding"), planes, bands),
    )
    q = queries.select(
        "query_id", "qe", norm(F.col("qe")).alias("qnrm"),
        *lsh_bands(F.col("qe"), planes, bands, prefix="qband"),
    )
    # stack bands to rows so one equi-join covers "any band matches"
    c_b = c.select(
        "vec_id", "embedding", "nrm",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("sig")) for b in range(bands)
        ])).alias("bk"),
    ).select("vec_id", "embedding", "nrm", F.col("bk.b").alias("b"), F.col("bk.sig").alias("sig"))
    q_b = q.select(
        "query_id", "qe", "qnrm",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("b"), F.col(f"qband{b}").alias("sig")) for b in range(bands)
        ])).alias("bk"),
    ).select("query_id", "qe", "qnrm", F.col("bk.b").alias("b"), F.col("bk.sig").alias("sig"))
    cand = (
        c_b.join(F.broadcast(q_b), on=["b", "sig"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "qe", "embedding", "qnrm", "nrm")
        .distinct()
    )
    cos = F.round(dot(F.col("qe"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def brute_force_topk_vectorized(corpus: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k with a BLAS matmul kernel (Arrow-batched
    mapInPandas) — the measured-fast path for dense linear algebra.

    The Column-expression fold (brute_force_topk) evaluates one multiply-add
    per expression-tree node; at 40k-corpus x 800-query stress scale that is
    ~330s. A numpy matmul does the same 32M cosines in well under a second
    of BLAS time. Structure:

      * the (small) query matrix is collected once, L2-normalized, and
        broadcast to executors;
      * each Arrow batch of the corpus is normalized and multiplied against
        the query matrix (batch x dim @ dim x nq);
      * each partition emits only its local top-k rows per query (partial
        top-k), so the final global ranking window sees at most
        k x n_partitions x n_queries rows — never the full product.

    Exactly the partial-aggregate shape Spark uses for TakeOrderedAndProject,
    applied to ANN. Results match brute_force_topk (same round-4 cosines,
    same id tie-breaks).
    """
    import numpy as np

    q_rows = queries.select("query_id", "qe").collect()
    if not q_rows:
        return brute_force_topk(corpus, queries, k)
    Q = np.array([list(r["qe"]) for r in q_rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    qids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, Q))

    def part(batches):
        import pandas as pd

        ids, Qn = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.array([list(e) for e in pdf["embedding"]], dtype=np.float64)
            E /= np.linalg.norm(E, axis=1, keepdims=True)
            S = np.round(E @ Qn.T, 4)  # (batch, nq)
            vecids = pdf["vec_id"].to_numpy(dtype=np.int64)
            out_q, out_n, out_c = [], [], []
            for j in range(S.shape[1]):
                col = S[:, j]
                mask = vecids != ids[j]  # exclude self
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                # local top-k by (cos desc, vec_id asc)
                order = np.lexsort((vecids[cand_idx], -col[cand_idx]))[:k]
                sel = cand_idx[order]
                out_q.extend([ids[j]] * len(sel))
                out_n.extend(vecids[sel])
                out_c.extend(col[sel])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cos": out_c})

    cands = corpus.select("vec_id", "embedding").mapInPandas(
        part, "query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return cands.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def blocked_dup_pairs_vectorized(
    emb: DataFrame, threshold: float = 0.45, block_col: str = "label"
) -> DataFrame:
    """Within-block all-pairs cosine >= threshold via per-block BLAS matmul
    (applyInPandas) — the vectorized twin of the label-blocked equi-join
    formulation (q43), same results.

    Each block's rows arrive as one pandas group; S = En @ En.T scores all
    pairs in one BLAS call and only the above-threshold (i < j) pairs are
    emitted. Scale: blocks are hash-partitioned across executors; block size
    bounds memory (a 50k-row block is a 2.5e9-cell S — split oversized
    blocks with a salt on the block key before calling this)."""
    import numpy as np
    import pandas as pd

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos": "float64"}
            )
        E = np.array([list(e) for e in pdf["embedding"]], dtype=np.float64)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        S = np.round(E @ E.T, 4)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = S[iu, ju] >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        swap = a > b  # normalize pair order to vec_a < vec_b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"vec_a": a2, "vec_b": b2, "cos": S[iu, ju][keep]})

    return emb.select("vec_id", block_col, "embedding").groupBy(block_col).applyInPandas(
        pairs, "vec_a bigint, vec_b bigint, cos double"
    )
