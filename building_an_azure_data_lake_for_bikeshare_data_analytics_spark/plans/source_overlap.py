"""q241 — cross-source duplication matrix: how much of each ingest feed
duplicates each other feed. The intake question behind source selection
and licensing audits ("is feed B just a scrape of feed A?"), and the
third analytical head the maintained dedup index serves this round
(after q226's threshold sweep and q240's quota ledger): the pair
relation is READ from ``plans/dedup_index.dup_pairs`` — no pair
recomputation, the whole query is two dimension joins and one grouped
aggregate over an already-materialized relation.

Determinism: the mean pair-Jaccard goes through the house integer
quantization — each pair's round-4 jaccard scales exactly to an int
(x10000, round-0), sums as int64 (order-independent), and divides once
at the end — so engine and oracle agree bit-for-bit despite float
addition being non-associative.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import _t, query
from .extensions import _JACCARD_EXACT_SQL

_OVERLAP_SQL = f"""WITH jac AS ({_JACCARD_EXACT_SQL}),
    lab AS (
      SELECT least(da.source, db.source) AS src_lo,
             greatest(da.source, db.source) AS src_hi,
             jac.doc_a, jac.doc_b,
             CAST(round(jac.jaccard * 10000, 0) AS BIGINT) AS jq
      FROM jac
      JOIN documents da ON jac.doc_a = da.doc_id
      JOIN documents db ON jac.doc_b = db.doc_id)
    SELECT src_lo, src_hi,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT doc_a) + count(DISTINCT doc_b) AS BIGINT)
               AS n_docs_involved,
           round(sum(jq) / (10000.0 * count(*)), 6) AS mean_jaccard
    FROM lab GROUP BY src_lo, src_hi ORDER BY src_lo, src_hi"""


@query(
    "q241_cross_source_overlap",
    _OVERLAP_SQL,
    tags=("intake", "dedup", "sources", "index-consumer"),
)
def q241(spark, sf):
    """Per unordered source pair: verified >=0.5-Jaccard pair count, the
    docs involved (distinct doc_a + distinct doc_b — endpoints counted
    per role, matching the oracle), and the exact quantized mean
    Jaccard. Pairs come from the maintained index; the only new work is
    two source-dimension joins and a grouped aggregate."""
    from .dedup_index import dup_pairs

    src = _t(spark, sf, "documents").select("doc_id", "source")
    pairs = dup_pairs(spark, sf)
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    jq = F.round(F.col("jaccard") * 10000, 0).cast("long")
    lab = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("src_lo"),
            F.greatest("sa", "sb").alias("src_hi"),
            "doc_a",
            "doc_b",
            jq.alias("jq"),
        )
    )
    return (
        lab.groupBy("src_lo", "src_hi")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.countDistinct("doc_a") + F.countDistinct("doc_b")).alias(
                "n_docs_involved"
            ),
            F.round(
                F.sum("jq") / (F.lit(10000.0) * F.count(F.lit(1))), 6
            ).alias("mean_jaccard"),
        )
        .orderBy("src_lo", "src_hi")
    )
