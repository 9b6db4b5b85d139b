"""Boilerplate-footer stress for exact Jaccard joins (SCALE_NOTES).

The regime that makes the naive shingle inverted-index self-join (q36)
quadratic: EVERY document shares a boilerplate footer, so each footer
shingle's posting list holds all N docs and the self-join materializes
~n_hot_shingles * N^2 / 2 intermediate pairs before the Jaccard filter
throws almost all of them away. The prefix-filtered join (q163) sorts
each doc's shingles by global document frequency and joins only the
rarest prefix — the footer shingles sort LAST and never enter the
candidate join.

Builds N docs = unique body + shared footer, plants N_DUP true near-dup
pairs, then measures both formulations end-to-end and asserts their
outputs identical.

Usage: python tools/stress_prefix_join.py [n_docs] [n_dup]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (  # noqa: E402
    prefix_filter_jaccard_pairs,
    shingle_sets,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark  # noqa: E402

#: 10 tokens — ~8 hot shingles shared by EVERY doc. Kept SHORT relative to
#: the 30-token unique body: prefix filtering only skips a shared shingle
#: when it sorts into the doc's suffix, i.e. when a doc's globally-frequent
#: shingles number <= ceil(t*n) - 1 (boilerplate <= ~t fraction of the
#: doc). That is the realistic crawl shape (footer << page); a corpus
#: that is MOSTLY shared boilerplate at just-below-threshold similarity
#: defeats the prefix bound and stays quadratic — measured and documented
#: in SCALE_NOTES.
FOOTER = "all rights reserved contact the site administrator for licensing details"
N_BODY = 30


def _body(idcol, changed: bool):
    """30 per-doc-unique body tokens w{id}x{i} (no cross-doc collisions);
    the near-dup variant replaces token 15, killing 3 shingles."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(N_BODY)),
        lambda i: F.when((i == 15) & F.lit(changed), F.lit("CHANGED")).otherwise(
            F.concat(F.lit("w"), idcol, F.lit("x"), i)
        ),
    )


def build_docs(spark, n_docs: int, n_dup: int):
    """n_docs docs with 30 unique body tokens + the shared 10-token footer;
    the last n_dup docs are near-copies of the first n_dup (one body token
    changed, Jaccard ~0.85), giving known >=0.5 pairs. Cross pairs sit at
    ~8/(2*38-8) ~ 0.12 — far below threshold, yet every one collides in
    all ~8 footer-shingle buckets of the naive join."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.concat_ws(" ", _body(F.col("id"), False)), F.lit(FOOTER)).alias("text"),
    )
    dups = spark.range(n_dup).select(
        (F.col("id") + n_docs).alias("doc_id"),
        F.concat_ws(" ", F.concat_ws(" ", _body(F.col("id"), True)), F.lit(FOOTER)).alias("text"),
    )
    return (
        base.unionAll(dups)
        .select("doc_id", F.split("text", " ").alias("ts"))
        .repartition(32, "doc_id")
    )


def exhaustive_pairs(docs, threshold=0.5):
    """q36's formulation, inlined for arbitrary (doc_id, ts) input."""
    sh = shingle_sets(docs, 3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_dup = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark()
    docs = build_docs(spark, n_docs, n_dup).localCheckpoint()

    t0 = time.time()
    exact = sorted(map(tuple, exhaustive_pairs(docs).collect()))
    t_exh = time.time() - t0

    t0 = time.time()
    pref = sorted(map(tuple, prefix_filter_jaccard_pairs(docs).collect()))
    t_pref = time.time() - t0

    assert pref == exact, f"outputs differ: {len(pref)} vs {len(exact)} rows"
    assert len(exact) >= n_dup, "planted dups must qualify"
    print(
        f"n_docs={n_docs + n_dup} n_true_pairs={len(exact)} | "
        f"exhaustive {t_exh:.1f}s | prefix-filtered {t_pref:.1f}s | "
        f"speedup {t_exh / t_pref:.1f}x"
    )

    # same regime for the DIRECTED containment join (q204): the exhaustive
    # formulation pays the identical footer-bucket blowup; the one-sided
    # prefix join keys candidates only on A-side rare body shingles
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (  # noqa: E402
        prefix_filter_containment_pairs,
    )

    def exhaustive_containment(docs, threshold=0.9):
        sh = shingle_sets(docs, 3)
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        a, b = sh.alias("a"), sh.alias("b")
        pairs = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") != F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
        cont = F.col("inter") / F.col("na")
        return (
            pairs.join(sa, "doc_a")
            .where(cont >= threshold)
            .select("doc_a", "doc_b", F.round(cont, 4).alias("containment"))
        )

    t0 = time.time()
    c_exact = sorted(map(tuple, exhaustive_containment(docs).collect()))
    t_cexh = time.time() - t0
    t0 = time.time()
    c_pref = sorted(map(tuple, prefix_filter_containment_pairs(docs, threshold=0.9).collect()))
    t_cpref = time.time() - t0
    assert c_pref == c_exact, f"containment differs: {len(c_pref)} vs {len(c_exact)}"
    assert len(c_exact) >= 2 * n_dup, "planted dups must qualify in both directions"
    print(
        f"containment>=0.9 directed_pairs={len(c_exact)} | "
        f"exhaustive {t_cexh:.1f}s | prefix-filtered {t_cpref:.1f}s | "
        f"speedup {t_cexh / t_cpref:.1f}x"
    )


if __name__ == "__main__":
    main()
