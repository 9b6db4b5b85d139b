"""Bigram language-model operators: the corpus-trained perplexity quality
filter (CCNet/Gopher-style; no reference counterpart — SURVEY §2.6 lists no
text ops), shared by the batch query (q138) and the streaming ingestion
scorer (streaming.lm_scored_docs_stream).

Determinism contract (the q119 discipline): every per-pair log-prob is one
ln() of an IEEE-identical ratio of exact int64 counts, quantized to
DECIMAL(18,12) so per-doc sums are exact integer arithmetic — order- and
partitioning-independent, replayable by the DuckDB oracle.

Scale shape: the "model" IS two vocab-bounded count tables (the standard
way n-gram filters train over petabyte corpora — one aggregation pass);
scoring joins them keyed on (w1, w2) / w1 with the vocab-size scalar
broadcast. In production the count tables persist once and every ingest
batch scores against them — exactly what the streaming scorer does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..functions.text import tokens


def lm_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> one row per adjacent token pair (doc_id, w1, w2).
    Map-side: transform-over-indices with O(1) element_at, one generator."""
    d = docs.select("doc_id", tokens(text_col).alias("ts"))
    return (
        d.where(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1), "
                    "i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )


def lm_fit(
    docs: DataFrame, text_col: str = "text", pairs: DataFrame | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the add-one-smoothed bigram LM: returns (bigram counts
    (w1, w2, c12), unigram counts (w1, c1), vocab-size scalar (vsz)) —
    three vocab-bounded relations; persisting them IS persisting the model.
    Pass a precomputed (possibly checkpointed) ``pairs`` relation to share
    it with downstream scoring (q138 does) — the counts are the ONE
    definition of the model either way."""
    d = docs.select(tokens(text_col).alias("ts"))
    toks = d.select(F.explode("ts").alias("t"))
    if pairs is None:
        pairs = lm_pairs(docs, text_col)
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ug = toks.groupBy(F.col("t").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    v = toks.agg(F.countDistinct("t").alias("vsz"))
    return bg, ug, v


def lm_score_pairs(pairs: DataFrame, bg: DataFrame, ug: DataFrame, v: DataFrame) -> DataFrame:
    """Score a (doc_id, w1, w2) pair relation against trained counts:
    per-doc (doc_id, n_pairs, avg_logp). Pairs whose bigram/unigram is
    absent from the model are dropped by the inner joins — for
    train-on-self scoring (q138) every pair is present; a production
    unseen-pair policy would left-join with a c12=0 default."""
    lp = F.log(
        (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("vsz"))
    ).cast(DecimalType(18, 12))
    term = (
        pairs.join(bg, ["w1", "w2"])
        .join(ug, "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", lp.alias("lp"))
    )
    return term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_pairs"),
        F.round(F.sum("lp").cast("double") / F.count(F.lit(1)), 6).alias("avg_logp"),
    )


def lm_dsir_score_pairs(
    pairs: DataFrame,
    target_model: tuple[DataFrame, DataFrame, DataFrame],
    raw_model: tuple[DataFrame, DataFrame, DataFrame],
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document's
    pair relation under TWO add-one-smoothed bigram LMs — one trained on a
    high-quality *target* slice, one on the *raw* corpus — and emit the
    per-pair mean log importance weight

        dsir_logw = (sum log p_target(pair) - sum log p_raw(pair)) / n_pairs.

    Positive = the target LM finds the doc more probable than the raw LM
    does = target-like; curation pipelines resample with probability
    proportional to exp(logw) (q108's weighted-sample machinery is the
    resampling half).

    Determinism: each per-pair log-prob is one ln() of an IEEE-identical
    ratio of exact int64 counts quantized to DECIMAL(18,12) (the q138
    discipline), so both per-doc sums AND their difference are exact
    integer arithmetic — order- and partitioning-independent — before the
    single double division + round-6.

    Scale shape: ONE pass over the pair relation; all four count tables
    are vocab-bounded equi-join sides and the two vocab scalars broadcast.
    In production both models persist once (the target model is tiny) and
    every ingest batch scores against them — same layout as the streaming
    LM gate."""
    bg_t, ug_t, v_t = target_model
    bg_r, ug_r, v_r = raw_model

    def lp(c12: str, c1: str, vsz: str):
        return F.log(
            (F.coalesce(F.col(c12), F.lit(0)) + 1).cast("double")
            / (F.coalesce(F.col(c1), F.lit(0)) + F.col(vsz))
        ).cast(DecimalType(18, 12))

    term = (
        pairs.join(bg_t.withColumnRenamed("c12", "c12_t"), ["w1", "w2"], "left")
        .join(ug_t.withColumnRenamed("c1", "c1_t"), "w1", "left")
        .join(bg_r.withColumnRenamed("c12", "c12_r"), ["w1", "w2"], "left")
        .join(ug_r.withColumnRenamed("c1", "c1_r"), "w1", "left")
        .crossJoin(F.broadcast(v_t.withColumnRenamed("vsz", "vsz_t")))
        .crossJoin(F.broadcast(v_r.withColumnRenamed("vsz", "vsz_r")))
        .select(
            "doc_id",
            lp("c12_t", "c1_t", "vsz_t").alias("lp_t"),
            lp("c12_r", "c1_r", "vsz_r").alias("lp_r"),
        )
    )
    n = F.count(F.lit(1))
    return term.groupBy("doc_id").agg(
        n.cast("int").alias("n_pairs"),
        F.round(F.sum("lp_t").cast("double") / n, 6).alias("avg_logp_target"),
        F.round(F.sum("lp_r").cast("double") / n, 6).alias("avg_logp_raw"),
        F.round((F.sum("lp_t") - F.sum("lp_r")).cast("double") / n, 6).alias("dsir_logw"),
    )


def lm_score_pairs_smoothed(
    pairs: DataFrame, bg: DataFrame, ug: DataFrame, v: DataFrame
) -> DataFrame:
    """Score docs that were NOT in the training corpus (the ingestion
    case): left joins with add-one defaults — an unseen bigram contributes
    p = 1 / (c1 + V), an unseen unigram p = 1 / V. Every pair of every doc
    scores (n_pairs = the doc's true pair count), which is what a
    threshold gate needs; on in-corpus docs this reduces exactly to
    lm_score_pairs (asserted in tests)."""
    lp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("vsz"))
    ).cast(DecimalType(18, 12))
    term = (
        pairs.join(bg, ["w1", "w2"], "left")
        .join(ug, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select("doc_id", lp.alias("lp"))
    )
    return term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_pairs"),
        F.round(F.sum("lp").cast("double") / F.count(F.lit(1)), 6).alias("avg_logp"),
    )
