"""Intake profiling heads — q226-q229: the first-look passes a pipeline
runs over a NEW data source before committing 100 TB of compute to it:
how much survives dedup at each threshold (q226), what the tokenizer
economics look like per source (q227), which schema rules actually hold
(q228 functional dependencies), and which columns could key the data
(q229 candidate-key profile).

Registered after plans/evalmetrics.py in plans/registry.py: registry
insertion order is registration order, which the gate scheduler's
overflow rule depends on (plans/evidence.py) — brand-new queries defer
to the next round's gate automatically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import tokens
from .base import _t, _ts, query
from .extensions import _JACCARD_EXACT_SQL

# The dedup-policy threshold sweep. Literals are written identically in
# the Spark plan and the oracle so the double join keys are bit-equal.
_YIELD_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)

_YIELD_SQL = f"""WITH jac AS ({_JACCARD_EXACT_SQL}),
    th AS (SELECT CAST(unnest([{", ".join(str(t) for t in _YIELD_THRESHOLDS)}])
                       AS DOUBLE) AS threshold),
    curve AS (SELECT threshold,
                     count(*) AS dup_pairs,
                     count(DISTINCT doc_b) AS docs_removed
              FROM th JOIN jac ON jaccard >= threshold
              GROUP BY 1),
    total AS (SELECT count(*) AS total_docs FROM documents)
    SELECT th.threshold,
           CAST(coalesce(dup_pairs, 0) AS BIGINT) AS dup_pairs,
           CAST(coalesce(docs_removed, 0) AS BIGINT) AS docs_removed,
           CAST(total_docs - coalesce(docs_removed, 0) AS BIGINT) AS docs_retained,
           round((total_docs - coalesce(docs_removed, 0)) / total_docs, 6)
               AS yield_frac
    FROM th LEFT JOIN curve USING (threshold) CROSS JOIN total
    ORDER BY th.threshold"""


@query(
    "q226_dedup_yield_curve",
    _YIELD_SQL,
    tags=("dedup", "yield", "threshold-sweep", "profiling"),
)
def q226(spark, sf):
    """Dedup yield curve: how many documents survive greedy near-dup
    removal at each Jaccard threshold — the number a pipeline owner reads
    before picking the dedup operating point (too low and you throw away
    unique data, too high and boilerplate floods training).

    Pairs come from the scalable exact path (q163's prefix-filtered
    PPJoin, zero false negatives vs the exhaustive oracle), computed ONCE
    at the loosest threshold; the sweep is then a 5-row broadcast join
    against the pair relation — one pass over pairs, not one dedup run
    per threshold. Greedy policy = drop the larger doc_id of every
    qualifying pair (the keeper-preserving convention q137 uses).
    The rounded pair jaccard (the gate-verified output column) is what
    both engines sweep, so threshold comparisons are bit-identical.

    r7: the pair relation is read from the MAINTAINED dedup index
    (plans/dedup_index.dup_pairs — same PPJoin kernel, built once per
    session and shared with q163/q105/q113)."""
    from .dedup_index import dup_pairs

    pairs = dup_pairs(spark, sf).select("doc_b", "jaccard")
    spine = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in _YIELD_THRESHOLDS])
        ).alias("threshold")
    )
    curve = (
        spine.join(pairs, pairs["jaccard"] >= spine["threshold"])
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("dup_pairs"),
            F.countDistinct("doc_b").alias("docs_removed"),
        )
    )
    total = (
        _t(spark, sf, "documents")
        .agg(F.count(F.lit(1)).alias("total_docs"))
    )
    return (
        spine.join(curve, "threshold", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "threshold",
            F.coalesce("dup_pairs", F.lit(0)).alias("dup_pairs"),
            F.coalesce("docs_removed", F.lit(0)).alias("docs_removed"),
            (F.col("total_docs") - F.coalesce("docs_removed", F.lit(0))).alias(
                "docs_retained"
            ),
            F.round(
                (F.col("total_docs") - F.coalesce("docs_removed", F.lit(0)))
                / F.col("total_docs"),
                6,
            ).alias("yield_frac"),
        )
        .orderBy("threshold")
    )


#: GPT-2-style coarse pre-tokenization: letter runs, single digits,
#: single non-alphanumeric marks. Written once; the oracle uses the same
#: pattern (Java regex and RE2 agree on this ASCII-class subset).
_SUBWORD_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

_FERTILITY_SQL = rf"""SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
               AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '{_SUBWORD_PATTERN}')))
               AS BIGINT) AS subword_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           round(sum(len(regexp_extract_all(text, '{_SUBWORD_PATTERN}')))
                 / sum(len(string_split_regex(trim(text), '\s+'))), 6)
               AS fertility,
           round(sum(length(text))
                 / sum(len(regexp_extract_all(text, '{_SUBWORD_PATTERN}'))), 6)
               AS chars_per_token
    FROM documents GROUP BY source ORDER BY source"""


@query(
    "q227_tokenizer_fertility",
    _FERTILITY_SQL,
    tags=("text", "tokenizer", "fertility", "profiling"),
)
def q227(spark, sf):
    """Tokenizer economics per source: fertility (subword tokens per
    whitespace word) and chars-per-token — the numbers that decide how a
    source is priced into a token-budgeted training mix (a source with
    fertility 2.5 costs 2.5x its word count) and that flag tokenizer
    mismatch (prose sits near 1.2-1.5; tables/code/non-Latin blow up).

    Single scan, one hash aggregate on ``source``, everything JVM-side:
    the subword proxy is one ``regexp_extract_all`` size (no BPE encode
    in the hot path — q131/q132 own real BPE; this is the O(bytes)
    screening pass you can afford on all 100 TB)."""
    # _ts (r12): two per-row regex tokenizations — fan the scan out
    d = _ts(spark, sf, "documents")
    subword = F.size(
        F.regexp_extract_all("text", F.lit(_SUBWORD_PATTERN), 0)
    )
    ws = F.size(tokens("text"))
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws).alias("ws_tokens"),
        F.sum(subword).alias("subword_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "ws_tokens",
        "subword_tokens",
        "n_chars",
        F.round(F.col("subword_tokens") / F.col("ws_tokens"), 6).alias(
            "fertility"
        ),
        F.round(F.col("n_chars") / F.col("subword_tokens"), 6).alias(
            "chars_per_token"
        ),
    ).orderBy("source")


#: Candidate FDs audited over ``orders``: the true key dependency, the
#: reverse direction (expected to fail), and two plausible-but-false
#: business rules. det/dep values are compared only within one engine,
#: so any injective cast-to-string works; both sides use their native
#: CAST.
_FD_PAIRS = (
    ("o_orderkey->o_custkey", "o_orderkey", "o_custkey"),
    ("o_custkey->o_orderstatus", "o_custkey", "o_orderstatus"),
    ("o_orderpriority->o_orderstatus", "o_orderpriority", "o_orderstatus"),
    ("o_orderstatus->o_orderpriority", "o_orderstatus", "o_orderpriority"),
)

_FD_SQL = (
    "WITH stacked AS ("
    + " UNION ALL ".join(
        f"SELECT '{name}' AS fd, CAST({det} AS VARCHAR) AS det, "
        f"CAST({dep} AS VARCHAR) AS dep FROM orders"
        for name, det, dep in _FD_PAIRS
    )
    + """),
    per_det AS (SELECT fd, det, count(DISTINCT dep) AS n_dep
                FROM stacked GROUP BY 1, 2)
    SELECT fd,
           count(*) AS n_det_values,
           CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_det,
           max(n_dep) AS max_dep_per_det,
           sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM per_det GROUP BY fd ORDER BY fd"""
)


@query(
    "q228_functional_dependency_audit",
    _FD_SQL,
    tags=("profiling", "functional-dependency", "schema", "quality"),
)
def q228(spark, sf):
    """Functional-dependency audit: for each candidate rule det -> dep,
    count determinant values that map to more than one dependent value —
    the schema-discovery pass (Metanome-style, distributed) that tells a
    pipeline which implicit invariants it may exploit (dedup on det alone,
    dimension extraction) and which "obvious" rules the data violates.

    One pass: each row explodes into one (rule, det, dep) tuple per
    audited pair (a column-pruned projection, not a data copy), then two
    hash aggregates — per-(rule, det) distinct-dep counts with map-side
    partial aggregation, then per-rule rollup of the violation counts.
    Adding rules scales the explode width, never the number of scans."""
    o = _t(spark, sf, "orders")
    stacked = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("fd"),
                        F.col(det).cast("string").alias("det"),
                        F.col(dep).cast("string").alias("dep"),
                    )
                    for name, det, dep in _FD_PAIRS
                ]
            )
        ).alias("s")
    ).select("s.*")
    per_det = stacked.groupBy("fd", "det").agg(
        F.countDistinct("dep").alias("n_dep")
    )
    violating = F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0)).cast("long")
    return (
        per_det.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_det_values"),
            violating.alias("n_violating_det"),
            F.max("n_dep").alias("max_dep_per_det"),
        )
        .withColumn("holds", F.col("n_violating_det") == 0)
        .orderBy("fd")
    )


_KEY_COLUMNS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_KEY_SQL = (
    "WITH stacked AS ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS v FROM orders"
        for c in _KEY_COLUMNS
    )
    + """)
    SELECT column_name,
           count(*) AS n_rows,
           count(v) AS n_non_null,
           count(DISTINCT v) AS n_distinct,
           round(count(DISTINCT v) / count(*), 6) AS uniqueness,
           count(DISTINCT v) = count(*) AND count(v) = count(*)
               AS candidate_key
    FROM stacked GROUP BY column_name ORDER BY column_name"""
)


@query(
    "q229_candidate_key_profile",
    _KEY_SQL,
    tags=("profiling", "candidate-key", "uniqueness", "schema"),
)
def q229(spark, sf):
    """Candidate-key discovery: per-column row/non-null/distinct counts,
    uniqueness ratio, and the key verdict (unique AND total) — the
    profile that picks dedup keys, MERGE keys (q149) and bucketing
    columns for a table nobody has documented.

    Same one-pass explode shape as q228: rows fan out to (column, value)
    with values cast to string ONLY as a per-engine grouping domain
    (cast formats differ across engines but both are injective, so the
    distinct counts agree); exact distinct per column via two-phase hash
    aggregation. For 100 TB you'd swap the exact count for the q169 HLL
    replay — same plan shape, sketch instead of distinct."""
    o = _t(spark, sf, "orders")
    stacked = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in _KEY_COLUMNS
                ]
            )
        ).alias("s")
    ).select("s.*")
    return (
        stacked.groupBy("column_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_non_null"),
            F.countDistinct("v").alias("n_distinct"),
        )
        .select(
            "column_name",
            "n_rows",
            "n_non_null",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_rows"), 6).alias(
                "uniqueness"
            ),
            (
                (F.col("n_distinct") == F.col("n_rows"))
                & (F.col("n_non_null") == F.col("n_rows"))
            ).alias("candidate_key"),
        )
        .orderBy("column_name")
    )
