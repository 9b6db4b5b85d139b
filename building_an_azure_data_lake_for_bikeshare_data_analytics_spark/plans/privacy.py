"""Privacy / governance heads — q207 k-anonymity + l-diversity audit.

No reference counterpart (the bikeshare notebook publishes raw rider
aggregates with no re-identification check, SURVEY.md §2); this is the
audit a training-data pipeline runs before releasing or retaining a
user-keyed slice: find quasi-identifier groups small enough to
re-identify (k-anonymity, Sweeney 2002) or sensitive-homogeneous
(l-diversity, Machanavajjhala et al. 2007).

Registered after plans/lm_advanced.py in plans/registry.py: registry
insertion order is registration order (plans/evidence.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import _t, query


@query(
    "q207_k_anonymity_audit",
    """WITH g AS (SELECT c_nationkey, c_mktsegment,
                         CAST(floor(c_acctbal / CAST(1000 AS DOUBLE)) AS INTEGER)
                             AS bal_band,
                         c_acctbal
                  FROM customer)
       SELECT c_nationkey, c_mktsegment, bal_band,
              count(*) AS k_size,
              count(DISTINCT c_acctbal) AS l_diversity,
              count(*) < 5 AS below_k,
              count(DISTINCT c_acctbal) < 2 AS below_l
       FROM g GROUP BY 1, 2, 3""",
    tags=("privacy", "k-anonymity", "l-diversity", "governance"),
)
def q207(spark, sf):
    """k-anonymity / l-diversity audit over the released quasi-identifier
    cut (nation, market segment, $1000 balance band): every QI group
    reports its size k (re-identification resistance — an attacker who
    knows someone's QI tuple finds them among k candidates) and the
    number of DISTINCT sensitive values l within it (exact balance here;
    a k-anonymous but sensitive-homogeneous group still leaks). Groups
    with k < 5 or l < 2 are flagged — the rows a release gate would
    suppress or generalize.

    Determinism: the band is int(floor(x / 1000.0)) with the division
    written identically in both engines (one IEEE double op, floor exact,
    negative balances floor toward -inf consistently); k and l are exact
    int64 counts; the flags are int comparisons. Nothing here can flake.

    Scale shape: ONE hash aggregation keyed by the QI tuple (map-side
    partial counts; count-distinct expands to a two-level agg, both keyed
    by the same QI hash) — no join, no window, no driver state. Output is
    QI-cardinality-bounded (metadata-scale). At 100 TB this is the same
    single-shuffle profile as q69's source stats."""
    c = _t(spark, sf, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("int")
    return (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            band.alias("bal_band"),
            "c_acctbal",
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("k_size"),
            F.countDistinct("c_acctbal").alias("l_diversity"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "k_size",
            "l_diversity",
            (F.col("k_size") < 5).alias("below_k"),
            (F.col("l_diversity") < 2).alias("below_l"),
        )
    )
