"""q210 scorer length-bias audit: end-to-end equality against a
numpy brute-force Spearman/Pearson on the collected documents."""

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE

STOPS = ("the", "a", "of", "and")


def _avg_ranks(a: np.ndarray) -> np.ndarray:
    """Tie-averaged fractional ranks, 1-based (scipy rankdata 'average')."""
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a), dtype=float)
    sorted_a = a[order]
    i = 0
    while i < len(a):
        j = i
        while j < len(a) and sorted_a[j] == sorted_a[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # mean of ranks i+1 .. j
        i = j
    return ranks


def _pearson(x: np.ndarray, y: np.ndarray) -> float:
    n = len(x)
    sx, sy = x.sum(), y.sum()
    num = n * (x * y).sum() - sx * sy
    den = math.sqrt(n * (x * x).sum() - sx * sx) * math.sqrt(
        n * (y * y).sum() - sy * sy
    )
    return num / den


def test_q210_matches_numpy_brute_force(spark):
    row = QUERIES["q210_score_length_bias"](spark, SF_SMOKE).collect()[0]

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "text", "n_chars"
    ).collect()
    def round_half_up(v: float, places: str) -> float:
        # Spark's round(): HALF_UP over the double's shortest decimal repr
        return float(Decimal(repr(v)).quantize(Decimal(places), ROUND_HALF_UP))

    x = np.array(
        [
            round_half_up(
                sum(t in STOPS for t in d["text"].split()) / len(d["text"].split()),
                "0.0001",
            )
            for d in docs
        ]
    )
    y = np.array([float(d["n_chars"]) for d in docs])

    assert row["n_docs"] == len(docs)
    want_s = _pearson(_avg_ranks(x), _avg_ranks(y))
    want_p = _pearson(np.array([round_half_up(v, "1") for v in x * 10000]), y)
    assert abs(row["spearman_rho"] - want_s) < 1e-6
    assert abs(row["pearson_rho"] - want_p) < 1e-6


def test_q210_rank_maps_broadcast(spark):
    """The corpus never shuffles for the rank joins: both fractional-rank
    map join-backs must be broadcast, never sort-merge; the only nested
    loop is the 1-row count scalar."""
    df = QUERIES["q210_score_length_bias"](spark, SF_SMOKE)
    tree = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    ).split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert "CartesianProduct" not in tree
    assert tree.count("BroadcastNestedLoopJoin") == 1
