"""q233-q234 diagnostics heads: brute-force recomputations on the smoke
corpus plus the accounting identities that pin the relations together."""

import datetime as dt
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def _rhu(v: float, places: str) -> float:
    return float(Decimal(repr(v)).quantize(Decimal(places), ROUND_HALF_UP))


def test_q233_matches_topk_occurrences(spark):
    topk = QUERIES["q39_embedding_topk"](spark, SF_SMOKE).collect()
    occ = Counter(r["neighbor_id"] for r in topk)
    hist = Counter(occ.values())
    n_total = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    hist[0] = n_total - len(occ)
    out = {
        r["n_occurrences"]: r["n_vectors"]
        for r in QUERIES["q233_embedding_hubness"](spark, SF_SMOKE).collect()
    }
    assert out == {k: v for k, v in hist.items() if v > 0}


def test_q233_occurrence_mass_accounts_for_every_topk_row(spark):
    rows = QUERIES["q233_embedding_hubness"](spark, SF_SMOKE).collect()
    n_topk = QUERIES["q39_embedding_topk"](spark, SF_SMOKE).count()
    n_total = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert sum(r["n_occurrences"] * r["n_vectors"] for r in rows) == n_topk
    assert sum(r["n_vectors"] for r in rows) == n_total


def test_q234_matches_bruteforce(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    daily = Counter((r["event_type"], r["ts"].date()) for r in ev)
    joined = {}
    for (etype, day), vol in daily.items():
        prev = daily.get((etype, day - dt.timedelta(days=7)))
        if prev is not None:
            joined[(etype, day)] = (vol, prev, vol - prev)
    resid = defaultdict(list)
    for (etype, _), (_, _, r) in joined.items():
        resid[etype].append(r)
    out = {
        (r["event_type"], r["day"]): r
        for r in QUERIES["q234_volume_anomaly_flags"](spark, SF_SMOKE).collect()
    }
    assert set(out) == set(joined)
    for key, (vol, fc, r) in joined.items():
        rs = resid[key[0]]
        n = len(rs)
        mean = sum(rs) / n
        var = sum((x - mean) ** 2 for x in rs) / n
        row = out[key]
        assert row["volume"] == vol
        assert row["forecast"] == fc
        assert row["residual"] == r
        if var == 0:
            assert row["z"] is None
            assert row["is_anomaly"] is False
        else:
            z = (r - mean) / math.sqrt(var)
            assert abs(row["z"] - z) < 1e-6
            assert row["is_anomaly"] == (abs(z) > 3)


def test_q234_plan_joins_are_broadcast_on_bounded_tables(spark):
    """The fact table is scanned/aggregated exactly ONCE (the bounded
    (type, day) aggregate is localCheckpointed for its three consumers);
    the forecast self-join and stats join-back run hash joins over the
    checkpointed rows — no nested loop, no cartesian, no re-scan."""
    df = QUERIES["q234_volume_anomaly_flags"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert "Scan parquet" not in tree, "fact scanned after the checkpoint"
    assert "Scan ExistingRDD" in tree
