"""Value/property tests for the profiling batch (q169-q177): brute-force
re-computation in numpy/pandas/DuckDB, estimator-accuracy bounds, and
physical-plan contracts for the scale-critical shapes."""

import hashlib

import duckdb
import numpy as np
import pandas as pd

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.profiling import (
    _HLL_M,
    _HLL_REM_BITS,
    _HLL_RHO_MAX,
    _JS_RATE,
    _JS_THETA,
    _MAD_C,
    _MAD_CUT,
    _SNM_MAXDIST,
    join_size_estimate_sampled,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# ---------------------------------------------------------------------------
# q169 HLL
# ---------------------------------------------------------------------------


def _py_hash60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def test_hll_register_sum_matches_pure_python(spark):
    """The exact-integer register sum must equal a from-scratch Python
    HLL over the same md5 hashes — register state verified bit-for-bit."""
    rows = {r["event_type"]: r for r in QUERIES["q169_hll_distinct"](spark, SF_SMOKE).collect()}
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["event_type", "user_id"])
    for et, grp in ev.groupby("event_type"):
        regs = {}
        users = set(grp["user_id"])
        for u in users:
            h = _py_hash60(u)
            bucket, rem = h % _HLL_M, h >> 8
            rho = _HLL_RHO_MAX if rem == 0 else _HLL_RHO_MAX - rem.bit_length()
            regs[bucket] = max(regs.get(bucket, 0), rho)
        s = sum(1 << (_HLL_RHO_MAX - m) for m in regs.values())
        s += (_HLL_M - len(regs)) * (1 << _HLL_RHO_MAX)
        r = rows[et]
        assert r["reg_sum"] == s, et
        assert r["n_buckets"] == len(regs), et
        assert r["n_exact"] == len(users), et


def test_hll_estimate_within_3_sigma(spark):
    """HLL stderr is ~1.04/sqrt(m) = 6.5% at m=256; require < 3 sigma."""
    for r in QUERIES["q169_hll_distinct"](spark, SF_SMOKE).collect():
        rel = abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel < 3 * 1.04 / np.sqrt(_HLL_M), (r["event_type"], rel)


def test_hll_plan_is_pure_aggregation(spark):
    """No windows, no joins — the sketch must plan as a hash-agg tree
    (the shape that partial-aggregates map-side at 100 TB)."""
    plan = _plan(spark, "q169_hll_distinct")
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree
    assert "Join" not in tree


# ---------------------------------------------------------------------------
# q170 column profile
# ---------------------------------------------------------------------------


def test_column_profile_single_scan(spark):
    """All 6x5 statistics in ONE scan of orders — a per-column rescan
    would turn profiling a 100 TB table into 6 passes."""
    plan = _plan(spark, "q170_column_profile")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1


def test_column_profile_values(spark):
    rows = {r["col_name"]: r for r in QUERIES["q170_column_profile"](spark, SF_SMOKE).collect()}
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    }
    for c in ("o_orderkey", "o_custkey", "o_orderstatus"):
        r = rows[c]
        assert r["n_rows"] == len(o)
        assert r["n_null"] == int(o[c].isna().sum())
        assert r["n_distinct"] == o[c].nunique()
    assert rows["o_totalprice"]["min_val"] == f"{o['o_totalprice'].min():.2f}"
    assert rows["o_totalprice"]["max_val"] == f"{o['o_totalprice'].max():.2f}"


# ---------------------------------------------------------------------------
# q171 Pareto frontier
# ---------------------------------------------------------------------------


def test_pareto_frontier_exact_vs_brute_force(spark):
    """The windowed frontier must equal the O(n^2) dominance definition:
    kept iff no other order has (date >=, price >=) with one strict."""
    got = {
        r["o_orderkey"]
        for r in QUERIES["q171_pareto_frontier"](spark, SF_SMOKE).collect()
    }
    o = pd.read_parquet(
        f"{SF_SMOKE}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )
    d = o["o_orderdate"].values
    p = o["o_totalprice"].values
    dominated = np.zeros(len(o), dtype=bool)
    for i in range(len(o)):
        dominated[i] = np.any(
            (d >= d[i]) & (p >= p[i]) & ((d > d[i]) | (p > p[i]))
        )
    want = set(o.loc[~dominated, "o_orderkey"])
    assert got == want


# ---------------------------------------------------------------------------
# q172 grouping sets
# ---------------------------------------------------------------------------


def test_grouping_sets_totals_consistent(spark):
    rows = QUERIES["q172_grouping_sets"](spark, SF_SMOKE).collect()
    detail = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 0]
    sub = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 1]
    grand = [r for r in rows if r["g_status"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in detail)
    # decimal-exact sums: subtotal and grand total must tie out exactly
    assert abs(grand[0]["sum_price"] - sum(r["sum_price"] for r in detail)) < 1e-6
    for s in sub:
        dsum = sum(r["sum_price"] for r in detail if r["o_orderstatus"] == s["o_orderstatus"])
        assert abs(s["sum_price"] - dsum) < 1e-6, s


def test_grouping_sets_single_shuffle(spark):
    """Expand + one hash-agg exchange — not one aggregate per set."""
    tree = _plan(spark, "q172_grouping_sets").split("\n\n")[0]
    assert "Expand" in tree
    assert tree.count("Exchange") <= 2  # agg exchange (+ the output sort)


# ---------------------------------------------------------------------------
# q173 transitions
# ---------------------------------------------------------------------------


def test_transition_probabilities_sum_to_one(spark):
    rows = QUERIES["q173_event_transitions"](spark, SF_SMOKE).collect()
    df = pd.DataFrame([r.asDict() for r in rows])
    for et, grp in df.groupby("event_type"):
        assert abs(grp["p_next"].sum() - 1.0) < 1e-4, et
    # transition counts must total (events - one per user with >=1 event)
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["user_id"])
    n_users = ev["user_id"].nunique()
    assert df["n_transitions"].sum() == len(ev) - n_users


# ---------------------------------------------------------------------------
# q174 MAD outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_vs_numpy(spark):
    rows = {r["event_type"]: r for r in QUERIES["q174_mad_outliers"](spark, SF_SMOKE).collect()}
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["event_type", "value"])
    for et, grp in ev.groupby("event_type"):
        v = grp["value"].values
        med = np.percentile(v, 50)
        mad = np.percentile(np.abs(v - med), 50)
        n_out = int(np.sum(np.abs(np.round(_MAD_C * (v - med) / mad, 6)) > _MAD_CUT))
        r = rows[et]
        assert abs(r["med"] - round(med, 4)) < 1e-9, et
        assert abs(r["mad"] - round(mad, 4)) < 1e-9, et
        assert r["n_outliers"] == n_out, et


def test_mad_join_backs_broadcast(spark):
    """The per-type median/MAD tables are tiny: both join-backs must
    broadcast, never shuffle the fact side."""
    tree = _plan(spark, "q174_mad_outliers").split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree


# ---------------------------------------------------------------------------
# q175 chi-square
# ---------------------------------------------------------------------------


def test_chi_square_vs_numpy(spark):
    r = QUERIES["q175_chi_square_independence"](spark, SF_SMOKE).collect()[0]
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["event_type", "ts"])
    # Spark dayofweek: 1=Sun..7=Sat; pandas dayofweek: 0=Mon..6=Sun
    dow = (ev["ts"].dt.dayofweek + 1) % 7 + 1
    tab = pd.crosstab(ev["event_type"], dow).values.astype(float)
    rt = tab.sum(axis=1, keepdims=True)
    ct = tab.sum(axis=0, keepdims=True)
    n = tab.sum()
    e = rt * ct / n
    chi2 = float(((tab - e) ** 2 / e).sum())
    assert abs(r["chi_square"] - chi2) < 1e-4
    assert r["dof"] == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    assert r["n_events"] == int(n)


# ---------------------------------------------------------------------------
# q176 join-size estimate
# ---------------------------------------------------------------------------


def test_join_size_exact_matches_duckdb(spark):
    r = QUERIES["q176_join_size_estimate"](spark, SF_SMOKE).collect()[0]
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT count(*) FROM '{SF_SMOKE}/orders.parquet' o
            JOIN '{SF_SMOKE}/events.parquet' e ON o.o_custkey = e.user_id"""
    ).fetchone()[0]
    assert r["exact_pairs"] == want


def test_join_size_sampled_shape_and_value(spark):
    """The estimation-only path must (a) reproduce the gate query's
    est_pairs exactly — same hash, same theta — and (b) carry the key
    filters BELOW the count aggregates so ~63/64 of rows die map-side."""
    gate = QUERIES["q176_join_size_estimate"](spark, SF_SMOKE).collect()[0]
    df = join_size_estimate_sampled(spark, SF_SMOKE)
    assert df.collect()[0]["est_pairs"] == gate["est_pairs"]
    tree = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    ).split("\n\n")[0]
    # one Filter per scan branch, sitting under the aggregates
    assert tree.count("Filter") >= 2
    assert tree.count("Scan parquet") == 2


def test_join_size_estimate_python_reference(spark):
    """Estimator replayed in pure Python over the same md5 hashes."""
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet", columns=["o_custkey"])
    e = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["user_id"])
    ca = o["o_custkey"].value_counts()
    cb = e["user_id"].value_counts()
    est = 0
    for k in ca.index.intersection(cb.index):
        if _py_hash60(k) < _JS_THETA:
            est += int(ca[k]) * int(cb[k])
    est *= _JS_RATE
    r = QUERIES["q176_join_size_estimate"](spark, SF_SMOKE).collect()[0]
    assert r["est_pairs"] == est


# ---------------------------------------------------------------------------
# q177 sorted neighborhood
# ---------------------------------------------------------------------------


def test_snm_pairs_valid_and_blocked(spark):
    rows = QUERIES["q177_sorted_neighborhood"](spark, SF_SMOKE).collect()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text", "lang"])
    norm = (
        docs.set_index("doc_id")["text"]
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
        .str.lower()
    )
    lang = docs.set_index("doc_id")["lang"]
    seen = set()
    for r in rows:
        a, b = r["doc_a"], r["doc_b"]
        assert a < b
        assert (a, b) not in seen
        seen.add((a, b))
        assert r["dist"] <= _SNM_MAXDIST
        # pair must come from the same block: same lang + same first char
        assert lang[a] == lang[b]
        assert norm[a][:1] == norm[b][:1]


def test_snm_window_is_partitioned(spark):
    """The sort window must be partitioned (lang, first char) — a global
    single-partition sort would not survive 100 TB."""
    plan = _plan(spark, "q177_sorted_neighborhood")
    assert "No Partition Defined" not in plan
    tree = plan.split("\n\n")[0]
    assert "Window" in tree
