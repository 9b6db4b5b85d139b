"""Invariant tests for the late-r4 families: lakehouse maintenance
(q149 MERGE / q150 SCD2 / q151 BM25 / q152 OLS trend) and the sketch/ANN
evaluation pair (q153 / q154).

Value-for-value parity is the DuckDB oracle gate (all six carry full
oracles); these pin the semantic invariants that survive a data refresh.
"""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lakehouse import (
    _BM25_TERMS,
    _TREND_EPOCH,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


# --------------------------------------------------------------------------
# q149 — MERGE upsert
# --------------------------------------------------------------------------

def test_merge_partitions_rows_into_three_actions(spark):
    rows = QUERIES["q149_merge_upsert"](spark, SF_SMOKE).collect()
    base = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n_base = base.count()
    by_action = {}
    for r in rows:
        by_action.setdefault(r["action"], []).append(r)
    # every base row survives exactly once (as update or keep)
    assert len(by_action["update"]) + len(by_action["keep"]) == n_base
    # update arm is exactly the keys ≡ 0 (mod 7); insert keys are negative
    assert all(r["o_orderkey"] % 7 == 0 and r["o_orderkey"] >= 0 for r in by_action["update"])
    assert all(r["o_orderkey"] < 0 for r in by_action["insert"])
    assert all(r["status"] == "R" for r in by_action["update"])
    assert all(r["status"] == "N" for r in by_action["insert"])


def test_merge_update_applies_price_uplift(spark):
    merged = QUERIES["q149_merge_upsert"](spark, SF_SMOKE)
    base = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    joined = merged.where(F.col("action") == "update").join(base, "o_orderkey").collect()
    assert joined
    for r in joined:
        assert r["price"] == r["o_totalprice"] * 1.05  # exact IEEE product


def test_merge_plan_never_shuffles_base(spark):
    """The MERGE contract: both arms are broadcast joins — no Exchange on
    the base-table side, no SortMergeJoin anywhere."""
    df = QUERIES["q149_merge_upsert"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    tree = plan.split("\n\n")[0]
    # the only Exchanges are BroadcastExchanges (no hash-partition shuffle)
    for line in tree.splitlines():
        if "Exchange" in line:
            assert "BroadcastExchange" in line, line


# --------------------------------------------------------------------------
# q150 — SCD Type 2
# --------------------------------------------------------------------------

def test_scd2_intervals_contiguous_and_one_current(spark):
    rows = QUERIES["q150_scd2_history"](spark, SF_SMOKE).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r["is_current"] for r in vs) == 1
        assert vs[-1]["is_current"] and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]  # no gaps, no overlaps
            assert a["event_type"] != b["event_type"]  # true change points


def test_scd2_first_version_starts_at_first_event(spark):
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where(F.col("user_id") < 200)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
    )
    v1 = QUERIES["q150_scd2_history"](spark, SF_SMOKE).where(F.col("version") == 1)
    joined = v1.join(ev, "user_id").collect()
    assert joined
    for r in joined:
        assert r["valid_from"] == r["first_ts"]


# --------------------------------------------------------------------------
# q151 — BM25
# --------------------------------------------------------------------------

def test_bm25_topk_sorted_and_positive(spark):
    rows = QUERIES["q151_bm25_topk"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_bm25_hits_contain_a_query_term(spark):
    top = QUERIES["q151_bm25_topk"](spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    joined = top.join(docs, "doc_id").collect()
    assert joined
    for r in joined:
        toks = set(r["text"].split())
        assert toks & set(_BM25_TERMS), r["doc_id"]


def test_bm25_length_normalization_downweights_long_docs(spark):
    """Two docs with the same tf for a term: the longer one scores lower
    on that term (b > 0). Checked synthetically through the same pipeline
    parameters rather than the corpus (which can't guarantee such a pair)."""
    k1, b = 1.2, 0.75

    def term_score(f, length, avglen, idf=1.0):
        return idf * (f * (k1 + 1)) / (f + k1 * (1 - b + b * length / avglen))

    assert term_score(2, 200, 100) < term_score(2, 50, 100)


# --------------------------------------------------------------------------
# q152 — OLS trend
# --------------------------------------------------------------------------

def test_trend_matches_numpy_polyfit(spark):
    rows = QUERIES["q152_value_trend_ols"](spark, SF_SMOKE).collect()
    assert rows
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf["x"] = (pdf["ts"].dt.normalize() - pd.Timestamp(_TREND_EPOCH)).dt.days
    pdf["v"] = pdf["value"].round(2)
    for r in rows:
        g = pdf[pdf["event_type"] == r["event_type"]]
        slope, intercept = np.polyfit(g["x"].to_numpy(float), g["v"].to_numpy(float), 1)
        assert math.isfinite(r["slope"]) and math.isfinite(r["intercept"])
        assert abs(r["slope"] - slope) < 1e-4
        assert abs(r["intercept"] - intercept) < 1e-3


# --------------------------------------------------------------------------
# q153 — MinHash estimate calibration
# --------------------------------------------------------------------------

def test_minhash_estimate_within_sampling_envelope(spark):
    rows = QUERIES["q153_minhash_jaccard_estimate"](spark, SF_SMOKE).collect()
    assert rows
    k = 32
    for r in rows:
        est, exact = r["est_jaccard"], r["exact_jaccard"]
        assert 0.0 <= est <= 1.0
        assert 0.0 <= exact <= 1.0
        # 4-sigma binomial envelope (+ slack for the hash-family
        # approximation of true permutations)
        sigma = math.sqrt(max(exact * (1 - exact), 1e-4) / k)
        assert abs(est - exact) <= 4 * sigma + 0.05, (r["doc_a"], r["doc_b"], est, exact)


def test_minhash_estimate_covers_lsh_candidates(spark):
    est = QUERIES["q153_minhash_jaccard_estimate"](spark, SF_SMOKE)
    cand = QUERIES["q37_minhash_lsh_pairs"](spark, SF_SMOKE)
    # same candidate universe as q37 (minus hash-collision pairs with zero
    # shingle overlap, which do not occur on this corpus)
    assert est.count() == cand.count()


# --------------------------------------------------------------------------
# q154 — ANN recall
# --------------------------------------------------------------------------

def test_ann_recall_bounded_and_consistent(spark):
    rows = QUERIES["q154_ann_recall"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hits"] <= 5
        assert r["recall_at_5"] == r["hits"] / 5
    # the smoke corpus is UNSTRUCTURED random vectors (cosines all near 0,
    # "nearest" is arbitrary), so LSH recall is legitimately modest here —
    # the high-recall evidence lives on the planted-dup stress corpus
    # (SCALE_NOTES: recall 1.000). A zero mean would mean q40 broke.
    mean_recall = sum(r["recall_at_5"] for r in rows) / len(rows)
    assert mean_recall > 0.0


def test_ann_recall_one_row_per_query(spark):
    df = QUERIES["q154_ann_recall"](spark, SF_SMOKE)
    n_queries = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .where(F.col("vec_id") % 50 == 0)
        .count()
    )
    assert df.count() == n_queries


# --------------------------------------------------------------------------
# q155/q156/q157 — product analytics + collocations
# --------------------------------------------------------------------------

def test_funnel_counts_monotone_decreasing(spark):
    r = QUERIES["q155_funnel_conversion"](spark, SF_SMOKE).collect()[0]
    assert r["users_view"] >= r["users_view_click"] >= r["users_view_click_purchase"]
    assert r["users_view"] > 0


def test_funnel_stage_respects_order(spark):
    """A user who clicked before ever viewing must not count as
    view->click: recompute the second stage naively in pandas."""
    pdf = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
    )
    expected = 0
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        views = g[g["event_type"] == "view"]
        if views.empty:
            continue
        v = views.iloc[0]
        later = g[
            (g["ts"] > v["ts"]) | ((g["ts"] == v["ts"]) & (g["event_id"] > v["event_id"]))
        ]
        if (later["event_type"] == "click").any():
            expected += 1
    r = QUERIES["q155_funnel_conversion"](spark, SF_SMOKE).collect()[0]
    assert r["users_view_click"] == expected


def test_retention_diagonal_covers_all_users(spark):
    """Each user appears in their own cohort week's diagonal cell, so the
    per-cohort max active_users equals the cohort size."""
    rows = QUERIES["q156_retention_cohorts"](spark, SF_SMOKE).collect()
    assert rows
    cohort_sizes = {}
    for r in rows:
        if r["cohort_week"] == r["activity_week"]:
            cohort_sizes[r["cohort_week"]] = r["active_users"]
        assert r["activity_week"] >= r["cohort_week"]  # nothing before first-seen
    for r in rows:
        assert r["active_users"] <= cohort_sizes[r["cohort_week"]]


def test_pmi_pairs_bounded_by_vocab(spark):
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.extensions import (
        _PMI_V,
    )

    rows = QUERIES["q157_token_pmi_pairs"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 50
    toks = {r["tok_a"] for r in rows} | {r["tok_b"] for r in rows}
    assert len(toks) <= _PMI_V
    for r in rows:
        assert r["tok_a"] < r["tok_b"]  # canonical pair order
        assert r["c_ab"] > 0


# --------------------------------------------------------------------------
# q158 — dup-graph PageRank
# --------------------------------------------------------------------------

def test_pagerank_mass_and_floor(spark):
    rows = QUERIES["q158_dup_graph_pagerank"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["pagerank"] >= 0.15  # damped floor
    # symmetric graph, no dangling nodes: total mass stays ~n (quantization
    # drift bounded by iters * n * deg * 5e-10)
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - len(rows)) < 0.01 * len(rows)


def test_pagerank_invariant_under_partitioning(spark):
    """The determinism contract: the quantized-decimal trajectory must not
    depend on how the edge list is partitioned."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        lsh_verified_jaccard_pairs,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.graph import (
        pagerank,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", tokens("text").alias("ts"))
    )
    edges = lsh_verified_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    a = {(r["id"], r["pr"]) for r in pagerank(edges, "doc_a", "doc_b").collect()}
    b = {
        (r["id"], r["pr"])
        for r in pagerank(edges.repartition(7, "doc_b"), "doc_a", "doc_b").collect()
    }
    assert a == b


# --------------------------------------------------------------------------
# q159 — KMV sketch merge
# --------------------------------------------------------------------------

def test_kmv_merge_is_lossless_and_accurate(spark):
    rows = QUERIES["q159_kmv_merge"](spark, SF_SMOKE).collect()
    assert rows
    exact = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["merge_lossless"] is True  # the mergeability theorem, per row
        # KMV error ~ 1/sqrt(k-1) = 13% at k=64; generous 4x envelope
        assert abs(r["kmv_estimate"] - exact[r["event_type"]]) <= max(
            0.5 * exact[r["event_type"]], 3
        )


# --------------------------------------------------------------------------
# q160 — temporal version join
# --------------------------------------------------------------------------

def test_temporal_join_covers_every_event_exactly_once(spark):
    rows = QUERIES["q160_temporal_version_join"](spark, SF_SMOKE).collect()
    assert rows
    total = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where(F.col("user_id") < 200)
        .count()
    )
    # half-open intervals tile each user's timeline: exactly-once assignment
    assert sum(r["n_events"] for r in rows) == total


def test_temporal_join_attr_matches_version(spark):
    v = QUERIES["q150_scd2_history"](spark, SF_SMOKE).select(
        "user_id", "version", F.col("event_type").alias("scd_attr")
    )
    j = (
        QUERIES["q160_temporal_version_join"](spark, SF_SMOKE)
        .join(v, ["user_id", "version"])
        .collect()
    )
    assert j
    for r in j:
        assert r["attr"] == r["scd_attr"]


# --------------------------------------------------------------------------
# q161 — zone-map pruning
# --------------------------------------------------------------------------

def test_zone_map_prunable_partitions_have_no_qualifying_rows(spark):
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lakehouse import (
        _SKIP_THRESHOLD,
    )

    rows = QUERIES["q161_zone_map_pruning"](spark, SF_SMOKE).collect()
    assert rows
    qualifying_days = {
        r["day"]
        for r in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where(F.col("value") > _SKIP_THRESHOLD)
        .select(F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    }
    for r in rows:
        assert r["mn"] <= r["mx"]
        # the data-skipping guarantee: a prunable partition contains NO
        # qualifying row, and every non-prunable one contains at least one
        # (max > threshold implies a witness row at the max)
        assert r["prunable"] == (r["day"] not in qualifying_days)


# --------------------------------------------------------------------------
# q162 — version-diff CDF
# --------------------------------------------------------------------------

def test_cdf_diff_agrees_with_merge_actions(spark):
    """The snapshot diff must recover exactly the changes the MERGE said it
    made (minus the deletion arm, which the diff alone can see)."""
    diff = {r["o_orderkey"]: r for r in QUERIES["q162_version_diff_cdf"](spark, SF_SMOKE).collect()}
    merged = QUERIES["q149_merge_upsert"](spark, SF_SMOKE).collect()
    for m in merged:
        k, action, status = m["o_orderkey"], m["action"], m["status"]
        if status == "F":
            # dropped from v2 -> must appear as a delete (updates are 'R',
            # inserts 'N', so only keeps can carry 'F')
            assert diff[k]["change_type"] == "delete"
            assert diff[k]["after_status"] is None
        elif action == "insert":
            assert diff[k]["change_type"] == "insert"
            assert diff[k]["before_status"] is None
        elif action == "update":
            assert diff[k]["change_type"] == "update"
            assert diff[k]["after_price"] == diff[k]["before_price"] * 1.05
        else:  # unchanged non-F keeps must NOT appear in the feed
            assert k not in diff


def test_cdf_change_types_partition_the_feed(spark):
    rows = QUERIES["q162_version_diff_cdf"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        ct = r["change_type"]
        assert ct in ("insert", "update", "delete")
        if ct == "insert":
            assert r["before_status"] is None and r["after_status"] is not None
        elif ct == "delete":
            assert r["after_status"] is None and r["before_status"] is not None
        else:
            assert r["before_status"] is not None and r["after_status"] is not None


def test_zorder_layout_covers_all_rows_and_beats_day_layout(spark):
    """q164's z-order claim, measured: (a) the z-buckets tile the fact
    (Σ n_rows == |events|); (b) for the 2-D probe (user_id < 50 AND
    value > 400) the fraction of ROWS sitting in prunable buckets under
    the z-layout strictly beats the 1-D day layout (q161's shape) — the
    reason OPTIMIZE ZORDER exists."""
    z = QUERIES["q164_zorder_layout"](spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    total = ev.count()
    assert sum(r["n_rows"] for r in z) == total
    z_prunable_rows = sum(r["n_rows"] for r in z if r["prunable"])
    # the probe thresholds q164 derives from the stats aggregate
    s = ev.agg(
        F.min("user_id").alias("mn_u"), F.max("user_id").alias("mx_u"),
        F.min("value").alias("mn_v"), F.max("value").alias("mx_v"),
    ).collect()[0]
    ut = s["mn_u"] + 0.25 * (s["mx_u"] - s["mn_u"] + 1)
    vt = s["mn_v"] + 0.8 * (s["mx_v"] - s["mn_v"])
    day = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("user_id").alias("mn_user"),
            F.max("value").alias("mx_value"),
        )
        .collect()
    )
    day_prunable_rows = sum(
        r["n_rows"] for r in day if r["mx_value"] <= vt or r["mn_user"] >= ut
    )
    assert z_prunable_rows / total > day_prunable_rows / total
    # the z layout must make the probe mostly-skippable, not marginally
    assert z_prunable_rows / total > 0.5


def test_compaction_plan_bins_bounded_and_cover_all_files(spark):
    """q166's next-fit-decreasing guarantee: every file appears exactly
    once, and no bin's total exceeds capacity + its own largest file (the
    bounded-overflow property of streaming bin packing that makes the
    plan safe to execute)."""
    import math

    rows = QUERIES["q166_compaction_plan"](spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_days = ev.select(F.col("ts").cast("date")).distinct().count()
    assert len(rows) == n_days
    total = sum(r["n_rows"] for r in rows)
    cap = math.ceil(total / 8)
    bins = {}
    for r in rows:
        bins.setdefault(r["bin"], []).append(r["n_rows"])
    for sizes in bins.values():
        assert sum(sizes) < cap + max(sizes)
    # decreasing assignment: a bin's largest file is >= the next bin's
    ordered = [max(bins[b]) for b in sorted(bins)]
    assert ordered == sorted(ordered, reverse=True)


def test_rrf_fusion_ranks_and_scores(spark, sf_dir):
    """q199: rrf recomputes from the reported per-system ranks (rank 0 =
    absent contributes nothing); every bm25 top-20 doc carries the same
    rank q151 assigns; output is top-20 by fused score."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

    rows = QUERIES["q199_rrf_fusion"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        expect = (1.0 / (60 + r["bm25_rank"]) if r["bm25_rank"] else 0.0) + (
            1.0 / (60 + r["cos_rank"]) if r["cos_rank"] else 0.0
        )
        assert abs(r["rrf"] - expect) < 1e-6, r
        assert r["rrf"] > 0
    bm25 = {r["doc_id"]: i + 1 for i, r in enumerate(QUERIES["q151_bm25_topk"](spark, sf_dir).collect())}
    fused_lex = {r["doc_id"]: r["bm25_rank"] for r in rows if 0 < r["bm25_rank"] <= 20}
    for doc_id, rnk in fused_lex.items():
        assert bm25.get(doc_id) == rnk, (doc_id, rnk, bm25.get(doc_id))
