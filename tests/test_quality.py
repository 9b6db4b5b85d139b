"""Invariant tests for the distribution/quality query family (q85-q91).

Value-for-value parity is the DuckDB oracle gate; these pin the semantic
invariants that would survive a data refresh.
"""

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def test_histogram_partitions_the_table(spark):
    rows = QUERIES["q85_value_histogram"](spark, SF_SMOKE).collect()
    total = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == total
    los = [r["bucket_lo"] for r in rows]
    assert los == sorted(los) and all(lo % 25 == 0 for lo in los)


def test_deciles_balanced_and_monotonic(spark):
    rows = QUERIES["q86_price_deciles"](spark, SF_SMOKE).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_orders"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile equi-depth contract
    # bucket ranges tile the value axis in order
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_price"] <= hi["min_price"]


def test_profile_is_sorted_and_consistent(spark):
    rows = QUERIES["q87_user_type_profile"](spark, SF_SMOKE).collect()
    for r in rows:
        parts = r["profile"].split("|")
        assert parts == sorted(parts)
        assert len(parts) == r["n_types"] <= r["n_events"]


def test_repetition_ratio_bounds(spark):
    for r in QUERIES["q88_repetition_ratio"](spark, SF_SMOKE).collect():
        assert 0 <= r["distinct_tokens"] <= r["total_tokens"]
        assert 0.0 <= r["dup_ratio"] < 1.0


def test_grouping_sets_shape(spark):
    rows = QUERIES["q89_status_priority_sets"](spark, SF_SMOKE).collect()
    # gid 1 = priority-only rows, 2 = status-only rows, 3 = grand total
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {1, 2, 3}
    assert len(by_gid[3]) == 1
    grand = by_gid[3][0]["n_orders"]
    assert sum(r["n_orders"] for r in by_gid[1]) == grand
    assert sum(r["n_orders"] for r in by_gid[2]) == grand


def test_edit_distance_pairs_blocked(spark):
    rows = QUERIES["q90_edit_distance_pairs"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        # 12-char shared block bounds the distance of 40-char prefixes
        assert 0 <= r["dist"] <= 28


def test_argmax_matches_window_formulation(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.agg import exact_sum
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.base import _t

    got = {
        (r["event_type"], r["top_user"], r["max_total"])
        for r in QUERIES["q91_top_user_by_type"](spark, SF_SMOKE).collect()
    }
    totals = (
        _t(spark, SF_SMOKE, "events")
        .groupBy("event_type", "user_id")
        .agg(exact_sum("value", "total"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("total"), F.asc("user_id"))
    want = {
        (r["event_type"], r["user_id"], r["total"])
        for r in totals.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    }
    assert got == want


def test_first_stopword_positions_nonnegative(spark):
    rows = QUERIES["q92_first_stopword_position"](spark, SF_SMOKE).collect()
    assert rows
    total_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) <= total_docs
    assert all(r["first_stop_pos"] >= 0 for r in rows)


def test_union_by_name_null_fills_missing_measure(spark):
    rows = {r["src"]: r for r in QUERIES["q93_union_by_name"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"purchase", "view"}
    assert rows["view"]["value_sum"] is None  # missing column null-filled
    assert rows["purchase"]["value_sum"] is not None


def test_unpivot_multiplies_rows_by_measures(spark):
    rows = QUERIES["q94_measure_unpivot"](spark, SF_SMOKE).collect()
    n_lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    assert [r["measure"] for r in rows] == sorted(
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    assert all(r["n_vals"] == n_lineitem for r in rows)
    assert all(r["val_min"] <= r["val_max"] for r in rows)


def test_percent_rank_bounds_per_nation(spark):
    rows = QUERIES["q95_supplier_revenue_rank"](spark, SF_SMOKE).collect()
    assert rows
    by_nation = {}
    for r in rows:
        assert 0.0 <= r["pct_rank"] <= 1.0
        assert 0.0 < r["cum_dist"] <= 1.0
        by_nation.setdefault(r["s_nationkey"], []).append(r)
    for grp in by_nation.values():
        assert min(r["pct_rank"] for r in grp) == 0.0  # lowest total ranks 0
        assert max(r["cum_dist"] for r in grp) == 1.0


def test_trailing_window_contains_current_row(spark):
    rows = QUERIES["q96_trailing_hour_stats"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["trailing_n"] >= 1


def test_salted_totals_match_plain_groupby(spark):
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.base import _t

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_price"], r["n_items"])
        for r in QUERIES["q97_salted_flag_totals"](spark, SF_SMOKE).collect()
    }
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.agg import exact_sum

    want = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_price"], r["n_items"])
        for r in _t(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(exact_sum("l_extendedprice", "sum_price"), F.count(F.lit(1)).alias("n_items"))
        .collect()
    }
    assert got == want  # salting is value-invisible


def test_lm_score_properties(spark):
    """q138 bigram LM scores: every doc with >= 2 tokens gets a finite
    negative mean log-prob (probabilities < 1 by add-one smoothing), and
    byte-identical documents (q35's exact-dup groups) must score
    IDENTICALLY — the score is a pure function of text + corpus counts."""
    import math

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
        QUERIES,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.readers import (
        read_parquet_table,
    )

    # sf0.1: the smallest corpus containing token-identical dup docs
    sf = "/root/testdata/sf0.1"
    scores = {r["doc_id"]: r for r in QUERIES["q138_doc_lm_score"](spark, sf).collect()}
    assert scores
    for r in scores.values():
        assert r["n_pairs"] >= 1
        assert math.isfinite(r["avg_logp"]) and r["avg_logp"] < 0, r

    groups = (
        read_parquet_table(spark, sf, "documents")
        .groupBy(F.concat_ws(" ", F.split(F.trim("text"), r"\s+")).alias("f"))
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") >= 2)
        .collect()
    )
    assert groups, "sf0.1 corpus should contain token-identical dup docs"
    for g in groups:
        vals = {scores[i]["avg_logp"] for i in g["ids"] if i in scores}
        assert len(vals) <= 1, ("identical docs scored differently", g["ids"], vals)


def test_integrity_audit_counts_match_direct_checks(spark):
    """q167's five audit rows agree with independently-computed
    violation counts, and the expected corpus defects fire: childless
    orders exist and order totals do NOT reconcile (the synthetic
    generator's documented gaps), while FK/PK/domain checks pass."""
    rows = {r["check_name"]: r for r in QUERIES["q167_integrity_audit"](spark, SF_SMOKE).collect()}
    assert set(rows) == {
        "fk_lineitem_has_order",
        "orders_have_lineitems",
        "pk_lineitem_unique",
        "domain_lineitem_valid",
        "reconcile_order_totals",
    }
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    orphans = li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti").count()
    childless = o.join(li.select("l_orderkey"), o.o_orderkey == li.l_orderkey, "left_anti").count()
    assert rows["fk_lineitem_has_order"]["n_violations"] == orphans
    assert rows["orders_have_lineitems"]["n_violations"] == childless
    assert rows["fk_lineitem_has_order"]["n_checked"] == li.count()
    assert rows["orders_have_lineitems"]["n_checked"] == o.count()
    # corpus facts the audit exists to catch
    assert not rows["orders_have_lineitems"]["pass"]
    assert not rows["reconcile_order_totals"]["pass"]
    assert not rows["pk_lineitem_unique"]["pass"]  # real duplicate pairs
    assert rows["fk_lineitem_has_order"]["pass"]
    assert rows["domain_lineitem_valid"]["pass"]
