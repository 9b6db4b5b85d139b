"""Physical-plan contract tests: the optimizations SURVEY.md §4 calls out
must actually fire. These guard against regressions that stay correct but
quietly lose the 100 TB-viable plan shape."""

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_topk_plans_take_ordered_and_project(spark):
    """orderBy+limit must fuse to TakeOrderedAndProject (O3) — a global
    sort of the aggregate output would be the scale bug."""
    for q in ("q01_avg_price_by_dow", "q05_avg_extprice_by_supp", "q52_segment_shipping"):
        assert "TakeOrderedAndProject" in _plan(spark, q), q


def test_star_joins_broadcast(spark):
    """Dim sides must broadcast: the fact side never shuffles for a star
    join (J1/J4/J5)."""
    for q in ("q11_avg_price_by_membership", "q13_sum_amount_by_month", "q21_member_spend_rides"):
        plan = _plan(spark, q)
        assert "BroadcastHashJoin" in plan, q
        assert "SortMergeJoin" not in plan, q


def test_member_filter_pushed_to_scan(spark):
    """P5 predicate must reach the parquet scan (PushedFilters), not sit
    above the join."""
    plan = _plan(spark, "q19_member_avg_by_acct_band")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # inside a PushedFilters list


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must scan 2 columns (ReadSchema pruning)."""
    plan = _plan(spark, "q31_doc_token_count")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema


def test_single_shuffle_per_aggregation(spark):
    """Partial+final hash agg: exactly one Exchange for a single-fact
    grouped aggregate (plus none hidden behind AQE reuse)."""
    tree = _plan(spark, "q01_avg_price_by_dow").split("\n\n")[0]  # operator tree only
    assert tree.count("Exchange") == 1
    assert tree.count("HashAggregate") == 2


def test_whole_stage_codegen_covers_agg(spark):
    df = QUERIES["q01_avg_price_by_dow"](spark, SF_SMOKE)
    codegen = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )
    assert "Found 2 WholeStageCodegen subtrees" in codegen or "WholeStageCodegen" in codegen
