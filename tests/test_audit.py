"""Global anti-pattern invariants, machine-checked over EVERY registered
query's physical plan (the committed AUDIT.md is the human-readable dump
of the same sweep at sf0.01):

* no row-at-a-time Python UDF (BatchEvalPython) anywhere,
* no CartesianProduct anywhere,
* BroadcastNestedLoopJoin only in the whitelisted bounded-side queries.
"""

import re
from collections import Counter

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from audit_plans import BNLJ_WHITELIST  # noqa: E402


def test_no_antipatterns_in_any_plan(spark):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    violations = []
    for name, fn in QUERIES.items():
        tree = (
            fn(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .explainString(mode)
            .split("\n\n")[0]
        )
        c = Counter(
            {
                op: len(re.findall(rf"\b{re.escape(op)}", tree))
                for op in ("BatchEvalPython", "CartesianProduct", "BroadcastNestedLoopJoin")
            }
        )
        if c["BatchEvalPython"]:
            violations.append(f"{name}: row-at-a-time Python UDF")
        if c["CartesianProduct"]:
            violations.append(f"{name}: CartesianProduct")
        if c["BroadcastNestedLoopJoin"] and name not in BNLJ_WHITELIST:
            violations.append(f"{name}: unlisted BroadcastNestedLoopJoin")
    assert not violations, violations
