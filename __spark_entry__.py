"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in
``building_an_azure_data_lake_for_bikeshare_data_analytics_spark``
(see SURVEY.md §2 for the operator inventory each query exercises).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (G1-equivalent, SURVEY.md §7.1): avg order price by
    day-of-week, sorted desc, top-k — on /root/testdata/sf0.001."""
    return QUERIES["q01_avg_price_by_dow"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI equivalents; keys missing here (MinHash/SimHash and other
    engine-hash-specific ops) get the driver's rows-only check."""
    return dict(ORACLES)
