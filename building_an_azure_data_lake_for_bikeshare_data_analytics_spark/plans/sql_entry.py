"""SQL-text entry-point queries (the reference's §3.2/§3.3 paths: temp views
+ ``spark.sql``) and the as-of join operator.

q57 runs ONE shared ANSI SQL string through both Spark SQL and DuckDB —
demonstrating the engine's second entry point end-to-end (ANTLR parse →
analyzer view resolution → same Catalyst pipeline as the DataFrame API).
q58 pits the composed Spark as-of join against DuckDB's *native* ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.readers import load_star
from .base import _t, query

# one ANSI string, two engines: deterministic aggregates via the decimal
# path (valid Spark SQL *and* DuckDB SQL), CTE + scalar subquery + join
_Q57_SQL = """
WITH spend AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM orders GROUP BY o_custkey)
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS segment_total
FROM customer JOIN spend ON c_custkey = custkey
WHERE total > (SELECT CAST(sum(CAST(total AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM spend)
GROUP BY c_mktsegment
ORDER BY segment_total DESC, c_mktsegment
"""


@query("q57_sql_cte_subquery", _Q57_SQL, tags=("extension", "sql-entry", "cte", "subquery"))
def q57(spark: SparkSession, sf: str) -> DataFrame:
    """SQL entry point (§3.2/3.3): temp views + spark.sql over a CTE with an
    uncorrelated scalar subquery — above-average spenders per segment. The
    oracle is the *identical* SQL string."""
    load_star(spark, sf, tables=("customer", "orders"), register_views=True)
    return spark.sql(_Q57_SQL)


@query(
    "q58_asof_last_order",
    """SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
       FROM events e
       ASOF LEFT JOIN orders o
         ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""",
    tags=("extension", "asof-join"),
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent order date
    at-or-before the event. Spark side is the union+window composition
    (operators/asof.py); the oracle is DuckDB's native ASOF JOIN — two
    independent formulations of the same semantics."""
    events = _t(spark, sf, "events").select("user_id", "ts", "event_id")
    orders = _t(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    out = asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        value_alias="last_order_date",
    )
    return out.select("event_id", "user_id", "last_order_date")
