"""Interval (range) query heads — q202 overlap join, q203 sweep-line
stacking (operators/intervals.py holds the engine shapes).

Registered after plans/profiling.py in plans/registry.py (containment /
timeseries / lm_advanced / privacy follow): registry insertion order IS
registration order, which the gate scheduler's overflow rule depends on
(plans/evidence.py — when never-green registrations exceed the free gate
slots of a round whose mandatory set is full, the newest wait and lead
the next round's prefix).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import _t, query

# Both heads run on deterministic "open order service window" intervals:
# [o_orderdate, o_orderdate + (o_orderkey % 14 + 1) days] per customer.

_IV_SQL = """iv AS (SELECT o_custkey AS k, o_orderkey AS iid,
                           CAST(o_orderdate AS DATE) AS s,
                           CAST(o_orderdate AS DATE)
                             + CAST(o_orderkey % 14 + 1 AS INTEGER) AS e
                    FROM orders)"""


def _order_intervals(spark, sf):
    return _t(spark, sf, "orders").select(
        F.col("o_custkey"),
        F.col("o_orderkey"),
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), (F.col("o_orderkey") % 14 + 1).cast("int")).alias(
            "e"
        ),
    )


@query(
    "q202_interval_overlap_join",
    f"""WITH {_IV_SQL}
        SELECT a.k AS o_custkey, a.iid AS id_a, b.iid AS id_b,
               a.s AS start_a, a.e AS end_a, b.s AS start_b, b.e AS end_b
        FROM iv a JOIN iv b
          ON a.k = b.k AND a.iid < b.iid AND a.s <= b.e AND b.s <= a.e""",
    tags=("extension", "interval", "range-join"),
)
def q202(spark, sf):
    """Interval-overlap self-join (range join) — all same-customer order
    pairs whose service windows overlap. The DuckDB oracle runs the
    literal theta join; the Spark plan must NOT (it would plan as a
    per-key nested loop): operators/intervals.interval_overlap_join
    quantizes each interval to the 30-day grid cells it touches and
    equi-joins on (customer, cell), so only grid-cohabiting intervals are
    ever compared — the bucketed-range-join shape that holds when one
    customer has a million intervals, provided interval length stays
    near the grid width (the operator's documented lever)."""
    from ..operators.intervals import interval_overlap_join

    iv = _order_intervals(spark, sf)
    return interval_overlap_join(
        iv, key="o_custkey", id_col="o_orderkey", start="s", end="e", bucket_days=30
    ).select(
        "o_custkey", "id_a", "id_b", "start_a", "end_a", "start_b", "end_b"
    )


@query(
    "q203_interval_stacking",
    f"""WITH {_IV_SQL},
        ev AS (SELECT k, s AS d, 1 AS delta FROM iv
               UNION ALL SELECT k, e + 1, -1 FROM iv),
        prof AS (SELECT k, sum(delta) OVER (PARTITION BY k ORDER BY d, delta ASC
                                            ROWS UNBOUNDED PRECEDING) AS open_now
                 FROM ev)
        SELECT k AS o_custkey,
               CAST(max(open_now) AS INTEGER) AS max_concurrent,
               CAST(count(*) / 2 AS INTEGER) AS n_intervals
        FROM prof GROUP BY 1 HAVING max(open_now) >= 2""",
    tags=("extension", "interval", "sweep-line"),
)
def q203(spark, sf):
    """Sweep-line interval stacking — per customer, the deepest stack of
    simultaneously-open service windows (customers with >= 2 concurrent
    open orders). The scale counterpart to q202: when the question is
    depth rather than pairs, the sweep line answers it with one window
    pass and NO pair relation — linear where any overlap join is
    output-bound quadratic in the stack depth."""
    from ..operators.intervals import interval_stacking

    iv = _order_intervals(spark, sf)
    return interval_stacking(iv, key="o_custkey", start="s", end="e", at_least=2)
