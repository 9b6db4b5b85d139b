"""Distributed global row numbering.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY plans as a
single-partition window — every row through one task, the classic scale
ceiling. When the ordered relation is bounded (distinct days, k
centroids, a top-k'd head) that is fine and this module is NOT needed;
when it is data-scale (a shingle vocabulary, a fact table), use
``distributed_row_number``: a two-level scheme that keeps every
per-row pass distributed.

1. bucket each row by an ORDER-CONSISTENT coarsening of the sort key
   (``b1 < b2  =>  every row in b1 sorts before every row in b2``);
2. per-bucket counts -> one cumulative-sum window over the BUCKET
   relation only (coarse by construction; recurse if even that is huge);
3. global number = bucket offset + row_number within the bucket — the
   per-bucket windows run in parallel across the cluster.

The result is row-for-row IDENTICAL to the single-partition
``row_number`` (both realize the same total order), so swapping one for
the other can never change query output — pinned in
tests/test_functions.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: columns injected into the input relation during numbering
_BKT, _OFF, _RN = "__rank_bkt", "__rank_off", "__rank_rn"


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    bucket: Column,
    out: str = "rn",
) -> DataFrame:
    """Append ``out`` = the global 1-based row number of each row under
    ``ORDER BY order_cols`` (which must be a total order — include a
    tie-breaking key), computed without any single-partition pass over
    the data.

    ``bucket`` must be an order-consistent coarsening of ``order_cols``:
    comparing buckets must agree with comparing sort keys whenever the
    buckets differ (e.g. for ORDER BY (df, shingle): ``struct(df,
    substring(shingle, 1, 8))`` — a string prefix can only tie or agree
    with the full string). Granularity is the scale lever: the offset
    cumsum runs over one row per DISTINCT bucket, the per-bucket windows
    over one bucket each.

    A NULL bucket is joined null-safely (``eqNullSafe``), so no row is
    ever dropped; but Spark sorts a NULL bucket FIRST while the rows
    inside it sort by ``order_cols``'s own null ordering — so a nullable
    bucket is only order-consistent if NULL order keys also sort first.
    Prefer deriving the bucket from non-null key columns (every call
    site here does).
    """
    b = df.withColumn(_BKT, bucket)
    counts = b.groupBy(_BKT).agg(F.count(F.lit(1)).alias("__n"))
    # the only ordered global pass — over DISTINCT buckets, not rows
    cum = Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        F.col(_BKT).alias(_BKT + "_o"),
        F.coalesce(F.sum("__n").over(cum), F.lit(0)).alias(_OFF),
    )
    win = Window.partitionBy(_BKT).orderBy(*order_cols)
    return (
        b.join(offsets, F.col(_BKT).eqNullSafe(F.col(_BKT + "_o")))
        .withColumn(out, (F.row_number().over(win) + F.col(_OFF)).cast("long"))
        .drop(_BKT, _BKT + "_o", _OFF)
    )


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[str | Column],
    bucket: Column,
    val: str,
    out: str = "cum",
) -> DataFrame:
    """Append ``out`` = ``sum(val) OVER (ORDER BY order_cols ROWS BETWEEN
    UNBOUNDED PRECEDING AND CURRENT ROW)`` — the running-sum sibling of
    ``distributed_row_number`` (which is this with val = 1), same
    order-consistent ``bucket`` contract and the same two-level scheme:
    per-bucket totals, one exclusive cumulative pass over the DISTINCT
    buckets only, inclusive within-bucket windows in parallel.

    ``order_cols`` must be a total order for per-row identity with the
    single-partition window (ties would make the inclusive frame
    order-dependent); call sites here run it over DISTINCT-value
    relations, where the value itself is the total order. Result type is
    ``sum(val)``'s (long for integral val — pinned against the window sum
    in tests/test_properties.py).
    """
    b = df.withColumn(_BKT, bucket)
    totals = b.groupBy(_BKT).agg(F.sum(F.col(val)).alias("__cs_n"))
    cum = Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        F.col(_BKT).alias(_BKT + "_o"),
        F.coalesce(F.sum("__cs_n").over(cum), F.lit(0)).alias(_OFF),
    )
    win = (
        Window.partitionBy(_BKT)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # offsets is DISTINCT-BUCKET-sized — coarse by the bucket contract —
    # so broadcast it instead of letting a stale estimate shuffle ``df``
    return (
        b.join(F.broadcast(offsets), F.col(_BKT).eqNullSafe(F.col(_BKT + "_o")))
        .withColumn(out, F.sum(F.col(val)).over(win) + F.col(_OFF))
        .drop(_BKT, _BKT + "_o", _OFF)
    )


def fractional_rank2(
    df: DataFrame,
    col: str,
    bucket: Column,
    out: str,
) -> DataFrame:
    """Append ``out`` = TWICE the fractional (average) rank of ``df[col]``
    under ``ORDER BY col`` — the tie-correct rank Spearman/rank-biserial
    statistics need, doubled so it stays an exact integer (ties average
    two half-integers).

    2·avg_rank(v) = 2·cum(v) − c(v) + 1 where c is v's multiplicity and
    ``cum`` the inclusive running count over the DISTINCT-value relation
    (so avg_rank = min_rank + (c−1)/2). The distinct relation is where
    ``distributed_cumsum`` runs — value-cardinality-sized, never
    row-scale — and the rank map joins back on the value (broadcastable
    whenever the domain is bounded: a rounded ratio, a length column).
    ``bucket`` follows the ``distributed_row_number`` contract over
    ``col`` alone. NULL values get no rank row (inner join drops them) —
    filter or coalesce first; matches SQL rank() semantics only on
    NULL-free input.
    """
    c = df.groupBy(col).agg(F.count(F.lit(1)).alias("__fr_c"))
    cummed = distributed_cumsum(
        c, [F.col(col).asc()], bucket, "__fr_c", out="__fr_cum"
    )
    ranks = cummed.select(
        F.col(col).alias("__fr_v"),
        (F.lit(2) * F.col("__fr_cum") - F.col("__fr_c") + F.lit(1)).alias(out),
    )
    # the rank map is value-cardinality-sized — bounded by contract at
    # every call site — so broadcast it rather than letting a stale size
    # estimate shuffle the row side (pinned in tests/test_plans.py)
    return df.join(F.broadcast(ranks), df[col] == F.col("__fr_v")).drop("__fr_v")


def exact_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    bucket: Column,
    k: int,
    out: str = "tile",
) -> DataFrame:
    """Append ``out`` = ``ntile(k) OVER (ORDER BY order_cols)`` — computed
    distributed, value-identical to the window ntile by construction.

    ``distributed_row_number`` (same ``bucket`` contract) gives each row
    its global rank rn; ntile's documented split — with n rows, the first
    ``n % k`` tiles get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — is
    then closed-form from (rn, n). The 1-row count scalar broadcasts
    (whitelisted BNLJ at every call site); no global sort anywhere.
    Matches the single-partition ``ntile`` for every n including n < k
    (then q = 0, but rn <= n <= head so the q-divide branch is
    unreachable) — pinned against F.ntile in tests/test_properties.py.
    """
    ranked = distributed_row_number(df, order_cols, bucket, out=_RN)
    n = df.agg(F.count(F.lit(1)).alias("__nt_n"))
    q, r = F.floor(F.col("__nt_n") / k), F.col("__nt_n") % k
    head = r * (q + 1)  # rows living in the first r (bigger) tiles
    tile = (
        F.when(F.col(_RN) <= head, F.ceil(F.col(_RN) / (q + 1)))
        .otherwise(r + F.ceil((F.col(_RN) - head) / q))
        .cast("int")
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(out, tile)
        .drop(_RN, "__nt_n")
    )
