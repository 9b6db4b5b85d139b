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
