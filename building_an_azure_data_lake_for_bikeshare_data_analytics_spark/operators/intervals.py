"""Interval (range) operators: overlap join and sweep-line stacking.

Spark has no native range join — a naive interval-overlap join is either
a BroadcastNestedLoopJoin (quadratic compare count) or an un-plannable
theta join. The scalable shapes, both here:

* **bucketed overlap join** — quantize each interval to the coarse grid
  buckets it touches, equi-join on (key, bucket) so only grid-cohabiting
  intervals are compared, dedup pairs, then apply the exact overlap
  predicate. Output is exactly the theta join's; cost is
  sum-over-buckets(|bucket|²) instead of |R|² per key, and the bucket
  width is the operator's skew lever (the same trick Databricks' range
  join hint implements natively).
* **sweep-line stacking** — max concurrent open intervals per key needs
  no pair relation at all: +1/-1 boundary events, one window-ordered
  running sum per key, max. Linear, one shuffle on the key; when the
  question is "how deep do the overlaps stack" (not "which pairs"), this
  is the 100 TB answer and the overlap join is the wrong tool.

Both operators treat intervals as CLOSED ([start, end], end inclusive),
matching SQL BETWEEN semantics so the DuckDB oracles are literal
inequality joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_overlap_join(
    intervals: DataFrame,
    key: str,
    id_col: str,
    start: str,
    end: str,
    bucket_days: int = 30,
    candidates_only: bool = False,
) -> DataFrame:
    """All pairs of intervals on the same ``key`` whose closed date ranges
    [start, end] overlap: ``a.start <= b.end AND b.start <= a.end``,
    ``a.id < b.id``.

    Candidate generation explodes each interval to the ``bucket_days``-
    wide grid cells it touches (an interval of length L covers
    ceil(L/width)+1 <= 2 cells when L <= width — pick the width near the
    typical interval length) and equi-joins on (key, cell). Any
    overlapping pair shares the cell containing the later start, so no
    false negatives; ``distinct`` collapses multi-cell double-matches
    before the exact predicate runs.

    Returns (key, id_a, id_b, start_a, end_a, start_b, end_b).

    ``candidates_only=True`` returns the CANDIDATE pair relation —
    (key, id_a, id_b), distinct, grid-equi-join only, NO overlap
    predicate — mirroring ``lsh_dup_pairs``'s flag, so telemetry tools
    measuring the candidate:verified ratio exercise the operator's own
    candidate derivation instead of re-implementing it (r6 advice:
    a hand copy silently diverges when the cell derivation changes).
    """
    # floor division, NOT double-divide + cast: cast("long") truncates
    # toward zero, which would merge days -(bucket_days-1)..bucket_days-1
    # into one double-width epoch-straddling cell for pre-1970 dates
    cell = lambda c: F.floor(F.unix_date(F.col(c)) / F.lit(bucket_days)).cast("long")  # noqa: E731
    ex = intervals.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("iid"),
        F.col(start).alias("s"),
        F.col(end).alias("e"),
        F.explode(F.sequence(cell(start), cell(end))).alias("cell"),
    )
    a, b = ex.alias("a"), ex.alias("b")
    if candidates_only:
        return (
            a.join(
                b,
                (F.col("a.k") == F.col("b.k"))
                & (F.col("a.cell") == F.col("b.cell"))
                & (F.col("a.iid") < F.col("b.iid")),
            )
            .select(
                F.col("a.k").alias(key),
                F.col("a.iid").alias("id_a"),
                F.col("b.iid").alias("id_b"),
            )
            .distinct()
        )
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.iid") < F.col("b.iid"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.k").alias(key),
            F.col("a.iid").alias("id_a"),
            F.col("b.iid").alias("id_b"),
            F.col("a.s").alias("start_a"),
            F.col("a.e").alias("end_a"),
            F.col("b.s").alias("start_b"),
            F.col("b.e").alias("end_b"),
        )
        .distinct()
    )


def interval_stacking(
    intervals: DataFrame,
    key: str,
    start: str,
    end: str,
    at_least: int = 1,
) -> DataFrame:
    """Max concurrency per key: the deepest stack of simultaneously-open
    closed intervals, via the sweep line. Each interval contributes a
    (+1 at start) and a (-1 at end + 1 day) boundary event — the +1-day
    shift makes [s, e] inclusive, so an interval ending on day d still
    overlaps one starting on day d (their events land on different days
    and both count as open on d). The running sum ordered by
    (event day, delta ASC) — closes BEFORE opens on the same event day —
    is the concurrency profile; its max is the answer. The tie order
    matters for ADJACENT intervals ([s, e] then [e+1, ...]): their -1 and
    +1 collide on day e+1, and since the +1-day shift already encoded the
    inclusivity, colliding events mean genuinely disjoint intervals —
    processing the open first would fabricate a depth-2 moment that no
    calendar day has (caught by the brute-force sweep in
    tests/test_intervals.py).

    Returns (key, max_concurrent, n_intervals) for keys with
    max_concurrent >= ``at_least``.
    """
    ev = intervals.select(
        F.col(key).alias("k"), F.unix_date(F.col(start)).alias("d"), F.lit(1).alias("delta")
    ).unionAll(
        intervals.select(
            F.col(key),
            F.unix_date(F.col(end)) + F.lit(1),
            F.lit(-1),
        )
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("d"), F.col("delta").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prof = ev.select("k", F.sum("delta").over(w).alias("open_now"), "delta")
    return (
        prof.groupBy("k")
        .agg(
            F.max("open_now").cast("int").alias("max_concurrent"),
            (F.count(F.lit(1)) / 2).cast("int").alias("n_intervals"),
        )
        .where(F.col("max_concurrent") >= F.lit(at_least))
        .select(F.col("k").alias(key), "max_concurrent", "n_intervals")
    )
