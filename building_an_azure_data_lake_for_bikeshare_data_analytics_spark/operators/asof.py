"""As-of (point-in-time) join — an operator Spark has no native primitive
for, composed from union + ordered window carry-forward (SURVEY.md §2.6:
absent from the reference; standard in event/feature pipelines).

For each left row (user_id, ts) find the greatest right timestamp <= ts for
that user. Composition:

  1. union right rows (carrying their timestamp as the payload) with left
     rows (null payload), tagged so rights sort before lefts at equal ts;
  2. one window per user ordered by (ts, tag): ``last(payload, ignorenulls)``
     over the unbounded-preceding frame carries the latest right value
     forward;
  3. keep the left rows.

Scale shape: a single shuffle on user_id (the window key) over the union —
no range-join explosion, no per-row Python; skewed users are bounded by the
same salting/AQE strategies as any window. This is the composition path (a)
from the build contract; a native range-join would be (b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_alias: str = "asof_value",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the greatest ``right_ts`` <=
    ``left_ts`` for the same ``on`` key (null if none)."""
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.col(right_ts).alias("__payload"),
        F.lit(0).alias("__tag"),
    )
    l_cols = [c for c in left.columns if c != on]
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(1).alias("__tag"),
        *l_cols,
    )
    # align schemas: right side gets nulls for the left's payload columns
    r_aligned = r.select(
        *[F.col(c) if c in r.columns else F.lit(None).cast(l.schema[c].dataType).alias(c) for c in l.columns]
    )
    unioned = r_aligned.unionByName(l)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__asof", F.last("__payload", ignorenulls=True).over(w))
    return (
        carried.where(F.col("__tag") == 1)
        .select(on, F.col("__t").alias(left_ts), *l_cols, F.col("__asof").alias(value_alias))
    )
