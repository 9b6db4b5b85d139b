"""Skew mitigation primitives.

The reference's own data is skewed (its top rider logs ~26,866 rides/month —
SURVEY.md §7.4.8), and at 100 TB a single hot group key turns one reducer
into the job's critical path. Two standard remedies, engine-packaged:

* **Salted two-phase aggregation** — spread each group over N salt buckets,
  partially aggregate (hot key now split N ways), then aggregate the
  partials. Works for any algebraic aggregate expressed as (partial, merge).
* **AQE skew-join splitting** is already on in the session factory for the
  join-side version of the same problem.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    value: Column | str,
    n_salts: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase salted sum+count per group.

    Phase 1 groups by (group_cols..., salt) — a hot key's rows land in
    ``n_salts`` different reduce partitions; phase 2 merges the ≤ n_salts
    partial rows per key. Because sum/count are algebraic, the result is
    identical to a direct groupBy (asserted in tests), but the max reducer
    load drops by ~n_salts for hot keys.

    ``avg`` comes out as sum/count at the call site — never average partial
    averages.
    """
    v = F.col(value) if isinstance(value, str) else value
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    partial = (
        df.select(*group_cols, v.alias("__v"), salt)
        .groupBy(*group_cols, "__salt")
        # count(lit(1)) = row count, matching the count(*) of the plain
        # groupBy twin even when the measure column contains nulls
        # (count('__v') would skip null measures and silently diverge)
        .agg(F.sum("__v").alias("__ps"), F.count(F.lit(1)).alias("__pc"))
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__ps").alias(sum_alias), F.sum("__pc").alias(count_alias)
    )
