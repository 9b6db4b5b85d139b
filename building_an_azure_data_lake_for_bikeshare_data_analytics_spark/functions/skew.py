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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    row_salt: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Salted equi-join: the remedy when the BIG side's join key is skewed
    and the small side is too large to broadcast (a broadcast join is
    always the first choice — this is for the sort-merge regime).

    The big side gets ``salt = pmod(row_salt, n_salts)`` where ``row_salt``
    must be a per-ROW hash (e.g. ``xxhash64`` of the full row key) — NOT a
    hash of the join key, which would land every hot-key row back in one
    bucket. The small side is replicated ``n_salts`` times, and the join
    runs on (key, salt): a key with 100M rows now spreads over n_salts
    reduce partitions. Row-for-row identical to the plain join (each big
    row matches exactly the replicas carrying its salt) — q111 pins that
    with a full value oracle. Cost: small side shuffles n_salts x its
    size; pick n_salts ~ (hot-key rows / healthy-partition rows).

    AQE's skew-join splitting does this adaptively for detected skew; the
    explicit form works on any Spark, composes with bucketing, and lets
    the caller choose the salt domain per workload.
    """
    b = big.withColumn("__salt", F.pmod(row_salt, F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        b.join(s, (b[big_key] == s[small_key]) & (b["__salt"] == s["__salt"]))
        .drop(b["__salt"])
        .drop(s["__salt"])
    )
