"""Time-series repair heads — q205 gap-fill with linear interpolation.

Registered after plans/containment.py in plans/registry.py: registry
insertion order is registration order, which the gate scheduler's
overflow rule depends on (plans/evidence.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.agg import exact_sum
from .base import _t, query


@query(
    "q205_gap_fill_interpolate",
    """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                      FROM events GROUP BY 1, 2),
        spine AS (SELECT user_id,
                         CAST(unnest(generate_series(min(day), max(day),
                                                     INTERVAL 1 DAY)) AS DATE) AS day
                  FROM daily GROUP BY user_id),
        joined AS (SELECT s.user_id, s.day, d.v FROM spine s
                   LEFT JOIN daily d USING (user_id, day)),
        ctx AS (SELECT user_id, day, v,
                       last_value(v IGNORE NULLS) OVER w_prev AS pv,
                       last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                           OVER w_prev AS pd,
                       first_value(v IGNORE NULLS) OVER w_next AS nv,
                       first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                           OVER w_next AS nd
                FROM joined
                WINDOW w_prev AS (PARTITION BY user_id ORDER BY day
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       w_next AS (PARTITION BY user_id ORDER BY day
                                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT user_id, day,
               round(CASE WHEN v IS NOT NULL THEN v
                          ELSE pv + (nv - pv) * ((day - pd) * 1.0 / (nd - pd))
                     END, 6) AS value_sum,
               v IS NULL AS interpolated
        FROM ctx""",
    tags=("timeseries", "gap-fill", "interpolation", "window"),
)
def q205(spark, sf):
    """Per-user daily gap-fill with LINEAR interpolation — the time-series
    repair pass a metrics/feature pipeline runs before windowed models:
    densify each user's activity to a contiguous daily spine (their own
    first..last active day, so every gap has both neighbors) and fill
    missing days on the straight line between the surrounding observed
    values.

    Scale shape: everything is partitioned BY USER — the spine explode,
    both ignore-nulls neighbor windows, and the final projection; no
    global pass, no driver state, and the spine join is an equi-join on
    (user_id, day). The interpolation expression is written identically
    here and in the oracle (one double multiply of an exact day-fraction,
    added to the previous value) so both engines produce bit-equal
    doubles before the shared 6-dp round."""
    ev = _t(spark, sf, "events")
    daily = (
        ev.select("user_id", F.to_date("ts").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(exact_sum("value", "v"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = joined.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    frac = (F.unix_date("day") - F.unix_date("pd")) * F.lit(1.0) / (
        F.unix_date("nd") - F.unix_date("pd")
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    )
    return ctx.select(
        "user_id",
        "day",
        F.round(filled, 6).alias("value_sum"),
        F.col("v").isNull().alias("interpolated"),
    )
