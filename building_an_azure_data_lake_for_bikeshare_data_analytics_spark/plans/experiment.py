"""Experimentation / lifecycle heads — q230-q232: the measurement layer
for product changes over the events stream: Kaplan-Meier churn survival
(q230), CUPED variance-reduced experiment readout (q231), and the
two-proportion z-test on conversion (q232).

Registered after plans/intake.py in plans/registry.py: registry
insertion order is registration order, which the gate scheduler's
overflow rule depends on (plans/evidence.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from .base import _t, query

# A user "dies" at their first CRITICAL error (value above this); users
# who never hit one are right-censored at their last observed day.
_CRITICAL_VALUE = 150

_KM_SQL = f"""WITH per_user AS (
        SELECT user_id,
               min(CAST(ts AS DATE)) AS d0,
               max(CAST(ts AS DATE)) AS dlast,
               min(CASE WHEN event_type = 'error' AND value > {_CRITICAL_VALUE}
                        THEN CAST(ts AS DATE) END) AS derr
        FROM events GROUP BY 1),
    lifetimes AS (
        SELECT date_diff('day', d0, coalesce(derr, dlast)) AS duration_days,
               CAST(derr IS NOT NULL AS INTEGER) AS churned
        FROM per_user),
    per_t AS (
        SELECT duration_days,
               count(*) AS n_total,
               CAST(sum(churned) AS BIGINT) AS n_deaths
        FROM lifetimes GROUP BY 1),
    risk AS (
        SELECT duration_days, n_total, n_deaths,
               CAST(sum(n_total) OVER (ORDER BY duration_days
                                       ROWS BETWEEN CURRENT ROW
                                       AND UNBOUNDED FOLLOWING) AS BIGINT)
                   AS n_at_risk
        FROM per_t),
    km AS (
        SELECT duration_days, n_at_risk, n_deaths,
               n_total - n_deaths AS n_censored,
               sum(CASE WHEN n_deaths > 0 AND n_deaths < n_at_risk
                        THEN CAST(ln(1 - n_deaths / n_at_risk)
                                  AS DECIMAL(18,12))
                        ELSE CAST(0 AS DECIMAL(18,12)) END)
                   OVER w AS log_surv,
               max(CASE WHEN n_deaths >= n_at_risk THEN 1 ELSE 0 END)
                   OVER w AS extinct
        FROM risk
        WINDOW w AS (ORDER BY duration_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT duration_days, n_at_risk, n_deaths, n_censored,
           CASE WHEN extinct = 1 THEN 0.0
                ELSE round(exp(CAST(log_surv AS DOUBLE)), 6) END AS survival
    FROM km WHERE n_deaths > 0 ORDER BY duration_days"""


@query(
    "q230_churn_survival_km",
    _KM_SQL,
    tags=("experiment", "survival", "kaplan-meier", "churn"),
)
def q230(spark, sf):
    """Kaplan-Meier survival curve for time-to-critical-failure: duration
    = days from a user's first event to their first critical error
    (value > 150); users who never hit one are right-censored at their
    last observed day. S(t) = prod over death times <= t of
    (1 - d_i/n_i) — THE time-to-event statistic that q156's cohort table
    feeds into, with censoring handled correctly (a naive rate silently
    treats still-healthy users as if their story were over).

    Scale shape: one data-scale hash aggregate (per-user min/max day);
    everything after runs on the per-duration table, which is bounded by
    the observation window in DAYS (31 here, ~thousands for a real lake),
    so the two ordered windows (reverse-cumulative risk set, cumulative
    log-survival) are metadata-scale. Determinism: each factor is one
    ln() of an IEEE-identical ratio of exact int64 counts, quantized to
    DECIMAL(18,12) (the q138/q206 idiom) so the cumulative sum is exact
    integer arithmetic; the d_i = n_i extinction row short-circuits to
    0 before ln(0) on both engines."""
    ev = _t(spark, sf, "events")
    day = F.col("ts").cast("date")
    per_user = ev.groupBy("user_id").agg(
        F.min(day).alias("d0"),
        F.max(day).alias("dlast"),
        F.min(
            F.when(
                (F.col("event_type") == "error")
                & (F.col("value") > _CRITICAL_VALUE),
                day,
            )
        ).alias("derr"),
    )
    lifetimes = per_user.select(
        F.datediff(F.coalesce("derr", "dlast"), F.col("d0"))
        .cast("long")
        .alias("duration_days"),
        F.col("derr").isNotNull().cast("int").alias("churned"),
    )
    per_t = lifetimes.groupBy("duration_days").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("churned").alias("n_deaths"),
    )
    w_risk = (
        Window.orderBy("duration_days")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = per_t.select(
        "duration_days",
        "n_total",
        "n_deaths",
        F.sum("n_total").over(w_risk).alias("n_at_risk"),
    )
    w = (
        Window.orderBy("duration_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    term = F.when(
        (F.col("n_deaths") > 0) & (F.col("n_deaths") < F.col("n_at_risk")),
        F.log(F.lit(1) - F.col("n_deaths") / F.col("n_at_risk")).cast(
            DecimalType(18, 12)
        ),
    ).otherwise(F.lit(0).cast(DecimalType(18, 12)))
    km = risk.select(
        "duration_days",
        "n_at_risk",
        "n_deaths",
        (F.col("n_total") - F.col("n_deaths")).alias("n_censored"),
        F.sum(term).over(w).alias("log_surv"),
        F.max(
            F.when(F.col("n_deaths") >= F.col("n_at_risk"), 1).otherwise(0)
        )
        .over(w)
        .alias("extinct"),
    )
    return (
        km.where(F.col("n_deaths") > 0)
        .select(
            "duration_days",
            "n_at_risk",
            "n_deaths",
            "n_censored",
            F.when(F.col("extinct") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("log_surv").cast("double")), 6))
            .alias("survival"),
        )
        .orderBy("duration_days")
    )


# CUPED pre/post boundary: the events corpus spans January 2024; the
# first half is the pre-experiment covariate window.
_CUPED_SPLIT = "2024-01-16"

_CUPED_MOMENTS_SQL = f"""
        SELECT user_id % 2 AS variant,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(y * y) AS DOUBLE) AS syy
        FROM (SELECT user_id,
                     coalesce(sum(CASE WHEN CAST(ts AS DATE) < DATE '{_CUPED_SPLIT}'
                                       THEN CAST(value AS DECIMAL(18,2)) END),
                              0) AS x,
                     coalesce(sum(CASE WHEN CAST(ts AS DATE) >= DATE '{_CUPED_SPLIT}'
                                       THEN CAST(value AS DECIMAL(18,2)) END),
                              0) AS y
              FROM events GROUP BY 1)
        GROUP BY 1"""

_CUPED_SQL = f"""WITH m AS ({_CUPED_MOMENTS_SQL}),
    pooled AS (SELECT sum(n) AS pn, sum(sx) AS psx, sum(sy) AS psy,
                      sum(sxx) AS psxx, sum(sxy) AS psxy
               FROM m),
    th AS (SELECT (pn * psxy - psx * psy) / (pn * psxx - psx * psx) AS theta,
                  psx / pn AS pooled_mean_x
           FROM pooled)
    SELECT CAST(variant AS BIGINT) AS variant,
           CAST(n AS BIGINT) AS n_users,
           round(sy / n, 6) AS mean_post,
           round(sy / n - theta * (sx / n - pooled_mean_x), 6) AS mean_cuped,
           round((syy - sy * sy / n) / n
                 - 2 * theta * ((sxy - sx * sy / n) / n)
                 + theta * theta * ((sxx - sx * sx / n) / n), 6) AS var_cuped,
           round((syy - sy * sy / n) / n, 6) AS var_post,
           round(1 - ((syy - sy * sy / n) / n
                      - 2 * theta * ((sxy - sx * sy / n) / n)
                      + theta * theta * ((sxx - sx * sx / n) / n))
                     / ((syy - sy * sy / n) / n), 6) AS var_reduction
    FROM m CROSS JOIN th ORDER BY variant"""


@query(
    "q231_cuped_readout",
    _CUPED_SQL,
    tags=("experiment", "cuped", "variance-reduction", "ab-test"),
)
def q231(spark, sf):
    """CUPED experiment readout (Deng et al. 2013): per-variant post-period
    spend means adjusted by the pre-period covariate, Y' = Y − θ(X − X̄),
    with θ = cov(X,Y)/var(X) fitted on the POOLED population (the
    standard choice — fitting θ per variant biases the delta). Reported
    per variant: raw and adjusted means, raw and adjusted variance, and
    the variance-reduction ratio that tells the experimenter how much
    sample size CUPED just bought them.

    Scale shape: one data-scale hash aggregate to per-user (x, y) decimal
    sums, one per-variant moment aggregate (six associative sums, exact
    DECIMAL, cast to double ONCE — the q152 idiom), then scalar algebra
    on a two-row table with θ broadcast back. regr_slope/covar_pop would
    accumulate doubles in stream order; the exact moments make the gate
    hash stable under any partitioning."""
    ev = _t(spark, sf, "events")
    day = F.col("ts").cast("date")
    v = F.col("value").cast(DecimalType(18, 2))
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(day < F.lit(_CUPED_SPLIT).cast("date"), v)), F.lit(0)
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(day >= F.lit(_CUPED_SPLIT).cast("date"), v)), F.lit(0)
        ).alias("y"),
    )
    m = per_user.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    pooled = m.agg(
        F.sum("n").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxx").alias("psxx"),
        F.sum("sxy").alias("psxy"),
    )
    th = pooled.select(
        (
            (F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy"))
            / (F.col("pn") * F.col("psxx") - F.col("psx") * F.col("psx"))
        ).alias("theta"),
        (F.col("psx") / F.col("pn")).alias("pooled_mean_x"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    theta = F.col("theta")
    var_post = (syy - sy * sy / n) / n
    var_cuped = (
        var_post
        - F.lit(2) * theta * ((sxy - sx * sy / n) / n)
        + theta * theta * ((sxx - sx * sx / n) / n)
    )
    return (
        m.crossJoin(F.broadcast(th))
        .select(
            F.col("variant").cast("long").alias("variant"),
            n.cast("long").alias("n_users"),
            F.round(sy / n, 6).alias("mean_post"),
            F.round(
                sy / n - theta * (sx / n - F.col("pooled_mean_x")), 6
            ).alias("mean_cuped"),
            F.round(var_cuped, 6).alias("var_cuped"),
            F.round(var_post, 6).alias("var_post"),
            F.round(F.lit(1) - var_cuped / var_post, 6).alias(
                "var_reduction"
            ),
        )
        .orderBy("variant")
    )


#: A user converts when they ever make a HIGH-VALUE purchase — the
#: bare did-they-purchase flag saturates to 1.0 on this corpus (every
#: user buys something in a month), which degenerates the pooled SE.
_CONV_VALUE = 180

_ZTEST_SQL = f"""WITH per_user AS (
        SELECT user_id % 2 AS variant,
               max(CASE WHEN event_type = 'purchase' AND value > {_CONV_VALUE}
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id),
    v AS (SELECT variant, count(*) AS n, CAST(sum(converted) AS BIGINT) AS c
          FROM per_user GROUP BY 1),
    wide AS (SELECT
                 max(CASE WHEN variant = 0 THEN n END) AS n0,
                 max(CASE WHEN variant = 1 THEN n END) AS n1,
                 max(CASE WHEN variant = 0 THEN c END) AS c0,
                 max(CASE WHEN variant = 1 THEN c END) AS c1
             FROM v),
    stat AS (SELECT n0, n1, c0, c1,
                    CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
                         ELSE (c0 / n0 - c1 / n1)
                              / sqrt(((c0 + c1) / (n0 + n1))
                                     * (1 - (c0 + c1) / (n0 + n1))
                                     * (1.0 / n0 + 1.0 / n1)) END AS zr
             FROM wide)
    SELECT n0, n1, c0, c1,
           round(c0 / n0, 6) AS p0,
           round(c1 / n1, 6) AS p1,
           round(zr, 6) AS z,
           coalesce(abs(zr) > 1.96, FALSE) AS significant
    FROM stat"""


@query(
    "q232_conversion_ztest",
    _ZTEST_SQL,
    tags=("experiment", "ztest", "ab-test", "conversion"),
)
def q232(spark, sf):
    """Two-proportion z-test on conversion (did the user ever make a
    high-value purchase) between the two deterministic hash variants —
    the readout behind every conversion A/B dashboard. Emits counts,
    rates, the pooled-SE z statistic and the |z| > 1.96 verdict
    (two-sided alpha = 0.05); a fully-degenerate pool (0% or 100%
    pooled conversion) yields NULL z / not-significant on both engines
    instead of a divide-by-zero.

    Scale shape: one data-scale hash aggregate to per-user conversion
    flags, one 2-row variant aggregate, then a 1-row pivot — the whole
    test is two partial+final aggregations; nothing after the first agg
    depends on corpus size. All inputs to the z formula are exact int64
    counts cast to double inside the SAME expression tree as the oracle,
    so the rounded statistic is bit-stable."""
    ev = _t(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > _CONV_VALUE),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    v = (
        per_user.groupBy((F.col("user_id") % 2).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("converted").alias("c"),
        )
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("c1"),
    )
    n0, n1, c0, c1 = (F.col(c) for c in ("n0", "n1", "c0", "c1"))
    pp = (c0 + c1) / (n0 + n1)
    zr = F.when(
        ((c0 + c1) == 0) | ((c0 + c1) == (n0 + n1)), F.lit(None)
    ).otherwise(
        (c0 / n0 - c1 / n1)
        / F.sqrt(pp * (F.lit(1) - pp) * (F.lit(1.0) / n0 + F.lit(1.0) / n1))
    )
    stat = wide.select("n0", "n1", "c0", "c1", zr.alias("zr"))
    return stat.select(
        "n0",
        "n1",
        "c0",
        "c1",
        F.round(c0 / n0, 6).alias("p0"),
        F.round(c1 / n1, 6).alias("p1"),
        F.round(F.col("zr"), 6).alias("z"),
        F.coalesce(F.abs(F.col("zr")) > 1.96, F.lit(False)).alias(
            "significant"
        ),
    )
