"""Index/monitoring diagnostics — q233 embedding hubness (the k-occurrence
pathology audit of the ANN index) and q234 seasonal-naive volume anomaly
flags (the online monitoring rule next to q191's offline CUSUM).

Registered after plans/experiment.py in plans/registry.py: registry
insertion order is registration order, which the gate scheduler's
overflow rule depends on (plans/evidence.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import _t, query
from .extensions import _BRUTE_TOPK_ORACLE, q64

_HUBNESS_SQL = f"""WITH topk AS ({_BRUTE_TOPK_ORACLE}),
    occ AS (SELECT neighbor_id, count(*) AS c FROM topk GROUP BY 1),
    total AS (SELECT count(*) AS n_vectors_total FROM embeddings),
    hist AS (SELECT CAST(c AS BIGINT) AS n_occurrences,
                    count(*) AS n_vectors
             FROM occ GROUP BY 1
             UNION ALL
             SELECT 0 AS n_occurrences,
                    n_vectors_total - (SELECT count(*) FROM occ) AS n_vectors
             FROM total)
    SELECT n_occurrences, CAST(n_vectors AS BIGINT) AS n_vectors
    FROM hist WHERE n_vectors > 0 ORDER BY n_occurrences"""


@query(
    "q233_embedding_hubness",
    _HUBNESS_SQL,
    tags=("similarity", "hubness", "diagnostics", "ann"),
)
def q233(spark, sf):
    """Hubness audit of the embedding space: the k-occurrence histogram —
    for the exact top-5 relation, how many corpus vectors appear as a
    neighbor 0, 1, 2, ... times. High-dimensional spaces grow "hubs"
    (vectors that are everyone's neighbor) and anti-hubs (never
    retrieved); a heavy occurrence tail is the standard diagnostic that
    cosine retrieval quality will degrade and that the space wants
    centering/whitening (q140/q141's job). Rides the q64 BLAS kernel —
    row-identical to the q39 fold (pinned in tests/test_plans.py) but
    ~10x faster at stress scale (r5 verdict item 3: the fold made this
    diagnostic the slowest query in the stress suite at 341.6 s for two
    metadata-scale aggregates) — so the audit costs two hash aggs on top
    of the deployment-path search it diagnoses.

    Scale shape: the input is |queries| x k rows (never corpus-squared);
    occurrence counting is one hash agg, the histogram another, and the
    zero bucket comes from one 1-row corpus-count scalar."""
    topk = q64(spark, sf)
    occ = topk.groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("c"))
    hist = occ.groupBy(F.col("c").cast("long").alias("n_occurrences")).agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    total = _t(spark, sf, "embeddings").agg(
        F.count(F.lit(1)).alias("n_vectors_total")
    )
    n_hit = occ.agg(F.count(F.lit(1)).alias("n_hit"))
    zero = (
        total.crossJoin(F.broadcast(n_hit))
        .select(
            F.lit(0).cast("long").alias("n_occurrences"),
            (F.col("n_vectors_total") - F.col("n_hit")).alias("n_vectors"),
        )
    )
    return (
        hist.unionByName(zero)
        .where(F.col("n_vectors") > 0)
        .orderBy("n_occurrences")
    )


_ANOMALY_SQL = """WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS volume
        FROM events GROUP BY 1, 2),
    joined AS (
        SELECT d.event_type, d.day, d.volume,
               f.volume AS forecast,
               d.volume - f.volume AS residual
        FROM daily d
        JOIN daily f ON f.event_type = d.event_type
                    AND f.day = d.day - INTERVAL 7 DAY),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(residual) AS DOUBLE) AS sr,
               CAST(sum(residual * residual) AS DOUBLE) AS srr
        FROM joined GROUP BY 1),
    scored AS (
        SELECT j.event_type, j.day, j.volume, j.forecast, j.residual,
               CASE WHEN (srr - sr * sr / n) / n = 0 THEN NULL
                    ELSE (j.residual - sr / n)
                         / sqrt((srr - sr * sr / n) / n) END AS zr
        FROM joined j JOIN stats s ON j.event_type = s.event_type)
    SELECT event_type, day, volume, forecast, residual,
           round(zr, 6) AS z,
           coalesce(abs(zr) > 3, FALSE) AS is_anomaly
    FROM scored ORDER BY event_type, day"""


@query(
    "q234_volume_anomaly_flags",
    _ANOMALY_SQL,
    tags=("monitoring", "anomaly", "seasonal-naive", "timeseries"),
)
def q234(spark, sf):
    """Seasonal-naive volume anomaly flags: per (event_type, day), the
    forecast is the same weekday one week earlier, and a day is anomalous
    when its residual sits more than 3 population standard deviations
    from the type's mean residual — the ONLINE ingest-monitoring rule
    that pages someone, next to q191's offline CUSUM changepoint and
    q219's distribution drift. Days without a week-earlier observation
    carry no forecast and are excluded (calendar join, not a row lag, so
    gaps never misalign the season).

    Scale shape: one data-scale hash aggregate to (type, day) counts;
    the forecast join, the per-type exact moments (integer residuals —
    counts minus counts — so Σr and Σr² aggregate exactly; the q152
    idiom) and the stats join-back all run on the bounded type x day
    table. A zero-variance type yields NULL z / no anomaly on both
    engines rather than a divide-by-zero."""
    ev = _t(spark, sf, "events")
    # the per-(type, day) aggregate is BOUNDED (types x observation days)
    # and has three consumers (the forecast side, the observation side,
    # and through them the stats pass): materialize it once so the fact
    # table is scanned and aggregated exactly once, not once per consumer
    daily = (
        ev.select("event_type", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("volume"))
        .localCheckpoint()
    )
    fc = daily.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("volume").alias("forecast"),
    )
    joined = daily.join(fc, ["event_type", "day"]).select(
        "event_type",
        "day",
        "volume",
        "forecast",
        (F.col("volume") - F.col("forecast")).alias("residual"),
    )
    stats = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("residual").cast("double").alias("sr"),
        F.sum(F.col("residual") * F.col("residual")).cast("double").alias("srr"),
    )
    n, sr, srr = F.col("n"), F.col("sr"), F.col("srr")
    var = (srr - sr * sr / n) / n
    zr = F.when(var == 0, F.lit(None)).otherwise(
        (F.col("residual") - sr / n) / F.sqrt(var)
    )
    return (
        joined.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "volume",
            "forecast",
            "residual",
            F.round(zr, 6).alias("z"),
            F.coalesce(F.abs(zr) > 3, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )
