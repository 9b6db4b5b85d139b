"""The reference's full medallion pipeline (bronze -> silver -> gold), as an
engine module: raw headerless CSVs -> typed tables -> enriched star schema ->
generated date dimensions (ipynb cells 3-18; SURVEY.md §0 flow diagram).

Stage map (reference cites):
  bronze  : CSV scan, `_c*` strings              (cell 4,  ipynb:L250-264)
  silver  : rename + cast via format_columns     (cell 8,  ipynb:L960-997)
  gold    : duration/time_id/ages enrichment     (cell 10, ipynb:L1072-1101)
  dims    : trip_dates / payment_dates spines    (cells 12/17/18)

Scale posture (deliberate deltas from the reference, SURVEY.md §7.4.8):
* facts are written partitioned by a date column (`started_month` for trips,
  `year` of date_id for payments) — the reference writes unpartitioned
  Delta, which forfeits partition pruning at 100 TB;
* the riders birthday join for `age_at_ride_time` broadcasts the projected
  (rider_id, birthday) dim exactly like the reference's manual `.select`
  narrow-then-join (J3, ipynb:L1093);
* every stage is DataFrame -> DataFrame; writes happen only in `run()`, so
  the DAG is testable without IO.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.derive import age_years, duration_seconds, hour_truncated
from ..functions.schema import format_bikeshare_table
from ..sources.readers import read_csv_raw
from ..sources.writers import overwrite_parquet_table
from .dates import payment_dates_dim, trip_dates_dim


def bronze(spark: SparkSession, csv_dir: str) -> dict[str, DataFrame]:
    """Raw ingestion: 4 headerless CSVs -> all-string `_c*` frames (cell 4)."""
    return {
        t: read_csv_raw(spark, os.path.join(csv_dir, f"{t}.csv"))
        for t in ("payments", "trips", "riders", "stations")
    }


def silver(raw: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Typed tables via the rename/cast registry (cell 8)."""
    return {t: format_bikeshare_table(df, t) for t, df in raw.items()}


def gold(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Enrichment (cell 10, ipynb:L1072-1101):

    * trips += duration (seconds), time_id (hour-truncated started_at),
      age_at_ride_time (rider birthday join J3);
    * riders += age_at_account_start;
    * payments pruned to its 4 final columns (P3).
    """
    riders = tables["riders"].withColumn(
        "age_at_account_start", age_years("birthday", "account_start_date")
    )
    birthdays = riders.select("rider_id", "birthday")  # J3 narrow dim (L1093)
    trips = (
        tables["trips"]
        .withColumn("duration", duration_seconds())
        .withColumn("time_id", hour_truncated("started_at"))
        .join(F.broadcast(birthdays), on="rider_id", how="inner")
        .withColumn("age_at_ride_time", age_years("birthday", F.to_date("started_at")))
        .select(
            "trip_id", "duration", "rideable_type", "age_at_ride_time",
            "started_at", "ended_at", "start_station_id", "end_station_id",
            "time_id", "rider_id",
        )
    )
    payments = tables["payments"].select("payment_id", "amount", "date_id", "rider_id")
    return {
        "trips": trips,
        "payments": payments,
        "riders": riders,
        "stations": tables["stations"],
    }


def date_dims(spark: SparkSession, gold_tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Generated dimensions (cells 12/17/18)."""
    return {
        "trip_dates": trip_dates_dim(spark, gold_tables["trips"], "time_id"),
        "payment_dates": payment_dates_dim(spark, gold_tables["payments"], "date_id"),
    }


def run(
    spark: SparkSession, csv_dir: str, out_dir: str, versioned: bool = False
) -> dict[str, DataFrame]:
    """Full pipeline: ingest -> format -> enrich -> dims -> partitioned
    parquet star schema under ``out_dir``. Returns the written frames
    (re-read from storage, like the reference's reload cell 20).

    ``versioned=True`` writes each table through the snapshot store
    (sources/versioned.py): re-runs create new versions instead of
    replacing files in place — the Delta-equivalent posture for pipelines
    that re-derive tables from themselves."""
    from ..sources import versioned as V

    g = gold(silver(bronze(spark, csv_dir)))
    dims = date_dims(spark, g)
    partitioning = {
        "trips": ["started_month"],
        "payments": ["pay_year"],
    }
    for name, df in {**g, **dims}.items():
        part = partitioning.get(name)
        if name == "trips":
            df = df.withColumn("started_month", F.date_format("started_at", "yyyy-MM"))
        elif name == "payments":
            df = df.withColumn("pay_year", F.year("date_id"))
        if versioned:
            V.write_version(df, os.path.join(out_dir, name), partition_by=part)
        else:
            overwrite_parquet_table(df, os.path.join(out_dir, name), partition_by=part)
    out = {}
    for name in list(g) + list(dims):
        if versioned:
            df = V.read_current(spark, os.path.join(out_dir, name))
        else:
            df = spark.read.parquet(os.path.join(out_dir, name))
        drop = {"trips": "started_month", "payments": "pay_year"}.get(name)
        out[name] = df.drop(drop) if drop else df
    return out
