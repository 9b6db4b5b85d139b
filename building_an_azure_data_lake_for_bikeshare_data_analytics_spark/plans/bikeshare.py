"""The reference's 22 concrete analytical queries (SURVEY.md §5.2 G1-G22)
over a bikeshare star schema — the API a user of the reference notebook
would migrate to.

Each function takes the star-schema tables (as produced by
``operators.pipeline.run`` or loaded from an existing lake) and returns the
DataFrame the corresponding notebook cell displays. Invocation cites map
each query to its cell; semantics — including the J5 fan-out row
multiplication and the `datediff/365` age formula — are reproduced, not
"fixed" (SURVEY.md §7.4).

Higher-order shape preserved: the notebook passes ``avg``/``sum`` function
objects as arguments (ipynb:L58 + cell 22 et al.); here the aggregate
factory is likewise a parameter of the five template functions in
``operators.analytics``; these 22 entries are the frozen instantiations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.analytics import analyze_fact, analyze_fact_with_dim, grouped_metric

Star = dict[str, DataFrame]  # trips, payments, riders, stations, trip_dates, payment_dates


def _trips_dow(star: Star) -> DataFrame:
    # cell 22 adds day_of_week from started_at (ipynb:L1851)
    return star["trips"].withColumn("day_of_week", F.dayofweek("started_at"))


# --- G1-G4: analyze_trip_data (cells 23-26) -------------------------------

def g01_avg_duration_by_dow(star: Star) -> DataFrame:
    return analyze_fact(_trips_dow(star), "day_of_week", F.avg("duration").alias("avg_duration"), "avg_duration", 10)


def g02_sum_duration_by_dow(star: Star) -> DataFrame:
    return analyze_fact(_trips_dow(star), "day_of_week", F.sum("duration").alias("sum_duration"), "sum_duration", 10)


def g03_avg_duration_by_start_time(star: Star) -> DataFrame:
    return analyze_fact(star["trips"], "started_at", F.avg("duration").alias("avg_duration"), "avg_duration", 10)


def g04_sum_duration_by_start_time(star: Star) -> DataFrame:
    return analyze_fact(star["trips"], "started_at", F.sum("duration").alias("sum_duration"), "sum_duration", 10)


# --- G5-G8: analyze_duration by station (cells 28-31), top 20 -------------

def g05_avg_duration_by_start_station(star: Star) -> DataFrame:
    return analyze_fact(star["trips"], "start_station_id", F.avg("duration").alias("avg_duration"), "avg_duration", 20)


def g06_sum_duration_by_start_station(star: Star) -> DataFrame:
    return analyze_fact(star["trips"], "start_station_id", F.sum("duration").alias("sum_duration"), "sum_duration", 20)


def g07_avg_duration_by_end_station(star: Star) -> DataFrame:
    return analyze_fact(star["trips"], "end_station_id", F.avg("duration").alias("avg_duration"), "avg_duration", 20)


def g08_sum_duration_by_end_station(star: Star) -> DataFrame:
    return analyze_fact(star["trips"], "end_station_id", F.sum("duration").alias("sum_duration"), "sum_duration", 20)


# --- G9-G10: analyze_duration_by_age (cells 33-34; J2 condition join) -----

def _trips_with_riders(star: Star) -> DataFrame:
    t, r = star["trips"], star["riders"]
    # J2: explicit condition, both rider_id columns kept (ipynb:L3330)
    return t.join(F.broadcast(r), t.rider_id == r.rider_id)


def g09_sum_duration_by_age(star: Star) -> DataFrame:
    return grouped_metric(_trips_with_riders(star), "age_at_account_start",
                          [F.sum("duration").alias("sum_duration")], "sum_duration", limit=10)


def g10_avg_duration_by_age(star: Star) -> DataFrame:
    return grouped_metric(_trips_with_riders(star), "age_at_account_start",
                          [F.avg("duration").alias("avg_duration")], "avg_duration", limit=10)


# --- G11-G12: analyze_duration_by_membership (cell 35; USING join) --------

def g11_avg_duration_by_membership(star: Star) -> DataFrame:
    return analyze_fact_with_dim(star["trips"], star["riders"], "rider_id", "is_member",
                                 F.avg("duration").alias("avg_duration"), "avg_duration", 10)


def g12_sum_duration_by_membership(star: Star) -> DataFrame:
    return analyze_fact_with_dim(star["trips"], star["riders"], "rider_id", "is_member",
                                 F.sum("duration").alias("sum_duration"), "sum_duration", 10)


# --- G13-G18: analyze_payment_data (cell 37) ------------------------------

def _payment_metric(star: Star, group: str, agg, alias: str) -> DataFrame:
    return analyze_fact_with_dim(star["payments"], star["payment_dates"], "date_id",
                                 group, agg.alias(alias), alias, 10)


def g13_sum_amount_by_month(star: Star) -> DataFrame:
    return _payment_metric(star, "month", F.sum("amount"), "amount_sum")


def g14_avg_amount_by_month(star: Star) -> DataFrame:
    return _payment_metric(star, "month", F.avg("amount"), "amount_avg")


def g15_sum_amount_by_quarter(star: Star) -> DataFrame:
    return _payment_metric(star, "quarter", F.sum("amount"), "amount_sum")


def g16_avg_amount_by_quarter(star: Star) -> DataFrame:
    return _payment_metric(star, "quarter", F.avg("amount"), "amount_avg")


def g17_sum_amount_by_year(star: Star) -> DataFrame:
    return _payment_metric(star, "year", F.sum("amount"), "amount_sum")


def g18_avg_amount_by_year(star: Star) -> DataFrame:
    return _payment_metric(star, "year", F.avg("amount"), "amount_avg")


# --- G19-G20: analyze_member_payment_data (cell 38) -----------------------

def g19_member_avg_amount_by_age(star: Star) -> DataFrame:
    return analyze_fact_with_dim(star["payments"], star["riders"], "rider_id",
                                 "age_at_account_start", F.avg("amount").alias("amount_avg"),
                                 "amount_avg", 10, dim_filter=F.col("is_member") == True)  # noqa: E712


def g20_member_sum_amount_by_age(star: Star) -> DataFrame:
    return analyze_fact_with_dim(star["payments"], star["riders"], "rider_id",
                                 "age_at_account_start", F.sum("amount").alias("amount_sum"),
                                 "amount_sum", 10, dim_filter=F.col("is_member") == True)  # noqa: E712


# --- G21-G22: extra-credit fan-out queries (cells 40-41) ------------------

def g21_member_spend_and_rides_per_month(star: Star) -> DataFrame:
    """cell 40 (ipynb:L5160-5171): trips ⋈ payments on rider_id (fan-out!)
    ⋈ member riders; per rider-month avg spend + ride count."""
    trips = star["trips"].withColumn("month", F.month("time_id")).select(
        "rider_id", "time_id", "month", "trip_id"
    )
    pay = star["payments"].select("rider_id", "amount")
    member = star["riders"].where(F.col("is_member") == True).select("rider_id")  # noqa: E712
    j = trips.join(pay, "rider_id").join(F.broadcast(member), "rider_id")
    return grouped_metric(
        j, ["rider_id", "month"],
        [F.avg("amount").alias("avg_amount"), F.count("trip_id").alias("num_rides")],
        order_by="num_rides", limit=10,
    )


def g22_member_spend_duration_per_minutes_month(star: Star) -> DataFrame:
    """cell 41 (ipynb:L5365-5381): trips ⋈ riders ⋈ payments, member filter,
    per rider-minutes-month avg spend + avg duration."""
    trips = star["trips"].select(
        "rider_id", "duration", "trip_id",
        (F.col("duration") / 60).cast("int").alias("minutes"),
        F.month("started_at").alias("month"),
    )
    riders = star["riders"].select("rider_id", "is_member")
    pay = star["payments"].select("rider_id", "amount")
    j = trips.join(F.broadcast(riders), "rider_id")
    j = j.filter(j.is_member).join(pay, "rider_id")  # P6 bare-col filter (L5368)
    return grouped_metric(
        j, ["rider_id", "minutes", "month"],
        [F.avg("amount").alias("avg_amount"), F.avg("duration").alias("avg_duration")],
        order_by="avg_duration", limit=10,
    )


ALL_G_QUERIES = {
    name: fn
    for name, fn in sorted(globals().items())
    if name.startswith("g") and name[1:3].isdigit() and callable(fn)
}
