"""End-to-end medallion pipeline test on a bikeshare-shaped fixture
(FIXTURES.md §A): headerless CSVs -> partitioned parquet star schema with
the reference's exact gold schemas (SURVEY.md §1.1 table)."""

import datetime as dt
import random

import pytest

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators import pipeline


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    """Deterministic tiny bikeshare raw layer (seed 7)."""
    rng = random.Random(7)
    d = tmp_path_factory.mktemp("bikeshare_csv")

    stations = [
        ("525", "Glenwood Ave & Touhy Ave", 42.012701, -87.666058),
        ("KA1503000012", "Clark St & Lake St", 41.886021, -87.630876),
        ("TA1305000032", "Racine Ave & 18th St", 41.858166, -87.656495),
    ]
    with open(d / "stations.csv", "w") as f:
        for s in stations:
            f.write(",".join(map(str, s)) + "\n")

    riders = []
    with open(d / "riders.csv", "w") as f:
        for rid in range(1000, 1020):
            bday = dt.date(1960 + rng.randrange(45), 1 + rng.randrange(12), 1 + rng.randrange(28))
            start = dt.date(2017 + rng.randrange(5), 1 + rng.randrange(12), 1)
            end = "" if rng.random() < 0.5 else str(start + dt.timedelta(days=365))
            member = rng.random() < 0.8
            riders.append(rid)
            f.write(f"{rid},First{rid},Last{rid},{rid} Main St,{bday},{start},{end},{member}\n")

    with open(d / "trips.csv", "w") as f:
        for i in range(200):
            rid = rng.choice(riders)
            sta = rng.choice(stations)[0]
            end_sta = rng.choice(stations)[0]
            t0 = dt.datetime(2021, 2, 1) + dt.timedelta(
                days=rng.randrange(300), hours=rng.randrange(24), minutes=rng.randrange(60)
            )
            t1 = t0 + dt.timedelta(seconds=60 + rng.randrange(7200))
            kind = rng.choice(["classic_bike", "electric_bike"])
            f.write(f"{i:016X},{kind},{t0},{t1},{sta},{end_sta},{rid}\n")

    with open(d / "payments.csv", "w") as f:
        pid = 0
        for rid in riders:
            for m in range(6):
                pid += 1
                f.write(f"{pid},{dt.date(2021, 1 + m, 1)},9.5,{rid}\n")
    return str(d)


GOLD_TRIPS_SCHEMA = [
    ("trip_id", "string"), ("duration", "bigint"), ("rideable_type", "string"),
    ("age_at_ride_time", "int"), ("started_at", "timestamp"), ("ended_at", "timestamp"),
    ("start_station_id", "string"), ("end_station_id", "string"),
    ("time_id", "timestamp"), ("rider_id", "int"),
]


def test_full_pipeline_schemas_and_semantics(spark, csv_dir, tmp_path):
    out = pipeline.run(spark, csv_dir, str(tmp_path / "lake"))

    # gold trips schema matches the reference star schema exactly (§1.1)
    trips = out["trips"].select(*[c for c, _ in GOLD_TRIPS_SCHEMA])
    assert [(c, t) for c, t in trips.dtypes] == GOLD_TRIPS_SCHEMA
    assert out["payments"].columns[:4] == ["payment_id", "amount", "date_id", "rider_id"]
    assert dict(out["payments"].dtypes)["amount"] == "decimal(10,0)"

    n_trips = out["trips"].count()
    assert n_trips == 200  # inner birthday join loses nothing (FK complete)

    # duration positive, time_id is the started_at hour
    bad = out["trips"].where("duration <= 0 OR time_id != date_trunc('hour', started_at)").count()
    assert bad == 0

    # decimal(10,0) semantics: 9.5 -> 10 (reference's bare-decimal rounding)
    amounts = {r["amount"] for r in out["payments"].select("amount").distinct().collect()}
    assert {int(a) for a in amounts} == {10}

    # date dims cover the fact ranges at the right grain
    td = out["trip_dates"]
    assert dict(td.dtypes) == {"time_id": "timestamp", "day_of_week": "int", "time_of_day": "string"}
    assert td.count() == td.select("time_id").distinct().count()
    pd_dim = out["payment_dates"]
    assert dict(pd_dim.dtypes) == {"date_id": "date", "month": "int", "quarter": "int", "year": "int"}
    # every payment date joins (the reference's J4 join must not drop rows)
    joined = out["payments"].join(pd_dim, "date_id").count()
    assert joined == out["payments"].count()


def test_pipeline_is_idempotent(spark, csv_dir, tmp_path):
    lake = str(tmp_path / "lake2")
    a = pipeline.run(spark, csv_dir, lake)["trips"].count()
    b = pipeline.run(spark, csv_dir, lake)["trips"].count()  # re-run over same out_dir
    assert a == b


def test_trips_partitioned_by_month(spark, csv_dir, tmp_path):
    import os

    lake = str(tmp_path / "lake3")
    pipeline.run(spark, csv_dir, lake)
    parts = [p for p in os.listdir(os.path.join(lake, "trips")) if p.startswith("started_month=")]
    assert len(parts) > 5  # hive-partitioned fact -> partition pruning at scale


def test_partition_pruning_on_lake(spark, csv_dir, tmp_path):
    """The partitioned fact write must enable partition pruning: a month
    filter on trips should show PartitionFilters and scan fewer files."""
    lake = str(tmp_path / "lake_prune")
    pipeline.run(spark, csv_dir, lake)
    df = spark.read.parquet(f"{lake}/trips").where("started_month = '2021-03'")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [isnotnull(started_month" in plan
    assert df.count() > 0
