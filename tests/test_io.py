"""IO-layer tests: headerless CSV scan (S1), format pipeline, safe
parquet self-overwrite (S2/S3 semantics without Delta)."""

import os

from pyspark.sql import Row

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.schema import (
    format_bikeshare_table,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.readers import (
    load_star,
    read_csv_raw,
    read_parquet_table,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.writers import (
    overwrite_parquet_table,
)

from conftest import SF_SMOKE


def test_read_csv_raw_headerless(spark, tmp_path):
    p = str(tmp_path / "stations.csv")
    with open(p, "w") as f:
        f.write("525,Glenwood Ave & Touhy Ave,42.012701,-87.666058\n")
        f.write("KA1503000012,Clark St & Im Ave,41.8,-87.6\n")
    df = read_csv_raw(spark, p)
    # reference behavior: _c* names, all strings (ipynb:L250-253)
    assert df.columns == ["_c0", "_c1", "_c2", "_c3"]
    assert all(t == "string" for _, t in df.dtypes)
    formatted = format_bikeshare_table(df, "stations")
    assert formatted.columns == ["station_id", "name", "latitude", "longitude"]
    assert dict(formatted.dtypes)["latitude"] == "float"
    assert formatted.count() == 2


def test_read_parquet_table_and_load_star(spark):
    orders = read_parquet_table(spark, SF_SMOKE, "orders")
    assert orders.count() == 1500
    star = load_star(spark, SF_SMOKE, tables=("region", "nation"), register_views=True)
    assert set(star) == {"region", "nation"}
    assert spark.sql("SELECT count(*) c FROM region").first()["c"] == 5


def test_events_nanos_ts_converted(spark):
    """Spark 4 reads the INT64 TIMESTAMP(NANOS) ts column natively as
    TIMESTAMP_NTZ (micros truncation, matching DuckDB TIMESTAMP_NS -> TIMESTAMP);
    the legacy-conf fallback yields TIMESTAMP. Either way, a timestamp — never
    a raw bigint."""
    ev = read_parquet_table(spark, SF_SMOKE, "events")
    assert dict(ev.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert ev.where(ev.ts.isNull()).count() == 0


def test_overwrite_parquet_table_safe_self_overwrite(spark, tmp_path):
    """The reference reads a Delta table and overwrites it in one job
    (trips -> trips, ipynb:L1074->L1098), relying on snapshots; our parquet
    stage-and-swap must survive the same pattern."""
    path = str(tmp_path / "t")
    spark.createDataFrame([Row(a=1), Row(a=2)]).write.parquet(path)
    df = spark.read.parquet(path)
    df2 = df.selectExpr("a", "a * 10 AS b")
    overwrite_parquet_table(df2, path)
    out = spark.read.parquet(path).orderBy("a").collect()
    assert [(r["a"], r["b"]) for r in out] == [(1, 10), (2, 20)]
    assert not os.path.exists(path + ".__stage__")


def test_load_star_cache_facts(spark):
    """S9 (ipynb:L1182): cache_facts pins fact tables; is_cached observable."""
    star = load_star(spark, SF_SMOKE, tables=("orders", "nation"), cache_facts=True)
    try:
        assert star["orders"].is_cached
        assert not star["nation"].is_cached
        assert star["orders"].count() == 1500  # materializes the cache
    finally:
        star["orders"].unpersist()


def test_read_jsonl_with_schema_and_corrupt_line(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "second"}\n'
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema=schema).cache()
    good = df.where(df._corrupt_record.isNull())
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    assert df.where(df._corrupt_record.isNotNull()).count() == 1
    df.unpersist()


def test_compact_parquet_table(spark, tmp_path):
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.writers import (
        compact_parquet_table,
    )

    path = str(tmp_path / "shards")
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    df.repartition(64).write.parquet(path)  # simulate small-file accretion

    stats = compact_parquet_table(spark, path, target_file_bytes=10**9, sort_within_by=["k"])
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg({"k": "max"}).first()[0] == 9_999


def test_nanos_conf_restored_after_events_read(spark):
    """read_parquet_table never leaks the nanosAsLong legacy conf into
    caller-owned sessions (ADVICE r1): the native path does not touch it and
    the legacy fallback restores whatever value the caller had set."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    try:
        spark.conf.set(key, "false")
        df = read_parquet_table(spark, SF_SMOKE, "events")
        assert spark.conf.get(key) == "false"  # untouched / restored
        assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_bucketed_tables_join_without_exchange(spark):
    """The claim several plan docstrings make ('zero shuffles on a
    user-bucketed lake'), PROVEN: write events and a user dim bucketed
    by user_id into the warehouse catalog, join them, and the physical
    plan must contain NO Exchange — both sides' bucketing satisfies the
    join's distribution requirement, so the 100 TB fact-fact join runs
    entirely map-side. This is the layout decision that amortizes ONE
    bootstrap shuffle (the bucketed write) across every subsequent join
    on the key."""
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    for name in ("bt_events", "bt_users"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    ev.write.bucketBy(8, "user_id").sortBy("user_id").mode("overwrite").saveAsTable("bt_events")
    users.write.bucketBy(8, "user_id").mode("overwrite").saveAsTable("bt_users")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the partitioned-join regime: at 100 TB neither fact side
        # broadcasts, which is exactly when bucketing pays
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("bt_events")
            .join(spark.table("bt_users"), "user_id")
            .groupBy("user_id")
            .agg(F.sum("value").alias("v"), F.min("n_events").alias("n"))
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it actually runs: every user appears exactly once
        rows = joined.collect()
        assert len(rows) == users.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        for name in ("bt_events", "bt_users"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
