"""Salted aggregation must be value-identical to the direct groupBy."""

from pyspark.sql import functions as F

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.skew import (
    salted_sum_count,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.readers import (
    read_parquet_table,
)

from conftest import SF_SMOKE


def test_salted_sum_count_matches_direct(spark):
    ev = read_parquet_table(spark, SF_SMOKE, "events")
    # integer-cast value so float addition order can't blur the comparison
    ev = ev.withColumn("cents", (F.col("value") * 100).cast("long"))
    direct = {
        r["user_id"]: (r["s"], r["n"])
        for r in ev.groupBy("user_id").agg(F.sum("cents").alias("s"), F.count("cents").alias("n")).collect()
    }
    salted = {
        r["user_id"]: (r["sum_value"], r["n"])
        for r in salted_sum_count(ev, ["user_id"], "cents", n_salts=8).collect()
    }
    assert direct == salted


def test_salted_agg_spreads_hot_key(spark):
    """The partial phase must actually split a hot key across salts."""
    ev = read_parquet_table(spark, SF_SMOKE, "events").withColumn(
        "k", F.lit(1)
    )  # everything one hot key
    partial = (
        ev.select("k", (F.rand(seed=42) * 8).cast("int").alias("__salt"))
        .groupBy("k", "__salt")
        .count()
    )
    assert partial.count() == 8  # 8 partial groups for the single hot key
