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


def test_salted_count_is_row_count_with_null_measures(spark):
    """count must be count(*) row semantics, not count(col): null measure
    values still count toward n (ADVICE r1 — salted count silently diverged
    from the plain-groupBy twin on null measures)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("b", None)], ["k", "v"]
    )
    got = {
        r["k"]: (r["sum_value"], r["n"])
        for r in salted_sum_count(df, ["k"], "v", n_salts=4).collect()
    }
    direct = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == direct
    assert got["a"][1] == 3 and got["b"][1] == 1  # rows, not non-null values


def test_salted_join_equals_plain_join(spark):
    """salted_join must be row-identical to the plain equi-join on a
    synthetic skewed dataset (90% of big rows share one hot key)."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.skew import (
        salted_join,
    )

    big = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("rid"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("sk"), (F.col("id") * 100).alias("payload")
    )
    got = sorted(
        map(
            tuple,
            salted_join(big, small, "k", "sk", F.xxhash64("rid"), n_salts=4)
            .select("rid", "payload")
            .collect(),
        )
    )
    want = sorted(
        map(tuple, big.join(small, big["k"] == small["sk"]).select("rid", "payload").collect())
    )
    assert got == want and len(got) == 1000
