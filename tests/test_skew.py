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


def test_lsh_band_join_aqe_skew_split_engages(spark):
    """The LSH band join's one real 100 TB risk is a hot band bucket
    (boilerplate docs collapse to one (band, sig) key on both sides of the
    self-join). AQE skew-join splitting is the engine's mitigation — this
    pins that it actually ENGAGES on a planted hot band: the final
    adaptive plan must mark the sort-merge band join skew=true, and the
    candidate counts must be unaffected (split partitions change layout,
    never results)."""
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    # 2000 hot docs share IDENTICAL text (their band bucket holds all 2000
    # on both join sides); 1000 cold docs are unique. bands=1 concentrates
    # the skew in ONE shuffle partition — with 16 bands the 16 hot buckets
    # spread across partitions and no single one dominates at test scale
    # (at corpus scale any one band's bucket can dominate alone).
    hot = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.split(F.lit("the same boilerplate legal footer repeated on every page"), " ").alias("ts"),
    )
    cold = spark.range(2000, 3000).select(
        F.col("id").alias("doc_id"),
        F.split(
            F.concat_ws(
                " ",
                F.concat(F.lit("tok"), F.col("id")),
                F.concat(F.lit("unique"), F.col("id") * 7),
                F.concat(F.lit("word"), F.col("id") * 13),
                F.concat(F.lit("tail"), F.col("id") * 29),
            ),
            " ",
        ).alias("ts"),
    )
    docs = hot.unionAll(cold)

    tuned = {
        # force the sort-merge regime (the 100 TB band join is never a
        # broadcast) and make the tiny test partitions register as skewed.
        # Thresholds are aggressive because skew detection reads COMPRESSED
        # shuffle bytes and identical band sigs compress away (SCALE_NOTES:
        # at production scale the same effect means hot-band bytes
        # understate hot-band rows — leave headroom, or use the salted
        # variant below for guaranteed spreading).
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        cand = minhash_lsh_candidates(docs, num_hashes=32, bands=1)
        # collect() (not count()) so the inspected queryExecution is the one
        # that actually ran — count() builds a separate execution
        rows = cand.collect()
        n_pairs = len(rows)
        final_plan = cand._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # every hot pair is a candidate (identical docs share the band sig)
    assert n_pairs >= 2000 * 1999 // 2
    assert "skew=true" in final_plan, "AQE skew split did not engage on the band join"
    # and skew splitting is value-transparent: every hot pair still agrees
    # on its band despite the hot partition being split across tasks
    hot_pairs = sum(1 for r in rows if r["doc_a"] < 2000 and r["doc_b"] < 2000)
    assert hot_pairs == 2000 * 1999 // 2


def test_salted_band_join_identical_to_plain(spark):
    """The salted band join must be row-identical to the plain band join
    (every pair meets exactly once, at the left doc's salt), and its join
    keys must carry the salt (the structural spread is in the KEY, not
    left to runtime detection)."""
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_candidates_salted,
    )

    hot = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.split(F.lit("the same boilerplate legal footer repeated on every page"), " ").alias("ts"),
    )
    cold = spark.range(300, 500).select(
        F.col("id").alias("doc_id"),
        F.split(
            F.concat_ws(
                " ",
                F.concat(F.lit("tok"), F.col("id")),
                F.concat(F.lit("unique"), F.col("id") * 7),
                F.concat(F.lit("word"), F.col("id") * 13),
                F.concat(F.lit("tail"), F.col("id") * 29),
            ),
            " ",
        ).alias("ts"),
    )
    docs = hot.unionAll(cold)
    plain = sorted(map(tuple, minhash_lsh_candidates(docs).collect()))
    salted_df = minhash_lsh_candidates_salted(docs, n_salts=4)
    salted = sorted(map(tuple, salted_df.collect()))
    assert plain == salted and len(plain) >= 300 * 299 // 2
    plan = salted_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "__salt" in plan
