"""BPE vocabulary training + encoding (operators/bpe.py)."""

from pyspark.sql import functions as F

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.bpe import (
    bpe_encode,
    bpe_fit,
    bpe_token_count,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_bpe_fit_hand_checked(spark):
    """'low lower lowest' x frequencies: the first merges must fuse the
    dominant adjacent pairs, exact counts included."""
    docs = _docs(spark, ["low low low lower lowest", "low lower"])
    merges = bpe_fit(docs, n_merges=3, top_words=100)
    # 'low' freq 4, 'lower' 2, 'lowest' 1 -> pair (l,o) and (o,w) both
    # appear in every word: count 7 each; tie-break -> ⟨l⟩⟨o⟩ < ⟨o⟩⟨w⟩
    assert merges[0][0] == "⟨l⟩⟨o⟩" and merges[0][2] == 7
    assert merges[1][0] == "⟨lo⟩⟨w⟩" and merges[1][2] == 7
    # after 'low' fuses, next best is ('low','e') in lower+lowest: 3
    assert merges[2][0] == "⟨low⟩⟨e⟩" and merges[2][2] == 3


def test_bpe_fit_invariant_to_partitioning(spark):
    texts = [f"alpha beta gamma delta word{i % 7}" for i in range(100)]
    a = bpe_fit(_docs(spark, texts), n_merges=6)
    b = bpe_fit(_docs(spark, texts).repartition(13), n_merges=6)
    assert a == b and len(a) == 6


def test_bpe_encode_and_count(spark):
    docs = _docs(spark, ["low low low lower lowest", "low lower"])
    merges = bpe_fit(docs, n_merges=3, top_words=100)
    out = (
        _docs(spark, ["low", "lower", "lowest", "xyz"])
        .select(
            "text",
            bpe_encode(F.col("text"), merges).alias("enc"),
            bpe_token_count(F.col("text"), merges).alias("n"),
        )
        .collect()
    )
    got = {r["text"]: (r["enc"], r["n"]) for r in out}
    assert got["low"] == ("⟨low⟩", 1)
    assert got["lower"] == ("⟨lowe⟩⟨r⟩", 2)  # ⟨low⟩⟨e⟩ merged in round 3
    assert got["lowest"] == ("⟨lowe⟩⟨s⟩⟨t⟩", 3)
    assert got["xyz"] == ("⟨x⟩⟨y⟩⟨z⟩", 3)  # untouched by merges
