"""Unit tests for the training-data pipeline surface (plans/training.py,
operators/graph.py, functions/text.redact_pii)."""

from __future__ import annotations

from pyspark.sql import functions as F

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import redact_pii
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.graph import connected_components
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans import registry

SF = "/root/testdata/sf0.001"


def test_connected_components_chain_and_island(spark):
    # 1-2-3 chain (transitive), 5-6 island, 9-9 self-loop
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6), (9, 9)], ["src", "dst"]
    )
    got = {
        r["id"]: r["comp"] for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def test_connected_components_deep_chain_converges(spark):
    # path graph 0-1-2-...-9: worst-case diameter for min-label propagation
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], ["src", "dst"])
    got = connected_components(edges, "src", "dst").collect()
    assert {r["comp"] for r in got} == {0}
    assert len(got) == 10


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            ("write bob.smith+x@mail.example.org today",),
            ("call +1 (555) 123-4567 now",),
            ("no pii here",),
        ],
        ["text"],
    )
    out = [r["red"] for r in df.select(redact_pii("text").alias("red")).collect()]
    assert out[0] == "write [EMAIL] today"
    assert out[1] == "call [PHONE] now"
    assert out[2] == "no pii here"


def test_hash_split_deterministic_and_complete(spark):
    q = registry.QUERIES["q71_hash_split"]
    a = {r["split"]: (r["n_docs"], r["sum_chars"]) for r in q(spark, SF).collect()}
    b = {r["split"]: (r["n_docs"], r["sum_chars"]) for r in q(spark, SF).collect()}
    assert a == b  # pure function of doc_id: identical across runs
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(n for n, _ in a.values()) == n_docs  # partition, no drops
    assert set(a) <= {"train", "val", "test"} and "train" in a


def test_pack_sequences_bins_respect_budget(spark):
    q = registry.QUERIES["q74_pack_sequences"]
    rows = q(spark, SF).collect()
    assert rows, "packing produced no bins"
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).first()["t"]
    assert sum(r["bin_tokens"] for r in rows) == total_tokens
    # bin ids are dense from 0 within each source
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["bin_id"])
    for src, bins in by_src.items():
        assert sorted(bins) == list(range(min(bins), max(bins) + 1))
        assert min(bins) == 0


def test_gap_fill_grid_complete_and_nonnull(spark):
    q = registry.QUERIES["q82_gap_fill_forward"]
    rows = q(spark, SF).collect()
    users = {r["user_id"] for r in rows}
    hours = {r["hour_id"] for r in rows}
    assert len(rows) == len(users) * len(hours)  # dense grid, no gaps
    assert all(r["value_filled"] is not None for r in rows)


def test_outliers_bounded_by_group_sizes(spark):
    rows = registry.QUERIES["q84_value_outliers"](spark, SF).collect()
    totals = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows and all(0 < r["n_outliers"] < totals[r["event_type"]] for r in rows)


def test_stratified_sample_subset_of_corpus(spark):
    q = registry.QUERIES["q72_stratified_sample"]
    sampled = {r["lang"]: r["n_sampled"] for r in q(spark, SF).collect()}
    totals = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sampled and all(0 < sampled[l] <= totals[l] for l in sampled)


def test_connected_components_matches_union_find(spark):
    """Property-style check: Spark CC vs an independent driver-side
    union-find on a pseudo-random (seeded, deterministic) edge list."""
    import random

    rng = random.Random(42)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(45)]

    parent = list(range(40))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    nodes = {n for e in edges for n in e}
    expected = {}
    for n in nodes:
        expected.setdefault(find(n), set()).add(n)
    want = {min(g): g for g in expected.values()}

    got_rows = connected_components(
        spark.createDataFrame(edges, ["src", "dst"]), "src", "dst"
    ).collect()
    got: dict[int, set[int]] = {}
    for r in got_rows:
        got.setdefault(r["comp"], set()).add(r["id"])
    assert got == want


def test_star_components_match_min_label_propagation(spark):
    """large-star/small-star (Kiveris) must produce the identical
    (id -> min-id component) labeling as min-label propagation, on shapes
    that stress both: random graphs, a long chain (high diameter — the
    regime star exists for), and disjoint islands."""
    import random

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.graph import (
        connected_components_star,
    )

    cases = []
    rng = random.Random(11)
    for n, m in ((30, 25), (40, 60)):
        cases.append([(rng.randrange(n), rng.randrange(n)) for _ in range(m)])
    cases.append([(i, i + 1) for i in range(80)])          # diameter-80 chain
    cases.append([(0, 1), (2, 3), (4, 4), (9, 8)])        # islands + self loop
    for i, pairs in enumerate(cases):
        edges = spark.createDataFrame(pairs, ["src", "dst"])
        ml = {r["id"]: r["comp"] for r in connected_components(edges, "src", "dst", max_iter=100).collect()}
        st = {r["id"]: r["comp"] for r in connected_components_star(edges, "src", "dst").collect()}
        assert ml == st, f"case {i}: star labeling diverged"


def test_bloom_bitmap_no_false_negatives_and_low_fp(spark):
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.prune import (
        bloom_bitmap,
        bloom_might_contain,
    )

    keys = spark.range(0, 200).withColumnRenamed("id", "k")
    bm = bloom_bitmap(keys, "k")
    probe = spark.range(0, 5000).withColumnRenamed("id", "k")
    hits = (
        probe.where(bloom_might_contain(F.col("k"), bm))
        .select("k")
        .collect()
    )
    hit_set = {r["k"] for r in hits}
    # Bloom contract: every inserted key tests positive
    assert set(range(200)) <= hit_set
    # and false positives on the 4800 non-members stay rare
    assert len(hit_set - set(range(200))) < 48


def test_bloom_prefilter_join_is_result_transparent(spark):
    q = registry.QUERIES["q102_bloom_prefilter_join"]
    got = {tuple(r) for r in q(spark, SF).collect()}
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keys = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.agg import exact_sum

    plain = {
        tuple(r)
        for r in orders.join(keys, orders["o_custkey"] == keys["c_custkey"])
        .groupBy("o_orderstatus")
        .agg(exact_sum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
        .collect()
    }
    assert got == plain and len(got) > 0


def test_source_quota_cap_keeps_longest(spark):
    rows = registry.QUERIES["q101_source_quota_cap"](spark, SF).collect()
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    all_src: dict[str, list] = {}
    for d in docs:
        all_src.setdefault(d["source"], []).append(d)
    for src, kept in per_src.items():
        assert len(kept) <= 10
        # kept set == top-10 by (n_chars desc, doc_id) among that source
        want = sorted(all_src[src], key=lambda d: (-d["n_chars"], d["doc_id"]))[:10]
        assert sorted(k["doc_id"] for k in kept) == sorted(w["doc_id"] for w in want)


def test_incremental_dedup_matches_exhaustive(spark):
    got = {
        r["doc_id"]
        for r in registry.QUERIES["q103_incremental_dedup"](spark, SF).collect()
    }
    # brute force in python on the tiny fixture
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    sh = {
        d["doc_id"]: {
            " ".join(toks[i : i + 3])
            for toks in [d["text"].strip().split()]
            for i in range(len(toks) - 2)
        }
        for d in docs
    }
    def h(i): return ((i % 100003) * 2654435761) % 1000
    batch = {i for i in sh if h(i) >= 800 and sh[i]}
    corpus = {i for i in sh if h(i) < 800 and sh[i]}
    want = {
        b
        for b in batch
        if all(
            len(sh[b] & sh[c]) / len(sh[b] | sh[c]) < 0.5 for c in corpus
        )
    }
    assert got == want and len(batch) > 0


def test_weighted_sample_sizes_and_determinism(spark):
    """q165: exactly min(k, |stratum|) rows per source with contiguous
    ranks, and the md5-derived draw is run-to-run IDENTICAL (the
    auditability property a production corpus build needs)."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.training import _ES_K

    a = registry.QUERIES["q165_weighted_sample"](spark, SF).collect()
    strata = {}
    for r in a:
        strata.setdefault(r["source"], []).append(r["rank"])
    docs = spark.read.parquet(f"{SF}/documents.parquet").where("n_chars > 0")
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, ranks in strata.items():
        assert sorted(ranks) == list(range(1, min(_ES_K, sizes[src]) + 1))
    b = registry.QUERIES["q165_weighted_sample"](spark, SF).collect()
    assert a == b
