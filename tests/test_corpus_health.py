"""q242 dedup identity ladder + q243 vocab growth: DuckDB oracle equality
plus full Python brute-force replays (the brute-force-beats-oracle rule —
the oracle shares regex/list-function strategy, the Python replay does
not)."""

from __future__ import annotations

import hashlib
import re

import duckdb

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
    ORACLES,
    QUERIES,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _texts(spark):
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.readers import (
        read_parquet_table,
    )

    return [
        (r["doc_id"], r["text"])
        for r in read_parquet_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .collect()
    ]


def _oracle(name):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    return [tuple(r) for r in con.execute(ORACLES[name]).fetchall()]


def test_q242_ladder_matches_oracle_and_brute_force(spark):
    name = "q242_dedup_identity_ladder"
    got = [tuple(r) for r in QUERIES[name](spark, SF_SMOKE).collect()]
    assert got == _oracle(name)

    texts = _texts(spark)
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    fps = {
        "a_raw": [md5(t) for _, t in texts],
        "b_norm_ws_case": [md5(re.sub(r"\s+", " ", t).strip().lower()) for _, t in texts],
        "c_token_set": [
            md5(" ".join(sorted(set(re.split(r"\s+", t.lower().strip())))))
            for _, t in texts
        ],
    }
    expect = []
    for lvl in sorted(fps):
        from collections import Counter

        c = Counter(fps[lvl])
        expect.append(
            (
                lvl,
                len(c),
                sum(1 for v in c.values() if v >= 2),
                sum(c.values()) - len(c),
            )
        )
    assert got == expect
    # the ladder is monotone: more aggressive identity -> fewer fingerprints
    assert got[0][1] >= got[1][1] >= got[2][1]


def test_q243_vocab_growth_matches_oracle_and_brute_force(spark):
    name = "q243_vocab_growth"
    got = [tuple(r) for r in QUERIES[name](spark, SF_SMOKE).collect()]
    assert got == _oracle(name)

    texts = _texts(spark)
    m = max(i for i, _ in texts)
    first: dict[str, int] = {}
    for doc_id, t in sorted(texts):
        for tk in re.split(r"\s+", t.strip()):
            first.setdefault(tk, doc_id)
    expect = []
    for d in range(1, 11):
        bound = lambda x: int(x * 10.0 // (m + 1))  # noqa: E731
        docs_in = sum(1 for i, _ in texts if bound(i) < d)
        vocab = sum(1 for v in first.values() if bound(v) < d)
        new = sum(1 for v in first.values() if bound(v) == d - 1)
        expect.append((d, docs_in, vocab, new))
    assert got == expect
    # curve invariants: cumulative and exhaustive
    assert got[-1][1] == len(texts) and got[-1][2] == len(first)
    assert all(a[2] <= b[2] for a, b in zip(got, got[1:]))
