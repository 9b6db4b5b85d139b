"""q206 Kneser-Ney scoring, q207 k-anonymity audit, q208 vocab coverage:
brute-force Python equality on the smoke corpus (independent of both the
Spark plan AND the DuckDB oracle, so a shared bug can't hide)."""

import math
from collections import Counter, defaultdict

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def _docs_tokens(spark):
    rows = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    return {r["doc_id"]: r["text"].strip().split() for r in rows}


def _kn_scores_bruteforce(toks):
    """(doc_id -> tokens) -> {doc_id: (n_pairs, avg_logp_kn)} under the
    q206 model, replayed in pure Python with the same quantization."""
    pairs = defaultdict(list)  # doc_id -> [(w1, w2)]
    for d, ts in toks.items():
        if len(ts) >= 2:
            pairs[d] = list(zip(ts, ts[1:]))
    c12 = Counter(p for ps in pairs.values() for p in ps)
    c1p, n1fw, n1bw = Counter(), Counter(), Counter()
    for (w1, w2), c in c12.items():
        c1p[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    nbig = len(c12)
    expect = {}
    for d, ps in pairs.items():
        tot = 0  # exact decimal(18,12) integer sum, like both engines
        for w1, w2 in ps:
            num = (c12[(w1, w2)] - 0.75) + (0.75 * n1fw[w1]) * (n1bw[w2] / nbig)
            lp = math.log(num / c1p[w1])
            tot += round(lp * 10**12)  # quantize to 12 frac digits
        expect[d] = (len(ps), round(tot / 10**12 / len(ps), 6))
    return expect


def test_kneser_ney_matches_bruteforce(spark):
    expect = _kn_scores_bruteforce(_docs_tokens(spark))
    got = {
        r["doc_id"]: (r["n_pairs"], r["avg_logp_kn"])
        for r in QUERIES["q206_kneser_ney_lm_score"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for d in expect:
        assert got[d][0] == expect[d][0], d
        assert abs(got[d][1] - expect[d][1]) < 1e-9, d


def test_kneser_ney_probabilities_sum_to_one(spark):
    """The interpolated-KN invariant: sum_w2 p(w2|w1) = 1 for every
    history (over the full vocab of observed continuations, the model
    mass is exactly redistributed, not just discounted away)."""
    toks = _docs_tokens(spark)
    c12 = Counter(
        p
        for ts in toks.values()
        if len(ts) >= 2
        for p in zip(ts, ts[1:])
    )
    c1p, n1fw, n1bw = Counter(), Counter(), Counter()
    for (w1, w2), c in c12.items():
        c1p[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    nbig = len(c12)
    vocab2 = list(n1bw)
    # check a handful of histories, including the heaviest
    hists = sorted(c1p, key=c1p.get, reverse=True)[:3] + sorted(c1p)[:2]
    for w1 in hists:
        s = 0.0
        for w2 in vocab2:
            c = c12.get((w1, w2), 0)
            s += (max(c - 0.75, 0.0) + 0.75 * n1fw[w1] * (n1bw[w2] / nbig)) / c1p[w1]
        assert abs(s - 1.0) < 1e-9, w1


def test_perplexity_buckets_match_bruteforce(spark):
    """q209's distributed closed-form tercile == a literal sort + ntile(3)
    split in Python, bucket for bucket."""
    scores = _kn_scores_bruteforce(_docs_tokens(spark))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))
    n, k = len(ranked), 3
    q_, r_ = divmod(n, k)
    expect = {}
    pos = 0
    for b in range(1, k + 1):
        size = q_ + (1 if b <= r_ else 0)
        chunk = [s for _, (_, s) in ranked[pos : pos + size]]
        pos += size
        mean = round(sum(round(s * 10**6) for s in chunk) / 10**6 / size, 6)
        label = {1: "head", 2: "middle", 3: "tail"}[b]
        expect[b] = (label, size, max(chunk), min(chunk), mean)
    got = {
        r["bucket"]: (
            r["label"],
            r["n_docs"],
            r["max_logp"],
            r["min_logp"],
            r["mean_logp"],
        )
        for r in QUERIES["q209_perplexity_buckets"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {1, 2, 3}
    for b in (1, 2, 3):
        assert got[b][0] == expect[b][0]
        assert got[b][1] == expect[b][1]
        for i in (2, 3, 4):
            assert abs(got[b][i] - expect[b][i]) < 1e-9, (b, i)
    # head genuinely outranks tail
    assert got[1][3] >= got[3][2]


def test_k_anonymity_matches_bruteforce(spark):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect()
    groups = defaultdict(list)
    for r in cust:
        band = math.floor(float(r["c_acctbal"]) / 1000.0)
        groups[(r["c_nationkey"], r["c_mktsegment"], band)].append(r["c_acctbal"])
    expect = {
        k: (len(v), len(set(v)), len(v) < 5, len(set(v)) < 2)
        for k, v in groups.items()
    }
    got = {
        (r["c_nationkey"], r["c_mktsegment"], r["bal_band"]): (
            r["k_size"],
            r["l_diversity"],
            r["below_k"],
            r["below_l"],
        )
        for r in QUERIES["q207_k_anonymity_audit"](spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert any(v[2] for v in got.values())  # the audit actually flags rows


def test_vocab_coverage_matches_bruteforce(spark):
    toks = _docs_tokens(spark)
    c = Counter(t for ts in toks.values() for t in ts)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    expect = {}
    for k in (4, 16, 64, 256, 4096):
        covered = sum(cnt for _, cnt in ranked[:k])
        expect[k] = (covered, total, round(covered / total, 6))
    got = {
        r["vocab_size"]: (r["covered_tokens"], r["total_tokens"], r["coverage"])
        for r in QUERIES["q208_vocab_coverage_curve"](spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        QUERIES["q208_vocab_coverage_curve"](spark, SF_SMOKE).collect(),
        key=lambda r: r["vocab_size"],
    )
    assert [r["vocab_size"] for r in rows] == [4, 16, 64, 256, 4096]
    cov = [r["coverage"] for r in rows]
    assert all(a <= b for a, b in zip(cov, cov[1:]))
    assert all(0.0 < x <= 1.0 for x in cov)
