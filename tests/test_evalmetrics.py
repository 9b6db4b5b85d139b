"""q211-q217 evaluation heads: end-to-end equality against independent
brute-force recomputations (numpy / pure Python) on the collected smoke
corpus — the oracle can share a bug with the implementation, the brute
force can't (the q203 lesson), plus plan-shape pins for the scale
claims in the docstrings."""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def _rhu(v: float, places: str) -> float:
    """Spark round(): HALF_UP over the double's shortest decimal repr."""
    return float(Decimal(repr(v)).quantize(Decimal(places), ROUND_HALF_UP))


def _probe_scores(spark):
    return QUERIES["q145_logreg_probe"](spark, SF_SMOKE).collect()


def _fold_dots(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise dot products as a LEFT FOLD over dims (acc += a_i*b_i per
    dim, vectorized over rows) — the exact summation order of
    functions/vectors.dot and the DuckDB list_sum fold; np.dot's pairwise
    summation could differ in the last ulp and flip a round-4 boundary."""
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for i in range(a.shape[1]):
        acc = acc + a[:, i] * b[:, i]
    return acc


# --------------------------------------------------------------------------
# q211 AUC
# --------------------------------------------------------------------------

def test_q211_auc_matches_pair_counting(spark):
    rows = _probe_scores(spark)
    s = np.array([r["score"] for r in rows])
    y = np.array([r["label_true"] for r in rows])
    pos, neg = s[y == 1], s[y == 0]
    # O(n+ * n-) definition: P(s+ > s-) + 0.5 P(s+ = s-)
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    want = (gt + 0.5 * eq) / (len(pos) * len(neg))

    out = QUERIES["q211_probe_auc"](spark, SF_SMOKE).collect()[0]
    assert out["n_pos"] == len(pos)
    assert out["n_neg"] == len(neg)
    assert abs(out["auc"] - want) < 1e-6


def test_q211_no_corpus_shuffle_joins(spark):
    """The rank-map join-back broadcasts; no nested loop anywhere."""
    df = QUERIES["q211_probe_auc"](spark, SF_SMOKE)
    tree = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    ).split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


# --------------------------------------------------------------------------
# q212 calibration deciles
# --------------------------------------------------------------------------

def test_q212_bins_match_brute_force(spark):
    rows = _probe_scores(spark)
    n = len(rows)
    srt = sorted(rows, key=lambda r: (r["score"], r["vec_id"]))
    q, r = divmod(n, 10)
    bins: dict[int, list] = {}
    at = 0
    for t in range(1, 11):
        size = q + 1 if t <= r else q
        for row in srt[at : at + size]:
            bins.setdefault(t, []).append(row)
        at += size
    out = {o["bin"]: o for o in QUERIES["q212_calibration_bins"](spark, SF_SMOKE).collect()}
    assert set(out) == set(bins)
    for t, members in bins.items():
        s6 = [int(_rhu(m["score"] * 1e6, "1")) for m in members]
        ys = [m["label_true"] for m in members]
        o = out[t]
        assert o["n"] == len(members)
        assert abs(o["mean_score"] - _rhu(sum(s6) / len(s6) / 1e6, "0.000001")) < 1e-9
        assert abs(o["pos_rate"] - _rhu(sum(ys) / len(ys), "0.000001")) < 1e-9
        se = sum((a - 1000000 * b) ** 2 for a, b in zip(s6, ys))
        assert abs(o["brier"] - _rhu(se / len(s6) / 1e12, "0.000001")) < 1e-9


# --------------------------------------------------------------------------
# q213 margin mining
# --------------------------------------------------------------------------

def test_q213_matches_numpy_brute_force(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    A = [(r["vec_id"], np.array(r["embedding"], dtype=np.float64)) for r in emb if r["label"] <= 1]
    B = [(r["vec_id"], np.array(r["embedding"], dtype=np.float64)) for r in emb if r["label"] >= 8]
    av = np.stack([v for _, v in A])
    bv = np.stack([v for _, v in B])
    anrm = np.sqrt(_fold_dots(av, av))
    bnrm = np.sqrt(_fold_dots(bv, bv))
    na, nb = len(A), len(B)
    cos = np.zeros((na, nb))
    for i in range(na):
        d = _fold_dots(np.broadcast_to(av[i], bv.shape).copy(), bv)
        for j in range(nb):
            cos[i, j] = _rhu(d[j] / (anrm[i] * bnrm[j]), "0.0001")
    c4 = np.vectorize(lambda v: int(_rhu(v * 10000, "1")))(cos)
    a_ids = np.array([i for i, _ in A])
    b_ids = np.array([i for i, _ in B])
    # top-4 sums with (cos desc, partner id asc) tie order
    ax4 = np.empty(na, dtype=np.int64)
    for i in range(na):
        order = sorted(range(nb), key=lambda j: (-cos[i, j], b_ids[j]))[:4]
        ax4[i] = sum(int(c4[i, j]) for j in order)
    ay4 = np.empty(nb, dtype=np.int64)
    for j in range(nb):
        order = sorted(range(na), key=lambda i: (-cos[i, j], a_ids[i]))[:4]
        ay4[j] = sum(int(c4[i, j]) for i in order)
    margin = np.zeros((na, nb))
    for i in range(na):
        for j in range(nb):
            margin[i, j] = _rhu(cos[i, j] / ((ax4[i] + ay4[j]) / 2 / 10000.0), "0.000001")
    want = set()
    bestf = {}
    for i in range(na):
        j = min(range(nb), key=lambda j: (-margin[i, j], b_ids[j]))
        bestf[i] = j
    for j in range(nb):
        i = min(range(na), key=lambda i: (-margin[i, j], a_ids[i]))
        if bestf.get(i) == j:
            want.add((int(a_ids[i]), int(b_ids[j]), cos[i, j], margin[i, j]))

    got = {
        (r["vec_a"], r["vec_b"], r["cos"], r["margin"])
        for r in QUERIES["q213_margin_mining"](spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) > 0


# --------------------------------------------------------------------------
# q214 NDCG
# --------------------------------------------------------------------------

def test_q214_matches_brute_force(spark):
    ex = QUERIES["q39_embedding_topk"](spark, SF_SMOKE).collect()
    ap = QUERIES["q40_embedding_lsh_ann"](spark, SF_SMOKE).collect()
    rel = {(r["query_id"], r["neighbor_id"]): 6 - r["rnk"] for r in ex}
    dcg: dict[int, int] = {}
    for r in ap:
        t9 = math.floor(
            rel.get((r["query_id"], r["neighbor_id"]), 0)
            / math.log2(r["rnk"] + 1)
            * 1e9
        )
        dcg[r["query_id"]] = dcg.get(r["query_id"], 0) + t9
    idcg = sum(math.floor((6 - p) / math.log2(p + 1) * 1e9) for p in range(1, 6))
    out = QUERIES["q214_ann_ndcg"](spark, SF_SMOKE).collect()
    assert {r["query_id"] for r in out} == {r["query_id"] for r in ex}
    for r in out:
        want = _rhu(dcg.get(r["query_id"], 0) / idcg, "0.000001")
        assert abs(r["ndcg_at_5"] - want) < 1e-6
    # a perfectly-ordered exact list must score 1.0, so values live in [0,1]
    assert all(0.0 <= r["ndcg_at_5"] <= 1.0 for r in out)


def test_q214_recall_consistency(spark):
    """NDCG can be at most 1 and is 0 exactly when recall is 0."""
    ndcg = {r["query_id"]: r["ndcg_at_5"] for r in QUERIES["q214_ann_ndcg"](spark, SF_SMOKE).collect()}
    rec = {r["query_id"]: r["recall_at_5"] for r in QUERIES["q154_ann_recall"](spark, SF_SMOKE).collect()}
    assert set(ndcg) == set(rec)
    for q in ndcg:
        if rec[q] == 0.0:
            assert ndcg[q] == 0.0
        if ndcg[q] > 0.0:
            assert rec[q] > 0.0


# --------------------------------------------------------------------------
# q215 Zipf fit
# --------------------------------------------------------------------------

def test_q215_matches_brute_force(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("text").collect()
    counts = Counter(t for d in docs for t in d["text"].split())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(i + 1) * 1e9) for i in range(len(ranked))]
    ys = [math.floor(math.log(c) * 1e9) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / 1e9

    out = QUERIES["q215_zipf_fit"](spark, SF_SMOKE).collect()[0]
    assert out["n_terms"] == n
    assert abs(out["zipf_slope"] - slope) < 1e-6
    assert abs(out["zipf_intercept"] - intercept) < 1e-6
    # a frequency-ranked spectrum always fits with non-positive slope
    assert out["zipf_slope"] <= 0.0


# --------------------------------------------------------------------------
# q216 anisotropy
# --------------------------------------------------------------------------

def test_q216_centroid_identity_equals_all_pairs(spark):
    """The O(n·d) centroid identity must equal the O(n²·d) literal mean
    over all ordered pairs — bit-exact, both are integer arithmetic on
    the same quantized vectors."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    by_label: dict[int, list[np.ndarray]] = {}
    norms: dict[int, list[int]] = {}
    for r in emb:
        v = np.array(r["embedding"], dtype=np.float64)
        acc = 0.0
        for x in v:  # left fold, the engines' summation order
            acc += x * x
        nrm = math.sqrt(acc)
        qv = np.array([math.floor(x / nrm * 1e6) for x in v], dtype=np.int64)
        by_label.setdefault(r["label"], []).append(qv)
        norms.setdefault(r["label"], []).append(math.floor(nrm * 1e6))

    out = {r["label"]: r for r in QUERIES["q216_embedding_anisotropy"](spark, SF_SMOKE).collect()}
    assert set(out) == set(by_label)
    for lbl, qvs in by_label.items():
        n = len(qvs)
        m = np.stack(qvs)
        gram = m @ m.T  # int64 exact: |entries| < 64e12 << 2^63
        total = int(gram.sum()) - int(np.trace(gram))
        want_cos = _rhu(total / (n * (n - 1)) / 1e12, "0.000001")
        want_norm = _rhu(sum(norms[lbl]) / n / 1e6, "0.000001")
        o = out[lbl]
        assert o["n_vecs"] == n
        assert abs(o["mean_pairwise_cos"] - want_cos) < 1e-9
        assert abs(o["mean_norm"] - want_norm) < 1e-9


def test_q216_plan_has_no_pair_join(spark):
    """The scale claim: no join on the vector relation at all — two
    grouped aggregates and a broadcast of the 10-row label stats."""
    df = QUERIES["q216_embedding_anisotropy"](spark, SF_SMOKE)
    tree = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    ).split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


# --------------------------------------------------------------------------
# q217 temporal embargo split
# --------------------------------------------------------------------------

def test_q217_matches_brute_force(spark):
    import datetime

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("user_id", "ts").collect()
    t1 = datetime.datetime(2024, 1, 20)
    t2 = datetime.datetime(2024, 1, 22)
    agg: dict[int, list[int]] = {}
    for r in ev:
        c = agg.setdefault(r["user_id"], [0, 0, 0])
        if r["ts"] < t1:
            c[0] += 1
        elif r["ts"] < t2:
            c[1] += 1
        else:
            c[2] += 1
    out = QUERIES["q217_temporal_embargo_split"](spark, SF_SMOKE).collect()
    assert {r["user_id"] for r in out} == set(agg)
    for r in out:
        tr, em, te = agg[r["user_id"]]
        assert (r["n_train_events"], r["n_embargo_events"], r["n_test_events"]) == (tr, em, te)
        want = (
            "excluded_leaky"
            if tr > 0 and te > 0
            else "train" if tr > 0 else "test" if te > 0 else "embargo_only"
        )
        assert r["assignment"] == want


def test_q217_split_is_exhaustive_and_disjoint(spark):
    """Every user lands in exactly one verdict; train/test users never
    share an identity (the guard's whole point)."""
    out = QUERIES["q217_temporal_embargo_split"](spark, SF_SMOKE).collect()
    train = {r["user_id"] for r in out if r["assignment"] == "train"}
    test = {r["user_id"] for r in out if r["assignment"] == "test"}
    leaky = {r["user_id"] for r in out if r["assignment"] == "excluded_leaky"}
    assert not (train & test)
    assert all(r["n_train_events"] > 0 and r["n_test_events"] > 0 for r in out if r["assignment"] == "excluded_leaky")
    assert len(train) + len(test) + len(leaky) <= len(out)


# --------------------------------------------------------------------------
# q218 conformal sets
# --------------------------------------------------------------------------

def test_q218_matches_brute_force(spark):
    rows = _probe_scores(spark)
    s6 = {r["vec_id"]: int(_rhu(r["score"] * 1e6, "1")) for r in rows}
    y = {r["vec_id"]: r["label_true"] for r in rows}
    cal = sorted(
        ((1000000 - s6[v]) if y[v] == 1 else s6[v], v)
        for v in s6
        if v % 5 == 0
    )
    n = len(cal)
    k = -(-((n + 1) * 9) // 10)  # ceil((n+1)*9/10)
    qhat = cal[k - 1][0]
    out = QUERIES["q218_conformal_probe_sets"](spark, SF_SMOKE).collect()
    assert {r["vec_id"] for r in out} == {v for v in s6 if v % 5 != 0}
    for r in out:
        v = r["vec_id"]
        assert r["qhat6"] == qhat
        assert r["pos_in_set"] == int(1000000 - s6[v] <= qhat)
        assert r["neg_in_set"] == int(s6[v] <= qhat)
        assert r["set_size"] == r["pos_in_set"] + r["neg_in_set"]


def test_q218_marginal_coverage(spark):
    """Split-conformal guarantee: held-out coverage of the true label is
    at least 1 - alpha up to the finite-sample correction (here the weak
    probe yields wide sets, so coverage should be comfortably high)."""
    rows = {r["vec_id"]: r for r in _probe_scores(spark)}
    out = QUERIES["q218_conformal_probe_sets"](spark, SF_SMOKE).collect()
    covered = sum(
        (r["pos_in_set"] if rows[r["vec_id"]]["label_true"] == 1 else r["neg_in_set"])
        for r in out
    )
    assert covered / len(out) >= 0.8


# --------------------------------------------------------------------------
# q219 PSI
# --------------------------------------------------------------------------

def test_q219_matches_brute_force(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "source", "n_chars"
    ).collect()
    lo = min(d["n_chars"] for d in docs)
    hi = max(d["n_chars"] for d in docs)
    per_sb: dict[tuple[str, int], int] = {}
    sources = sorted({d["source"] for d in docs})
    for d in docs:
        b = min(int(math.floor((d["n_chars"] - lo) * 10.0 / (hi - lo + 1))), 9)
        per_sb[(d["source"], b)] = per_sb.get((d["source"], b), 0) + 1
    out = {r["source"]: r["psi"] for r in QUERIES["q219_source_psi"](spark, SF_SMOKE).collect()}
    assert set(out) == set(sources)
    nn = len(docs)
    for s in sources:
        ns = sum(per_sb.get((s, b), 0) for b in range(10))
        t9s = 0
        for b in range(10):
            c = per_sb.get((s, b), 0)
            cb = sum(per_sb.get((s2, b), 0) for s2 in sources)
            p = (c + 1) / (ns + 10)
            q = (cb + 1) / (nn + 10)
            t9s += math.floor((p - q) * math.log(p / q) * 1e9)
        want = _rhu(t9s / 1e9, "0.000001")
        assert abs(out[s] - want) < 1e-9
        # PSI terms are (p-q)ln(p/q) >= 0; only floor quantization can
        # push the sum a hair under zero
        assert out[s] >= -1e-8


# --------------------------------------------------------------------------
# q220 MMR
# --------------------------------------------------------------------------

def test_q220_matches_independent_greedy(spark):
    """Re-derive the whole MMR selection from raw embeddings with an
    independent implementation (no shared helpers) and compare pick by
    pick."""
    emb = {r["vec_id"]: r["embedding"] for r in spark.read.parquet(
        f"{SF_SMOKE}/embeddings.parquet").collect()}

    def fold(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    qv = emb[0]
    qn = math.sqrt(fold(qv, qv))
    rel = {
        v: _rhu(fold(qv, e) / (qn * math.sqrt(fold(e, e))), "0.0001")
        for v, e in emb.items()
        if v != 0
    }
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:30]
    rel4 = {v: int(_rhu(rel[v] * 10000, "1")) for v in pool}
    sim4 = {}
    for a in pool:
        na = math.sqrt(fold(emb[a], emb[a]))
        for b in pool:
            if a != b:
                nb = math.sqrt(fold(emb[b], emb[b]))
                sim4[(a, b)] = int(
                    _rhu(_rhu(fold(emb[a], emb[b]) / (na * nb), "0.0001") * 10000, "1")
                )
    chosen: list[int] = []
    want: list[tuple[int, int, int]] = []
    for step in range(1, 11):
        cands = [c for c in pool if c not in chosen]
        scores = {
            c: 7 * rel4[c] - (3 * max(sim4[(c, s)] for s in chosen) if chosen else 0)
            for c in cands
        }
        pick = min(cands, key=lambda c: (-scores[c], c))
        want.append((step, pick, scores[pick]))
        chosen.append(pick)

    out = QUERIES["q220_mmr_rerank"](spark, SF_SMOKE).collect()
    got = [(r["pick"], r["vec_id"], int(_rhu(r["mmr_score"] * 100000, "1"))) for r in out]
    assert got == want
    # first pick is the pure-relevance argmax; scores never increase
    assert out[0]["vec_id"] == min(rel4, key=lambda v: (-rel4[v], v))


# --------------------------------------------------------------------------
# q221 excess-loss reweighting
# --------------------------------------------------------------------------

def test_q221_matches_brute_force(spark):
    lm = {r["doc_id"]: r["avg_logp"] for r in QUERIES["q138_doc_lm_score"](spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "source").collect()
    per: dict[str, list[int]] = {}
    for d in docs:
        if d["doc_id"] in lm:  # docs with < 2 tokens score no pairs
            per.setdefault(d["source"], []).append(int(_rhu(lm[d["doc_id"]] * 1e6, "1")))
    gs = sum(sum(v) for v in per.values())
    gn = sum(len(v) for v in per.values())
    g_nll = _rhu(-(gs / gn) / 1e6, "0.000001")
    w6 = {}
    stats = {}
    for s, v in per.items():
        mean_nll = _rhu(-(sum(v) / len(v)) / 1e6, "0.000001")
        excess = _rhu(mean_nll - g_nll, "0.000001")
        stats[s] = (len(v), mean_nll, excess)
        w6[s] = max(0, 1000000 + int(_rhu(excess * 1e6, "1")) * 5)
    tw = sum(w6.values())
    out = {r["source"]: r for r in QUERIES["q221_excess_loss_reweight"](spark, SF_SMOKE).collect()}
    assert set(out) == set(per)
    for s in per:
        n, mean_nll, excess = stats[s]
        assert out[s]["n_docs"] == n
        assert abs(out[s]["mean_nll"] - mean_nll) < 1e-9
        assert abs(out[s]["excess"] - excess) < 1e-9
        assert abs(out[s]["mix_weight"] - _rhu(w6[s] / tw, "0.000001")) < 1e-9
    # mixture sums to ~1 and upweights above-average-loss sources
    assert abs(sum(r["mix_weight"] for r in out.values()) - 1.0) < 1e-4
    for s in per:
        if stats[s][2] > 1e-5:
            assert out[s]["mix_weight"] * len(per) > 1.0 - 1e-4


# --------------------------------------------------------------------------
# q222 heavy hitters
# --------------------------------------------------------------------------

def test_q222_matches_exact_threshold(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("text").collect()
    counts = Counter(t for d in docs for t in d["text"].split())
    total = sum(counts.values())
    want = {t: c for t, c in counts.items() if c * 32 > total}
    got = {r["tok"]: r["cnt"] for r in QUERIES["q222_heavy_hitters_exact"](spark, SF_SMOKE).collect()}
    assert got == want
    assert len(got) > 0


def test_q222_mg_candidates_superset_under_any_partitioning(spark):
    """The completeness guarantee the two-pass design rests on: however
    the token relation is split, the surviving MG candidates contain
    every token with freq > n/k."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import tokens as _tok
    from pyspark.sql import functions as F

    toks = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(F.explode(_tok("text")).alias("tok"))
    )
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("text").collect()
    counts = Counter(t for d in docs for t in d["text"].split())
    total = sum(counts.values())
    want = {t for t, c in counts.items() if c * 32 > total}
    for parts in (1, 7, 32):
        # direct candidate check at a hostile partitioning
        rep = toks.repartition(parts)
        k = 32

        def mg(it):
            import pandas as pd

            counters = {}
            for pdf in it:
                for tok_v, cnt_v in pdf["tok"].value_counts().items():
                    counters[tok_v] = counters.get(tok_v, 0) + int(cnt_v)
                if len(counters) > k - 1:
                    cut = sorted(counters.values(), reverse=True)[k - 1]
                    counters = {t2: c2 - cut for t2, c2 in counters.items() if c2 - cut > 0}
            yield pd.DataFrame({"tok": list(counters)})

        cands = {r["tok"] for r in rep.mapInPandas(mg, "tok string").collect()}
        assert want <= cands


# --------------------------------------------------------------------------
# q223 quantile normalization
# --------------------------------------------------------------------------

def test_q223_matches_brute_force(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    STOPS = ("the", "a", "of", "and")
    x = {
        d["doc_id"]: _rhu(
            sum(t in STOPS for t in d["text"].split()) / len(d["text"].split()),
            "0.0001",
        )
        for d in docs
    }
    src = {d["doc_id"]: d["source"] for d in docs}
    pooled = sorted(x, key=lambda i: (x[i], i))
    nn = len(pooled)
    want = {}
    for s in {v for v in src.values()}:
        mem = sorted((i for i in x if src[i] == s), key=lambda i: (x[i], i))
        ns = len(mem)
        for r, i in enumerate(mem, start=1):
            tr = math.floor((r - 1) * float(nn - 1) / (ns - 1)) + 1
            want[i] = x[pooled[tr - 1]]
    out = QUERIES["q223_quantile_normalize"](spark, SF_SMOKE).collect()
    assert len(out) == nn
    for r in out:
        assert r["score"] == x[r["doc_id"]]
        assert r["norm_score"] == want[r["doc_id"]]


def test_q223_harmonizes_distributions(spark):
    """After normalization, per-source score distributions are drawn
    from the SAME pooled value set, and within-source ordering is
    preserved (monotone mapping)."""
    out = QUERIES["q223_quantile_normalize"](spark, SF_SMOKE).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    pooled_vals = sorted({r["norm_score"] for r in out})
    assert len(pooled_vals) > 1
    for s, rows in by_src.items():
        rows = sorted(rows, key=lambda r: (r["score"], r["doc_id"]))
        ns = [r["norm_score"] for r in rows]
        assert all(ns[i] <= ns[i + 1] for i in range(len(ns) - 1))


# --------------------------------------------------------------------------
# q224 distinct-n
# --------------------------------------------------------------------------

def test_q224_matches_brute_force(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("source", "text").collect()
    want = {}
    for n in (1, 2, 3):
        per: dict[str, Counter] = {}
        for d in docs:
            ts = d["text"].split()
            if len(ts) < n:
                continue
            grams = [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]
            per.setdefault(d["source"], Counter()).update(grams)
        for s, c in per.items():
            tot = sum(c.values())
            want[(s, n)] = (tot, len(c), _rhu(len(c) / tot, "0.000001"))
    out = QUERIES["q224_distinct_ngrams"](spark, SF_SMOKE).collect()
    assert {(r["source"], r["n"]) for r in out} == set(want)
    for r in out:
        tot, dis, ratio = want[(r["source"], r["n"])]
        assert (r["total_ngrams"], r["distinct_ngrams"]) == (tot, dis)
        assert abs(r["distinct_ratio"] - ratio) < 1e-9
    # diversity can only fall as n-grams get longer on a fixed corpus? no —
    # distinct RATIO rises with n (longer grams repeat less); assert that
    by_src: dict[str, dict[int, float]] = {}
    for r in out:
        by_src.setdefault(r["source"], {})[r["n"]] = r["distinct_ratio"]
    for s, m in by_src.items():
        assert m[1] <= m[2] <= m[3]


# --------------------------------------------------------------------------
# q225 exact KS
# --------------------------------------------------------------------------

def test_q225_matches_brute_force(spark):
    rows = _probe_scores(spark)
    pos = sorted(r["score"] for r in rows if r["label_true"] == 1)
    neg = sorted(r["score"] for r in rows if r["label_true"] == 0)
    thresholds = sorted(set(pos) | set(neg))
    best = None
    for t in thresholds:
        c1 = sum(1 for v in pos if v <= t)
        c0 = sum(1 for v in neg if v <= t)
        dnum = abs(c1 * len(neg) - c0 * len(pos))
        if best is None or dnum > best[0]:
            best = (dnum, t)
    out = QUERIES["q225_probe_ks_separation"](spark, SF_SMOKE).collect()[0]
    assert out["n_pos"] == len(pos)
    assert out["n_neg"] == len(neg)
    assert out["ks_threshold"] == best[1]
    assert abs(out["ks_d"] - _rhu(best[0] / (len(pos) * len(neg)), "0.000001")) < 1e-9


def test_q225_ks_bounds_auc(spark):
    """Classical relation on any pair of samples: D in [0,1], and a
    separation of D implies AUC >= 1/2 + D/2 is NOT generally true, but
    AUC = 1/2 exactly when D = 0 cannot be asserted either way from one
    corpus — so pin only the implementable invariant: 0 <= D <= 1 and
    the threshold is an observed score."""
    out = QUERIES["q225_probe_ks_separation"](spark, SF_SMOKE).collect()[0]
    assert 0.0 <= out["ks_d"] <= 1.0
    scores = {r["score"] for r in _probe_scores(spark)}
    assert out["ks_threshold"] in scores
