"""q226-q229 intake-profiling heads: end-to-end equality against
independent brute-force recomputations (pure Python / pandas) on the
collected smoke corpus — the DuckDB oracle can share a bug with the
implementation, the brute force can't."""

import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def _rhu(v: float, places: str) -> float:
    """Spark round(): HALF_UP over the double's shortest decimal repr."""
    return float(Decimal(repr(v)).quantize(Decimal(places), ROUND_HALF_UP))


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()


def _orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()


# --------------------------------------------------------------------------
# q226 dedup yield curve
# --------------------------------------------------------------------------

def _exact_pairs(spark):
    """Exhaustive word-3-gram Jaccard >= 0.5 pairs, recomputed in pure
    Python (the same ground truth tests/test_dedup_similarity.py uses)."""
    shingles = {}
    for r in _docs(spark):
        ts = r["text"].strip().split()
        shingles[r["doc_id"]] = {
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        }
    ids = sorted(shingles)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(shingles[a] & shingles[b])
            if not inter:
                continue
            jac = inter / (len(shingles[a]) + len(shingles[b]) - inter)
            if jac >= 0.5:
                pairs.append((a, b, _rhu(jac, "0.0001")))
    return pairs


def test_q226_matches_bruteforce_curve(spark):
    pairs = _exact_pairs(spark)
    total = len(_docs(spark))
    out = {
        r["threshold"]: r
        for r in QUERIES["q226_dedup_yield_curve"](spark, SF_SMOKE).collect()
    }
    assert sorted(out) == [0.5, 0.6, 0.7, 0.8, 0.9]
    for t in (0.5, 0.6, 0.7, 0.8, 0.9):
        q = [(a, b) for a, b, j in pairs if j >= t]
        removed = {b for _, b in q}
        row = out[t]
        assert row["dup_pairs"] == len(q), t
        assert row["docs_removed"] == len(removed), t
        assert row["docs_retained"] == total - len(removed), t
        assert row["yield_frac"] == _rhu((total - len(removed)) / total, "0.000001")


def test_q226_monotone_and_grounded(spark):
    rows = sorted(
        QUERIES["q226_dedup_yield_curve"](spark, SF_SMOKE).collect(),
        key=lambda r: r["threshold"],
    )
    # tightening the threshold can only retain more documents
    for lo, hi in zip(rows, rows[1:]):
        assert hi["docs_retained"] >= lo["docs_retained"]
        assert hi["dup_pairs"] <= lo["dup_pairs"]
    # the 0.5 row matches the gate-verified q163 pair relation
    n_pairs = QUERIES["q163_jaccard_prefix_join"](spark, SF_SMOKE).count()
    assert rows[0]["dup_pairs"] == n_pairs


# --------------------------------------------------------------------------
# q227 tokenizer fertility
# --------------------------------------------------------------------------

_SUBWORD = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")


def test_q227_matches_bruteforce(spark):
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, ws, subword, chars
    for r in _docs(spark):
        a = agg[r["source"]]
        a[0] += 1
        a[1] += len(re.split(r"\s+", r["text"].strip()))
        a[2] += len(_SUBWORD.findall(r["text"]))
        a[3] += len(r["text"])
    out = QUERIES["q227_tokenizer_fertility"](spark, SF_SMOKE).collect()
    assert {r["source"] for r in out} == set(agg)
    for r in out:
        docs, ws, sub, chars = agg[r["source"]]
        assert r["n_docs"] == docs
        assert r["ws_tokens"] == ws
        assert r["subword_tokens"] == sub
        assert r["n_chars"] == chars
        assert r["fertility"] == _rhu(sub / ws, "0.000001")
        assert r["chars_per_token"] == _rhu(chars / sub, "0.000001")


def test_q227_single_scan_no_join(spark):
    plan = (
        QUERIES["q227_tokenizer_fertility"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# q228 functional dependencies
# --------------------------------------------------------------------------

def test_q228_matches_bruteforce(spark):
    rows = _orders(spark)
    specs = {
        "o_orderkey->o_custkey": ("o_orderkey", "o_custkey"),
        "o_custkey->o_orderstatus": ("o_custkey", "o_orderstatus"),
        "o_orderpriority->o_orderstatus": ("o_orderpriority", "o_orderstatus"),
        "o_orderstatus->o_orderpriority": ("o_orderstatus", "o_orderpriority"),
    }
    out = {
        r["fd"]: r
        for r in QUERIES["q228_functional_dependency_audit"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(out) == set(specs)
    for fd, (det, dep) in specs.items():
        deps = defaultdict(set)
        for r in rows:
            deps[r[det]].add(r[dep])
        violating = sum(1 for v in deps.values() if len(v) > 1)
        row = out[fd]
        assert row["n_det_values"] == len(deps), fd
        assert row["n_violating_det"] == violating, fd
        assert row["max_dep_per_det"] == max(len(v) for v in deps.values()), fd
        assert row["holds"] == (violating == 0), fd


def test_q228_key_fd_holds_and_reverse_fails(spark):
    out = {
        r["fd"]: r["holds"]
        for r in QUERIES["q228_functional_dependency_audit"](
            spark, SF_SMOKE
        ).collect()
    }
    assert out["o_orderkey->o_custkey"] is True
    assert out["o_custkey->o_orderstatus"] is False


# --------------------------------------------------------------------------
# q229 candidate keys
# --------------------------------------------------------------------------

def test_q229_matches_bruteforce(spark):
    rows = _orders(spark)
    cols = (
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    out = {
        r["column_name"]: r
        for r in QUERIES["q229_candidate_key_profile"](spark, SF_SMOKE).collect()
    }
    assert set(out) == set(cols)
    n = len(rows)
    for c in cols:
        vals = [r[c] for r in rows]
        non_null = [v for v in vals if v is not None]
        distinct = len(set(non_null))
        row = out[c]
        assert row["n_rows"] == n, c
        assert row["n_non_null"] == len(non_null), c
        assert row["n_distinct"] == distinct, c
        assert row["uniqueness"] == _rhu(distinct / n, "0.000001"), c
        assert row["candidate_key"] == (distinct == n and len(non_null) == n), c


def test_q229_key_verdicts(spark):
    """The PK is a candidate key; low-cardinality enums never are.
    (o_totalprice happens to be unique at smoke scale — continuous
    doubles — so no only-one-key claim here.)"""
    out = {
        r["column_name"]: r["candidate_key"]
        for r in QUERIES["q229_candidate_key_profile"](spark, SF_SMOKE).collect()
    }
    assert out["o_orderkey"] is True
    assert out["o_orderstatus"] is False
    assert out["o_orderpriority"] is False
