"""Property tests for the r4 curation additions: DSIR importance weights
(q144), the GD-fit logistic probe (q145), and SemDeDup cell-blocked
semantic dedup (q146). Oracle value-parity is the driver gate's job;
these pin the SEMANTICS — the things a hash-match can't express."""

import math

import pytest

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


# --------------------------------------------------------------------------
# q144 DSIR
# --------------------------------------------------------------------------

def test_dsir_upweights_target_slice(spark):
    """The defining DSIR property: the target slice's own documents must
    average a HIGHER importance weight than out-of-target documents (the
    target LM prefers the distribution it was trained on), and every doc
    with >= 2 tokens gets a finite weight."""
    rows = QUERIES["q144_dsir_weights"](spark, SF_SMOKE).collect()
    docs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    assert rows and all(math.isfinite(r["dsir_logw"]) for r in rows)
    assert all(r["n_pairs"] >= 1 for r in rows)
    tgt = [r["dsir_logw"] for r in rows if docs[r["doc_id"]] == "en"]
    rest = [r["dsir_logw"] for r in rows if docs[r["doc_id"]] != "en"]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_dsir_weight_is_decimal_sum_difference(spark):
    """dsir_logw must equal the round-6 of (sum_t - sum_r)/n computed from
    the two average columns' unrounded sums — i.e. the difference is taken
    in exact decimal BEFORE rounding, not as avg_t - avg_r of two rounded
    averages (which can differ by 1e-6 and would silently change the
    contract)."""
    rows = QUERIES["q144_dsir_weights"](spark, SF_SMOKE).collect()
    # reconstructing exact sums isn't possible from rounded averages, so
    # assert the weaker-but-real invariant: |logw - (avg_t - avg_r)| is
    # within one rounding ulp of the round-6 grid
    for r in rows:
        assert abs(r["dsir_logw"] - (r["avg_logp_target"] - r["avg_logp_raw"])) <= 2e-6


# --------------------------------------------------------------------------
# q145 logistic probe
# --------------------------------------------------------------------------

def test_probe_fit_deterministic_and_nonzero(spark):
    """Two independent fits over the same corpus must produce IDENTICAL
    weights (the whole point of the exact-gradient discipline), and the
    gradient signal must be non-degenerate (weights move off init)."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.probe import (
        logreg_probe_fit,
        probe_features,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    feats = probe_features(emb).localCheckpoint()
    w1 = logreg_probe_fit(feats)
    w2 = logreg_probe_fit(feats)
    assert w1 == w2
    assert any(w != 0.0 for w in w1)


def test_probe_scores_consistent(spark):
    """score in [0,1]; pred == (score >= 0.5); label_true mirrors the
    label < 5 rule from the source table; every vector scored."""
    rows = QUERIES["q145_logreg_probe"](spark, SF_SMOKE).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    assert len(rows) == len(labels)
    for r in rows:
        assert 0.0 <= r["score"] <= 1.0
        assert r["pred"] == (1 if r["score"] >= 0.5 else 0)
        assert r["label_true"] == (1 if labels[r["vec_id"]] < 5 else 0)


# --------------------------------------------------------------------------
# q146 SemDeDup
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def semdedup_rows(spark):
    return QUERIES["q146_semantic_dedup_cells"](spark, SF_SMOKE).collect()


def test_semdedup_covers_corpus_once(spark, semdedup_rows):
    """Every vector appears exactly once, with a valid cell id."""
    n = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert len(semdedup_rows) == n
    assert len({r["vec_id"] for r in semdedup_rows}) == n
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.extensions import (
        _SEMDEDUP_K,
    )

    assert all(0 <= r["cell"] < _SEMDEDUP_K for r in semdedup_rows)


def test_semdedup_keep_rule_exact(spark, semdedup_rows):
    """Recompute the keep rule exhaustively (smoke scale): a vector is
    dropped IFF some lower-id same-cell vector scores round(cos,4) >=
    0.45 against it — and the lowest-id member of every cell is kept."""
    import numpy as np

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    by_cell: dict[int, list[int]] = {}
    kept = {}
    for r in semdedup_rows:
        by_cell.setdefault(r["cell"], []).append(r["vec_id"])
        kept[r["vec_id"]] = r["kept"]
    for cell, ids in by_cell.items():
        ids.sort()
        assert kept[ids[0]] == 1, f"lowest id of cell {cell} must be kept"
        for i, vb in enumerate(ids):
            has_dup = False
            for va in ids[:i]:
                a, b = emb[va], emb[vb]
                cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                if round(cos, 4) >= 0.45:
                    has_dup = True
                    break
            assert kept[vb] == (0 if has_dup else 1), (cell, vb)


def test_semdedup_kernel_twin_row_identical(spark, semdedup_rows):
    """q147 (numpy int64 assignment kernel) must be ROW-IDENTICAL to q146
    (Column-fold assignment) — the exact-integer twin contract that lets
    it carry q146's oracle verbatim."""
    kernel = QUERIES["q147_semantic_dedup_cells_vectorized"](spark, SF_SMOKE).collect()
    key = lambda r: (r["vec_id"], r["cell"], r["kept"])
    assert sorted(map(key, kernel)) == sorted(map(key, semdedup_rows))


# --------------------------------------------------------------------------
# q148 character entropy
# --------------------------------------------------------------------------

def test_char_entropy_matches_direct_computation(spark):
    """Recompute entropy from raw text (smoke scale) and compare to the
    engine's exact-count formulation; bounds: 0 <= H <= log2(alphabet)."""
    import math
    from collections import Counter

    rows = {r["doc_id"]: r for r in QUERIES["q148_char_entropy"](spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        cnt = Counter(d["text"])
        n = sum(cnt.values())
        h = -sum((c / n) * math.log2(c / n) for c in cnt.values())
        r = rows[d["doc_id"]]
        assert r["n_chars"] == n
        assert abs(r["entropy"] - h) < 1e-4, d["doc_id"]
        assert 0.0 <= r["entropy"] <= math.log2(len(cnt)) + 1e-9


# --------------------------------------------------------------------------
# partitioning invariance — the determinism claims under actual replans
# --------------------------------------------------------------------------

def test_probe_fit_invariant_under_repartition(spark):
    """The probe fit's gradient sums are exact DECIMAL of int64 terms, so
    the learned weights must be bit-identical under any partitioning —
    the claim a 1000-executor cluster depends on."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.probe import (
        logreg_probe_fit,
        probe_features,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    w1 = logreg_probe_fit(probe_features(emb.repartition(3)).localCheckpoint())
    w2 = logreg_probe_fit(probe_features(emb.repartition(13)).localCheckpoint())
    assert w1 == w2


def test_dsir_invariant_under_repartition(spark):
    """Both LM fits and the scoring pass ride exact integer counts and
    DECIMAL sums — identical weights whatever the partitioning."""
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.lm import (
        lm_dsir_score_pairs,
        lm_fit,
        lm_pairs,
    )

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "text"
    )

    def run(dd):
        pairs = lm_pairs(dd).localCheckpoint()
        raw = lm_fit(dd, pairs=pairs)
        tgt = lm_fit(dd.where(F.col("lang") == "en"))
        rows = lm_dsir_score_pairs(pairs, tgt, raw).collect()
        return sorted((r["doc_id"], r["n_pairs"], r["dsir_logw"]) for r in rows)

    assert run(d.repartition(3)) == run(d.repartition(13))
