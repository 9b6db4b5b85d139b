"""Aggregated query registry: importing this module registers every plan
module's queries into ``REGISTRY`` and exposes the driver-contract dicts."""

from __future__ import annotations

from .base import REGISTRY, QuerySpec, QueryFn  # noqa: F401
from . import core  # noqa: F401  (registers q01-q30)
from . import extensions  # noqa: F401  (registers q31-q41, q53-q69, q98-q100, q104, q107-q109, q128, q135/q137-q139, q144-q148, q153-q154, q157, q163)
from . import analytics_ext  # noqa: F401  (registers q42-q52, q59-q70, q126-q127, q134, q136, q155-q156, q168)
from . import sql_entry  # noqa: F401  (registers q57-q58)
from . import training  # noqa: F401  (registers q71-q84, q101-q106, q110-q113, q165)
from . import quality  # noqa: F401  (registers q85-q97, q167)
from . import curation  # noqa: F401  (registers q114-q125, q129-q132, q201)
from . import lakehouse  # noqa: F401  (registers q149-q152, q160-q162, q164, q166, q199)
from . import profiling  # noqa: F401  (registers q169-q198, q200)
from . import intervals  # noqa: F401  (registers q202-q203)
from . import containment  # noqa: F401  (registers q204)
from . import timeseries  # noqa: F401  (registers q205)
from . import lm_advanced  # noqa: F401  (registers q206, q209, q208 — file order = registration order)
from . import privacy  # noqa: F401  (registers q207)
from . import score_audit  # noqa: F401  (registers q210)
from . import evalmetrics  # noqa: F401  (registers q211-q225)
from . import intake  # noqa: F401  (registers q226-q229)
from . import experiment  # noqa: F401  (registers q230-q232)
from . import diagnostics  # noqa: F401  (registers q233-q234)
from . import tokenizer_validation  # noqa: F401  (registers q235)
from . import chunk_validation  # noqa: F401  (registers q236)
from . import tcloseness  # noqa: F401  (registers q237)
from . import url_intake  # noqa: F401  (registers q238)
from . import dedup_maintenance  # noqa: F401  (registers q239)
from . import url_quota  # noqa: F401  (registers q240)
from . import source_overlap  # noqa: F401  (registers q241)
from . import corpus_health  # noqa: F401  (registers q242-q243)
from . import decontamination  # noqa: F401  (registers q244)
from . import signature_maintenance  # noqa: F401  (registers q245; new modules import LAST — insertion order is registration order)

# ---------------------------------------------------------------------------
# Export order. The grading driver gates exactly the FIRST 50 registry
# entries each round, so this prefix is rebuilt every round by the
# deterministic scheduler in ``plans/evidence.py`` (never-self-green
# oracled queries first in insertion order, then oldest effective
# evidence, oracle-twin groups derived from verbatim oracle-SQL identity,
# staleness bound = 4 rounds). ``tools/check_rotation.py`` and
# ``tests/test_rotation.py`` recompute the schedule from the committed
# CORRECTNESS_r*.json history and fail on any drift from this tuple —
# the policy is data + code now, not prose (r4 verdict item 2).
#
# Round-8 prefix (computed by evidence.build_prefix() from the committed
# CORRECTNESS_r1..r7 history): the never-driver-gated new-this-round
# registrations lead — q244 (multi-benchmark decontamination sweep, r7
# verdict item 5) and q245 (maintained LSH signature/band table, the
# lever the r8 maintenance soak identified) — then the aged r3-evidence
# cohort: the ANN/multimodal/sketch heads q40/q41/q99/q53/q63/q100/
# q107/q108, the date-derivation pair q126/q127, q134, and the
# training/curation families q101-q106/q110-q117/q119/q121-q124/
# q131-q132 (driver-gated in r3, untouched since) — with the tail
# filled by the next-oldest evidence (r4/r5 cohort: q01/q21/q23, the
# embedding/substring/LM heads q153/q98/q39/q154/q135/q137-q139/q141/
# q143-q145/q148/q138/q64). q104 and q65 rotated off the tail by the
# two new insertions — they return on their staleness clocks.
# Deliberately never scheduled: q46/q81 (rows-only sketch values;
# q134/q136 carry their evidence) and fixture-tagged superseded folds
# (q56/q118/q125 — their kernels q130/q120/q129 carry identical oracle
# SQL).
#
# PREFIX_ROUND records which round's deterministic schedule this tuple IS.
# The driver writes CORRECTNESS_r{PREFIX_ROUND}.json AFTER the end-of-round
# snapshot commit, so between that write and the next round-open rotation
# the committed tuple lags latest_gated_round()+1 by design;
# tests/test_rotation.py uses PREFIX_ROUND to xfail (not hard-fail) in that
# window while still hard-failing on genuine drift from the schedule the
# tuple was frozen for (r5 verdict item 5).
# ---------------------------------------------------------------------------
PREFIX_ROUND: int = 8

_PRIORITY: tuple[str, ...] = (
    "q244_multi_benchmark_decontamination",
    "q245_signature_table_maintenance",
    "q40_embedding_lsh_ann",
    "q41_multimodal_features",
    "q99_frame_sample",
    "q53_simhash_near_pairs",
    "q63_winnow_fingerprints",
    "q100_semantic_dup_lsh",
    "q107_cms_heavy_hitters",
    "q108_weighted_sample",
    "q126_event_gap_seconds",
    "q127_order_age_years",
    "q134_kmv_distinct_users",
    "q101_source_quota_cap",
    "q102_bloom_prefilter_join",
    "q103_incremental_dedup",
    "q105_dup_group_canonical",
    "q106_corpus_shuffle",
    "q110_token_budget_mix",
    "q111_salted_revenue_join",
    "q112_incremental_gold_refresh",
    "q113_leakage_safe_split",
    "q114_decayed_user_activity",
    "q115_length_bucket_batches",
    "q116_hard_negatives",
    "q117_corpus_filter_gate",
    "q119_source_token_drift",
    "q121_curation_pipeline",
    "q122_value_drift_by_window",
    "q123_pq_adc_rerank",
    "q124_curriculum_order",
    "q131_bpe_vocab",
    "q132_bpe_token_counts",
    "q01_avg_price_by_dow",
    "q21_member_spend_rides",
    "q23_format_orders",
    "q153_minhash_jaccard_estimate",
    "q98_lsh_verified_pairs",
    "q39_embedding_topk",
    "q154_ann_recall",
    "q135_substring_dup_spans",
    "q137_substring_dedup_clean",
    "q141_pca_project",
    "q143_pca_project2",
    "q145_logreg_probe",
    "q148_char_entropy",
    "q139_incremental_span_dedup",
    "q138_doc_lm_score",
    "q144_dsir_weights",
    "q64_embedding_topk_vectorized",
)

_missing = [n for n in _PRIORITY if n not in REGISTRY]
if _missing:  # fail loudly at import: a renamed query must update the prefix
    raise KeyError(f"registry priority prefix references unknown queries: {_missing}")

_ORDER: list[str] = list(_PRIORITY) + [n for n in REGISTRY if n not in set(_PRIORITY)]

#: name -> (spark, sf_dir) -> DataFrame
QUERIES: dict[str, QueryFn] = {name: REGISTRY[name].fn for name in _ORDER}

#: name -> DuckDB oracle SQL (only for SQL-expressible queries)
ORACLES: dict[str, str] = {
    name: REGISTRY[name].oracle for name in _ORDER if REGISTRY[name].oracle is not None
}
