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
from . import decontamination  # noqa: F401  (registers q244, q249, q265)
from . import signature_maintenance  # noqa: F401  (registers q245)
from . import ann_maintenance  # noqa: F401  (registers q246-q247, q251)
from . import lexical_maintenance  # noqa: F401  (registers q248)
from . import census_maintenance  # noqa: F401  (registers q250)
from . import ingest_composed  # noqa: F401  (registers q252)
from . import packing  # noqa: F401  (registers q253-q257, q267)
from . import packed_store  # noqa: F401  (registers q258, q260)
from . import census_evolution  # noqa: F401  (registers q259)
from . import loader_schedule  # noqa: F401  (registers q262-q264; new modules import LAST — insertion order is registration order)
from . import span_corruption  # noqa: F401  (registers q266, q268)

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
# Round-13 prefix (computed by evidence.build_prefix(this_round=13) from
# the committed CORRECTNESS_r1..r12 history): the four REVIEW_PINS lead —
# q123/q140/q146/q247, the r12 kernel-switched queries the r12 verdict
# flagged as never independently hashed by the driver since the switch
# (evidence.REVIEW_PINS[13]; their own evidence is r8/r9) — then the
# r7-evidence staleness cohort (q95-q97, q238-q243, q01/q21/q23) and the
# r8-evidence cohort in effective-green order: the similarity/ANN
# batteries (q153/q98/q39-q41/q154/q99), text kernels (q53/q63/q135/
# q137-q148 families), the incremental-dedup chain (q100-q106, q110-q116)
# up to the 50-slot cap. No never-self-green queries exist this round
# (q261-q268 were gated green in r12).
# Deliberately never scheduled: q46/q81 (rows-only sketch values;
# q134/q136 carry their evidence) and fixture-tagged superseded folds
# (q56/q118/q125).
#
# PREFIX_ROUND records which round's deterministic schedule this tuple IS.
# The driver writes CORRECTNESS_r{PREFIX_ROUND}.json AFTER the end-of-round
# snapshot commit, so between that write and the next round-open rotation
# the committed tuple lags latest_gated_round()+1 by design;
# tests/test_rotation.py uses PREFIX_ROUND to xfail (not hard-fail) in that
# window while still hard-failing on genuine drift from the schedule the
# tuple was frozen for (r5 verdict item 5).
# ---------------------------------------------------------------------------
PREFIX_ROUND: int = 13

_PRIORITY: tuple[str, ...] = (
    "q123_pq_adc_rerank",
    "q140_embedding_covariance",
    "q146_semantic_dedup_cells",
    "q247_ivf_pq_index_maintenance",
    "q95_supplier_revenue_rank",
    "q96_trailing_hour_stats",
    "q97_salted_flag_totals",
    "q238_url_host_dedup",
    "q239_dedup_index_maintenance",
    "q240_domain_quota_enforce",
    "q241_cross_source_overlap",
    "q242_dedup_identity_ladder",
    "q243_vocab_growth",
    "q01_avg_price_by_dow",
    "q21_member_spend_rides",
    "q23_format_orders",
    "q153_minhash_jaccard_estimate",
    "q98_lsh_verified_pairs",
    "q39_embedding_topk",
    "q40_embedding_lsh_ann",
    "q154_ann_recall",
    "q41_multimodal_features",
    "q99_frame_sample",
    "q53_simhash_near_pairs",
    "q63_winnow_fingerprints",
    "q135_substring_dup_spans",
    "q137_substring_dedup_clean",
    "q141_pca_project",
    "q143_pca_project2",
    "q145_logreg_probe",
    "q148_char_entropy",
    "q139_incremental_span_dedup",
    "q138_doc_lm_score",
    "q144_dsir_weights",
    "q100_semantic_dup_lsh",
    "q64_embedding_topk_vectorized",
    "q107_cms_heavy_hitters",
    "q108_weighted_sample",
    "q163_jaccard_prefix_join",
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
