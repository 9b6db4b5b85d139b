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
from . import decontamination  # noqa: F401  (registers q244, q249)
from . import signature_maintenance  # noqa: F401  (registers q245)
from . import ann_maintenance  # noqa: F401  (registers q246-q247, q251)
from . import lexical_maintenance  # noqa: F401  (registers q248)
from . import census_maintenance  # noqa: F401  (registers q250)
from . import ingest_composed  # noqa: F401  (registers q252)
from . import packing  # noqa: F401  (registers q253-q257)
from . import packed_store  # noqa: F401  (registers q258, q260)
from . import census_evolution  # noqa: F401  (registers q259; new modules import LAST — insertion order is registration order)

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
# Round-11 prefix (computed by evidence.build_prefix() from the committed
# CORRECTNESS_r1..r10 history): the never-gated new-this-round heads lead
# in insertion order — q257 (mix -> pack composition), q258 (packed-
# sequence maintained store), q259 (census schema evolution), q260
# (packed spans store) — then the
# staleness ladder: the r6-evidence cohort at the floor (q05-q20/q22,
# the supplier/part/membership/date-dim agg batteries; q42-q52/q54/
# q59-q62/q66-q69, the event-analytics and text-intake families; and
# q226-q237, the intake/experiment/diagnostics cohort).
# The r10-gated heads (q252-q256 and the r5 cohort) rotated off on
# fresh evidence; they return on their staleness clocks.
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
PREFIX_ROUND: int = 11

_PRIORITY: tuple[str, ...] = (
    "q257_mixture_packing",
    "q258_packed_store_maintenance",
    "q260_packed_spans_store",
    "q259_census_schema_evolution",
    "q05_avg_extprice_by_supp",
    "q06_sum_extprice_by_supp",
    "q07_avg_extprice_by_part",
    "q08_sum_extprice_by_part",
    "q09_sum_price_by_acct_band",
    "q10_avg_price_by_acct_band",
    "q11_avg_price_by_membership",
    "q12_sum_price_by_membership",
    "q13_sum_amount_by_month",
    "q14_avg_amount_by_month",
    "q15_sum_amount_by_quarter",
    "q16_avg_amount_by_quarter",
    "q17_sum_amount_by_year",
    "q18_avg_amount_by_year",
    "q19_member_avg_by_acct_band",
    "q20_member_sum_by_acct_band",
    "q22_member_spend_duration",
    "q54_dedup_keep_rows",
    "q62_bpe_token_count",
    "q66_doc_chunks",
    "q69_source_stats",
    "q42_hourly_event_stats",
    "q44_top_tokens",
    "q45_distinct_users_by_type",
    "q47_user_running_value",
    "q48_sessionize",
    "q49_event_type_pivot",
    "q50_props_json_extract",
    "q51_pricing_summary",
    "q52_segment_shipping",
    "q59_member_users_with_events",
    "q60_order_counts_left_outer",
    "q61_customers_with_events_semi",
    "q67_value_percentiles",
    "q68_status_priority_cube",
    "q226_dedup_yield_curve",
    "q227_tokenizer_fertility",
    "q228_functional_dependency_audit",
    "q229_candidate_key_profile",
    "q230_churn_survival_km",
    "q231_cuped_readout",
    "q232_conversion_ztest",
    "q233_embedding_hubness",
    "q234_volume_anomaly_flags",
    "q235_tokenizer_roundtrip",
    "q236_chunk_roundtrip",
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
