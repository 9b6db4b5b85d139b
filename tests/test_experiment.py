"""q230-q232 experimentation heads: end-to-end equality against
independent brute-force recomputations (pure Python) on the collected
smoke corpus, plus invariants the oracle can't express (survival
monotonicity, CUPED variance never increases on the pooled fit)."""

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def _rhu(v: float, places: str) -> float:
    return float(Decimal(repr(v)).quantize(Decimal(places), ROUND_HALF_UP))


def _events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()


def _lifetimes(rows):
    """(duration_days, churned) per user — death at first error with
    value > 150, censoring at the last observed day."""
    d0, dlast, derr = {}, {}, {}
    for r in rows:
        u, day = r["user_id"], r["ts"].date()
        d0[u] = min(d0.get(u, day), day)
        dlast[u] = max(dlast.get(u, day), day)
        if r["event_type"] == "error" and r["value"] > 150:
            derr[u] = min(derr.get(u, day), day)
    return [
        ((derr.get(u, dlast[u]) - d0[u]).days, u in derr) for u in d0
    ]


def test_q230_matches_bruteforce_km(spark):
    lts = _lifetimes(_events(spark))
    out = QUERIES["q230_churn_survival_km"](spark, SF_SMOKE).collect()
    # classic KM over death times
    durations = sorted({t for t, _ in lts})
    surv, rows = 1.0, {}
    for t in durations:
        n_at_risk = sum(1 for d, _ in lts if d >= t)
        deaths = sum(1 for d, dead in lts if d == t and dead)
        total = sum(1 for d, _ in lts if d == t)
        if deaths:
            surv *= 1 - deaths / n_at_risk
            rows[t] = (n_at_risk, deaths, total - deaths, surv)
    assert {r["duration_days"] for r in out} == set(rows)
    for r in out:
        n, d, c, s = rows[r["duration_days"]]
        assert r["n_at_risk"] == n
        assert r["n_deaths"] == d
        assert r["n_censored"] == c
        # implementation sums DECIMAL(18,12)-quantized logs; agree to 1e-5
        assert abs(r["survival"] - s) < 1e-5, r["duration_days"]


def test_q230_survival_is_monotone_from_one(spark):
    out = sorted(
        QUERIES["q230_churn_survival_km"](spark, SF_SMOKE).collect(),
        key=lambda r: r["duration_days"],
    )
    assert out, "smoke corpus must produce at least one death time"
    last = 1.0
    for r in out:
        assert 0.0 <= r["survival"] <= last + 1e-12
        last = r["survival"]
        assert r["n_deaths"] >= 1
        assert r["n_at_risk"] >= r["n_deaths"]


def _user_xy(rows):
    split = "2024-01-16"
    xy = defaultdict(lambda: [Decimal(0), Decimal(0)])
    for r in rows:
        side = 0 if str(r["ts"].date()) < split else 1
        xy[r["user_id"]][side] += Decimal(repr(r["value"])).quantize(
            Decimal("0.01"), ROUND_HALF_UP
        )
    return xy


def test_q231_matches_bruteforce_cuped(spark):
    xy = _user_xy(_events(spark))
    xs = {u: float(v[0]) for u, v in xy.items()}
    ys = {u: float(v[1]) for u, v in xy.items()}
    users = sorted(xy)
    n = len(users)
    sx = sum(xs[u] for u in users)
    sy = sum(ys[u] for u in users)
    sxx = sum(xs[u] ** 2 for u in users)
    sxy = sum(xs[u] * ys[u] for u in users)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    mean_x = sx / n
    out = {
        r["variant"]: r
        for r in QUERIES["q231_cuped_readout"](spark, SF_SMOKE).collect()
    }
    assert set(out) == {0, 1}
    for variant in (0, 1):
        vu = [u for u in users if u % 2 == variant]
        vy = [ys[u] for u in vu]
        vx = [xs[u] for u in vu]
        m = len(vu)
        mean_post = sum(vy) / m
        mean_cuped = mean_post - theta * (sum(vx) / m - mean_x)
        adj = [y - theta * (x - mean_x) for x, y in zip(vx, vy)]
        var_post = sum((y - mean_post) ** 2 for y in vy) / m
        var_cuped = sum((a - mean_cuped) ** 2 for a in adj) / m
        row = out[variant]
        assert row["n_users"] == m
        assert abs(row["mean_post"] - mean_post) < 1e-4
        assert abs(row["mean_cuped"] - mean_cuped) < 1e-4
        assert abs(row["var_post"] - var_post) < max(1e-3, var_post * 1e-6)
        assert abs(row["var_cuped"] - var_cuped) < max(1e-3, var_post * 1e-6)
        assert abs(
            row["var_reduction"] - (1 - var_cuped / var_post)
        ) < 1e-6


def test_q232_matches_bruteforce_ztest(spark):
    conv = defaultdict(int)
    seen = set()
    for r in _events(spark):
        seen.add(r["user_id"])
        if r["event_type"] == "purchase" and r["value"] > 180:
            conv[r["user_id"]] = 1
    n = {0: 0, 1: 0}
    c = {0: 0, 1: 0}
    for u in seen:
        n[u % 2] += 1
        c[u % 2] += conv[u]
    out = QUERIES["q232_conversion_ztest"](spark, SF_SMOKE).collect()[0]
    assert (out["n0"], out["n1"]) == (n[0], n[1])
    assert (out["c0"], out["c1"]) == (c[0], c[1])
    assert out["p0"] == _rhu(c[0] / n[0], "0.000001")
    assert out["p1"] == _rhu(c[1] / n[1], "0.000001")
    pooled = (c[0] + c[1]) / (n[0] + n[1])
    if 0 < pooled < 1:
        z = (c[0] / n[0] - c[1] / n[1]) / math.sqrt(
            pooled * (1 - pooled) * (1 / n[0] + 1 / n[1])
        )
        assert abs(out["z"] - z) < 1e-6
        assert out["significant"] == (abs(z) > 1.96)
    else:
        assert out["z"] is None
        assert out["significant"] is False
