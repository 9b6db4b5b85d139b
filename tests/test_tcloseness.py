"""q237 t-closeness: end-to-end equality against a pure-Python
fraction-exact recomputation on the collected smoke corpus (the brute
force computes TV over float probabilities with Fraction arithmetic —
structurally different from the engine's integer cross-product
identity)."""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def _rhu(v: float, places: str = "0.000001") -> float:
    return float(Decimal(repr(v)).quantize(Decimal(places), ROUND_HALF_UP))


def test_q237_matches_fraction_exact_tv(spark):
    rows = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    groups = Counter()
    per_gv = Counter()
    glob = Counter()
    for r in rows:
        band = math.floor(r["c_acctbal"] / 1000.0)
        qi = (r["c_mktsegment"], band)
        groups[qi] += 1
        per_gv[(qi, r["c_nationkey"])] += 1
        glob[r["c_nationkey"]] += 1
    n = sum(glob.values())
    expected = {}
    for qi, n_g in groups.items():
        tv = Fraction(1, 2) * sum(
            abs(
                Fraction(per_gv.get((qi, v), 0), n_g) - Fraction(cnt_v, n)
            )
            for v, cnt_v in glob.items()
        )
        expected[qi] = tv
    got = {
        (r["c_mktsegment"], r["bal_band"]): r
        for r in QUERIES["q237_t_closeness_audit"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expected)
    for qi, tv in expected.items():
        g = got[qi]
        assert g["k_size"] == groups[qi], qi
        # the engine divides two exact integers once and rounds to 6
        # decimals; the Fraction tv is that exact rational, so the
        # reported value sits within one round-6 ulp of it
        approx = float(tv.numerator) / float(tv.denominator)
        assert abs(g["tv_distance"] - approx) < 1e-6, (
            qi, g["tv_distance"], approx,
        )
        assert g["above_t"] == (tv > Fraction(3, 10)), qi


def test_q237_flags_are_consistent_with_distance(spark):
    for r in QUERIES["q237_t_closeness_audit"](spark, SF_SMOKE).collect():
        assert 0.0 <= r["tv_distance"] <= 1.0
        if r["tv_distance"] > 0.3000005:
            assert r["above_t"]
        if r["tv_distance"] < 0.2999995:
            assert not r["above_t"]
