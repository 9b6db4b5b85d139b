"""q244 multi-benchmark decontamination sweep (plans/decontamination.py).

Pinned two independent ways (the brute-force-beats-oracle rule): (1) a
pure-Python set-arithmetic reimplementation over the smoke parquet —
shares NOTHING with either engine's shingle/join strategy; (2) the
registered query value-matched against its DuckDB oracle. Plus a plan
pin for the one-scan property the head exists to demonstrate: exactly
ONE Generate over the corpus side regardless of benchmark count.
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
    BENCHMARKS,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
    ORACLES,
    QUERIES,
)

SF_SMOKE = "/root/testdata/sf0.001"
NAME = "q244_multi_benchmark_decontamination"


def _brute_force(path: str) -> list[tuple]:
    """Set arithmetic in plain Python — no SQL, no Spark."""
    docs = pd.read_parquet(path, columns=["doc_id", "source", "text"])

    def shingles(text: str, n: int) -> set:
        # mirror the ENGINE tokenizer contract exactly (r8 advice):
        # space-only trim + regex split that PRESERVES empty tokens
        # (split(trim(text), '\s+') yields '' on leading tab/newline —
        # the edge test_properties.py pins). Python strip()/split()
        # would silently diverge on such docs.
        ts = re.split(r"\s+", text.strip(" "))
        return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}

    src_counts = docs.groupby("source").size().to_dict()
    out = []
    for bname, bsrc, n, te4 in BENCHMARKS:
        bench_set = set()
        for t in docs.loc[docs["source"] == bsrc, "text"]:
            bench_set |= shingles(t, n)
        cont: dict[str, int] = {}
        for _, row in docs[docs["source"] != bsrc].iterrows():
            sh = shingles(row["text"], n)
            m = len(sh & bench_set)
            if m >= 1 and m * 10000 >= te4 * len(sh):
                cont[row["source"]] = cont.get(row["source"], 0) + 1
        for src, n_docs in src_counts.items():
            if src == bsrc:
                continue
            c = cont.get(src, 0)
            out.append((src, bname, c, round(c / n_docs, 6)))
    out.sort(key=lambda r: (r[0], r[1]))
    return out


def test_q244_matches_python_brute_force(spark):
    got = [tuple(r) for r in QUERIES[NAME](spark, SF_SMOKE).collect()]
    want = _brute_force(f"{SF_SMOKE}/documents.parquet")
    assert len(got) == len(want) > 0
    assert got == want


def test_q244_matches_duckdb_oracle(spark):
    got = [tuple(r) for r in QUERIES[NAME](spark, SF_SMOKE).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    orc = [tuple(r) for r in con.execute(ORACLES[NAME]).fetchall()]
    assert got == orc


def test_q244_emits_full_matrix_with_zero_rows(spark):
    """Every (source, benchmark) pair except a benchmark's own source
    must appear — a clean source is a zero ROW, not an absence."""
    rows = QUERIES[NAME](spark, SF_SMOKE).collect()
    sources = {r["source"] for r in rows}
    per_bench = {}
    for r in rows:
        per_bench.setdefault(r["benchmark"], set()).add(r["source"])
    n_sources = len(sources | {b[1] for b in BENCHMARKS})
    for bname, bsrc, _, _ in BENCHMARKS:
        assert bsrc not in per_bench[bname]
        assert len(per_bench[bname]) == n_sources - 1


def test_q244_single_corpus_generate(spark):
    """The one-scan property: the executed plan contains exactly ONE
    Generate fed by the full corpus (big side); the N benchmark sides
    add Generates only over single-source (bounded) inputs, and there
    are exactly len(BENCHMARKS) of those."""
    plan = (
        QUERIES[NAME](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_generates = plan.count("Generate explode")
    # 1 corpus-side (tagged multi-size array) + one per benchmark side
    assert n_generates == 1 + len(BENCHMARKS), plan[:2000]
    # the probe must be a broadcast hash join on (n, sh), never a shuffle
    # of the corpus side against the benchmark union
    assert "BroadcastHashJoin [n#" in plan or "BroadcastHashJoin [n " in plan.replace("#", " ")
