"""q235 tokenizer round-trip validation: end-to-end equality against an
independent pure-Python BPE encode/decode over the collected smoke corpus
(the DuckDB oracle replays the same replace chain the implementation
runs, so it could share a bug; the reference implementation here applies
merges over explicit symbol LISTS — a structurally different encoder)."""

import re
from decimal import ROUND_HALF_UP, Decimal

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE

L, R = "⟨", "⟩"


def _rhu(v: float, places: str = "0.000001") -> float:
    return float(Decimal(repr(v)).quantize(Decimal(places), ROUND_HALF_UP))


def _ref_fit(texts, n_merges=8, top_words=1000):
    """Reference BPE fit over symbol LISTS (not delimiter strings)."""
    freq = {}
    for t in texts:
        for w in t.strip().lower().split():
            if re.fullmatch(r"[a-z0-9]+", w):
                freq[w] = freq.get(w, 0) + 1
    head = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:top_words]
    words = [([c for c in w], f) for w, f in head]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), _c = min(
            counts.items(),
            key=lambda kv: (-kv[1], f"{L}{kv[0][0]}{R}{L}{kv[0][1]}{R}"),
        )
        merges.append((a, b))
        out = []
        for syms, f in words:
            i, ns = 0, []
            while i < len(syms):
                # left-to-right non-overlapping, like str.replace
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            out.append((ns, f))
        words = out
    return merges


def _ref_encode(word, merges):
    syms = [c for c in word]
    for a, b in merges:
        i, ns = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                ns.append(a + b)
                i += 2
            else:
                ns.append(syms[i])
                i += 1
        syms = ns
    return syms


def test_q235_matches_pure_python_reference(spark):
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    ]
    sources = [
        (r["source"], r["text"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    ]
    merges = _ref_fit(texts)
    per = {}
    for src, text in sources:
        st = per.setdefault(
            src, {"n": 0, "enc": 0, "rt": 0, "sym": 0, "whole": 0}
        )
        for w in text.strip().lower().split():
            if not w:
                continue
            st["n"] += 1
            if re.fullmatch(r"[a-z0-9]+", w):
                st["enc"] += 1
                syms = _ref_encode(w, merges)
                st["sym"] += len(syms)
                st["whole"] += len(syms) == 1
                st["rt"] += "".join(syms) == w
    got = {
        r["source"]: r
        for r in QUERIES["q235_tokenizer_roundtrip"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(per)
    for src, st in per.items():
        g = got[src]
        assert g["n_words"] == st["n"], src
        assert g["n_encodable"] == st["enc"], src
        assert g["n_fallback"] == st["n"] - st["enc"], src
        assert g["n_roundtrip_ok"] == st["rt"], src
        assert g["bpe_symbols"] == st["sym"], src
        assert g["n_whole_word"] == st["whole"], src
        assert g["fallback_rate"] == _rhu((st["n"] - st["enc"]) / st["n"]), src
        assert g["roundtrip_rate"] == _rhu(st["rt"] / st["enc"]), src
        assert g["bpe_fertility"] == _rhu(st["sym"] / st["enc"]), src
        assert g["whole_word_rate"] == _rhu(st["whole"] / st["enc"]), src


def test_q235_roundtrip_is_lossless_on_this_corpus(spark):
    """The engine's own claim: every encodable word decodes back to
    itself (delimiter characters are outside the alphabet contract, so a
    collision is impossible by construction — this pins it)."""
    for r in QUERIES["q235_tokenizer_roundtrip"](spark, SF_SMOKE).collect():
        assert r["n_roundtrip_ok"] == r["n_encodable"], r["source"]
        assert r["roundtrip_rate"] == 1.0, r["source"]
