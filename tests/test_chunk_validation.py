"""q236 chunker round-trip audit: end-to-end equality against a pure
Python chunk/stitch reference over the collected smoke corpus — the
reference chunks with plain list slicing (structurally different from
the engine's posexplode/slice pipeline and from the oracle's unnest)."""

from decimal import ROUND_HALF_UP, Decimal

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.extensions import (
    _CHUNK,
    _STEP,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import QUERIES

from conftest import SF_SMOKE


def _rhu(v: float, places: str = "0.000001") -> float:
    return float(Decimal(repr(v)).quantize(Decimal(places), ROUND_HALF_UP))


def _ref_chunks(text):
    # mirror split(trim(text), '\s+'): an empty/whitespace doc tokenizes
    # to [''] on both engines
    import re

    ts = re.split(r"\s+", text.strip())
    return [ts[s : s + _CHUNK] for s in range(0, len(ts), _STEP)]


def _ref_stitch(chunks):
    out = []
    for i, c in enumerate(chunks):
        out.extend(c[:_STEP] if i < len(chunks) - 1 else c)
    return " ".join(out)


def test_q236_matches_pure_python_reference(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    per = {}
    for r in docs:
        st = per.setdefault(
            r["source"], {"docs": 0, "chunks": 0, "rt": 0, "ct": 0, "dt": 0}
        )
        import re

        ts = re.split(r"\s+", r["text"].strip())
        chunks = _ref_chunks(r["text"])
        st["docs"] += 1
        st["chunks"] += len(chunks)
        st["ct"] += sum(len(c) for c in chunks)
        st["dt"] += len(ts)
        st["rt"] += _ref_stitch(chunks) == " ".join(ts)
    got = {
        r["source"]: r
        for r in QUERIES["q236_chunk_roundtrip"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(per)
    for src, st in per.items():
        g = got[src]
        assert g["n_docs"] == st["docs"], src
        assert g["n_chunks"] == st["chunks"], src
        assert g["n_roundtrip_ok"] == st["rt"], src
        assert g["chunk_tokens"] == st["ct"], src
        assert g["doc_tokens"] == st["dt"], src
        assert g["chunks_per_doc"] == _rhu(st["chunks"] / st["docs"]), src
        assert g["roundtrip_rate"] == _rhu(st["rt"] / st["docs"]), src
        assert g["dup_factor"] == _rhu(st["ct"] / st["dt"]), src


def test_q236_roundtrip_is_lossless_on_this_corpus(spark):
    """The engine's own claim: stitching q66's chunk strings reproduces
    every whitespace-normalized document exactly."""
    for r in QUERIES["q236_chunk_roundtrip"](spark, SF_SMOKE).collect():
        assert r["n_roundtrip_ok"] == r["n_docs"], r["source"]
        assert r["roundtrip_rate"] == 1.0, r["source"]
