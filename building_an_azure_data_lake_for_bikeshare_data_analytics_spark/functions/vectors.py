"""Vector math over embedding columns (``array<float>``) as native Column
expressions — the brute-force kernel for similarity search / semantic dedup
(BASELINE.json north star; the reference has no array columns at all).

Everything folds left-to-right with ``F.aggregate`` so results are
bit-deterministic and reproducible by any engine that sums sequentially —
required for the DuckDB oracle hash-match, and good hygiene at scale.
Values are widened to double before multiply/accumulate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
