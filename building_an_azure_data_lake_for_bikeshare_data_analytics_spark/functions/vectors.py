"""Vector math over embedding columns (``array<float>``) as native Column
expressions — the brute-force kernel for similarity search / semantic dedup
(BASELINE.json north star; the reference has no array columns at all).

Everything sums left-to-right starting from 0.0 so results are
bit-deterministic and reproducible by any engine that sums sequentially —
required for the DuckDB oracle hash-match, and good hygiene at scale.
Values are widened to double before multiply/accumulate.

Execution note (r6): the original formulation was an
``F.aggregate(F.zip_with(...))`` fold. Higher-order functions are
INTERPRETED in Spark — every row pays per-element lambda dispatch outside
whole-stage codegen, which made the cosine-verify stage of the LSH dedup
family the slowest thing in the bench (q100: 13.4 s on 2k vectors).
Embeddings here have a fixed contract dimension, so ``dot`` now unrolls to
a chained ``element_at`` product sum — the IDENTICAL float-op sequence
(0.0 + p0 + p1 + ...; zip_with/aggregate compute exactly this), but fully
codegen'd. ``dim=None`` falls back to the fold for variable-length arrays.
Under ANSI mode ``element_at`` throws on a shorter array where the fold
would yield NULL — a louder failure for the same contract violation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: contract dimension of the ``embeddings.embedding`` column (TESTDATA.md)
EMBEDDING_DIM = 64


def dot(a: Column, b: Column, dim: int | None = EMBEDDING_DIM) -> Column:
    """Sequential left-to-right dot product in double precision.

    With ``dim`` (default: the embedding contract dimension) the sum is a
    codegen-able unrolled expression; ``dim=None`` uses the interpreted
    higher-order fold for arrays of unknown length. Both produce the
    bit-identical double (same op order, same 0.0 seed)."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
    return acc


def norm(a: Column, dim: int | None = EMBEDDING_DIM) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = EMBEDDING_DIM) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))
