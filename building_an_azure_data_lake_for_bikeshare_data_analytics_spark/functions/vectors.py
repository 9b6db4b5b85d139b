"""Vector math over embedding columns (``array<float>``) as native Column
expressions — the brute-force kernel for similarity search / semantic dedup
(BASELINE.json north star; the reference has no array columns at all).

Everything sums left-to-right starting from 0.0 so results are
bit-deterministic and reproducible by any engine that sums sequentially —
required for the DuckDB oracle hash-match, and good hygiene at scale.
Values are widened to double before multiply/accumulate.

Execution note (r6): the original formulation was a bare
``F.aggregate(F.zip_with(...))`` fold — higher-order functions are
interpreted per element with a lambda frame per step, which made the
cosine-verify stage of the LSH dedup family the slowest thing in the
bench (q100: 13.4 s on 2k vectors). Measured alternatives on 800k
64-dim pairs (hash-identical results all three):

* pure unrolled ``element_at`` chain, codegen'd: **17.7 s** — the
  generated method for a 255-node tree blows the JIT's huge-method
  limit and runs in the bytecode interpreter;
* pure fold: **4.5 s**;
* ``when(size==dim, unrolled).otherwise(fold)``: **2.4 s** — the mixed
  expression drops to Catalyst's interpreted eval, where the unrolled
  branch is 255 cheap eval() nodes with no per-element lambda dispatch.

``dot`` therefore emits the guarded dual path when ``dim`` is given
(default: the 64-dim embedding contract): same float-op sequence
(0.0 + p0 + p1 + ...) in both branches — bit-equality is pinned in
tests/test_functions.py — and arrays of any OTHER length still get the
generic fold via the otherwise-branch, so synthetic small-dim corpora
keep working. ``dim=None`` forces the fold alone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: contract dimension of the ``embeddings.embedding`` column (TESTDATA.md)
EMBEDDING_DIM = 64


def _fold_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot(a: Column, b: Column, dim: int | None = EMBEDDING_DIM) -> Column:
    """Sequential left-to-right dot product in double precision.

    With ``dim`` (default: the embedding contract dimension) emits the
    measured-fast guarded dual path: an unrolled ``element_at`` chain for
    arrays of exactly that length, the generic fold otherwise (see module
    docstring for the timing story). Both branches produce the
    bit-identical double (same op order, same 0.0 seed). ``dim=None``
    forces the fold alone."""
    if dim is None:
        return _fold_dot(a, b)
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), acc
    ).otherwise(_fold_dot(a, b))


def norm(a: Column, dim: int | None = EMBEDDING_DIM) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = EMBEDDING_DIM) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))
