"""q258 — the packed-sequence manifest as a MAINTAINED store: the
batch-assembly layer's artifact (where every training sequence falls)
physically written, shard-partitioned, and append-friendly.

q253 computes the packing manifest; a loader needs it STORED — one row
per (shard, seq_id) with the doc count and exact token fill — and a
live corpus keeps growing, so the store must take batches without
repacking the corpus. Per-shard GPT-style packing is naturally
append-friendly because a new batch only extends each shard's token
stream: the manifest is kept as MERGEABLE state (the census posture),
where per (shard, seq_id) both ``n_docs`` and ``fill`` are additive.

Lifecycle:

1. **v1 build** — pack the existing corpus (`packing_manifest`), write
   the rows via ``write_version`` partitioned by ``shard`` — probes for
   one shard's sequences prune to one partition directory.
2. **per-batch append** — read the per-shard packed token offsets from
   the STORE (``sum(fill)`` per shard: |shards| stored rows, zero
   corpus rescan), pack the batch ALONE continuing each shard's cumsum
   from its stored offset (``packing_manifest(base=…)``), and land the
   batch's contribution rows through ``append_version``'s manifest
   commit — O(batch) physical IO. A shard's tail sequence is never
   rewritten: the batch contributes an ADDITIONAL row for that
   (shard, seq_id), summed at read.
3. **read** — ``read_current`` + groupBy (shard, seq_id) summing
   n_docs/fill finalizes the manifest.

Because batch docs FOLLOW existing docs in the per-shard order (arrival
order in a deployment; the monotone doc_id split here), the continued
cumsum reproduces the union's offsets exactly, so
v1-state + batch-contribution == from-scratch pack of the union —
value-for-value, not modulo a tail rewrite. The oracle is therefore
q253's from-scratch packing SQL verbatim, and the chain identity is
pinned in tests/test_packing.py.

Scale shape: the append path shuffles per-doc METADATA only (~9 B/row,
q253's contract), reads |shards| stored rows for the offsets, and
writes O(batch) manifest rows. The one bounded driver collect is the
doc_id split threshold (1 row, max aggregate).

Reference scope note: the reference notebook has no training-assembly
surface (SURVEY.md §2.6) — training-data-pipeline extension set.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .base import _t, query
from .packing import _PACKING_SQL, _SPANS_SQL, packing_manifest, packing_spans


def _finalize(manifest):
    """Merge the store's state rows: per (shard, seq_id), n_docs and
    fill are additive across the v1 snapshot and batch contributions."""
    return (
        manifest.groupBy("shard", "seq_id")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("fill").cast("bigint").alias("fill"),
        )
        .orderBy("shard", "seq_id")
    )


def packed_store_lifecycle(spark, store: str, corpus, batch):
    """v1 build + one batch append against ``store`` (shard-partitioned,
    versioned). ``corpus`` and ``batch`` are (doc_id, text) relations
    where every batch doc_id exceeds every corpus doc_id per shard.
    Shared by the gated head, tests, and tools/stress_packed_store.py."""
    from ..sources.versioned import append_version, read_current, write_version

    write_version(packing_manifest(corpus), store, partition_by=["shard"])
    base = (
        read_current(spark, store)
        .groupBy("shard")
        .agg(F.sum("fill").alias("base_toks"))
    )
    contrib = packing_manifest(batch, base=base)
    append_version(contrib, store, partition_by=["shard"])
    return read_current(spark, store)


@query(
    "q258_packed_store_maintenance",
    _PACKING_SQL,
    tags=("training", "packing", "incremental", "versioned"),
)
def q258(spark, sf):
    """Packed-sequence manifest finalized from the MAINTAINED store after
    the v1-build + batch-append lifecycle (batch = the top doc_id
    quintile, the monotone-arrival split). Columns: shard, seq_id,
    n_docs, fill. The oracle is q253's from-scratch packing SQL over the
    full corpus: a green row certifies the continued-cumsum append
    reproduces the scratch pack value-for-value. Like the other
    maintenance heads, plan construction is eager — the store is the
    subject."""
    from ..sources.versioned import register_cleanup, vacuum

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    # monotone split: batch docs follow corpus docs in every shard's
    # doc_id order (arrival order in a deployment). Bounded collect: 1 row.
    thr = docs.agg((F.max("doc_id") * 4).cast("bigint")).first()[0] // 5
    store = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_packed_{spark.sparkContext.applicationId}",
    )
    register_cleanup(store)
    cur = packed_store_lifecycle(
        spark,
        store,
        docs.where(F.col("doc_id") < thr),
        docs.where(F.col("doc_id") >= thr),
    )
    vacuum(store, keep=2)
    return _finalize(cur)


def span_store_lifecycle(spark, store: str, corpus, batch):
    """q260's v1 build + one batch append: the loader-facing span table
    (shard, seq_id, doc_id, seq_off, doc_off, n_span), shard-partitioned.
    Span rows are per-doc facts, so the batch's rows (offsets continued
    from the stored per-shard totals: sum(n_span) == packed tokens per
    shard) are purely additive — no row is ever rewritten, not even the
    boundary sequence's."""
    from ..sources.versioned import append_version, read_current, write_version

    write_version(packing_spans(corpus), store, partition_by=["shard"])
    base = (
        read_current(spark, store)
        .groupBy("shard")
        .agg(F.sum("n_span").alias("base_toks"))
    )
    append_version(packing_spans(batch, base=base), store, partition_by=["shard"])
    return read_current(spark, store)


@query(
    "q260_packed_spans_store",
    _SPANS_SQL,
    tags=("training", "packing", "incremental", "versioned"),
)
def q260(spark, sf):
    """The packed-sequence SPAN table from the maintained store after the
    v1-build + batch-append lifecycle — the relation a data loader
    actually reads to materialize sequence (shard, seq_id): which doc,
    which token slice, in what order. Columns: shard, seq_id, doc_id,
    seq_off, doc_off, n_span. Oracle: the from-scratch span SQL over the
    full corpus — a green row certifies every stored slice boundary
    value-for-value through the append. Same monotone doc_id split and
    eager store construction as q258."""
    from ..sources.versioned import register_cleanup, vacuum

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    thr = docs.agg((F.max("doc_id") * 4).cast("bigint")).first()[0] // 5
    store = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_spans_{spark.sparkContext.applicationId}",
    )
    register_cleanup(store)
    cur = span_store_lifecycle(
        spark,
        store,
        docs.where(F.col("doc_id") < thr),
        docs.where(F.col("doc_id") >= thr),
    )
    vacuum(store, keep=2)
    return cur.orderBy("shard", "seq_id", "doc_id")
