"""Structured Streaming pipelines over the events stream.

The reference has zero streaming (SURVEY.md §2.6: no watermarks, windows, or
stateful ops); this module is the engine's streaming extension surface,
mirroring the batch analytics shapes (windowed aggregates over event time)
plus a custom stateful operator via ``applyInPandasWithState``.

Scale notes:
* event-time windows + watermark bound state: without the watermark the
  window state grows forever at 100 TB/day ingest;
* the stateful session operator keys state by user_id — state is
  hash-partitioned across executors, no driver state;
* file source used in tests; swap ``readStream.format(...)`` for kafka in
  production — the transformations are source-agnostic.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: schema of the events stream (matches testdata events.parquet, with ts
#: already converted to a microsecond timestamp)
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events (schema-on-read; one file per microbatch
    in tests via maxFilesPerTrigger)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_type_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling-window counts + value sums per event_type.

    Watermark bounds state and admits late data up to ``watermark``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)
SESSION_STATE = StructType(
    [StructField("n_events", LongType()), StructField("value_sum", DoubleType())]
)


def _accumulate_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user totals across microbatches (custom stateful op)."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_sum": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running (count, sum)
    via applyInPandasWithState — the engine's template for operators the
    built-in windowed aggs can't express."""
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate_user,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def deduped_event_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming deduplication by event_id within the watermark horizon —
    turns an at-least-once source (kafka redelivery, file re-uploads) into
    effectively-once rows for everything downstream.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key seen
    inside the watermark window and evicts it as event time advances —
    bounded state, unlike plain ``dropDuplicates`` on a stream, whose key
    state grows forever at 100 TB/day ingest."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(df: DataFrame, name: str, output_mode: str) -> None:
    """Test helper: drain a stream into an in-memory table synchronously."""
    q = df.writeStream.format("memory").queryName(name).outputMode(output_mode).start()
    q.processAllAvailable()
    q.stop()


def enriched_event_stream(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a (batch) user
    dimension — the streaming twin of the batch star join. The static side
    is re-read per micro-batch (picking up dim updates) and broadcast; no
    stream-side state is kept, so this scales to any stream rate."""
    from pyspark.sql import functions as F

    return events.join(F.broadcast(user_dim), events.user_id == user_dim.c_custkey, "left").select(
        "event_id", "ts", "user_id", "event_type", "value",
        F.col("c_mktsegment").alias("segment"),
    )


def sessionized_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time sessionization via ``session_window`` — dynamic windows
    that extend while events keep arriving within ``gap`` and close after a
    quiet period (the streaming twin of the batch q48 sessionize, which
    derives sessions from lag() gaps).

    Unlike tumbling windows, session windows MERGE as late events bridge
    two open sessions; Spark keeps per-key open-session state and the
    watermark both bounds that state and decides when a session is final
    (append mode emits only closed sessions). Works identically on a batch
    DataFrame (no watermark needed), which is what the parity test uses."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "value_sum",
        )
    )


def incremental_merge_stream(
    events: DataFrame,
    store_path: str,
    key: str = "event_id",
    seq_col: str = "ts",
    checkpoint_dir: str | None = None,
) -> int:
    """Stream -> versioned-store bridge: MERGE each micro-batch into the
    table via ``foreachBatch`` (the standard incremental-ingestion sink —
    exactly how production Delta streaming MERGEs work; here it lands on
    whichever backend ``sources.versioned`` resolves).

    Each batch is deduplicated last-write-wins on ``(key, seq_col)`` before
    the MERGE (a micro-batch can legally contain multiple updates for one
    key; MERGE requires key-unique sources). ``availableNow`` trigger:
    drain everything currently available, then stop — the incremental batch
    job shape. Returns the number of micro-batches processed.

    Scale notes: state here is Spark's file-source log (which files were
    ingested), not row state — unbounded corpus, bounded checkpoint; the
    MERGE's anti-join broadcasts only the batch's keys against the store.
    """
    from ..sources import versioned as V

    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql.window import Window

        if not batch_df.take(1):
            return
        w = Window.partitionBy(key).orderBy(F.desc(seq_col), F.desc(key))
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if V.current_version(store_path) is None:
            V.write_version(latest, store_path)
        else:
            V.merge_upsert(latest.sparkSession, store_path, latest, key=key)
        n_batches["n"] += 1

    writer = events.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return n_batches["n"]


def attributed_purchases_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Stream-stream interval join: each purchase joins the SAME user's
    click events from the preceding ``gap`` window — the attribution shape
    (which click led to this purchase). Both sides are views of one events
    stream (stream self-join).

    State stays bounded because the range condition + watermarks tell
    Spark exactly what to keep: a buffered click is evictable once the
    watermark passes click_ts + gap (no future purchase can reach back to
    it), so state size ~ one gap's worth of clicks per partition, not the
    stream's history. Without the time bound an inner stream-stream join
    buffers both sides forever — the 100 TB/day failure mode.

    Inner join in append mode: matches emit in the microbatch where both
    sides have arrived; results equal the batch join over the same data
    (parity-tested)."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            "value",
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {gap}"))
        & (F.col("click_ts") < F.col("purchase_ts")),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts", "value")


def value_histogram(events: DataFrame, width: float = 25.0) -> DataFrame:
    """Batch reference histogram for the drift monitor: per (event_type,
    bucket) counts with q85's fixed-width buckets."""
    return (
        events.select(
            "event_type",
            (F.floor(F.col("value") / width) * int(width)).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt_ref"))
    )


def drift_monitor_stream(
    events: DataFrame,
    reference_hist: DataFrame,
    width: float = 25.0,
    checkpoint_dir: str | None = None,
) -> list[tuple]:
    """Streaming distribution-drift monitor: each micro-batch's value
    histogram is compared to a static reference histogram (built by
    ``value_histogram`` over the trusted corpus) and scored per event type
    with the same total-variation math as q122 — the alert signal a
    production ingest pipeline watches to catch a source going off-mix
    *while it streams in*, not at the end of the day.

    foreachBatch + availableNow (the incremental monitoring job shape, like
    incremental_merge_stream): aggregations-over-aggregations aren't
    expressible in one streaming query, but per-batch they're just batch
    plans. Returns (epoch_id, event_type, n_batch_events, tv_drift) rows.

    Scale notes: the reference histogram is (type, bucket) — a few hundred
    rows regardless of corpus size, broadcast into each batch plan; batch
    state is the file-source log only. TV terms ride the exact-count
    DECIMAL(18,12) path, so a drift score is bit-identical whatever the
    micro-batch partitioning."""
    from pyspark.sql.types import DecimalType

    out: list[tuple] = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        cur = (
            batch_df.select(
                "event_type",
                (F.floor(F.col("value") / width) * int(width)).alias("bucket"),
            )
            .groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt_cur"))
        )
        u = reference_hist.select(
            "event_type", "bucket", "cnt_ref", F.lit(0).cast("long").alias("cnt_cur")
        ).unionByName(
            cur.select(
                "event_type",
                "bucket",
                F.lit(0).cast("long").alias("cnt_ref"),
                "cnt_cur",
            )
        )
        c = u.groupBy("event_type", "bucket").agg(
            F.sum("cnt_ref").alias("cnt_ref"), F.sum("cnt_cur").alias("cnt_cur")
        )
        t = c.groupBy("event_type").agg(
            F.sum("cnt_ref").cast("bigint").alias("tot_ref"),
            F.sum("cnt_cur").cast("bigint").alias("tot_cur"),
        )
        d = F.abs(
            F.col("cnt_ref") / F.col("tot_ref") - F.col("cnt_cur") / F.col("tot_cur")
        ).cast(DecimalType(18, 12))
        rows = (
            c.join(F.broadcast(t), "event_type")
            .where((F.col("tot_ref") > 0) & (F.col("tot_cur") > 0))
            .select("event_type", "tot_ref", "tot_cur", d.alias("d"))
            .groupBy("event_type", "tot_ref", "tot_cur")
            .agg(F.round((0.5 * F.sum("d")).cast("double"), 6).alias("tv_drift"))
            .collect()
        )
        out.extend(
            (epoch_id, r["event_type"], r["tot_cur"], r["tv_drift"]) for r in rows
        )

    writer = events.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def lm_scored_docs_stream(
    docs: DataFrame,
    bg: DataFrame,
    ug: DataFrame,
    v: DataFrame,
    min_avg_logp: float | None = None,
    checkpoint_dir: str | None = None,
) -> list[tuple]:
    """Streaming ingestion quality gate: score each micro-batch of incoming
    documents against the STATIC corpus-trained bigram LM (operators/lm —
    the counts persist once; every crawl batch scores against them) and
    optionally gate on a minimum mean log-probability — the shape of a
    production crawl pipeline that rejects garbled/boilerplate docs while
    they stream in, not at the end of the day.

    foreachBatch + availableNow (the incremental ingestion-job shape, like
    drift_monitor_stream): per-doc aggregation over an exploded pair
    relation is a plain batch plan per micro-batch. Unseen bigrams/
    unigrams take the add-one defaults (lm_score_pairs_smoothed), so novel
    crawl content still scores every pair — and EVERY doc of every batch
    gets an output row: docs too short to form a pair (empty/one-token
    crawl records, exactly what a gate exists to reject) come back with
    n_pairs=0, avg_logp NULL, kept=False. Returns (epoch_id, doc_id,
    n_pairs, avg_logp[, kept]) rows.

    Determinism: a doc's score depends only on its text and the static
    counts, so the union of all micro-batch outputs EQUALS the batch
    scoring of the same docs regardless of how the stream was chunked —
    the parity test's exact-equality contract. State is the file-source
    log only; the count tables are vocab-bounded joins in each batch plan.
    """
    from ..operators.lm import lm_pairs, lm_score_pairs_smoothed

    out: list[tuple] = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        scored = batch_df.select("doc_id").join(
            lm_score_pairs_smoothed(lm_pairs(batch_df), bg, ug, v), "doc_id", "left"
        ).select(
            "doc_id",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            "avg_logp",
        )
        if min_avg_logp is not None:
            scored = scored.withColumn(
                "kept", F.coalesce(F.col("avg_logp") >= min_avg_logp, F.lit(False))
            )
        for r in scored.collect():
            row = (epoch_id, r["doc_id"], r["n_pairs"], r["avg_logp"])
            out.append(row + ((r["kept"],) if min_avg_logp is not None else ()))

    writer = docs.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def semantic_dedup_stream(
    emb_stream: DataFrame,
    centroids: list[list[int]],
    index: DataFrame,
    threshold: float = 0.45,
    checkpoint_dir: str | None = None,
) -> list[tuple]:
    """Streaming SemDeDup ingestion gate: each micro-batch of incoming
    embeddings is cell-assigned (the q147 int64 kernel) and compared only
    against the STATIC cleaned-corpus cell index
    (operators/similarity.build_cell_index — persisted once per corpus
    refresh, like the LM gate's count tables); a vector is rejected iff a
    same-cell corpus vector scores round(cos,4) >= threshold.

    Same contract as lm_scored_docs_stream: batch members are never
    compared to each other, so a vector's verdict depends only on itself
    and the static index — the union of all micro-batch outputs EQUALS
    the batch scoring of the same vectors regardless of chunking (the
    parity test's exact-equality contract). Kept vectors join the index
    at the NEXT corpus refresh (the q103/q139 append-only incremental
    posture), not mid-stream — deliberate: mid-stream index growth would
    make verdicts chunking-dependent.

    Returns (epoch_id, vec_id, cell, n_candidates, max_cos, kept) rows.
    """
    from ..operators.similarity import semantic_dedup_against_index

    out: list[tuple] = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        for r in semantic_dedup_against_index(
            batch_df, centroids, index, threshold
        ).collect():
            out.append(
                (epoch_id, r["vec_id"], r["cell"], r["n_candidates"], r["max_cos"], r["kept"])
            )

    writer = emb_stream.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def scd2_history_stream(
    events: DataFrame,
    store_path: str,
    checkpoint_dir: str | None = None,
) -> int:
    """Incremental SCD Type-2 maintenance — the streaming counterpart of
    q150 (plans/lakehouse.scd2_versions): each micro-batch updates the
    versioned-history table for ONLY the entities present in the batch.

    Per batch (foreachBatch, availableNow trigger):

    1. append the batch's raw change events to a raw log under the store
       (partition-append, no rewrite);
    2. recompute ``scd2_versions`` for the batch's affected user_ids from
       the accumulated raw log, filtered by a pushed-down ``user_id IN``
       predicate (event_id-deduped, so source redelivery is harmless);
    3. write versions = (previous versions minus affected users) UNION
       (recomputed affected histories) as a new snapshot version of the
       store (time travel of the dimension's own history for free).

    Recompute-from-log makes the operator insensitive to event-time order
    ACROSS batches — a late row for user u simply triggers a fresh rebuild
    of u's (small) history, where a merge-the-interval-edits approach
    would need delicate boundary surgery. Cost per batch ∝ affected
    entities' history sizes, not the corpus: the raw-log read prunes on
    user_id, the SCD2 window shuffles only affected rows, and the
    untouched-users relation is a pass-through scan. Parity with the
    batch build over the full log is asserted in tests/test_streaming.py
    (including an out-of-order delivery case).

    Returns the number of non-empty micro-batches processed.
    """
    from ..plans.lakehouse import scd2_versions
    from ..sources import versioned as V

    raw_dir = os.path.join(store_path, "_raw_log")
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.select("user_id", "event_type", "ts", "event_id")
        if not batch.take(1):
            return
        spark = batch.sparkSession
        batch.write.mode("append").parquet(raw_dir)
        ids = batch.select("user_id").distinct()
        # bounded-collect hybrid: literal IN-list when the batch touches few
        # entities (predicate pushes into the raw-log parquet scan — row
        # groups of untouched users are skipped), distributed semi/anti
        # joins beyond that (no pushdown, but no driver state either)
        affected = [r["user_id"] for r in ids.limit(10_001).collect()]
        raw_all = spark.read.parquet(raw_dir)
        prev = (
            V.read_current(spark, store_path)
            if V.current_version(store_path) is not None
            else None
        )
        if len(affected) <= 10_000:
            raw = raw_all.where(F.col("user_id").isin(affected))
            kept = prev.where(~F.col("user_id").isin(affected)) if prev is not None else None
        else:
            raw = raw_all.join(F.broadcast(ids), "user_id", "left_semi")
            kept = prev.join(F.broadcast(ids), "user_id", "left_anti") if prev is not None else None
        rebuilt = scd2_versions(raw.dropDuplicates(["event_id"]))
        V.write_version(rebuilt if kept is None else kept.unionByName(rebuilt), store_path)
        n_batches["n"] += 1

    writer = events.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return n_batches["n"]


def hll_register_stream(
    events: DataFrame,
    p: int = 8,
    checkpoint_dir: str | None = None,
) -> tuple[list[tuple], dict]:
    """Streaming HyperLogLog maintenance: each micro-batch's registers
    (the q169 sketch — md5-derived bucket + max leading-zero rank) are
    merged into a running register table by MAX, and the per-type distinct
    estimate is re-issued after every batch — the "live distinct users"
    counter a production ingest keeps, maintained incrementally because
    register-max merge is associative, commutative and idempotent (late or
    REPLAYED data cannot corrupt it, unlike a count).

    foreachBatch + availableNow like drift_monitor_stream. The merged
    state is bounded at |event_type| * 2^p rows — tiny per-type scalars by
    construction, kept driver-side exactly like the suite's other
    streaming monitors; the per-batch distributed work is one register
    hash-agg over the batch. Returns (per-epoch estimate rows, final
    register dict {(event_type, bucket): m_j}); the union-equals-batch
    parity (final registers == q169's registers over the whole corpus) is
    pinned in tests/test_streaming.py.

    CAVEAT (shared with the suite's other driver-side monitors): the merged
    register dict lives in driver memory only. If ``checkpoint_dir`` is set
    and the stream RESTARTS, Spark skips already-committed batches while
    this dict starts empty, so a restarted run under-counts — the replay
    safety above holds only within a single run. A restart-safe deployment
    must rebuild ``state`` from a persisted register table (e.g. the q169
    batch registers over the already-ingested prefix) before starting."""
    from ..plans.profiling import _hll_params

    c = _hll_params(p)
    state: dict[tuple[str, int], int] = {}
    out: list[tuple] = []

    def _estimates(epoch_id: int) -> None:
        by_type: dict[str, dict[int, int]] = {}
        for (et, bucket), m_j in state.items():
            by_type.setdefault(et, {})[bucket] = m_j
        for et in sorted(by_type):
            regs = by_type[et]
            s = sum(1 << (c["rho_max"] - m) for m in regs.values())
            s += (c["m"] - len(regs)) * c["pow0"]
            e_raw = c["num"] / float(s)
            v = c["m"] - len(regs)
            if v > 0 and e_raw <= c["lc_cut"]:
                import math

                est = c["m"] * math.log(c["m"] / float(v))
            else:
                est = e_raw
            out.append((epoch_id, et, len(regs), s, round(est, 4)))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        from ..functions.hashing import h60

        # exact integer division for rem (the q169 fix): the double
        # round-trip loses precision for h >= 2^53
        b = batch_df.select("event_type", h60("user_id").alias("h")).selectExpr(
            "event_type",
            f"h % {c['m']} AS bucket",
            f"h div {c['m']} AS rem",
        )
        rho = F.when(F.col("rem") == 0, F.lit(c["rho_max"])).otherwise(
            F.lit(c["rho_max"]) - F.length(F.bin(F.col("rem")))
        )
        reg = (
            b.groupBy("event_type", "bucket")
            .agg(F.max(rho).alias("m_j"))
            .collect()  # bounded: <= |event_type| * 2^p rows
        )
        for r in reg:
            key = (r["event_type"], r["bucket"])
            if r["m_j"] > state.get(key, 0):
                state[key] = r["m_j"]
        _estimates(epoch_id)

    writer = events.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out, state


def tokenizer_validated_docs_stream(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    checkpoint_dir: str | None = None,
) -> list[tuple]:
    """Streaming tokenizer-validation gate: every micro-batch of incoming
    documents is round-trip-checked against the STATIC learned BPE merge
    table (operators/bpe.roundtrip_flags — the SAME Columns the q235
    batch audit aggregates, so the two surfaces cannot drift). The shape
    of a production crawl intake that refuses to enqueue documents whose
    tokens do not survive encode -> decode or that are priced in
    byte-fallback symbols — caught per batch, not in a day-end audit.

    foreachBatch + availableNow (the incremental ingestion-job shape).
    Emits one row per document that produced at least one non-empty
    token: (epoch_id, doc_id, source, n_words, n_encodable,
    n_roundtrip_ok, bpe_symbols). A document's row depends only on its
    own text and the static merges, so the union of all micro-batch
    outputs EQUALS the batch per-doc relation regardless of chunking —
    the parity test's exact-equality contract — and summing the rows by
    source reproduces q235's count columns.
    """
    from ..functions.text import tokens
    from ..operators.bpe import roundtrip_flags

    out: list[tuple] = []

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # no empty-batch take(1) guard: an empty batch's groupBy/collect
        # already yields zero rows, and the probe was a redundant full
        # extra Spark job per micro-batch (r6 advice)
        words = batch_df.select(
            "doc_id",
            "source",
            F.explode(tokens(F.lower(F.col("text")))).alias("word"),
        ).where(F.col("word") != "")
        enc_flag, rt_ok, n_sym = roundtrip_flags(F.col("word"), merges)
        agg = (
            words.select(
                "doc_id",
                "source",
                enc_flag.alias("enc_flag"),
                rt_ok.alias("rt_ok"),
                n_sym.alias("n_sym"),
            )
            .groupBy("doc_id", "source")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("enc_flag").alias("n_encodable"),
                F.sum("rt_ok").alias("n_roundtrip_ok"),
                F.sum("n_sym").alias("bpe_symbols"),
            )
        )
        for r in agg.collect():
            out.append(
                (
                    epoch_id,
                    r["doc_id"],
                    r["source"],
                    r["n_words"],
                    r["n_encodable"],
                    r["n_roundtrip_ok"],
                    r["bpe_symbols"],
                )
            )

    writer = docs.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def _signature_batch_rows(batch_df: DataFrame) -> DataFrame:
    """One micro-batch's banded signature rows (tokenize/shingle/band the
    batch ALONE — the per-batch index work of the q245 lifecycle)."""
    from ..functions.text import tokens as _tokens
    from ..operators.dedup import banded_signature_table, shingle_sets

    return banded_signature_table(
        shingles=shingle_sets(
            batch_df.select("doc_id", _tokens("text").alias("ts")), 3
        )
    )


def commit_store_batch(
    rows: DataFrame, store: str, epoch_id: int, dedupe_epochs: bool,
    partition_by: list[str] | None = None,
    compact_max_parts: int | None = None,
    compact_max_files: int | None = None,
    allow_new_columns: bool = False,
) -> int | None:
    """Commit one micro-batch's derived rows to a versioned store:
    write_version bootstraps, append_version lands every later batch
    (manifest commit, O(batch) IO). Returns the committed version, or
    None for an empty batch.

    Exactly-once (``dedupe_epochs=True``, i.e. the stream runs with a
    checkpoint): a micro-batch replayed after a mid-epoch failure
    re-arrives with the SAME epoch_id; the store's ``_EPOCHS`` ledger is
    consulted and the duplicate append is skipped, returning the version
    the original commit produced (r9 advice — without this, a replay
    would double-append the batch's rows and break drain equality).
    Shared by every maintained-store stream (signature, lexical tf/dl,
    census).

    ``compact_max_parts`` / ``compact_max_files`` opt in to the
    compaction cadence policy (``versioned.maybe_compact``): after the
    epoch is recorded, the store compacts whenever its manifest depth or
    physical file count crossed the bound, so a long-lived stream's read
    amplification sawtooths under a constant ceiling instead of growing
    one delta part per micro-batch. Off by default — the gated heads
    keep deterministic store layouts.

    ``allow_new_columns`` opts the append into schema evolution (the
    q259 posture, forwarded to ``append_version``): a stream whose
    row-builder starts emitting a new statistic mid-deployment lands it
    as an O(batch) evolved append — older rows read back null-filled —
    instead of failing loudly or forcing a corpus rewrite. Removals stay
    loud regardless."""
    from ..sources.versioned import (
        append_version,
        applied_epochs,
        current_version,
        maybe_compact,
        record_epoch,
        write_version,
    )

    if not rows.take(1):
        return None
    if dedupe_epochs:
        seen = applied_epochs(store)
        if int(epoch_id) in seen:  # replayed epoch: already committed
            return seen[int(epoch_id)]
    if current_version(store) is None:
        v = write_version(rows, store, partition_by=partition_by)
    else:
        v = append_version(
            rows, store, partition_by=partition_by,
            allow_new_columns=allow_new_columns,
        )
    if dedupe_epochs:
        record_epoch(store, int(epoch_id), v)
    if compact_max_parts is not None or compact_max_files is not None:
        # compaction is physical-only: the recorded epoch->version mapping
        # stays valid for replay skipping (replays compare epoch_id, and
        # rows are never re-appended after a compact)
        maybe_compact(
            rows.sparkSession,
            store,
            max_parts=compact_max_parts,
            max_files=compact_max_files,
            partition_by=partition_by,
        )
    return v


def maintained_signature_store_stream(
    docs: DataFrame,
    store: str,
    checkpoint_dir: str | None = None,
) -> list[tuple]:
    """Streaming index maintenance: each micro-batch of incoming docs is
    tokenized/shingled/banded ALONE and committed to the versioned
    signature store — q245's maintenance lifecycle in its production
    Structured Streaming shape. The first batch creates v1 with
    ``write_version``; every later batch lands through
    ``append_version``'s manifest commit, so per-micro-batch physical IO
    is O(batch) (the store-append lever, SCALE_NOTES r9) and the store
    is probe-ready between batches.

    foreachBatch + availableNow (the incremental ingestion-job shape,
    like lm_scored_docs_stream). Returns (epoch_id, committed_version)
    per non-empty micro-batch.

    Determinism: a doc's banded signature rows depend only on its text
    and the fixed hash family, so after the stream drains the store's
    CURRENT version equals the from-scratch banded table over all
    streamed docs REGARDLESS of how the stream was chunked — the parity
    test's exact-equality contract (tests/test_streaming.py).

    Exactly-once: with a checkpoint, a micro-batch replayed after a
    mid-epoch failure re-arrives with the SAME epoch_id; the sink
    records each committed epoch_id in the store's ``_EPOCHS`` ledger
    and skips duplicates, so the replay cannot double-append the batch's
    signature rows (r9 advice). Without a checkpoint there is no replay
    (and epoch_ids of unrelated runs may collide), so the ledger is not
    consulted."""
    out: list[tuple] = []
    dedupe_epochs = checkpoint_dir is not None

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        committed = commit_store_batch(
            _signature_batch_rows(batch_df), store, epoch_id, dedupe_epochs,
            partition_by=["band"],
        )
        if committed is not None:
            out.append((epoch_id, committed))

    writer = docs.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def screened_ingest_stream(
    docs: DataFrame,
    bench_store: str,
    ledger_store: str,
    checkpoint_dir: str | None = None,
    hit_stats: bool = False,
) -> list[tuple]:
    """Streaming decontamination screening: each micro-batch of incoming
    (doc_id, source, text) docs is shingled ALONE (q244's one-Generate
    tagged explode, over the batch only) and probed against the STORED
    benchmark shingle table — q249's maintained artifact — with the
    per-doc hits appended to a versioned contamination LEDGER,
    hive-partitioned by benchmark. This is the ingest-side half of the
    q249 lifecycle in its production Structured Streaming shape: the
    benchmark index is maintained by the (rare) registration path; the
    (constant) ingest stream only reads it.

    Returns (epoch_id, committed_version) per micro-batch that produced
    hits (a clean batch appends nothing and commits no version).

    Drain equality: a doc's hits depend only on its own shingles and the
    stored benchmark table, so after the stream drains the ledger's
    current version equals ``doc_hits`` over all streamed docs regardless
    of chunking (tests/test_streaming.py). Exactly-once under
    checkpointed replay via the ledger's ``_EPOCHS`` ledger
    (commit_store_batch).

    ``hit_stats``: record per-hit evidence strength (``n_hits``/
    ``n_shingles``, see ``doc_hits``) — a deployment that flips this on
    a LIVE ledger lands the new columns as EVOLVED appends
    (``allow_new_columns`` plumbed through commit_store_batch, the q259
    posture); pre-evolution ledger rows read back null-filled."""
    from ..functions.text import tokens as _tokens
    from ..plans.decontamination import corpus_shingles, doc_hits
    from ..sources.versioned import read_current

    out: list[tuple] = []
    dedupe_epochs = checkpoint_dir is not None

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        bench = read_current(batch_df.sparkSession, bench_store)
        hits = doc_hits(
            corpus_shingles(
                batch_df.select("doc_id", "source", _tokens("text").alias("ts"))
            ),
            bench,
            with_hit_stats=hit_stats,
        )
        v = commit_store_batch(
            hits,
            ledger_store,
            epoch_id,
            dedupe_epochs,
            partition_by=["benchmark"],
            allow_new_columns=hit_stats,
        )
        if v is not None:
            out.append((epoch_id, v))

    writer = docs.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def maintained_ivf_store_stream(
    vecs: DataFrame,
    store: str,
    cent_store: str,
    checkpoint_dir: str | None = None,
    refresh_factor: float | None = None,
    refresh_k: int = 8,
    compact_max_parts: int | None = None,
    compact_max_files: int | None = None,
) -> list[tuple]:
    """Streaming vector-index maintenance: each micro-batch of
    (vec_id, embedding) rows is assigned to IVF cells through the STORED
    centroids and appended to the q246 cell-assignment store — the
    maintained ANN index in its production Structured Streaming shape.
    The quantizer is trained OFFLINE at build time (q246's faiss
    posture) and lives in its own store; the stream re-reads it per
    micro-batch (bounded collect: exactly k centroid rows) so a batch
    quantizer refresh is picked up without restarting the stream.

    Returns (epoch_id, committed_version) per non-empty micro-batch.

    Drain equality: cell assignment is per-row deterministic against the
    fixed centroids, so after the stream drains the store's current
    version equals ``assign_cells`` over all streamed vectors regardless
    of chunking (tests/test_streaming.py); the stale-quantizer aging of
    this exact shape is measured in tools/stress_index_aging.py
    (SCALE_NOTES r10, occupancy-skew refresh trigger). Exactly-once
    under checkpointed replay via the store's ``_EPOCHS`` ledger.

    ``refresh_factor`` opts in to the r11 aging policy
    (``ann_maintenance.maybe_refresh``): after each commit the store's
    occupancy skew is compared against its recorded baseline (one k-row
    agg), and when drift has inflated it past the factor, the quantizer
    retrains from the stored vectors and BOTH stores rotate — the next
    micro-batch assigns through the refreshed centroids, exactly the
    "picked up without restarting the stream" path above. Off by
    default (deterministic drain-equality contract)."""
    from ..operators.similarity import assign_cells
    from ..plans.ann_maintenance import (
        index_health,
        maybe_refresh,
        record_health,
        stored_health,
    )
    from ..sources.versioned import read_current

    out: list[tuple] = []
    dedupe_epochs = checkpoint_dir is not None

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        cents = [
            [int(x) for x in r["centroid"]]
            for r in read_current(batch_df.sparkSession, cent_store)
            .orderBy("cell")
            .collect()
        ]
        v = commit_store_batch(
            assign_cells(batch_df.select("vec_id", "embedding"), cents),
            store,
            epoch_id,
            dedupe_epochs,
            partition_by=["cell"],
            compact_max_parts=compact_max_parts,
            compact_max_files=compact_max_files,
        )
        if v is not None:
            out.append((epoch_id, v))
        if refresh_factor is not None and v is not None:
            spark = batch_df.sparkSession
            if stored_health(store) is None:  # baseline on first commit
                record_health(store, index_health(spark, store))
            else:
                maybe_refresh(
                    spark, store, k=refresh_k, factor=refresh_factor,
                    cent_store=cent_store,
                )

    writer = vecs.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def composed_ingest_stream(
    docs: DataFrame,
    store_root: str,
    bench_store: str,
    checkpoint_dir: str | None = None,
    compact_max_parts: int | None = None,
    compact_max_files: int | None = None,
    dl_with_uniq: bool = False,
) -> list[tuple]:
    """The q252 composed shared-scan ingest in its production Structured
    Streaming shape: ONE stream of (doc_id, source, text, n_chars) docs
    maintains EVERY text-side artifact — each micro-batch is tokenized
    ONCE and shingled ONCE (the multi-size tagged relation, whose n=3
    slice feeds the signature append while the full relation feeds the
    decontamination screen), and the derived rows commit to:

    * ``<root>_sig``    — banded signature store (q245), band-partitioned
    * ``<root>_tf/_dl`` — lexical index stores (q248), bucket/century-part.
    * ``<root>_stats/_kmv`` — census merge state (q250)
    * ``<root>_ledger`` — per-doc contamination hits screened against the
      STORED q249 benchmark table (read-only input), benchmark-part.
    * ``<root>_packed`` — packed-sequence manifest (q258), shard-part.,
      committed through the derived path (expected_base CAS + monotone
      guard) since its rows continue the stored per-shard offsets.
    * ``<root>_spans`` — loader-facing span table (q260), shard-part.,
      same derived commit — the stream maintains everything a training
      loader reads, down to the exact token slices.

    The vector-side artifact keeps its own stream
    (maintained_ivf_store_stream) because its source is the embeddings
    stream, not the document stream.

    Returns (epoch_id, v_sig, v_tf, v_dl, v_stats, v_kmv, v_ledger,
    v_packed, v_spans) per non-empty micro-batch (None where that store
    had nothing to commit, e.g. a clean batch appends no ledger rows).

    Drain equality per store vs its batch builder is pinned in
    tests/test_streaming.py — the per-doc/mergeable-state arguments of
    the five standalone streams compose unchanged. Exactly-once under
    checkpointed replay: every store consults its own ``_EPOCHS`` ledger,
    so a replayed micro-batch that died mid-fan-out re-commits ONLY the
    stores that missed it (per-store idempotence makes the multi-store
    fan-out restartable without coordination).

    ``compact_max_parts`` / ``compact_max_files`` opt every APPEND-chain
    store (sig, tf, dl, ledger, packed) into the compaction cadence —
    the everything-on deployment shape tools/stress_deploy_soak.py
    exercises; the census merge stores rewrite O(state) snapshots every
    batch and need no cadence. Off by default (gated heads keep
    deterministic layouts)."""
    from pyspark.sql import functions as F

    from ..functions.text import tokens as _tokens
    from ..operators.dedup import _CKPT_LEVEL, banded_signature_table
    from ..plans.census_maintenance import _census_state, _merge_kmv, _merge_stats
    from ..plans.decontamination import corpus_shingles, doc_hits
    from ..plans.lexical_maintenance import index_rows_from_tokens
    from ..sources.versioned import read_current

    out: list[tuple] = []
    dedupe_epochs = checkpoint_dir is not None

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        b = batch_df.select(
            "doc_id", "source", "text", "n_chars", _tokens("text").alias("ts")
        ).localCheckpoint(storageLevel=_CKPT_LEVEL)
        tagged = corpus_shingles(b.select("doc_id", "source", "ts")).localCheckpoint(
            storageLevel=_CKPT_LEVEL
        )
        v_sig = commit_store_batch(
            banded_signature_table(
                shingles=tagged.where(F.col("n") == 3).select(
                    "doc_id", F.col("sh").alias("shingle")
                )
            ),
            store_root + "_sig",
            epoch_id,
            dedupe_epochs,
            partition_by=["band"],
            compact_max_parts=compact_max_parts,
            compact_max_files=compact_max_files,
        )
        tf_b, dl_b = index_rows_from_tokens(
            b.select("doc_id", "ts"), dl_with_uniq=dl_with_uniq
        )
        v_tf = commit_store_batch(
            tf_b, store_root + "_tf", epoch_id, dedupe_epochs,
            partition_by=["tok_bucket"],
            compact_max_parts=compact_max_parts,
            compact_max_files=compact_max_files,
        )
        # dl_with_uniq: mid-deployment schema evolution (the q259
        # posture) — the restarted stream lands n_uniq through EVOLVED
        # appends while older dl rows read back null-filled
        v_dl = commit_store_batch(
            dl_b, store_root + "_dl", epoch_id, dedupe_epochs, partition_by=["hb"],
            compact_max_parts=compact_max_parts,
            compact_max_files=compact_max_files,
            allow_new_columns=dl_with_uniq,
        )
        stats_b, kmv_b = _census_state(
            b.select("doc_id", "source", "text", "n_chars")
        )
        v_st = commit_store_merge(
            stats_b, store_root + "_stats", epoch_id, dedupe_epochs, _merge_stats
        )
        v_km = commit_store_merge(
            kmv_b, store_root + "_kmv", epoch_id, dedupe_epochs, _merge_kmv
        )
        v_led = commit_store_batch(
            doc_hits(tagged, read_current(batch_df.sparkSession, bench_store)),
            store_root + "_ledger",
            epoch_id,
            dedupe_epochs,
            partition_by=["benchmark"],
            compact_max_parts=compact_max_parts,
            compact_max_files=compact_max_files,
        )
        # packed-sequence store (q258's artifact, the sixth class): token
        # counts from the SAME shared tokenized relation; later batches
        # continue each shard's cumsum from the stored offsets through
        # the DERIVED commit (expected_base CAS + monotone guard) —
        # a concurrent packed writer can no longer silently double-fill
        pk_in = b.select("doc_id", F.size("ts").alias("n_toks"))
        v_pk = commit_packed_batch(
            pk_in, store_root + "_packed", epoch_id, dedupe_epochs,
            compact_max_parts=compact_max_parts,
            compact_max_files=compact_max_files,
        )
        # span store (q260's artifact, the seventh class): the loader-
        # facing token slices from the same shared counts
        v_sp = commit_span_batch(
            pk_in, store_root + "_spans", epoch_id, dedupe_epochs,
            compact_max_parts=compact_max_parts,
            compact_max_files=compact_max_files,
        )
        out.append((epoch_id, v_sig, v_tf, v_dl, v_st, v_km, v_led, v_pk, v_sp))

    writer = docs.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def commit_packed_batch(
    rows_in: DataFrame, store: str, epoch_id: int, dedupe_epochs: bool,
    compact_max_parts: int | None = None,
    compact_max_files: int | None = None,
) -> int | None:
    """``commit_store_batch`` for the packed-sequence store, whose append
    rows are DERIVED from store state (each shard's cumsum continues from
    the stored offsets): the derived-append path must not use the plain
    commuting commit — two writers continuing from the same offsets would
    silently double-fill the same (shard, seq_id), and the summing
    finalizer would hide it (r11 verdict item 2). The first batch
    bootstraps the store; every later batch goes through
    ``packed_store.packed_append``: offsets + high-water doc_id read from
    a pinned version, monotone-arrival guard, ``expected_base`` CAS with
    bounded re-derive. Same ``_EPOCHS`` exactly-once ledger as the other
    stores. ``rows_in`` is a (doc_id, text) or (doc_id, n_toks) relation."""
    from ..plans.packed_store import packed_append
    from ..plans.packing import packing_manifest
    from ..sources.versioned import (
        applied_epochs,
        current_version,
        maybe_compact,
        record_epoch,
        write_version,
    )

    if not rows_in.take(1):
        return None
    if dedupe_epochs:
        seen = applied_epochs(store)
        if int(epoch_id) in seen:  # replayed epoch: already committed
            return seen[int(epoch_id)]
    if current_version(store) is None:
        v = write_version(
            packing_manifest(rows_in, with_doc_bounds=True),
            store,
            partition_by=["shard"],
        )
    else:
        v = packed_append(rows_in.sparkSession, store, rows_in)
    if dedupe_epochs:
        record_epoch(store, int(epoch_id), v)
    if compact_max_parts is not None or compact_max_files is not None:
        # compaction is physical-only: the summed (shard, seq_id) state
        # and the stored per-shard offsets/high-water marks are unchanged,
        # so the next derived append reads identical state
        maybe_compact(
            rows_in.sparkSession,
            store,
            max_parts=compact_max_parts,
            max_files=compact_max_files,
            partition_by=["shard"],
        )
    return v


def commit_span_batch(
    rows_in: DataFrame, store: str, epoch_id: int, dedupe_epochs: bool,
    compact_max_parts: int | None = None,
    compact_max_files: int | None = None,
) -> int | None:
    """``commit_packed_batch`` for the loader-facing SPAN store (q260):
    span rows are per-doc facts whose offsets continue from the stored
    per-shard totals, so the append is equally derived-from-state —
    same expected_base CAS, monotone guard, and ``_EPOCHS`` ledger."""
    from ..plans.packed_store import span_append
    from ..plans.packing import packing_spans
    from ..sources.versioned import (
        applied_epochs,
        current_version,
        maybe_compact,
        record_epoch,
        write_version,
    )

    if not rows_in.take(1):
        return None
    if dedupe_epochs:
        seen = applied_epochs(store)
        if int(epoch_id) in seen:  # replayed epoch: already committed
            return seen[int(epoch_id)]
    if current_version(store) is None:
        v = write_version(packing_spans(rows_in), store, partition_by=["shard"])
    else:
        v = span_append(rows_in.sparkSession, store, rows_in)
    if dedupe_epochs:
        record_epoch(store, int(epoch_id), v)
    if compact_max_parts is not None or compact_max_files is not None:
        maybe_compact(
            rows_in.sparkSession,
            store,
            max_parts=compact_max_parts,
            max_files=compact_max_files,
            partition_by=["shard"],
        )
    return v


def commit_store_merge(
    rows: DataFrame, store: str, epoch_id: int, dedupe_epochs: bool, merge_fn,
    partition_by: list[str] | None = None,
) -> int | None:
    """``commit_store_batch`` for MERGE-maintained state (the q250 census
    posture): the first batch bootstraps the store, every later batch is
    combined with the current state via ``merge_fn(current, rows)`` and
    written as the next snapshot (algebraic state is small — sums /
    min-max / bottom-k rows — so the snapshot write is O(state), not
    O(corpus)). A merge is NOT naturally idempotent (re-merging a
    replayed batch double-counts), which is exactly why the ``_EPOCHS``
    ledger gates it under checkpointed replay.

    Concurrency: the merge is a read-transform-overwrite, so the commit
    pins the VERSION IT READ as the CAS base (``expected_base``) — if a
    concurrent writer (e.g. a maintenance ``compact``) commits in
    between, ``write_version`` refuses rather than discarding that
    commit, and the merge is re-derived from the new current (bounded
    retries; the state is O(sources), so a retry is cheap)."""
    from ..sources.versioned import (
        ConcurrentWriteError,
        applied_epochs,
        current_version,
        read_version,
        record_epoch,
        write_version,
    )

    if not rows.take(1):
        return None
    if dedupe_epochs:
        seen = applied_epochs(store)
        if int(epoch_id) in seen:
            return seen[int(epoch_id)]
    spark = rows.sparkSession
    for attempt in range(3):
        base = current_version(store)
        try:
            if base is None:
                v = write_version(
                    rows, store, partition_by=partition_by, expected_base=None
                )
            else:
                v = write_version(
                    merge_fn(read_version(spark, store, base), rows),
                    store,
                    partition_by=partition_by,
                    expected_base=base,
                )
            break
        except ConcurrentWriteError:
            if attempt == 2:
                raise
    if dedupe_epochs:
        record_epoch(store, int(epoch_id), v)
    return v


def maintained_lexical_index_stream(
    docs: DataFrame,
    tf_store: str,
    dl_store: str,
    checkpoint_dir: str | None = None,
    dl_with_uniq: bool = False,
) -> list[tuple]:
    """Streaming lexical-index maintenance: each micro-batch of incoming
    docs is tokenized ALONE and its term-frequency / doc-length rows are
    committed to the q248 versioned stores — the maintained inverted
    index in its production Structured Streaming shape (r9 verdict item
    5: the signature store's foreachBatch lifecycle, extended to the
    retrieval artifact). First batch bootstraps each store, later
    batches land through append_version's manifest commit (O(batch) IO),
    hive-partitioned on the probe keys (tok_bucket / hb) exactly like
    the batch head.

    Returns (epoch_id, tf_version, dl_version) per non-empty batch.

    Drain equality: tf/dl are PER-DOC aggregates and the file source
    never splits one doc across micro-batches, so after the stream
    drains each store's current version equals the from-scratch
    ``index_rows`` over all streamed docs regardless of chunking —
    pinned in tests/test_streaming.py. Exactly-once under checkpointed
    replay via the stores' ``_EPOCHS`` ledgers (commit_store_batch).

    ``dl_with_uniq``: the dl rows additionally carry ``n_uniq``
    (distinct tokens per doc), and the dl commit opts into schema
    evolution — a deployment that flips this flag on a LIVE store lands
    the new statistic as O(batch) evolved appends (pre-evolution rows
    read back null-filled), with the store's drain-equality on the
    original columns unchanged. Pinned in tests/test_streaming.py."""
    from ..plans.lexical_maintenance import index_rows

    out: list[tuple] = []
    dedupe_epochs = checkpoint_dir is not None

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        tf_b, dl_b = index_rows(
            batch_df.select("doc_id", "text"), dl_with_uniq=dl_with_uniq
        )
        v_tf = commit_store_batch(
            tf_b, tf_store, epoch_id, dedupe_epochs, partition_by=["tok_bucket"]
        )
        v_dl = commit_store_batch(
            dl_b, dl_store, epoch_id, dedupe_epochs, partition_by=["hb"],
            allow_new_columns=dl_with_uniq,
        )
        if v_tf is not None or v_dl is not None:
            out.append((epoch_id, v_tf, v_dl))

    writer = docs.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def maintained_census_store_stream(
    docs: DataFrame,
    stats_store: str,
    kmv_store: str,
    checkpoint_dir: str | None = None,
) -> list[tuple]:
    """Streaming census maintenance: each micro-batch's census state
    (per-source stats row + KMV retained hashes, computed over the batch
    ALONE) is MERGED into the q250 stores — sums add, min/max combine,
    bottom-k re-ranks (``bottomk(A ∪ B) = bottomk(bottomk(A) ∪
    bottomk(B))``), so after the stream drains the stored state equals
    the from-scratch census over all streamed docs regardless of
    chunking (pinned in tests/test_streaming.py).

    Returns (epoch_id, stats_version, kmv_version) per non-empty batch.
    Exactly-once under checkpointed replay via the ``_EPOCHS`` ledgers —
    essential here because a re-merged batch would double-count sums
    (commit_store_merge)."""
    from ..plans.census_maintenance import _census_state, _merge_kmv, _merge_stats

    out: list[tuple] = []
    dedupe_epochs = checkpoint_dir is not None

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        stats_b, kmv_b = _census_state(
            batch_df.select("doc_id", "source", "text", "n_chars")
        )
        v_s = commit_store_merge(
            stats_b, stats_store, epoch_id, dedupe_epochs, _merge_stats
        )
        v_k = commit_store_merge(
            kmv_b, kmv_store, epoch_id, dedupe_epochs, _merge_kmv
        )
        if v_s is not None or v_k is not None:
            out.append((epoch_id, v_s, v_k))

    writer = docs.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out


def maintained_packed_store_stream(
    docs: DataFrame,
    store: str,
    checkpoint_dir: str | None = None,
) -> list[tuple]:
    """Streaming batch-assembly maintenance: each micro-batch of incoming
    (doc_id, text) docs extends the q258 packed-sequence store — the
    SIXTH maintained-artifact class in its production Structured
    Streaming shape. The first batch bootstraps the store with its own
    pack; every later batch reads the per-shard packed token offsets
    from the STORE (|shards| stored rows), packs the batch ALONE with
    the continued cumsum (``packing_manifest(base=...)``), and lands the
    additive contribution rows through ``commit_store_batch``'s manifest
    append, shard-partitioned.

    Ordering contract: per-shard packing order IS arrival order, and
    since r12 the append VALIDATES it — a micro-batch whose doc_ids fall
    at or below a shard's stored high-water mark is rejected loudly
    (``ValueError`` from the monotone guard) instead of silently
    producing a manifest that no longer equals the scratch pack;
    backfills rebuild from scratch. The commit also pins the version the
    offsets were read from (``expected_base`` CAS), so a concurrent
    packed writer gets a loud conflict + re-derive, never a silent
    double-fill (r11 verdict item 2).

    Exactly-once under checkpointed replay via the store's ``_EPOCHS``
    ledger: the replayed batch's contribution rows are recomputed but
    never re-appended, so offsets never double-advance."""
    out: list[tuple] = []
    dedupe_epochs = checkpoint_dir is not None

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        v = commit_packed_batch(
            batch_df.select("doc_id", "text"), store, epoch_id, dedupe_epochs
        )
        if v is not None:
            out.append((epoch_id, v))

    writer = docs.writeStream.foreachBatch(sink).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return out
