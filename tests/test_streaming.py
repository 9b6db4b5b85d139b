"""Structured Streaming tests: windowed event-time aggregation must agree
with the equivalent batch query; the custom stateful operator must
accumulate across microbatches."""

import shutil

import pytest

from pyspark.sql import functions as F

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.readers import (
    read_parquet_table,
)
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
    read_events_stream,
    run_to_memory,
    running_user_totals,
    windowed_type_counts,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Split the events table into 3 *time-ordered* parquet files (written in
    chronological order so the file-source microbatches replay history the
    way a real stream arrives — interleaved files would make older events
    late beyond the watermark and get dropped)."""
    import time

    import duckdb

    d = tmp_path_factory.mktemp("events_stream")
    out = d / "events"
    out.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""CREATE TABLE ev AS
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
            FROM read_parquet('{SF_SMOKE}/events.parquet') ORDER BY ts"""
    )
    n = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    step = (n + 2) // 3
    for i in range(3):
        con.execute(
            f"COPY (SELECT * FROM ev ORDER BY ts LIMIT {step} OFFSET {i * step}) "
            f"TO '{out}/part{i}.parquet' (FORMAT PARQUET)"
        )
        time.sleep(1.1)  # distinct mtimes -> deterministic file order
    yield str(out)
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = windowed_type_counts(read_events_stream(spark, events_dir))
    run_to_memory(stream, "win_counts", "append")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        spark.read.schema(spark.read.parquet(events_dir).schema)
        .parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {(r["win"]["start"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    # append mode only emits windows the watermark has closed: window_end
    # <= max(ts) - 2h at end-of-stream
    import datetime as dt

    max_ts = spark.read.parquet(events_dir).agg(F.max("ts")).first()[0]
    cutoff = max_ts - dt.timedelta(hours=2)
    closed = {k for k in want if k[0] + dt.timedelta(hours=1) <= cutoff}
    assert set(got) == closed
    assert len(closed) > 10
    for k in closed:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6


def test_running_user_totals_accumulate(spark, events_dir):
    stream = running_user_totals(read_events_stream(spark, events_dir))
    run_to_memory(stream, "user_totals", "update")
    # memory sink in update mode appends every emission; the last emission
    # per user must equal the full batch totals
    rows = spark.sql(
        """SELECT user_id, n_events, value_sum FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
               FROM user_totals) WHERE rn = 1"""
    ).collect()
    got = {r["user_id"]: (r["n_events"], r["value_sum"]) for r in rows}
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {r["user_id"]: (r["n"], r["s"]) for r in batch}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6


def test_stream_static_join_enriches(spark, events_dir):
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        enriched_event_stream,
    )

    cust = read_parquet_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")
    stream = enriched_event_stream(read_events_stream(spark, events_dir), cust)
    run_to_memory(stream, "enriched", "append")
    out = spark.sql("SELECT * FROM enriched")
    n = out.count()
    assert n == spark.read.parquet(events_dir).count()  # left join: no row loss
    # every user_id < 150 resolves to a segment (customer table covers them)
    assert out.where("user_id < 150 AND segment IS NULL").count() == 0
    assert out.where("segment IS NOT NULL").count() > 0


def test_late_data_beyond_watermark_is_dropped(spark, tmp_path):
    """Watermark semantics: events older than (max seen ts - watermark) that
    arrive in a later microbatch must NOT reopen closed windows."""
    import time as _time

    import duckdb

    d = tmp_path / "late_events"
    d.mkdir()
    con = duckdb.connect()
    # batch 1: hours 00-10 of day 1; batch 2: hour 23 (advances watermark);
    # batch 3: a LATE event back at hour 01 (far beyond the 2h watermark)
    con.execute(
        """CREATE TABLE ev(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
                           event_type VARCHAR, value DOUBLE, props VARCHAR)"""
    )
    con.execute(
        """INSERT INTO ev
           SELECT i, TIMESTAMP '2024-01-01 00:30:00' + INTERVAL (i) HOUR, i % 5,
                  'click', 1.0, '{}' FROM range(10) t(i)"""
    )
    con.execute(f"COPY ev TO '{d}/part0.parquet' (FORMAT PARQUET)")
    _time.sleep(1.1)
    con.execute(
        """COPY (SELECT 100::BIGINT, TIMESTAMP '2024-01-01 23:30:00', 1::BIGINT,
                        'click', 1.0, '{}') TO '%s/part1.parquet' (FORMAT PARQUET)""" % d
    )
    _time.sleep(1.1)
    con.execute(
        """COPY (SELECT 200::BIGINT, TIMESTAMP '2024-01-01 01:40:00', 1::BIGINT,
                        'click', 1.0, '{}') TO '%s/part2.parquet' (FORMAT PARQUET)""" % d
    )
    stream = windowed_type_counts(read_events_stream(spark, str(d)))
    run_to_memory(stream, "late_counts", "append")
    rows = {
        r["window_start"].hour: r["n_events"]
        for r in spark.sql("SELECT * FROM late_counts").collect()
    }
    # hour-01 window was closed by the watermark before the late event
    # arrived: its count must still be 1 (not 2)
    assert rows[1] == 1


def test_stream_dedup_drops_redelivered_rows(spark, tmp_path):
    """dropDuplicatesWithinWatermark: rows redelivered in a later microbatch
    (same event_id, within the watermark horizon) appear exactly once."""
    import duckdb

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        deduped_event_stream,
    )

    out = tmp_path / "dup_events"
    out.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""CREATE TABLE ev AS
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
            FROM read_parquet('{SF_SMOKE}/events.parquet') ORDER BY ts LIMIT 150"""
    )
    import time

    con.execute(
        f"COPY (SELECT * FROM ev ORDER BY ts LIMIT 100) TO '{out}/f0.parquet' (FORMAT PARQUET)"
    )
    time.sleep(1.1)
    # second delivery: rows 51-150 — 50 redelivered + 50 new
    con.execute(
        f"COPY (SELECT * FROM ev ORDER BY ts LIMIT 100 OFFSET 50) TO '{out}/f1.parquet' (FORMAT PARQUET)"
    )
    stream = deduped_event_stream(read_events_stream(spark, str(out)), watermark="10 hours")
    run_to_memory(stream, "deduped", "append")
    rows = spark.sql("SELECT event_id FROM deduped").collect()
    assert len(rows) == 150
    assert len({r["event_id"] for r in rows}) == 150


def test_session_windows_match_batch(spark, events_dir):
    """Streaming session_window (append mode: closed sessions only) must
    agree with the same session_window aggregation run in batch over the
    full table — merging of gap-bridged sessions included."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        sessionized_stream,
    )

    stream = sessionized_stream(read_events_stream(spark, events_dir))
    run_to_memory(stream, "sessions_stream", "append")
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    }

    batch = spark.read.parquet(events_dir)
    want = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in sessionized_stream(batch).collect()
    }
    # the stream's final watermark may hold back the very last open sessions;
    # everything it DID emit must match batch exactly, and it must have
    # emitted the overwhelming majority
    assert got, "stream emitted no closed sessions"
    for k, n in got.items():
        assert want.get(k) == n, k
    assert len(got) >= 0.8 * len(want)


def test_incremental_merge_stream_upserts_per_batch(spark, tmp_path):
    """foreachBatch -> versioned-store MERGE: batches land incrementally,
    later batches overwrite earlier rows per key (last-write-wins), and the
    store keeps one version per non-initial batch."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import (
        versioned as V,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        EVENTS_SCHEMA,
        incremental_merge_stream,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    base = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "a", 1.0, "{}"),
            (2, "2024-01-01 00:01:00", 11, "a", 2.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    upd = spark.createDataFrame(
        [
            (2, "2024-01-01 00:05:00", 11, "b", 20.0, "{}"),  # update key 2
            (2, "2024-01-01 00:03:00", 11, "stale", 5.0, "{}"),  # loses in-batch LWW
            (3, "2024-01-01 00:06:00", 12, "c", 3.0, "{}"),  # insert key 3
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    base.coalesce(1).write.parquet(str(src / "f1"))
    upd.coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    store = str(tmp_path / "store")
    n = incremental_merge_stream(
        stream, store, key="event_id", seq_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert n == 2  # two micro-batches (one file each)
    got = {r["event_id"]: (r["event_type"], r["value"]) for r in V.read_current(spark, store).collect()}
    assert got == {1: ("a", 1.0), 2: ("b", 20.0), 3: ("c", 3.0)}
    assert V.current_version(store) == 2  # initial write + one merge


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """The click->purchase attribution join (stream-stream, range-bounded)
    must emit exactly the pairs the equivalent batch join produces —
    in-order replay means nothing is late, so parity is exact."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        attributed_purchases_stream,
    )

    stream = attributed_purchases_stream(read_events_stream(spark, events_dir))
    run_to_memory(stream, "attrib", "append")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }

    ev = spark.read.parquet(events_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), F.col("event_id").alias("purchase_id")
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in purchases.join(
            clicks,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 minutes"))
            & (F.col("click_ts") < F.col("purchase_ts")),
        ).collect()
    }
    assert want, "fixture produced no click->purchase pairs in the gap window"
    assert got == want


def test_drift_monitor_stream_flags_skew_not_self(spark, events_dir):
    """A stream scored against its own full histogram drifts ~0 when the
    batch is the whole corpus; against a deliberately skewed reference
    (clicks only), every batch shows high drift."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        drift_monitor_stream,
        value_histogram,
    )

    batch = spark.read.parquet(events_dir)
    ref = value_histogram(batch)

    # micro-batches are thirds of the reference corpus: per-batch drift is
    # sampling noise — small, never the alert regime
    stream_all = read_events_stream(spark, events_dir)
    rows = drift_monitor_stream(stream_all, ref)
    assert rows
    assert all(0.0 <= r[3] < 0.25 for r in rows), rows
    # every micro-batch reports every event type present in it
    assert {r[1] for r in rows} == {
        r["event_type"] for r in batch.select("event_type").distinct().collect()
    }

    # reference built from clicks only: every type's value mix differs per
    # micro-batch, and non-click types never match
    skew_ref = value_histogram(batch.where(F.col("event_type") == "click"))
    rows_skew = drift_monitor_stream(read_events_stream(spark, events_dir), skew_ref)
    assert rows_skew
    # only 'click' can appear (reference has no other types after the
    # tot_ref > 0 guard); its distribution matches itself exactly
    assert {r[1] for r in rows_skew} == {"click"}


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    """Split the documents table into 3 parquet files so the file source
    replays the corpus as 3 micro-batches (maxFilesPerTrigger=1)."""
    import time

    import duckdb

    d = tmp_path_factory.mktemp("docs_stream")
    out = d / "docs"
    out.mkdir()
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE dd AS SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet') ORDER BY doc_id"
    )
    n = con.execute("SELECT count(*) FROM dd").fetchone()[0]
    step = (n + 2) // 3
    for i in range(3):
        con.execute(
            f"COPY (SELECT * FROM dd ORDER BY doc_id LIMIT {step} OFFSET {i * step}) "
            f"TO '{out}/part{i}.parquet' (FORMAT PARQUET)"
        )
        time.sleep(1.1)
    # a 4th file with degenerate crawl records (no scorable pair): the
    # gate must emit rows for these too, kept=False
    con.execute(
        f"COPY (SELECT * FROM (VALUES (999001, 'solo'), (999002, '')) t(doc_id, text)) "
        f"TO '{out}/part3.parquet' (FORMAT PARQUET)"
    )
    yield str(out)
    shutil.rmtree(d, ignore_errors=True)


def test_lm_scored_stream_matches_batch(spark, docs_dir):
    """The streaming ingestion quality gate must score EXACTLY like the
    batch path regardless of micro-batch chunking: a doc's score depends
    only on its text and the static LM counts, so the union of all
    micro-batch outputs equals batch scoring of the whole corpus — and on
    in-corpus docs the smoothed (left-join) scorer must reduce exactly to
    q138's inner-join scorer."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.lm import (
        lm_fit,
        lm_pairs,
        lm_score_pairs,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        lm_scored_docs_stream,
    )

    docs = read_parquet_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bg, ug, v = lm_fit(docs)
    bg, ug, v = bg.localCheckpoint(), ug.localCheckpoint(), v.localCheckpoint()
    batch = {
        r["doc_id"]: (r["n_pairs"], r["avg_logp"])
        for r in lm_score_pairs(lm_pairs(docs), bg, ug, v).collect()
    }

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    # threshold at the median corpus score so BOTH gate outcomes occur
    med = sorted(s for _n, s in batch.values())[len(batch) // 2]
    rows = lm_scored_docs_stream(stream, bg, ug, v, min_avg_logp=med)
    assert len({e for e, *_ in rows}) >= 2, "expected multiple micro-batches"
    got = {doc_id: (n, s) for _, doc_id, n, s, _k in rows if doc_id < 999000}
    assert got == batch
    kept = {doc_id: k for _, doc_id, _n, _s, k in rows}
    for _, doc_id, _n, s, k in rows:
        if doc_id < 999000:
            assert k == (s >= med), (doc_id, s, med)
    assert any(kept.values()) and not all(kept.values()), "both outcomes"
    # degenerate docs (no scorable pair) are present, unscored, rejected
    deg = {doc_id: (n, s, k) for _, doc_id, n, s, k in rows if doc_id >= 999000}
    assert deg == {999001: (0, None, False), 999002: (0, None, False)}, deg


@pytest.fixture(scope="module")
def emb_stream_dir(tmp_path_factory):
    """Stage the 20% hash-tail of the embeddings table as 3 parquet chunk
    files (the incoming crawl batches), plus a planted copy of a CORPUS
    vector under a new id — the near-dup the gate must reject."""
    import time

    import duckdb

    d = tmp_path_factory.mktemp("emb_stream")
    out = d / "emb"
    out.mkdir()
    con = duckdb.connect()
    src = f"{SF_SMOKE}/embeddings.parquet"
    con.execute(
        f"CREATE TABLE ee AS SELECT vec_id, embedding FROM read_parquet('{src}') "
        f"WHERE vec_id % 5 = 0 ORDER BY vec_id"
    )
    n = con.execute("SELECT count(*) FROM ee").fetchone()[0]
    step = (n + 2) // 3
    for i in range(3):
        extra = (
            f" UNION ALL SELECT 999001 AS vec_id, embedding FROM read_parquet('{src}') WHERE vec_id = 1"
            if i == 2
            else ""
        )
        con.execute(
            f"COPY (SELECT * FROM (SELECT * FROM ee ORDER BY vec_id LIMIT {step} OFFSET {i * step}){extra}) "
            f"TO '{out}/part{i}.parquet' (FORMAT PARQUET)"
        )
        time.sleep(1.1)
    yield str(out)
    shutil.rmtree(d, ignore_errors=True)


def test_semantic_dedup_stream_matches_batch(spark, emb_stream_dir):
    """The streaming SemDeDup gate must produce EXACTLY the batch verdicts
    regardless of micro-batch chunking (a vector's verdict depends only on
    itself and the static cell index), and the planted corpus-copy must be
    rejected while novel vectors pass."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.similarity import (
        build_cell_index,
        kmeans_fit,
        semantic_dedup_against_index,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        semantic_dedup_stream,
    )

    emb = read_parquet_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    corpus = emb.where("vec_id % 5 != 0")
    cents = kmeans_fit(corpus, k=16, max_iter=4)
    index = build_cell_index(corpus, cents).localCheckpoint()

    incoming = spark.read.parquet(emb_stream_dir)
    batch = {
        r["vec_id"]: (r["cell"], r["n_candidates"], r["max_cos"], r["kept"])
        for r in semantic_dedup_against_index(incoming, cents, index).collect()
    }

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(emb_stream_dir)
    )
    rows = semantic_dedup_stream(stream, cents, index)
    assert len({e for e, *_ in rows}) >= 2, "expected multiple micro-batches"
    got = {vec_id: (c, n, m, k) for _, vec_id, c, n, m, k in rows}
    assert got == batch
    assert got[999001][3] is False, "planted corpus copy must be rejected"
    kept_vals = [k for *_, k in rows]
    assert any(kept_vals) and not all(kept_vals), "both outcomes"


def test_scd2_stream_matches_batch_with_out_of_order_batches(spark, tmp_path):
    """Incremental SCD2 maintenance == the batch build over the full log,
    even when a later micro-batch delivers EARLIER events for a user (the
    recompute-from-log contract): final store rows equal
    scd2_versions(all events) exactly."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lakehouse import (
        scd2_versions,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import (
        versioned as V,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        EVENTS_SCHEMA,
        scd2_history_stream,
    )

    schema = "event_id long, ts string, user_id long, event_type string, value double, props string"
    b1 = spark.createDataFrame(
        [
            (10, "2024-01-01 00:10:00", 1, "view", 0.0, "{}"),
            (11, "2024-01-01 00:20:00", 1, "click", 0.0, "{}"),
            (20, "2024-01-01 00:15:00", 2, "view", 0.0, "{}"),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    # batch 2: user 1 gets an EARLIER event (out-of-order) that inserts a
    # version BEFORE the ones already written; user 3 appears fresh
    b2 = spark.createDataFrame(
        [
            (9, "2024-01-01 00:05:00", 1, "signup", 0.0, "{}"),
            (30, "2024-01-01 00:30:00", 3, "purchase", 0.0, "{}"),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    # batch 3: user 2 changes attr; user 1 untouched
    b3 = spark.createDataFrame(
        [
            (21, "2024-01-01 00:40:00", 2, "error", 0.0, "{}"),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))

    src = tmp_path / "incoming"
    src.mkdir()
    import time

    for i, b in enumerate([b1, b2, b3]):
        b.coalesce(1).write.parquet(str(src / f"f{i}"))
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    store = str(tmp_path / "scd2_store")
    n = scd2_history_stream(stream, store, checkpoint_dir=str(tmp_path / "ckpt"))
    assert n == 3

    all_events = b1.unionByName(b2).unionByName(b3).select(
        "user_id", "event_type", "ts", "event_id"
    )
    expect = {tuple(r) for r in scd2_versions(all_events).collect()}
    got = {tuple(r) for r in V.read_current(spark, store).collect()}
    assert got == expect
    # user 1's history was rebuilt with the late signup as version 1
    u1 = sorted(
        (r for r in got if r[0] == 1), key=lambda r: r[5]
    )
    assert [r[1] for r in u1] == ["signup", "view", "click"]


def test_hll_register_stream_matches_batch(spark, events_dir):
    """Union-equals-batch for the streaming HLL: after replaying the
    corpus as 3 micro-batches, the merged register state and the final
    estimate must EQUAL q169's batch sketch over the whole table —
    register-max merge is associative/commutative/idempotent, so the
    micro-batch boundaries cannot leak into the result. Estimates must
    also be monotonically non-decreasing per type across epochs (registers
    only grow)."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
        QUERIES,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        hll_register_stream,
    )

    stream = (
        spark.readStream.schema(read_parquet_table(spark, SF_SMOKE, "events").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    rows, state = hll_register_stream(stream, p=8)
    epochs = sorted({r[0] for r in rows})
    assert len(epochs) == 3  # one register merge per micro-batch

    batch = {r["event_type"]: r for r in QUERIES["q169_hll_distinct"](spark, SF_SMOKE).collect()}
    final = {r[1]: r for r in rows if r[0] == epochs[-1]}
    assert set(final) == set(batch)
    for et, b in batch.items():
        _, _, n_buckets, reg_sum, est = final[et]
        assert n_buckets == b["n_buckets"], et
        assert reg_sum == b["reg_sum"], et
        assert est == b["hll_estimate"], et

    # estimates never decrease as registers accumulate
    for et in final:
        series = [r[4] for r in rows if r[1] == et]
        assert all(a <= b + 1e-9 for a, b in zip(series, series[1:])), et


@pytest.fixture(scope="module")
def docs_src_dir(tmp_path_factory):
    """documents with (doc_id, source, text) split into 3 parquet files
    (3 micro-batches under maxFilesPerTrigger=1), plus a 4th file holding
    a whitespace-only crawl record — zero non-empty tokens, so the
    validation gate must emit NO row for it on either surface."""
    import time

    import duckdb

    d = tmp_path_factory.mktemp("docs_src_stream")
    out = d / "docs"
    out.mkdir()
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE dd AS SELECT doc_id, source, text FROM read_parquet('{SF_SMOKE}/documents.parquet') ORDER BY doc_id"
    )
    n = con.execute("SELECT count(*) FROM dd").fetchone()[0]
    step = (n + 2) // 3
    for i in range(3):
        con.execute(
            f"COPY (SELECT * FROM dd ORDER BY doc_id LIMIT {step} OFFSET {i * step}) "
            f"TO '{out}/part{i}.parquet' (FORMAT PARQUET)"
        )
        time.sleep(1.1)
    con.execute(
        f"COPY (SELECT * FROM (VALUES (999001, 'web_0', '   ')) t(doc_id, source, text)) "
        f"TO '{out}/part3.parquet' (FORMAT PARQUET)"
    )
    yield str(out)
    shutil.rmtree(d, ignore_errors=True)


def test_tokenizer_validation_stream_matches_batch_and_q235(spark, docs_src_dir):
    """The streaming tokenizer round-trip gate must validate EXACTLY like
    the batch surface regardless of micro-batch chunking: a doc's row
    depends only on its text and the static merges, so (a) the union of
    micro-batch outputs equals the batch per-doc relation, (b) summing
    per-doc rows by source reproduces q235's count columns, and (c) the
    whitespace-only crawl record yields no row anywhere."""
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.bpe import (
        bpe_fit,
        roundtrip_flags,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.registry import (
        QUERIES,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        tokenizer_validated_docs_stream,
    )

    static = read_parquet_table(spark, SF_SMOKE, "documents")
    merges = bpe_fit(static.select("text"), n_merges=8, top_words=1000)

    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_src_dir)
    )
    rows = tokenizer_validated_docs_stream(stream, merges)
    got = {r[1]: r[2:] for r in rows}
    assert 999001 not in got  # (c) zero-token doc emits nothing

    words = static.select(
        "doc_id", "source", F.explode(tokens(F.lower(F.col("text")))).alias("word")
    ).where(F.col("word") != "")
    ef, rt, ns = roundtrip_flags(F.col("word"), merges)
    batch = {
        r["doc_id"]: (
            r["source"], r["n_words"], r["n_encodable"],
            r["n_roundtrip_ok"], r["bpe_symbols"],
        )
        for r in words.select(
            "doc_id", "source", ef.alias("e"), rt.alias("r"), ns.alias("n")
        )
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("e").alias("n_encodable"),
            F.sum("r").alias("n_roundtrip_ok"),
            F.sum("n").alias("bpe_symbols"),
        )
        .collect()
    }
    assert got == batch  # (a)

    by_source = {}
    for src, nw, ne, nr, bs in got.values():
        c = by_source.setdefault(src, [0, 0, 0, 0])
        c[0] += nw; c[1] += ne; c[2] += nr; c[3] += bs
    q235 = {
        r["source"]: [
            r["n_words"], r["n_encodable"], r["n_roundtrip_ok"], r["bpe_symbols"]
        ]
        for r in QUERIES["q235_tokenizer_roundtrip"](spark, SF_SMOKE).collect()
    }
    assert by_source == q235  # (b)


def test_maintained_signature_store_stream_matches_batch(spark, docs_dir, tmp_path):
    """Streaming index maintenance parity: after the micro-batches drain,
    the versioned signature store's current version must equal the
    from-scratch banded table over every streamed doc — chunking must
    not matter, and each micro-batch must have committed its own store
    version (v1 full write, then manifest appends)."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        banded_signature_table,
        shingle_sets,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        maintained_signature_store_stream,
    )

    store = str(tmp_path / "sigstream")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    rows = maintained_signature_store_stream(stream, store)
    assert len(rows) >= 2, "expected multiple micro-batches"
    # one committed version per non-empty micro-batch, strictly increasing
    assert [v for _, v in rows] == sorted({v for _, v in rows})

    streamed = spark.read.parquet(docs_dir).select("doc_id", "text")
    want = sorted(
        tuple(r)
        for r in banded_signature_table(
            shingles=shingle_sets(streamed.select("doc_id", tokens("text").alias("ts")), 3)
        ).collect()
    )
    got = sorted(tuple(r) for r in read_current(spark, store).collect())
    assert got == want
    assert len(got) > 0


def test_commit_store_batch_epoch_replay_is_idempotent(spark, docs_dir, tmp_path):
    """Exactly-once contract of the maintained-store sink (r9 advice):
    with a checkpointed stream, a micro-batch replayed after a mid-epoch
    failure re-arrives with the SAME epoch_id — the second commit of that
    epoch must be a no-op returning the original version, leaving the
    store's contents (and so drain equality) intact. A NEW epoch_id must
    still append."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        applied_epochs,
        read_current,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        _signature_batch_rows,
        commit_store_batch,
    )

    store = str(tmp_path / "sigreplay")
    docs = spark.read.parquet(docs_dir).select("doc_id", "text")
    b0 = docs.where("doc_id % 2 = 0")
    b1 = docs.where("doc_id % 2 = 1")

    v0 = commit_store_batch(_signature_batch_rows(b0), store, 0, True)
    n0 = read_current(spark, store).count()
    assert v0 == 1 and n0 > 0

    # replay of epoch 0 (same data re-delivered): no new version, no new rows
    v0r = commit_store_batch(_signature_batch_rows(b0), store, 0, True)
    assert v0r == v0
    assert read_current(spark, store).count() == n0

    # a genuinely new epoch appends
    v1 = commit_store_batch(_signature_batch_rows(b1), store, 1, True)
    assert v1 == v0 + 1
    n1 = read_current(spark, store).count()
    assert n1 > n0

    # replay of epoch 1 after its commit: still a no-op
    assert commit_store_batch(_signature_batch_rows(b1), store, 1, True) == v1
    assert read_current(spark, store).count() == n1
    assert applied_epochs(store) == {0: v0, 1: v1}

    # an UNCHECKPOINTED stream (dedupe_epochs=False) never consults the
    # ledger: same epoch_id commits again
    store2 = str(tmp_path / "sigreplay_nockpt")
    va = commit_store_batch(_signature_batch_rows(b0), store2, 0, False)
    vb = commit_store_batch(_signature_batch_rows(b0), store2, 0, False)
    assert (va, vb) == (1, 2)


def test_maintained_lexical_index_stream_matches_batch(spark, docs_dir, tmp_path):
    """Streaming lexical-index maintenance parity: after the micro-batches
    drain, the tf/dl stores' current versions equal the from-scratch
    index_rows over every streamed doc — chunking must not matter (per-doc
    aggregates, docs never split across batches), and each non-empty batch
    committed its own versions through the manifest append."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lexical_maintenance import (
        index_rows,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        maintained_lexical_index_stream,
    )

    tf_p, dl_p = str(tmp_path / "lexstream_tf"), str(tmp_path / "lexstream_dl")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    rows = maintained_lexical_index_stream(stream, tf_p, dl_p)
    assert len(rows) >= 2, "expected multiple micro-batches"
    assert [v for _, v, _ in rows] == sorted({v for _, v, _ in rows})

    streamed = spark.read.parquet(docs_dir).select("doc_id", "text")
    tf_all, dl_all = index_rows(streamed)
    got_tf = sorted(tuple(r) for r in read_current(spark, tf_p).collect())
    got_dl = sorted(tuple(r) for r in read_current(spark, dl_p).collect())
    assert got_tf == sorted(tuple(r) for r in tf_all.collect())
    assert got_dl == sorted(tuple(r) for r in dl_all.collect())
    assert len(got_tf) > 0 and len(got_dl) > 0
    # the stores carry their hive-partition keys (probe-pruning layout)
    import os

    assert any(
        d.startswith("tok_bucket=")
        for d in os.listdir(os.path.join(tf_p, "_v1"))
        if not d.startswith("_")
    )


def test_maintained_census_store_stream_matches_batch(spark, docs_dir, tmp_path):
    """Streaming census maintenance parity: merged per-batch state after
    the drain equals the from-scratch census state over all streamed docs
    (the mergeability identities composed across micro-batches), with
    exactly-once semantics under the epoch ledger."""
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.census_maintenance import (
        _census_state,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        maintained_census_store_stream,
    )

    sp, kp = str(tmp_path / "censtream_stats"), str(tmp_path / "censtream_kmv")
    # docs_dir has (doc_id, text); derive the census columns the same way
    # on both the stream and the batch side
    enrich = lambda df: df.withColumn(  # noqa: E731
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 4).cast("string"))
    ).withColumn("n_chars", F.length("text"))
    stream = enrich(
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    rows = maintained_census_store_stream(stream, sp, kp)
    assert len(rows) >= 2, "expected multiple micro-batches"

    batch = enrich(spark.read.parquet(docs_dir).select("doc_id", "text"))
    stats_all, kmv_all = _census_state(batch)
    got_stats = sorted(tuple(r) for r in read_current(spark, sp).collect())
    got_kmv = sorted(tuple(r) for r in read_current(spark, kp).collect())
    assert got_stats == sorted(tuple(r) for r in stats_all.collect())
    assert got_kmv == sorted(tuple(r) for r in kmv_all.collect())
    assert len(got_stats) > 0 and len(got_kmv) > 0


@pytest.fixture(scope="module")
def docs_decon_dir(tmp_path_factory):
    """(doc_id, source, text) split into 3 chunk files, with a planted
    verbatim copy of a src0 doc under a NEW source in the final chunk — a
    guaranteed contamination hit against the zero-threshold b_src0_5
    benchmark, so the screen stream has something to ledger."""
    import time

    import duckdb

    d = tmp_path_factory.mktemp("docs_decon_stream")
    out = d / "docs"
    out.mkdir()
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE dd AS SELECT doc_id, source, text FROM read_parquet('{SF_SMOKE}/documents.parquet') ORDER BY doc_id"
    )
    n = con.execute("SELECT count(*) FROM dd").fetchone()[0]
    step = (n + 2) // 3
    for i in range(3):
        extra = (
            " UNION ALL SELECT * FROM (SELECT 999001 AS doc_id, 'srcX' AS source, text "
            "FROM dd WHERE source = 'src0' AND length(text) > 50 ORDER BY doc_id LIMIT 1)"
            if i == 2
            else ""
        )
        con.execute(
            f"COPY (SELECT * FROM (SELECT * FROM dd ORDER BY doc_id LIMIT {step} OFFSET {i * step})"
            f"{extra}) TO '{out}/part{i}.parquet' (FORMAT PARQUET)"
        )
        time.sleep(1.1)
    return str(out)


def test_screened_ingest_stream_matches_batch(spark, docs_decon_dir, tmp_path):
    """Streaming decontamination parity: after the micro-batches drain,
    the contamination ledger's current version equals the from-scratch
    per-doc hit relation over every streamed doc probed against the SAME
    stored benchmark table — chunking must not matter (a doc's hits
    depend only on its own shingles), and the planted verbatim src0 copy
    must be in the ledger."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
        BENCHMARKS,
        bench_shingle_table,
        corpus_shingles,
        doc_hits,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
        write_version,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        screened_ingest_stream,
    )

    # the maintained benchmark index (q249's artifact), registered once
    # batch-side from the eval sources
    bench_p, ledger_p = str(tmp_path / "benchstore"), str(tmp_path / "deconledger")
    d_all = (
        spark.read.parquet(docs_decon_dir)
        .where("source <> 'srcX'")
        .select("doc_id", "source", tokens("text").alias("ts"))
    )
    write_version(
        bench_shingle_table(d_all, BENCHMARKS), bench_p, partition_by=["benchmark"]
    )

    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_decon_dir)
    )
    rows = screened_ingest_stream(stream, bench_p, ledger_p)
    assert len(rows) >= 1, "expected at least one ledgered micro-batch"
    assert [v for _, v in rows] == sorted({v for _, v in rows})

    streamed = spark.read.parquet(docs_decon_dir).select(
        "doc_id", "source", tokens("text").alias("ts")
    )
    want = sorted(
        tuple(r)
        for r in doc_hits(
            corpus_shingles(streamed), read_current(spark, bench_p)
        ).collect()
    )
    got = sorted(tuple(r) for r in read_current(spark, ledger_p).collect())
    assert got == want
    # the planted verbatim copy of a src0 doc must have been caught
    assert any(r[0] == 999001 and r[2] == "b_src0_5" for r in got)


def test_maintained_ivf_store_stream_matches_batch(spark, emb_stream_dir, tmp_path):
    """Streaming ANN-index maintenance parity: after the micro-batches
    drain, the cell-assignment store's current version equals
    ``assign_cells`` over every streamed vector through the SAME stored
    centroids — chunking must not matter (assignment is per-row
    deterministic against a fixed quantizer), and each non-empty batch
    committed its own version through the manifest append."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.similarity import (
        assign_cells,
        kmeans_fit,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
        write_version,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        maintained_ivf_store_stream,
    )

    store, cent_p = str(tmp_path / "ivfstream"), str(tmp_path / "ivfstream_cents")
    # quantizer trained OFFLINE on the corpus side (q246's build posture),
    # persisted to its own store; the stream only assigns through it
    corpus = read_parquet_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = kmeans_fit(corpus, k=4, max_iter=4)
    write_version(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cell int, centroid array<bigint>"
        ),
        cent_p,
    )

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(emb_stream_dir)
    )
    rows = maintained_ivf_store_stream(stream, store, cent_p)
    assert len(rows) >= 2, "expected multiple micro-batches"
    assert [v for _, v in rows] == sorted({v for _, v in rows})

    streamed = spark.read.parquet(emb_stream_dir).select("vec_id", "embedding")
    want = sorted(
        (r["vec_id"], tuple(r["embedding"]), r["cell"])
        for r in assign_cells(streamed, cents).collect()
    )
    got = sorted(
        (r["vec_id"], tuple(r["embedding"]), r["cell"])
        for r in read_current(spark, store).collect()
    )
    assert got == want
    assert len(got) > 0
    # the store carries its hive-partition key (probe-pruning layout)
    import os

    assert any(
        d.startswith("cell=")
        for d in os.listdir(os.path.join(store, "_v1"))
        if not d.startswith("_")
    )


def test_composed_ingest_stream_matches_batch_builders(spark, docs_decon_dir, tmp_path):
    """Streaming composed ingest parity: ONE drained stream must leave
    every text-side maintained store equal to its standalone batch
    builder over all streamed docs — the per-doc / mergeable-state
    drain-equality arguments of the five standalone streams must survive
    composition behind one shared tokenize/shingle pass."""
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.dedup import (
        banded_signature_table,
        shingle_sets,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.census_maintenance import (
        _census_state,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
        BENCHMARKS,
        bench_shingle_table,
        corpus_shingles,
        doc_hits,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lexical_maintenance import (
        index_rows,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
        write_version,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        composed_ingest_stream,
    )

    root = str(tmp_path / "composed")
    bench_p = str(tmp_path / "composed_bench")
    enrich = lambda df: df.withColumn("n_chars", F.length("text"))  # noqa: E731

    all_docs = enrich(spark.read.parquet(docs_decon_dir))
    write_version(
        bench_shingle_table(
            all_docs.where("source <> 'srcX'").select(
                "doc_id", "source", tokens("text").alias("ts")
            ),
            BENCHMARKS,
        ),
        bench_p,
        partition_by=["benchmark"],
    )

    stream = enrich(
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_decon_dir)
    )
    rows = composed_ingest_stream(stream, root, bench_p)
    assert len(rows) >= 2, "expected multiple micro-batches"

    def rowset(df):
        return sorted(tuple(r) for r in df.collect())

    ts_all = all_docs.select("doc_id", tokens("text").alias("ts"))
    want_sig = banded_signature_table(
        shingles=shingle_sets(ts_all, 3)
    )
    assert rowset(read_current(spark, root + "_sig")) == rowset(want_sig)

    tf_all, dl_all = index_rows(all_docs.select("doc_id", "text"))
    assert rowset(read_current(spark, root + "_tf")) == rowset(tf_all)
    assert rowset(read_current(spark, root + "_dl")) == rowset(dl_all)

    stats_all, kmv_all = _census_state(
        all_docs.select("doc_id", "source", "text", "n_chars")
    )
    assert rowset(read_current(spark, root + "_stats")) == rowset(stats_all)
    assert rowset(read_current(spark, root + "_kmv")) == rowset(kmv_all)

    want_hits = doc_hits(
        corpus_shingles(all_docs.select("doc_id", "source", tokens("text").alias("ts"))),
        read_current(spark, bench_p),
    )
    got_hits = rowset(read_current(spark, root + "_ledger"))
    assert got_hits == rowset(want_hits)
    assert any(r[0] == 999001 for r in got_hits), "planted dup must be ledgered"

    # the sixth artifact: the packed store's finalized manifest equals the
    # from-scratch pack of all streamed docs (micro-batches arrive in
    # doc_id order here — the monotone-arrival contract)
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        _finalize,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packing_manifest,
    )

    want_pack = packing_manifest(all_docs.select("doc_id", "text"))
    got_pack = _finalize(read_current(spark, root + "_packed"))
    assert [tuple(r) for r in got_pack.collect()] == [
        tuple(r) for r in want_pack.collect()
    ]

    # the seventh artifact: the span store equals the from-scratch span
    # table — the loader-facing slices survive the streamed lifecycle
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packing_spans,
    )

    want_spans = packing_spans(all_docs.select("doc_id", "text"))
    # hive-partitioned read-back appends the shard column last — align
    got_spans = read_current(spark, root + "_spans").select(*want_spans.columns)
    assert rowset(got_spans) == rowset(want_spans)


def test_maintained_packed_store_stream_matches_batch(spark, docs_dir, tmp_path):
    """Streaming packed-store maintenance parity (the sixth maintained
    artifact): after the micro-batches drain in arrival order, the
    finalized store equals the from-scratch pack over every streamed
    doc — the continued-cumsum contributions compose across any
    chunking, and each non-empty micro-batch commits its own version."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packed_store import (
        _finalize,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.packing import (
        packing_manifest,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        maintained_packed_store_stream,
    )

    store = str(tmp_path / "packedstream")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    rows = maintained_packed_store_stream(stream, store)
    assert len(rows) >= 2, "expected multiple micro-batches"
    assert [v for _, v in rows] == sorted({v for _, v in rows})

    streamed = spark.read.parquet(docs_dir).select("doc_id", "text")
    want = [tuple(r) for r in packing_manifest(streamed).collect()]
    got = [tuple(r) for r in _finalize(read_current(spark, store)).collect()]
    assert got == want and len(got) > 0


def test_commit_store_merge_retries_on_concurrent_commit(spark, tmp_path, monkeypatch):
    """A concurrent commit (e.g. maintenance compact) landing between the
    merge's read and its write must not be discarded OR crash the stream:
    the pinned-base CAS refuses, and the merge re-derives from the new
    current and succeeds on retry."""
    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import versioned as V
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        commit_store_merge,
    )

    store = str(tmp_path / "csm")
    V.write_version(spark.createDataFrame([("a", 1)], ["k", "n"]), store)

    real_write = V.write_version
    intruder = spark.createDataFrame([("b", 10)], ["k", "n"])
    state = {"fired": False}

    def racing_write(df, path, partition_by=None, backend="auto", expected_base=V._UNSET):
        if not state["fired"]:
            state["fired"] = True
            # the concurrent writer commits first; the merge's pinned base
            # is then stale and its own CAS must refuse
            merged = (
                V.read_current(spark, path).unionByName(intruder)
                .groupBy("k").agg(F.sum("n").alias("n"))
            )
            real_write(merged, path)
        return real_write(
            df, path, partition_by=partition_by, backend=backend,
            expected_base=expected_base,
        )

    monkeypatch.setattr(V, "write_version", racing_write)
    merge_fn = lambda a, b: a.unionByName(b).groupBy("k").agg(F.sum("n").alias("n"))
    v = commit_store_merge(
        spark.createDataFrame([("a", 5)], ["k", "n"]), store, 0, False, merge_fn
    )
    assert v is not None and state["fired"]
    got = {r["k"]: r["n"] for r in V.read_current(spark, store).collect()}
    # both the intruder's commit and the merged batch survive
    assert got == {"a": 6, "b": 10}


def test_ivf_stream_refresh_policy_rotates_both_stores(spark, tmp_path):
    """The aging policy wired into the IVF stream: a drifted micro-batch
    funnels into one stale cell, the in-stream trigger fires, and BOTH
    stores rotate — the assignment store is rewritten healthy and the
    centroid store gains the retrained quantizer (so later batches assign
    through the refreshed cells). No vector is lost across the refresh."""
    import time

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.similarity import (
        kmeans_fit,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.ann_maintenance import (
        refresh_due,
        stored_health,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        current_version,
        read_current,
        write_version,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        maintained_ivf_store_stream,
    )

    emb = read_parquet_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    healthy = emb.where("vec_id % 4 = 0")
    drifted = emb.where("vec_id % 4 != 0").select(
        "vec_id",
        F.transform("embedding", lambda x: x * 0 + F.lit(9.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    src = tmp_path / "drift_src"
    src.mkdir()

    def _stage_file(df, name):
        import glob
        import shutil

        d = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(d))
        part = glob.glob(str(d / "part-*.parquet"))[0]
        shutil.move(part, str(src / name))

    _stage_file(healthy, "f1.parquet")
    time.sleep(1.1)  # distinct mtimes: file source drains oldest-first
    _stage_file(drifted, "f2.parquet")

    store, cent_p = str(tmp_path / "ivfr"), str(tmp_path / "ivfr_cents")
    cents = kmeans_fit(healthy, k=8, max_iter=4)
    write_version(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cell int, centroid array<bigint>"
        ),
        cent_p,
    )
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    # the drifted batch is 3x the baseline corpus and collapses into one
    # stale cell, so post-drift occ_skew >= 0.75 while the k=8 baseline
    # sits well under 0.42 — factor 1.8 trips deterministically (the 3x
    # production constant is pinned in test_maintenance_chains; this test
    # pins the STREAM wiring: trigger -> retrain -> both stores rotate)
    rows = maintained_ivf_store_stream(
        stream, store, cent_p, refresh_factor=1.8, refresh_k=8
    )
    assert len(rows) == 2
    assert stored_health(store) is not None
    assert current_version(cent_p) >= 2, "centroid store did not rotate"
    due, _ = refresh_due(spark, store, factor=1.8)
    assert not due  # re-baselined healthy after the refresh
    got_ids = sorted(r["vec_id"] for r in read_current(spark, store).collect())
    want_ids = sorted(
        r["vec_id"] for r in healthy.unionByName(drifted).select("vec_id").collect()
    )
    assert got_ids == want_ids


def test_lexical_dl_store_schema_evolves_mid_stream(spark, tmp_path):
    """r11 verdict item 6: a maintained store OTHER than the census
    evolving its schema mid-deployment, through the STREAMING lifecycle.
    Phase 1 streams dl rows in the original (doc_id, len, hb) schema;
    the deployment then flips ``dl_with_uniq`` and restarts from the
    same checkpoint — phase 2's rows carry ``n_uniq`` and land as
    EVOLVED appends (allow_new_columns plumbed through
    commit_store_batch). Pre-evolution rows read back null-filled, the
    original columns' drain equality is untouched, and the new
    statistic is exact on post-evolution docs."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.lexical_maintenance import (
        index_rows,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        read_current,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        maintained_lexical_index_stream,
    )

    def _docs(lo, hi):
        return spark.createDataFrame(
            [(i, " ".join(f"t{(i * j) % 7}" for j in range(i % 9 + 1)))
             for i in range(lo, hi)],
            ["doc_id", "text"],
        )

    src = tmp_path / "evo_src"
    src.mkdir()

    def _land(df, name):
        staged = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(staged)
        part = glob.glob(staged + "/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    tf_p, dl_p = str(tmp_path / "evo_tf"), str(tmp_path / "evo_dl")
    ckpt = str(tmp_path / "evo_ckpt")

    def _stream():
        return (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    # phase 1: original schema
    _land(_docs(0, 30), "a")
    rows1 = maintained_lexical_index_stream(_stream(), tf_p, dl_p, checkpoint_dir=ckpt)
    assert rows1
    assert "n_uniq" not in read_current(spark, dl_p).columns

    # phase 2: the deployment starts tracking n_uniq — same checkpoint,
    # so only the NEW file is processed, as an evolved append
    _land(_docs(30, 55), "b")
    rows2 = maintained_lexical_index_stream(
        _stream(), tf_p, dl_p, checkpoint_dir=ckpt, dl_with_uniq=True
    )
    assert rows2

    dl = read_current(spark, dl_p)
    assert "n_uniq" in dl.columns
    # pre-evolution rows null-fill; post-evolution rows carry the stat
    assert dl.where("doc_id < 30 AND n_uniq IS NOT NULL").count() == 0
    assert dl.where("doc_id >= 30 AND n_uniq IS NULL").count() == 0

    all_docs = _docs(0, 55)
    _, dl_old = index_rows(all_docs)
    got_core = sorted(
        tuple(r) for r in dl.select("doc_id", "len", "hb").collect()
    )
    assert got_core == sorted(tuple(r) for r in dl_old.collect())
    _, dl_new = index_rows(_docs(30, 55), dl_with_uniq=True)
    got_uniq = sorted(
        tuple(r) for r in dl.where("doc_id >= 30")
        .select("doc_id", "len", "n_uniq", "hb").collect()
    )
    assert got_uniq == sorted(tuple(r) for r in dl_new.collect())
    # the original store schema's REMOVAL would still be loud: a later
    # batch regressing to the old builder fails the write-time contract
    import pytest

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        append_version,
    )

    _, dl_regress = index_rows(_docs(55, 60))
    with pytest.raises(ValueError, match="missing column"):
        append_version(dl_regress, dl_p, partition_by=["hb"])


def test_decon_ledger_schema_evolves_mid_stream(spark, tmp_path):
    """r11 verdict item 6, third store: the contamination LEDGER evolving
    mid-deployment through the streaming lifecycle. Phase 1 screens in
    the original (doc_id, source, benchmark) ledger schema; the
    deployment then flips ``hit_stats`` and restarts from the same
    checkpoint — phase 2's hits land with ``n_hits``/``n_shingles`` as
    EVOLVED appends. Pre-evolution ledger rows null-fill, core-column
    drain equality is untouched, the new evidence-strength stats are
    exact on post-evolution hits, and a regressed builder (columns
    removed again) still fails loudly at write time."""
    import glob
    import shutil

    import pytest

    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.functions.text import (
        tokens,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.plans.decontamination import (
        BENCHMARKS,
        bench_shingle_table,
        corpus_shingles,
        doc_hits,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources.versioned import (
        append_version,
        read_current,
        write_version,
    )
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import (
        screened_ingest_stream,
    )

    base = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .where("length(text) > 50")
    )
    # two planted verbatim src0 copies under a new source — one per
    # phase, each a guaranteed hit against zero-threshold b_src0_5
    plant = (
        base.where("source = 'src0'")
        .orderBy("doc_id")
        .limit(2)
        .select(
            (F.col("doc_id") + 999000).alias("doc_id"),
            F.lit("srcX").alias("source"),
            "text",
        )
    )
    plants = plant.collect()
    assert len(plants) == 2

    src = tmp_path / "decon_evo_src"
    src.mkdir()

    def _land(df, name):
        staged = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(staged)
        shutil.copy(
            glob.glob(staged + "/part-*.parquet")[0], str(src / f"{name}.parquet")
        )

    # the maintained benchmark index, registered once from the eval sources
    bench_p = str(tmp_path / "evo_bench")
    ledger_p = str(tmp_path / "evo_ledger")
    ckpt = str(tmp_path / "evo_decon_ckpt")
    write_version(
        bench_shingle_table(
            base.select("doc_id", "source", tokens("text").alias("ts")), BENCHMARKS
        ),
        bench_p,
        partition_by=["benchmark"],
    )

    def _stream():
        return (
            spark.readStream.schema("doc_id bigint, source string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    phase1 = spark.createDataFrame([plants[0]], ["doc_id", "source", "text"])
    phase2 = spark.createDataFrame([plants[1]], ["doc_id", "source", "text"])

    # phase 1: original ledger schema
    _land(phase1, "a")
    rows1 = screened_ingest_stream(_stream(), bench_p, ledger_p, checkpoint_dir=ckpt)
    assert rows1
    assert "n_hits" not in read_current(spark, ledger_p).columns

    # phase 2: the deployment starts recording evidence strength — same
    # checkpoint, so only the new file screens, as an evolved append
    _land(phase2, "b")
    rows2 = screened_ingest_stream(
        _stream(), bench_p, ledger_p, checkpoint_dir=ckpt, hit_stats=True
    )
    assert rows2

    led = read_current(spark, ledger_p)
    assert {"n_hits", "n_shingles"} <= set(led.columns)
    p1_id, p2_id = plants[0]["doc_id"], plants[1]["doc_id"]
    assert led.where(f"doc_id = {p1_id} AND n_hits IS NOT NULL").count() == 0
    assert led.where(f"doc_id = {p2_id} AND n_hits IS NULL").count() == 0

    # core-column drain equality vs the from-scratch screen of everything
    streamed = phase1.unionByName(phase2).select(
        "doc_id", "source", tokens("text").alias("ts")
    )
    bench = read_current(spark, bench_p)
    want_core = sorted(
        tuple(r) for r in doc_hits(corpus_shingles(streamed), bench).collect()
    )
    got_core = sorted(
        tuple(r) for r in led.select("doc_id", "source", "benchmark").collect()
    )
    assert got_core == want_core

    # the new stats are exact on the post-evolution hits
    want_stats = sorted(
        tuple(r)
        for r in doc_hits(
            corpus_shingles(
                phase2.select("doc_id", "source", tokens("text").alias("ts"))
            ),
            bench,
            with_hit_stats=True,
        ).collect()
    )
    got_stats = sorted(
        tuple(r)
        for r in led.where(f"doc_id = {p2_id}")
        .select("doc_id", "source", "n_hits", "n_shingles", "benchmark")
        .collect()
    )
    assert got_stats == want_stats

    # regression is loud: a later batch dropping the stats fails at write
    regress = doc_hits(
        corpus_shingles(
            phase1.select("doc_id", "source", tokens("text").alias("ts"))
        ),
        bench,
    )
    with pytest.raises(ValueError, match="missing column"):
        append_version(regress, ledger_p, partition_by=["benchmark"])
