"""Versioned table store: snapshot-isolated self-overwrite, time travel,
vacuum retention."""

import pytest

from pyspark.sql import Row

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import delta_available
from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import versioned as V

#: both store backends; the delta cases run for real wherever delta-spark
#: is installed and skip cleanly in this codec-less container
BACKENDS = [
    "parquet",
    pytest.param(
        "delta",
        marks=pytest.mark.skipif(not delta_available(), reason="delta-spark not installed"),
    ),
]


@pytest.mark.parametrize("backend", BACKENDS)
def test_write_read_roundtrip_and_versions(spark, tmp_path, backend):
    p = str(tmp_path / "t")
    assert V.current_version(p) is None
    v1 = V.write_version(spark.createDataFrame([Row(a=1)]), p, backend=backend)
    v2 = V.write_version(spark.createDataFrame([Row(a=2)]), p, backend=backend)
    assert v2 == v1 + 1  # delta numbers from 0, the manifest store from 1
    assert V.current_version(p) == v2
    assert V.read_current(spark, p).first()["a"] == 2
    assert V.read_version(spark, p, v1).first()["a"] == 1  # time travel


@pytest.mark.parametrize("backend", BACKENDS)
def test_self_overwrite_reads_stable_snapshot(spark, tmp_path, backend):
    """The reference's read-X-overwrite-X pattern (ipynb:L1074->L1098) —
    must work on both backends: the derivation reads v1 while v2 writes."""
    p = str(tmp_path / "t")
    v1 = V.write_version(spark.createDataFrame([Row(a=i) for i in range(100)]), p, backend=backend)
    cur = V.read_current(spark, p)
    derived = cur.selectExpr("a", "a * 10 AS b")  # lazily reads v1
    V.write_version(derived, p, backend=backend)
    out = V.read_current(spark, p).orderBy("a").collect()
    assert len(out) == 100 and out[3]["b"] == 30
    # v1 untouched and still readable
    assert "b" not in V.read_version(spark, p, v1).columns


def test_vacuum_retention(spark, tmp_path):
    p = str(tmp_path / "t")
    for i in range(5):
        V.write_version(spark.createDataFrame([Row(a=i)]), p)
    removed = V.vacuum(p, keep=2)
    assert removed == [1, 2, 3]
    assert V.read_version(spark, p, 4).first()["a"] == 3
    assert V.read_current(spark, p).first()["a"] == 4
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, p, 1)


def test_pipeline_versioned_mode(spark, tmp_path):
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators import pipeline

    d = tmp_path / "csv"
    d.mkdir()
    (d / "stations.csv").write_text("S1,One St,41.9,-87.6\n")
    (d / "riders.csv").write_text("1000,F,L,1 St,1990-01-01,2020-01-01,,True\n")
    (d / "trips.csv").write_text(
        "0000000000000001,classic_bike,2021-02-01 10:00:00,2021-02-01 10:30:00,S1,S1,1000\n"
    )
    (d / "payments.csv").write_text("1,2021-02-01,9.5,1000\n")
    lake = str(tmp_path / "lake")
    a = pipeline.run(spark, str(d), lake, versioned=True)
    assert a["trips"].count() == 1
    b = pipeline.run(spark, str(d), lake, versioned=True)  # re-run -> v2
    assert b["trips"].count() == 1
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import versioned as V
    import os

    assert V.current_version(os.path.join(lake, "trips")) == 2
    assert V.read_version(spark, os.path.join(lake, "trips"), 1).count() == 1


@pytest.mark.parametrize("backend", BACKENDS)
def test_merge_upsert_updates_and_inserts(spark, tmp_path, backend):
    p = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "tag", "x"])
    V.write_version(base, p, backend=backend)
    updates = spark.createDataFrame([(2, "B", 99), (4, "d", 40)], ["id", "tag", "x"])
    v0 = V.current_version(p)
    v = V.merge_upsert(spark, p, updates, key="id")
    assert v == v0 + 1
    got = {r["id"]: (r["tag"], r["x"]) for r in V.read_current(spark, p).collect()}
    assert got == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}
    # time travel: the pre-merge snapshot still has the old row
    old = {r["id"]: r["tag"] for r in V.read_version(spark, p, v0).collect()}
    assert old[2] == "b" and 4 not in old


@pytest.mark.parametrize("backend", BACKENDS)
def test_merge_upsert_schema_evolution(spark, tmp_path, backend):
    p = str(tmp_path / "t")
    V.write_version(spark.createDataFrame([(1, "a")], ["id", "tag"]), p, backend=backend)
    updates = spark.createDataFrame([(2, "b", 7)], ["id", "tag", "extra"])
    V.merge_upsert(spark, p, updates, key="id", allow_new_columns=True)
    got = {r["id"]: r["extra"] for r in V.read_current(spark, p).collect()}
    assert got == {1: None, 2: 7}


def test_merge_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    """Delta MERGE errors when multiple source rows match one target row;
    merge_upsert mirrors that instead of silently multiplying rows."""
    import pytest

    p = str(tmp_path / "t")
    V.write_version(spark.createDataFrame([(1, "a")], ["id", "tag"]), p)
    dup_updates = spark.createDataFrame([(1, "x"), (1, "y")], ["id", "tag"])
    with pytest.raises(ValueError, match="duplicate key"):
        V.merge_upsert(spark, p, dup_updates, key="id")
    # table unchanged (no new version was written)
    assert V.current_version(p) == 1


@pytest.mark.parametrize("backend", BACKENDS)
def test_lake_roundtrip_parity_merge_cdf_optimize(spark, tmp_path, backend):
    """One small lake driven end-to-end per backend — the r4 verdict's
    MERGE / change-feed / OPTIMIZE parity leg. The parquet manifest store
    runs everywhere; the delta leg runs for real wherever delta-spark is
    installed, asserting the SAME logical outcomes through real Delta
    MERGE / versionAsOf / vacuum. Change-data-feed is derived the
    backend-neutral way (full-outer join of two time-travel snapshots),
    so the assertion is on the change set itself, not a backend API."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "tag", "x"]
    )
    V.write_version(base, p, backend=backend)
    v0 = V.current_version(p)

    # MERGE: update id=2, insert id=4
    updates = spark.createDataFrame([(2, "B", 99), (4, "d", 40)], ["id", "tag", "x"])
    v1 = V.merge_upsert(spark, p, updates, key="id")
    assert v1 == v0 + 1

    # CDF between the two snapshots via time travel (both backends)
    old = V.read_version(spark, p, v0).select("id", "tag", "x")
    new = V.read_version(spark, p, v1).select("id", "tag", "x")
    o = old.select(*(F.col(c).alias(f"o_{c}") for c in old.columns))
    n = new.select(*(F.col(c).alias(f"n_{c}") for c in new.columns))
    diff = o.join(n, o.o_id == n.n_id, "full_outer").select(
        F.coalesce("o_id", "n_id").alias("id"),
        F.when(F.col("o_id").isNull(), "insert")
        .when(F.col("n_id").isNull(), "delete")
        .when((F.col("o_tag") != F.col("n_tag")) | (F.col("o_x") != F.col("n_x")), "update_postimage")
        .alias("change"),
    )
    changes = {r["id"]: r["change"] for r in diff.collect()}
    assert changes == {1: None, 2: "update_postimage", 3: None, 4: "insert"}

    # OPTIMIZE/vacuum: old snapshots reclaimable, current survives
    for i in range(3):
        V.merge_upsert(
            spark, p, spark.createDataFrame([(1, f"t{i}", i)], ["id", "tag", "x"]), key="id"
        )
    V.vacuum(p, keep=1)
    got = {r["id"]: (r["tag"], r["x"]) for r in V.read_current(spark, p).collect()}
    assert got == {1: ("t2", 2), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_append_version_equals_union_write(spark, tmp_path):
    """append_version(batch) must read back row-multiset-equal to
    write_version(current ∪ batch) — the O(batch)-IO append contract."""
    p = str(tmp_path / "ap")
    base = spark.createDataFrame([(i, f"r{i}") for i in range(100)], ["id", "s"])
    batch = spark.createDataFrame([(i, f"r{i}") for i in range(100, 130)], ["id", "s"])
    v1 = V.write_version(base, p)
    v2 = V.append_version(batch, p)
    assert v2 == v1 + 1
    got = sorted(tuple(r) for r in V.read_current(spark, p).collect())
    want = sorted(tuple(r) for r in base.unionByName(batch).collect())
    assert got == want
    # time travel still addresses the pre-append snapshot
    assert V.read_version(spark, p, v1).count() == 100
    # the appended version physically wrote ONLY the delta part
    import os

    vdir = tmp_path / "ap" / f"_v{v2}"
    assert (vdir / "_PARTS").exists()
    assert not any(f.suffix == ".parquet" for f in vdir.iterdir())


def test_append_version_chain_and_vacuum_keeps_referenced(spark, tmp_path):
    """A chain of appends reads back complete, and vacuum never removes
    a directory a KEPT version's manifest references — even when that
    directory belongs to a version outside the keep window."""
    p = str(tmp_path / "apv")
    V.write_version(
        spark.createDataFrame([(i,) for i in range(10)], ["id"]), p
    )
    for k in range(3):
        V.append_version(
            spark.createDataFrame([(100 + 10 * k + j,) for j in range(10)], ["id"]),
            p,
        )
    assert V.read_current(spark, p).count() == 40
    removed = V.vacuum(p, keep=1)
    # v1 (the full snapshot) is outside keep=1 but referenced by v4's
    # manifest — it must survive; same for every referenced _parts delta
    assert V.read_current(spark, p).count() == 40
    got = sorted(r["id"] for r in V.read_current(spark, p).collect())
    assert got == sorted(list(range(10)) + [100 + 10 * k + j for k in range(3) for j in range(10)])
    # the un-referenced middle MANIFEST versions are reclaimable
    assert all(v in (2, 3) for v in removed)


def test_append_version_requires_existing_table(spark, tmp_path):
    p = str(tmp_path / "apx")
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(FileNotFoundError):
        V.append_version(df, p)


def test_append_version_then_full_write_vacuum_gc_parts(spark, tmp_path):
    """After a full write supersedes an append chain, vacuum reclaims the
    no-longer-referenced delta parts."""
    import os

    p = str(tmp_path / "apgc")
    V.write_version(spark.createDataFrame([(1,)], ["id"]), p)
    V.append_version(spark.createDataFrame([(2,)], ["id"]), p)
    V.write_version(spark.createDataFrame([(9,)], ["id"]), p)  # v3 full
    V.vacuum(p, keep=1, grace_seconds=0)
    assert [r["id"] for r in V.read_current(spark, p).collect()] == [9]
    parts_dir = tmp_path / "apgc" / "_parts"
    assert not parts_dir.exists() or not any(parts_dir.iterdir())


def test_compact_collapses_append_chain(spark, tmp_path):
    """compact(): v1 + N appends + compact reads back row-multiset-equal
    to the from-scratch union, as ONE plain snapshot (no manifest), with
    strictly fewer data files than the chain — and vacuum can then GC
    every superseded delta part."""
    p = str(tmp_path / "cmp")
    base = spark.createDataFrame([(i, f"r{i}") for i in range(50)], ["id", "s"])
    V.write_version(base, p)
    want_rows = [(i, f"r{i}") for i in range(50)]
    for k in range(4):
        lo = 100 + 10 * k
        V.append_version(
            spark.createDataFrame(
                [(i, f"r{i}") for i in range(lo, lo + 10)], ["id", "s"]
            ),
            p,
        )
        want_rows += [(i, f"r{i}") for i in range(lo, lo + 10)]
    files_before = len(V.table_files(p))
    v = V.compact(spark, p)
    assert v == 6  # v1 + 4 appends + the compaction snapshot
    got = sorted(tuple(r) for r in V.read_current(spark, p).collect())
    assert got == sorted(want_rows)
    # one plain snapshot: no _PARTS manifest, fewer files than the chain
    import os

    vdir = tmp_path / "cmp" / f"_v{v}"
    assert not (vdir / "_PARTS").exists()
    files_after = len(V.table_files(p))
    assert files_after < files_before
    # time travel to the pre-compact chain still works until vacuumed
    assert V.read_version(spark, p, 5).count() == 90
    # once the chain ages out, its delta parts are reclaimable
    V.vacuum(p, keep=1, grace_seconds=0)
    parts_dir = tmp_path / "cmp" / "_parts"
    assert not parts_dir.exists() or not any(parts_dir.iterdir())
    assert sorted(tuple(r) for r in V.read_current(spark, p).collect()) == sorted(
        want_rows
    )


def test_compact_preserves_partitioning(spark, tmp_path):
    """A partitioned store compacts into one file per partition directory
    and stays partition-discoverable (pruning keeps working)."""
    p = str(tmp_path / "cmpp")
    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(60)], ["id", "band", "s"]
    )
    V.write_version(df, p, partition_by=["band"])
    V.append_version(
        spark.createDataFrame(
            [(i, i % 3, f"r{i}") for i in range(100, 130)], ["id", "band", "s"]
        ),
        p,
        partition_by=["band"],
    )
    v = V.compact(spark, p, partition_by=["band"])
    cur = V.read_current(spark, p)
    assert cur.count() == 90
    assert set(cur.columns) == {"id", "band", "s"}
    # one file per band directory
    import os

    vdir = str(tmp_path / "cmpp" / f"_v{v}")
    for b in (0, 1, 2):
        bdir = os.path.join(vdir, f"band={b}")
        files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
        assert len(files) == 1, (b, files)
    # partition filter still prunes to one directory's rows
    assert cur.where("band = 1").count() == 30


def test_maybe_compact_policy_bounds(spark, tmp_path):
    """maybe_compact: no-op within bounds, compacts past them, and under
    a per-append invocation the chain depth sawtooths under the bound
    while the row multiset stays the running union."""
    p = str(tmp_path / "mc")
    V.write_version(spark.createDataFrame([(0,)], ["id"]), p)
    assert V.maybe_compact(spark, p, max_parts=3) is None  # within bounds
    want, depths = [0], []
    for i in range(1, 11):
        V.append_version(spark.createDataFrame([(i,)], ["id"]), p)
        want.append(i)
        V.maybe_compact(spark, p, max_parts=3)
        depths.append(len(V._parts_of(p, V.current_version(p))))
    # sawtooth: post-policy depth never exceeds max_parts and keeps
    # collapsing back to a single snapshot
    assert max(depths) == 3 and depths.count(1) >= 3
    assert sorted(r["id"] for r in V.read_current(spark, p).collect()) == want


def test_maybe_compact_max_files_axis(spark, tmp_path):
    """The file-count bound triggers even when the chain is shallow —
    the axis partitioned appends actually grow."""
    p = str(tmp_path / "mf")
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], ["id", "band"])
    V.write_version(df, p, partition_by=["band"])
    V.append_version(
        spark.createDataFrame([(i, i % 3) for i in range(30, 60)], ["id", "band"]),
        p,
        partition_by=["band"],
    )
    n_before = len(V.table_files(p))
    assert V.maybe_compact(spark, p, max_parts=None, max_files=n_before + 1) is None
    v = V.maybe_compact(
        spark, p, max_parts=None, max_files=n_before - 1, partition_by=["band"]
    )
    assert v is not None
    assert len(V.table_files(p)) == 3  # one file per band directory
    assert V.read_current(spark, p).count() == 60


def test_commit_store_batch_with_compaction_cadence(spark, tmp_path):
    """The streaming commit path with the cadence policy on: drain
    equality holds across compactions and replayed epochs still dedupe."""
    from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.streaming.pipeline import commit_store_batch

    p = str(tmp_path / "ccb")
    for e in range(8):
        rows = spark.createDataFrame([(e * 10 + j,) for j in range(10)], ["id"])
        commit_store_batch(rows, p, e, dedupe_epochs=True, compact_max_parts=3)
    assert len(V._parts_of(p, V.current_version(p))) <= 4
    # replayed epoch: skipped, not re-appended, even after compactions
    replay = spark.createDataFrame([(5,)], ["id"])
    commit_store_batch(replay, p, 3, dedupe_epochs=True, compact_max_parts=3)
    got = sorted(r["id"] for r in V.read_current(spark, p).collect())
    assert got == list(range(80))


def test_append_schema_evolution_add_column(spark, tmp_path):
    """Evolved append: new column rides in O(batch); older rows read
    back null-filled; aggregates over the new column see batch rows only."""
    p = str(tmp_path / "evo")
    V.write_version(
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"]), p
    )
    V.append_version(
        spark.createDataFrame([(3, "c", 30)], ["id", "s", "extra"]),
        p,
        allow_new_columns=True,
    )
    cur = V.read_current(spark, p)
    assert set(cur.columns) == {"id", "s", "extra"}
    got = {r["id"]: r["extra"] for r in cur.collect()}
    assert got == {1: None, 2: None, 3: 30}
    # a later non-evolved append of the WIDE schema is a plain append
    V.append_version(
        spark.createDataFrame([(4, "d", 40)], ["id", "s", "extra"]), p
    )
    assert V.read_current(spark, p).count() == 4


def test_append_schema_removal_always_raises(spark, tmp_path):
    p = str(tmp_path / "evr")
    V.write_version(spark.createDataFrame([(1, "a")], ["id", "s"]), p)
    with pytest.raises(ValueError, match="removal"):
        V.append_version(spark.createDataFrame([(2,)], ["id"]), p)
    with pytest.raises(ValueError, match="removal"):
        V.append_version(
            spark.createDataFrame([(2,)], ["id"]), p, allow_new_columns=True
        )
    # new column without the flag: loud too
    with pytest.raises(ValueError, match="allow_new_columns"):
        V.append_version(
            spark.createDataFrame([(2, "b", 1)], ["id", "s", "x"]), p
        )
    assert V.read_current(spark, p).count() == 1  # store untouched


def test_compact_materializes_evolved_schema(spark, tmp_path):
    """Evolution x compaction: compacting a chain whose later appends
    EVOLVED the schema must produce a snapshot carrying the full evolved
    schema with pre-evolution rows' new columns materialized as nulls —
    the same logical contents the manifest chain read — and the
    post-compact store must keep enforcing the contract both ways
    (old-schema appends loud, evolved appends fine)."""
    p = str(tmp_path / "evc")
    V.write_version(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"]), p)
    V.append_version(
        spark.createDataFrame([(3, "c", 30)], ["id", "s", "x"]),
        p,
        allow_new_columns=True,
    )
    before = sorted(tuple(r) for r in V.read_current(spark, p).collect())

    v = V.compact(spark, p)
    after_df = V.read_current(spark, p)
    assert sorted(tuple(r) for r in after_df.collect()) == before
    assert set(after_df.columns) == {"id", "s", "x"}
    # the compacted snapshot is ONE part: nulls are physical now
    assert len(V._parts_of(p, v)) == 1

    # contract still enforced against the compacted footers
    with pytest.raises(ValueError, match="allow_new_columns"):
        V.append_version(
            spark.createDataFrame([(4, "d", 40, 1.0)], ["id", "s", "x", "y"]), p
        )
    V.append_version(spark.createDataFrame([(5, "e", 50)], ["id", "s", "x"]), p)
    assert V.read_current(spark, p).count() == 4
