"""Versioned table store: snapshot-isolated self-overwrite, time travel,
vacuum retention."""

import pytest

from pyspark.sql import Row

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.sources import versioned as V


def test_write_read_roundtrip_and_versions(spark, tmp_path):
    p = str(tmp_path / "t")
    assert V.current_version(p) is None
    v1 = V.write_version(spark.createDataFrame([Row(a=1)]), p)
    v2 = V.write_version(spark.createDataFrame([Row(a=2)]), p)
    assert (v1, v2) == (1, 2)
    assert V.current_version(p) == 2
    assert V.read_current(spark, p).first()["a"] == 2
    assert V.read_version(spark, p, 1).first()["a"] == 1  # time travel


def test_self_overwrite_reads_stable_snapshot(spark, tmp_path):
    """The reference's read-X-overwrite-X pattern (ipynb:L1074->L1098) —
    must work without Delta: the derivation reads v1 while v2 writes."""
    p = str(tmp_path / "t")
    V.write_version(spark.createDataFrame([Row(a=i) for i in range(100)]), p)
    cur = V.read_current(spark, p)
    derived = cur.selectExpr("a", "a * 10 AS b")  # lazily reads v1
    V.write_version(derived, p)
    out = V.read_current(spark, p).orderBy("a").collect()
    assert len(out) == 100 and out[3]["b"] == 30
    # v1 untouched and still readable
    assert "b" not in V.read_version(spark, p, 1).columns


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
