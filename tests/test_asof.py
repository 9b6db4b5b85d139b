"""As-of join edge semantics: no-match nulls, equal-timestamp inclusivity,
per-key isolation."""

import datetime as dt

from pyspark.sql import Row

from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, t=_ts("2021-01-10 00:00:00"), eid=100),  # after both rights
            Row(k=1, t=_ts("2021-01-02 00:00:00"), eid=101),  # between
            Row(k=1, t=_ts("2020-12-31 00:00:00"), eid=102),  # before all -> null
            Row(k=1, t=_ts("2021-01-05 00:00:00"), eid=103),  # exactly equal -> inclusive
            Row(k=2, t=_ts("2021-01-10 00:00:00"), eid=200),  # other key: no rights -> null
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rt=_ts("2021-01-01 00:00:00")),
            Row(k=1, rt=_ts("2021-01-05 00:00:00")),
        ]
    )
    out = {
        r["eid"]: r["asof_value"]
        for r in asof_join(left, right, on="k", left_ts="t", right_ts="rt").collect()
    }
    assert out[100] == _ts("2021-01-05 00:00:00")
    assert out[101] == _ts("2021-01-01 00:00:00")
    assert out[102] is None
    assert out[103] == _ts("2021-01-05 00:00:00")  # ties are inclusive (>=)
    assert out[200] is None
