"""Source readers.

Reference behaviors reproduced (SURVEY.md §2.1):

* S1  headerless CSV scan producing all-string ``_c0.._cN`` columns
      (ipynb:L250-253, cell 4) — plus an explicit-schema variant the
      reference lacks (schema-on-read beats double-pass inference at scale).
* S4  catalog/table scan (``spark.read.table``, ipynb:L973/L1074-1076/L1750)
      — here parameterized over a storage root so local parquet dirs,
      ``abfss://`` containers, or a metastore all interchange; the
      reference's Azure coupling is only path strings.
* S9  ``cache()`` of hot fact tables (ipynb:L1182, cell 12) as an option.

Scale notes: readers never infer schemas on big data (inference = an extra
full scan), and never coalesce; Catalyst handles split planning from
``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: the driver-testdata star schema (TESTDATA.md) + extension tables
STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv_raw(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    schema: StructType | None = None,
) -> DataFrame:
    """Headerless CSV scan.

    Without ``schema`` this matches the reference byte-for-byte: every column
    arrives as a string named ``_c<i>`` (ipynb:L250-253). With ``schema`` the
    scan is single-pass typed — the only sane mode at 100 TB.
    """
    reader = spark.read.format("csv").option("sep", sep).option("header", "false")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """JSON-lines scan (one object per line) — the dominant interchange
    format for web-scale text corpora, absent from the reference (which is
    CSV-only, SURVEY.md §2.1 S1).

    Pass ``schema`` in production: inference costs an extra full pass over
    100 TB and silently widens types on dirty data. Corrupt lines land in
    ``_corrupt_record`` (PERMISSIVE mode) instead of failing the job —
    filter/count that column as the ingest-quality gate."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


#: columns stored as INT64 TIMESTAMP(NANOS) in the driver testdata. Spark 4
#: reads nanos parquet natively as TIMESTAMP_NTZ (micros truncation — same as
#: DuckDB casting TIMESTAMP_NS to TIMESTAMP); the native scan keeps ts
#: predicates pushdown-able, so it is the primary path. Older Sparks reject
#: the type outright unless spark.sql.legacy.parquet.nanosAsLong is set, in
#: which case we read raw nanos longs and truncate — that conf is scoped to
#: the fallback scan and restored (ADVICE r1: it used to leak into
#: caller-owned sessions).
_NANOS_TS_COLS = {"events": ("ts",)}


def _read_nanos_fallback(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Legacy-Spark path: scan nanos columns as longs, truncate to micros."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev: str | None = None
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "true")
    try:
        df = spark.read.parquet(path)
        for c in _NANOS_TS_COLS.get(name, ()):
            if c in df.columns and dict(df.dtypes).get(c) == "bigint":
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def read_parquet_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Path-based table scan: ``<root>/<name>.parquet`` (driver testdata
    layout) or ``<root>/<name>`` directory. Columnar, predicate/column
    pushdown free via the vectorized parquet reader."""
    file_path = os.path.join(root, f"{name}.parquet")
    dir_path = os.path.join(root, name)
    path = file_path if os.path.exists(file_path) else dir_path
    try:
        df = spark.read.parquet(path)
        if name in _NANOS_TS_COLS:
            dtypes = dict(df.dtypes)
            if any(dtypes.get(c) == "bigint" for c in _NANOS_TS_COLS[name]):
                # session already had nanosAsLong=true: normalize to micros
                for c in _NANOS_TS_COLS[name]:
                    if dtypes.get(c) == "bigint":
                        df = df.withColumn(
                            c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                        )
        return df
    except Exception as exc:
        # Only the nanos-timestamp parquet-type error routes to the legacy-conf
        # fallback; anything else (missing path, corrupt file, permissions)
        # re-raises so the real cause surfaces.
        msg = str(exc)
        if name in _NANOS_TS_COLS and (
            "PARQUET_TYPE_ILLEGAL" in msg or "Illegal Parquet type" in msg
        ):
            return _read_nanos_fallback(spark, path, name)
        raise


def load_star(
    spark: SparkSession,
    root: str,
    tables: tuple[str, ...] = STAR_TABLES,
    cache_facts: bool = False,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the star schema from ``root``; optionally register temp views
    (S6, ipynb:L1194-1195) and cache the fact tables (S9, ipynb:L1182)."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = read_parquet_table(spark, root, name)
        if cache_facts and name in {"orders", "lineitem", "events"}:
            df = df.cache()
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
