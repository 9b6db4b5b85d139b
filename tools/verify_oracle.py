"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry at a given sf dir in Spark, runs the matching
``oracle_sql()`` in DuckDB over the same parquet files, and compares:
row count, column names, dtypes (via pandas), and an order-insensitive
value hash (rows sorted, columns sorted by name, values canonicalized).

Usage: python tools/verify_oracle.py [--bare] [sf_dir] [query ...]
(--bare runs under a conf-less SparkSession, mimicking the grading driver)
"""

from __future__ import annotations

import datetime
import hashlib
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> tuple[str, list[str], list[str]]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # without Arrow, Spark's toPandas yields datetime.date objects
            # where DuckDB yields datetime64 — normalize both to datetime64
            # so the harness is robust to the session's arrow setting
            if s.map(lambda v: isinstance(v, datetime.date) or v is None).all() and s.notna().any():
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                df[c] = s.map(lambda v: str(v) if v is not None else None)
    rows = sorted(df.itertuples(index=False, name=None), key=lambda r: tuple(str(x) for x in r))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return h, list(df.columns), [str(df[c].dtype) for c in df.columns]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--bare"]
    bare = "--bare" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e

    if bare:
        # mimic the grading driver: a SparkSession with NONE of the engine's
        # confs (no AQE tuning, no Arrow, no UTC pin) — queries must still
        # hash-match (verified 121/121 in round 2)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("verify-bare").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from building_an_azure_data_lake_for_bikeshare_data_analytics_spark.session import get_spark

        spark = get_spark("verify-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        # accept both full names and bare qNN prefixes (q05 == q05_...)
        if only and name not in only and name.split("_", 1)[0] not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            # arrow path: DATE comes back as datetime.date objects, matching
            # Spark's toPandas representation
            odf = con.execute(oracles[name]).arrow().to_pandas()
        except Exception:
            print(f"FAIL {name}: ORACLE ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        sh, scols, sdt = canon(sdf)
        oh, ocols, odt = canon(odf)
        status = []
        if len(sdf) != len(odf):
            status.append(f"rows {len(sdf)} vs {len(odf)}")
        if scols != ocols:
            status.append(f"cols {scols} vs {ocols}")
        elif sdt != odt:
            status.append(f"dtypes {sdt} vs {odt}")
        if sh != oh and not status:
            status.append("value-hash mismatch")
            merged = sdf[sorted(sdf.columns)].round(6) if len(sdf) < 50 else None
            if merged is not None:
                print("  spark:\n", sdf[sorted(sdf.columns)].head(25).to_string())
                print("  oracle:\n", odf[sorted(odf.columns)].head(25).to_string())
        if status:
            print(f"FAIL {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
