"""Build the /tmp/stress corpus used by SCALE_NOTES.md measurements.

20x replication of the sf0.1 documents/embeddings tables with planted
near-dups — the regime dedup/ANN are deployed for (the gate corpora are
near-uniform noise, where no sub-linear ANN can hold exact top-k):

* documents: 20 copies of the 5,000 sf0.1 docs (100,000 rows). Copies of
  docs with ``doc_id % 10 == 0`` keep their text verbatim (planted exact/
  near dup groups of size 20); all other copies get a copy-specific token
  appended (distinct but shingle-overlapping).
* embeddings: 20 copies of the 2,000 sf0.1 vectors (40,000 rows), each
  copy perturbed by a small deterministic per-(vec,dim) offset — replicas
  of one base vector sit at cosine ~0.999 of each other (planted ANN
  neighbors). Queries downstream keep the ``vec_id % 50 = 0`` convention
  (800 queries).

Deterministic (no RNG): offsets are integer hashes of (vec_id, dim).

Usage: python tools/build_stress.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

COPIES = 20


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs0 AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    con.execute(f"CREATE VIEW emb0 AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')")
    n_docs = con.execute("SELECT count(*) FROM docs0").fetchone()[0]
    n_vecs = con.execute("SELECT count(*) FROM emb0").fetchone()[0]

    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + c.i * {n_docs} AS doc_id,
                 CASE WHEN d.doc_id % 10 = 0 THEN d.text
                      ELSE d.text || ' copytok' || c.i END AS text,
                 d.lang, d.source,
                 CAST(length(CASE WHEN d.doc_id % 10 = 0 THEN d.text
                                  ELSE d.text || ' copytok' || c.i END) AS BIGINT) AS n_chars
          FROM docs0 d
          CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + c.i * {n_vecs} AS vec_id,
                 list_transform(
                   list_zip(e.embedding,
                            range(1, len(e.embedding) + 1)),
                   z -> CAST(z[1] AS FLOAT)
                        + CAST((((e.vec_id * 31 + CAST(z[2] AS BIGINT) * 17 + c.i * 5) % 7) - 3)
                               AS FLOAT) * CAST(0.002 AS FLOAT) * CAST(c.i > 0 AS INTEGER)
                 ) AS embedding,
                 e.label
          FROM emb0 e
          CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    nd = con.execute(f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')").fetchone()[0]
    ne = con.execute(f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')").fetchone()[0]
    print(f"wrote {out}: documents={nd} embeddings={ne}")


if __name__ == "__main__":
    main()
