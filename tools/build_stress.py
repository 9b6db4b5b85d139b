"""Build the /tmp/stress corpus used by SCALE_NOTES.md measurements.

``copies x shards`` replication of the sf0.1 documents/embeddings tables
with planted near-dups — the regime dedup/ANN are deployed for (the gate
corpora are near-uniform noise, where no sub-linear ANN can hold exact
top-k):

* **copies** (within-shard replication, the r2 design): copies of docs
  with ``doc_id % 10 == 0`` keep their text verbatim (planted exact/near
  dup groups of size ``copies``); all other copies get a copy-specific
  token appended (distinct but shingle-overlapping). Embedding copies are
  perturbed by a small deterministic per-(vec,dim) offset — replicas sit
  at cosine ~0.999 (planted ANN neighbors).
* **shards** (corpus-growth axis, the r5 soak design): shard j > 0
  prefixes EVERY doc token with ``s<j>_`` (all shingles distinct across
  shards — cross-shard Jaccard ~0) and applies a shard-specific
  deterministic SIGN-FLIP pattern to the embedding dimensions (an
  orthogonal transform: within-shard cosine structure is preserved
  EXACTLY, cross-shard cosine ~0). Growing ``shards`` therefore scales
  the corpus while keeping dup-group size and density CONSTANT — clean
  scaling exponents for the 10x soak.

Default 20 x 1 (100,000 docs / 40,000 vectors) preserves the r2-r4
corpus byte-for-byte in layout and id scheme
(``id + (shard*copies + copy) * n_base``; queries keep the
``vec_id % 50 = 0`` convention).

Deterministic (no RNG): offsets/signs are integer hashes of
(vec_id, dim, copy, shard).

Usage: python tools/build_stress.py [sf_dir] [out_dir] [copies] [shards]
"""

from __future__ import annotations

import os
import sys

import duckdb

COPIES = 20


def build(sf_dir: str, out: str, copies: int = COPIES, shards: int = 1) -> tuple[int, int]:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs0 AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    con.execute(f"CREATE VIEW emb0 AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')")
    n_docs = con.execute("SELECT count(*) FROM docs0").fetchone()[0]
    n_vecs = con.execute("SELECT count(*) FROM emb0").fetchone()[0]

    con.execute(
        f"""
        COPY (
          WITH reps AS (
            SELECT j.j, i.i FROM (SELECT unnest(range({shards})) AS j) j
            CROSS JOIN (SELECT unnest(range({copies})) AS i) i
          ),
          sharded AS (
            SELECT d.doc_id, r.j, r.i,
                   CASE WHEN r.j = 0 THEN d.text
                        ELSE array_to_string(
                               list_transform(string_split(d.text, ' '),
                                              t -> 's' || r.j || '_' || t), ' ')
                   END AS text,
                   d.lang, d.source
            FROM docs0 d CROSS JOIN reps r
          )
          SELECT s.doc_id + (s.j * {copies} + s.i) * {n_docs} AS doc_id,
                 CASE WHEN s.doc_id % 10 = 0 THEN s.text
                      ELSE s.text || ' copytok' || s.i END AS text,
                 s.lang, s.source,
                 CAST(length(CASE WHEN s.doc_id % 10 = 0 THEN s.text
                                  ELSE s.text || ' copytok' || s.i END) AS BIGINT) AS n_chars
          FROM sharded s
          ORDER BY 1
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          WITH reps AS (
            SELECT j.j, i.i FROM (SELECT unnest(range({shards})) AS j) j
            CROSS JOIN (SELECT unnest(range({copies})) AS i) i
          )
          SELECT e.vec_id + (r.j * {copies} + r.i) * {n_vecs} AS vec_id,
                 list_transform(
                   list_zip(e.embedding,
                            range(1, len(e.embedding) + 1)),
                   z -> (CAST(z[1] AS FLOAT)
                         + CAST((((e.vec_id * 31 + CAST(z[2] AS BIGINT) * 17 + r.i * 5) % 7) - 3)
                                AS FLOAT) * CAST(0.002 AS FLOAT) * CAST(r.i > 0 AS INTEGER))
                        * CAST(CASE WHEN r.j > 0
                                     AND (r.j * 31 + CAST(z[2] AS BIGINT) * 7) % 2 = 1
                               THEN -1 ELSE 1 END AS FLOAT)
                 ) AS embedding,
                 e.label
          FROM emb0 e CROSS JOIN reps r
          ORDER BY 1
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    nd = con.execute(f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')").fetchone()[0]
    ne = con.execute(f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')").fetchone()[0]
    return nd, ne


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else COPIES
    shards = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    nd, ne = build(sf_dir, out, copies, shards)
    print(f"wrote {out}: documents={nd} embeddings={ne}")


if __name__ == "__main__":
    main()
