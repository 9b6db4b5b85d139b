"""q240 — per-domain quota ENFORCEMENT: the policy step downstream of
q238's ledger. q238 reports which registrable domains are over quota;
this query executes the RefinedWeb-style cap — keep at most ``_CAP``
documents per domain, preferring longer documents (n_chars DESC, ties
doc_id ASC — the same deterministic tie-break as q105's canonical rep),
and report what each domain kept and dropped.

Scale shape: the URL synthesis + canonicalization are the same map-side
Column pipeline as q238 (one shared SQL string, no drift); the cap is a
per-domain ``row_number`` window — ONE hash-partition shuffle on domain
(no rank-limit pushdown here BY DESIGN: the dropped-side accounting
needs every row's rank, unlike a pure top-k filter). Output is
domain-cardinality-bounded.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.url import host_of, registrable_domain
from .base import _t, query
from .url_intake import _URL_SYNTH_SQL

#: per-domain document cap (RefinedWeb caps per-domain contributions;
#: 50 bites at gate scale — several synthesized domains carry 100+ docs
#: at sf0.01 — without zeroing any domain)
_CAP = 50

_QUOTA_SQL = f"""WITH raw AS (
      SELECT doc_id, n_chars, ({_URL_SYNTH_SQL}) AS url FROM documents),
    hosted AS (
      SELECT doc_id, n_chars,
             regexp_replace(
                 regexp_replace(
                     lower(regexp_extract(regexp_replace(url, '#.*$', ''),
                                          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
                     '^www\\.', ''),
                 ':(80|443)$', '') AS host_c
      FROM raw),
    named AS (
      SELECT doc_id, n_chars,
             str_split(regexp_replace(host_c, ':[0-9]+$', ''), '.') AS labels
      FROM hosted),
    dom AS (
      SELECT doc_id, n_chars,
             CASE WHEN len(labels) >= 3
                       AND array_to_string(labels[len(labels)-1:], '.')
                           IN ('co.uk', 'com.au', 'co.jp')
                  THEN array_to_string(labels[len(labels)-2:], '.')
                  ELSE array_to_string(labels[greatest(len(labels)-1, 1):], '.')
             END AS domain
      FROM named),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY domain
                                   ORDER BY n_chars DESC, doc_id) AS rn
      FROM dom)
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn <= {_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rn > {_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           CAST(sum(CASE WHEN rn <= {_CAP} THEN n_chars ELSE 0 END) AS BIGINT)
               AS chars_kept,
           CAST(sum(CASE WHEN rn > {_CAP} THEN n_chars ELSE 0 END) AS BIGINT)
               AS chars_dropped
    FROM ranked GROUP BY domain ORDER BY domain"""


@query(
    "q240_domain_quota_enforce",
    _QUOTA_SQL,
    tags=("intake", "url", "quota", "window", "curation"),
)
def q240(spark, sf):
    """Per-domain keep/drop ledger under the _CAP-docs-per-domain policy:
    (domain, n_docs, n_kept, n_dropped, chars_kept, chars_dropped),
    keep-preference (n_chars DESC, doc_id ASC)."""
    docs = _t(spark, sf, "documents").select(
        "doc_id", "n_chars", F.expr(_URL_SYNTH_SQL).alias("url")
    )
    dom = docs.select(
        "doc_id",
        "n_chars",
        registrable_domain(host_of("url")).alias("domain"),
    )
    w = Window.partitionBy("domain").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    kept = F.col("rn") <= _CAP
    return (
        dom.withColumn("rn", F.row_number().over(w))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum((~kept).cast("long")).alias("n_dropped"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0))).alias(
                "chars_kept"
            ),
            F.sum(F.when(~kept, F.col("n_chars")).otherwise(F.lit(0))).alias(
                "chars_dropped"
            ),
        )
        .orderBy("domain")
    )
