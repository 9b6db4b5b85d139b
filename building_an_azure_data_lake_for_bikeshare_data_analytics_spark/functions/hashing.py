"""The suite's cross-engine 60-bit integer hash — single-sourced.

``h60(col)`` is the load-bearing contract used by every sketch/sampling
operator (KMV, HLL, theta, rendezvous, checksums, join-size estimation):
the first 15 hex chars of md5 parsed as an integer, which DuckDB computes
identically as ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``
(``H60_SQL`` is that oracle-side template). Any drift between a Spark
copy and its oracle silently breaks exactly one gate row — hence one
definition here instead of per-query copies.

Integer-division note: deriving buckets/words from h MUST use integer
``div`` (``F.expr("h div 256")``), never ``(h / 256).cast("long")`` — the
double round-trip loses precision for h >= 2^53 and lands on
floor(h/m) +- 1 (review-confirmed on real md5 hashes), which flips
bit-length-derived register values whenever the true quotient sits next
to a power of two.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB-side rendering of the same hash; format with the value expression
H60_SQL = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


def h60(col: Column | str) -> Column:
    """60-bit md5 integer hash of the column rendered as a string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
