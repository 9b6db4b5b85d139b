"""URL/domain canonicalization — the CCNet/RefinedWeb-style intake
normalizer (r6 verdict item 5; not present in the reference, which has no
web-crawl surface — SURVEY.md §2.6 "not present").

A crawl corpus refers to one resource under many spellings: scheme case,
``www.`` prefixes, default ports, tracking query parameters in arbitrary
order, fragments. URL-level dedup and host-level quota accounting both
need ONE canonical key per resource, computed map-side at full corpus
scale — so every function here is a pure native Column expression
(regexp/split/filter/array_sort — JVM, codegen'd, zero Python per row),
and each has a DuckDB-expressible twin in ``plans/url_intake.py`` so the
whole pipeline is value-oracled.

Canonical form (scheme deliberately dropped — http/https serve the same
resource for dedup purposes, the RefinedWeb convention):

    canonical_url = host_canonical + path_no_trailing_slash
                    + '?' + sorted(kept query params)   (if any kept)

where host_canonical = lowercase, ``www.`` stripped, default :80/:443
port stripped; and kept params = everything except the tracking set
(``utm_*``, ``fbclid``, ``gclid``, ``ref``).

Registrable domain uses the real PSL *algorithm* (longest matching
public suffix + one label) over a deliberately tiny built-in suffix
list — the operator shape is what scales; swapping in the full Mozilla
PSL is a data change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking query parameters stripped during canonicalization (the
#: CCNet/ad-attribution set; extend freely — the regex is anchored on the
#: param NAME so values never match). Including bare ``ref`` is a
#: deliberate CCNet-convention tradeoff: ``ref`` usually carries referral
#: attribution, but on some sites it is content-bearing (e.g. a git ref),
#: so this set can over-merge genuinely distinct resources — tune per
#: corpus if that matters more than under-deduping referral spam.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|ref)="

#: minimal public-suffix list: two-label suffixes that make the
#: registrable domain three labels long. A full deployment loads the
#: Mozilla PSL into this same set.
TWO_LABEL_SUFFIXES: tuple[str, ...] = ("co.uk", "com.au", "co.jp")


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_fragment(url: str | Column) -> Column:
    """Everything before the first ``#`` (the fragment is client-side
    only and never distinguishes resources)."""
    return F.regexp_replace(_c(url), r"#.*$", "")


def host_of(url: str | Column) -> Column:
    """Canonical host: the authority component with any ``user[:pass]@``
    userinfo stripped (credentials never distinguish resources — without
    this, ``https://alice@example.com/x`` and ``https://example.com/x``
    would get different dedup keys), lowercased, ``www.`` prefix
    stripped, default ``:80``/``:443`` port stripped. Non-default ports
    are KEPT — they address distinct origins.

    The userinfo strip is GREEDY to the last ``@`` (``^.*@``), matching
    urllib/WHATWG semantics where the hostname is everything after the
    final ``@`` of the authority — a malformed-but-scrapable
    ``https://a@b@example.com/x`` canonicalizes to host ``example.com``,
    not ``b@example.com`` (r8 advice). Safe because the authority capture
    above already excludes ``/?#``, so the greedy ``.*`` cannot cross
    into the path."""
    raw = F.regexp_extract(_c(url), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    h = F.regexp_replace(raw, r"^.*@", "")
    h = F.lower(h)
    h = F.regexp_replace(h, r"^www\.", "")
    return F.regexp_replace(h, r":(80|443)$", "")


def path_of(url: str | Column) -> Column:
    """Path component with any trailing slash removed (so ``/a/`` and
    ``/a`` collapse); the bare root path canonicalizes to ''."""
    p = F.regexp_extract(strip_fragment(url), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.regexp_replace(p, r"/$", "")


def query_canonical(url: str | Column) -> Column:
    """Query string with tracking params removed and the survivors
    sorted: split on ``&``, drop ``TRACKING_PARAM_RE`` matches and empty
    segments, ``array_sort``, rejoin. Returns '' when nothing survives."""
    q = F.regexp_extract(strip_fragment(url), r"\?([^#]*)$", 1)
    parts = F.split(q, "&")
    kept = F.filter(
        parts, lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)
    )
    return F.array_join(F.array_sort(kept), "&")


def canonical_url(url: str | Column) -> Column:
    """The dedup key: host + path + ('?' + canonical query, if any).
    Scheme and fragment dropped, see module docstring."""
    qc = query_canonical(url)
    return F.concat(
        host_of(url),
        path_of(url),
        F.when(qc == "", F.lit("")).otherwise(F.concat(F.lit("?"), qc)),
    )


def registrable_domain(host: str | Column) -> Column:
    """eTLD+1 under the built-in suffix list: three labels when the host
    ends in a listed two-label suffix (``a.b.co.uk`` -> ``b.co.uk``),
    else the last two labels. Hosts with fewer labels pass through. Any
    ``:port`` suffix (canonical hosts keep NON-default ports — distinct
    origins) is stripped first: ports address origins, never domains."""
    h = F.regexp_replace(_c(host), r":[0-9]+$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    two = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    three = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    is_listed = two.isin(*TWO_LABEL_SUFFIXES)
    return F.when(is_listed & (n >= 3), three).otherwise(two)
