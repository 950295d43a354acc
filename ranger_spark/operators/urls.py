"""URL canonicalization and URL-level dedup — the first dedup pass of
every web-corpus pipeline (Common Crawl processing dedups by canonical
URL before any content hashing: re-crawls and tracking-parameter
variants of the same page are by far the cheapest duplicates to drop).

Pure built-in column expressions (regexp + split/filter/sort +
concat) — map-only JVM work; the only shuffle in ``dedup_by_url`` is
the one hash-aggregate on the canonical form. At 100 TB this runs
inside the WARC scan stage and the aggregate shuffles 8-byte digests.

Canonicalization rules (the conservative, public set every crawler
applies — c.f. RFC 3986 §6 syntax-based normalization plus the
tracking-param strip):
  * scheme and host lowercased; ``https`` folded to ``http`` (optional,
    on by default: corpus identity, not fetch semantics)
  * userinfo (``user:pass@``) dropped — credentials are fetch state,
    never page identity (and case-folding them would be wrong)
  * leading ``www.`` dropped; default ports (``:80``/``:443``) dropped
  * fragment dropped
  * tracking params removed (``utm_*``, ``gclid``, ``fbclid``,
    ``ref``, ``mc_cid``, ``mc_eid``), remaining query params sorted
    byte-wise so param order never splits a group
  * trailing ``/`` dropped from non-root paths; empty path → ``/``
  * an empty residual query drops its ``?``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# case-insensitive: ad/mail platforms emit param names in varying case
# (UTM_Source=, Fbclid=) and a case-sensitive miss would split the dedup
# group this pass exists to collapse; values stay case-significant.
# NOTE: bare ``ref`` is in the default set because it is overwhelmingly a
# referral tag on the open web, but some sites route content through it —
# pass ``strip_params`` excluding it when ``ref`` carries page identity.
DEFAULT_STRIP_PARAMS = (
    "utm_[a-z0-9_]*",
    "gclid",
    "fbclid",
    "ref",
    "mc_cid",
    "mc_eid",
)


def _strip_regex(strip_params: tuple[str, ...] | list[str]) -> str:
    return r"^(?i:" + "|".join(strip_params) + r")="


def canonicalize_url(
    col: Column | str,
    fold_https: bool = True,
    strip_params: tuple[str, ...] | list[str] = DEFAULT_STRIP_PARAMS,
) -> Column:
    """Canonical corpus identity of a URL (see module docstring) as a
    composable Column expression. Non-http(s) inputs pass through with
    only whitespace trimmed — identity for them is the raw string.

    ``strip_params`` is the tracking-parameter name list (each entry a
    case-insensitive regex fragment matched against the full param
    name); defaults to ``DEFAULT_STRIP_PARAMS``. An empty list keeps
    every query parameter."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    is_http = u.rlike(r"(?i)^https?://")
    # split once: scheme, authority, path, query, fragment
    scheme = F.lower(F.regexp_extract(u, r"(?i)^(https?)://", 1))
    if fold_https:
        scheme = F.lit("http")
    rest = F.regexp_replace(u, r"(?i)^https?://", "")
    frag_free = F.regexp_replace(rest, r"#.*$", "")
    authority = F.regexp_extract(frag_free, r"^([^/?]*)", 1)
    # userinfo first (before lowercasing — credentials are
    # case-significant and must not leak into the canonical form)
    authority = F.lower(F.regexp_replace(authority, r"^[^@]*@", ""))
    authority = F.regexp_replace(authority, r"^www\.", "")
    authority = F.regexp_replace(authority, r":(80|443)$", "")
    path = F.regexp_extract(frag_free, r"^[^/?]*([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", "$1")
    )
    query = F.regexp_extract(frag_free, r"\?(.*)$", 1)
    if strip_params:
        tracking_re = _strip_regex(strip_params)
        keep = lambda p: (p != F.lit("")) & ~p.rlike(tracking_re)  # noqa: E731
    else:
        keep = lambda p: p != F.lit("")  # noqa: E731
    kept = F.array_sort(F.filter(F.split(query, "&"), keep))
    qcanon = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), authority, path, qcanon)
    return F.when(is_http, canon).otherwise(u)


def dedup_by_url(
    df: DataFrame,
    url_col: str,
    id_col: str,
    fold_https: bool = True,
    strip_params: tuple[str, ...] | list[str] = DEFAULT_STRIP_PARAMS,
) -> DataFrame:
    """URL-level dedup groups: one row per canonical URL with the keeper
    (min id), the duplicate count, and the canonical form. The shuffle
    key is the md5 of the canonical URL — 16 bytes per row regardless
    of URL length, the same digest-shuffle shape as exact text dedup
    (operators/dedup.py:39). ``strip_params`` is forwarded to
    :func:`canonicalize_url`."""
    canon = canonicalize_url(
        F.col(url_col), fold_https=fold_https, strip_params=strip_params
    )
    # Group on the canonical URL itself: the first(canonical_url)
    # buffer of the md5-keyed form is var-length, which forces
    # SortAggregate (a sort on each side of the exchange). Keying on
    # the string keeps primitive min/count buffers (HashAggregate) and
    # shuffles the same bytes — the URL traveled as the first() buffer
    # before, as the key now. url_fp is derived after the aggregation.
    return (
        df.select(F.col(id_col), canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(
            F.md5("canonical_url").alias("url_fp"),
            "keeper_id",
            "dup_count",
            "canonical_url",
        )
    )
