"""URL canonicalization + hashing for the crawl frontier (north rule).

The reference achieves URL identity via deterministic filenames
(``01…ipynb:514-556 dataset_filename``); a web-scale frontier needs true URL
canonicalization.  The canonical form is FULL column algebra — including
query-parameter sorting (split on '&' → array_sort → array_join), so no row
ever leaves the JVM.  (Round 1 gated a pandas UDF behind a
``F.when(contains('?'), udf(...))`` predicate — but Spark's
ExtractPythonUDFs rule HOISTS Python UDFs out of conditionals and evaluates
them on EVERY row, so the 'gate' shipped 100% of URLs through Arrow anyway,
verified empirically.  The lesson is recorded here because the pattern looks
correct and silently is not.)

Canonical form: https-defaulted lowercase scheme, lowercase host, default
port stripped (http:80 / https:443), fragment stripped, empty path → '/',
query params sorted bytewise.  ``canonicalize_url_py`` is the same function
in plain Python — the property-test reference implementation.

Frontier keys are ``xxhash64(canon_url)`` (Spark builtin — 64-bit, fast,
consistent across executors), per the north rule.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII whitespace only — the Java \s class the column expression trims.
# (str.strip() with no args also strips unicode spaces like NBSP, which the
# JVM side would keep: the two sides must disagree on NO input.)
_ASCII_WS = " \t\n\r\x0b\x0c"
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def canonicalize_url_py(url: str | None) -> str | None:
    """Plain-Python reference implementation of the canonical form (used by
    property tests and the crawl simulator — byte-identical to the column
    expression by construction)."""
    if url is None:
        return None
    u = url.strip(_ASCII_WS)
    u = u.split("#", 1)[0]
    # ANCHORED scheme test, like the column expression's rlike — a bare
    # '"://" in u' would treat 'h.org/r?next=https://b.com' (a '://' in the
    # QUERY) as schemed and partition at the wrong place, silently diverging
    # from the engine's canon_url/url_hash for redirect-style URLs.
    if not _SCHEME_RE.match(u):
        u = "https://" + u
    scheme, _, rest = u.partition("://")
    scheme = scheme.lower()
    hostpart, sep, tail = rest.partition("/")
    tail = sep + tail  # '' or '/...'
    if "?" in hostpart:  # query directly after host, no path
        hostpart, _, q = hostpart.partition("?")
        tail = "?" + q
    host = hostpart.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    if scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path, qsep, query = tail.partition("?")
    if not path:
        path = "/"
    if qsep:
        query = "&".join(sorted(query.split("&")))
        return f"{scheme}://{host}{path}?{query}"
    return f"{scheme}://{host}{path}"


def canonicalize_url(col: Column) -> Column:
    """Canonical URL, entirely JVM-side (no Python in the hot path)."""
    # \s-trim, not F.trim: trim() strips only ' ' and a tab/newline-padded
    # URL would keep its padding, fail the anchored scheme match, and
    # canonicalize differently from the Python reference's strip
    no_frag = F.regexp_replace(
        F.regexp_replace(col, r"^\s+|\s+$", ""), r"#.*$", ""
    )
    # scheme-less input defaults to https:// — without this, the extraction
    # regexes all miss and every scheme-less URL collapsed to ':///' with
    # ONE shared url_hash (silent frontier dedup of distinct URLs).
    with_scheme = F.when(
        no_frag.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), no_frag
    ).otherwise(F.concat(F.lit("https://"), no_frag))
    scheme = F.lower(
        F.regexp_extract(with_scheme, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = F.lower(
        F.regexp_extract(with_scheme, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    rest = F.regexp_extract(
        with_scheme, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        _strip_default_port(scheme, host),
        path,
        F.when(rest.contains("?"), F.concat(F.lit("?"), sorted_query)).otherwise(
            F.lit("")
        ),
    )


def _strip_default_port(scheme: Column, host: Column) -> Column:
    return (
        F.when((scheme == F.lit("http")) & host.rlike(r":80$"),
               F.regexp_replace(host, r":80$", ""))
        .when((scheme == F.lit("https")) & host.rlike(r":443$"),
              F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )


def url_hash(canon_col: Column) -> Column:
    """64-bit frontier key (north rule: xxhash64 of canonicalized URL)."""
    return F.xxhash64(canon_col)


def url_host(col: Column) -> Column:
    """Host component (politeness-scheduling partition key)."""
    return F.lower(F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))
