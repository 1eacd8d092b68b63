"""URL canonicalization + hashing for the crawl frontier (north rule).

The reference achieves URL identity via deterministic filenames
(``01…ipynb:514-556 dataset_filename``); a web-scale frontier needs true URL
canonicalization.  The canonical form is computed JVM-side with column
expressions for the common cases; query-parameter sorting (the one step that
needs real parsing) is a vectorized pandas UDF gated behind a cheap
``contains('?')`` predicate so the overwhelmingly query-less crawl URLs never
leave the JVM.

Frontier keys are ``xxhash64(canon_url)`` (Spark builtin — 64-bit, fast,
consistent across executors), per the north rule.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _canon_one(url: str | None) -> str | None:
    if url is None:
        return None
    try:
        scheme, netloc, path, query, _frag = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = (scheme or "https").lower()
    netloc = netloc.lower()
    if netloc.endswith(":80") and scheme == "http":
        netloc = netloc[:-3]
    if netloc.endswith(":443") and scheme == "https":
        netloc = netloc[:-4]
    if not path:
        path = "/"
    if query:
        query = urlencode(sorted(parse_qsl(query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


@pandas_udf(StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(_canon_one)


def canonicalize_url(col: Column) -> Column:
    """Canonical URL: JVM fast path (lowercase scheme+host, strip fragment,
    default ports) with a pandas-UDF slow path only for URLs carrying a query
    string (needs param sorting)."""
    # JVM fast path: strip fragment, lowercase scheme://host, drop default port.
    no_frag = F.regexp_replace(F.trim(col), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    fast = F.concat(scheme, F.lit("://"), _strip_default_port(scheme, host),
                    F.when(rest == "", F.lit("/")).otherwise(rest))
    return F.when(no_frag.contains("?"), canonicalize_url_udf(no_frag)).otherwise(fast)


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
