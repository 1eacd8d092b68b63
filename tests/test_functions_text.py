"""Text-function semantics: sanitize/slugify/mojibake/NFKD unit fixtures plus
hypothesis property tests (slugify output charset, sanitize idempotence,
URL-canonicalization idempotence)."""

from __future__ import annotations

import re
import unicodedata
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.functions import text as T
from hdx_metadata_crawler_spark.functions.url import canonicalize_url


def _apply(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r["out"] for r in df.select(col_fn(F.col("s")).alias("out")).collect()]


def test_sanitize_fixtures(spark):
    got = _apply(
        spark,
        T.sanitize_text,
        [
            "<b>Flood</b> &amp; <i>drought</i>",
            "a&nbsp;b&lt;c&gt;d&quot;e&#39;f",
            "curly ‘q’ “d” – dash … end",
            "  lots   of\t\twhitespace  ",
        ],
    )
    assert got == [
        'Flood & drought',
        'a b<c>d"e\'f',
        "curly 'q' \"d\" - dash ... end",
        "lots of whitespace",
    ]


def test_slugify_fixtures(spark):
    got = _apply(spark, lambda c: T.slugify(c, 20), ["Hello, World! 42", "--a__b--"])
    assert got == ["hello_world_42", "a_b"]


def test_mojibake_repair(spark):
    # 'é' mis-decoded as cp1252 shows as 'Ã©'; repair restores it.
    got = _apply(spark, T.repair_text, ["cafÃ©", "plain ascii"])
    assert got == ["café", "plain ascii"]


def test_nfkd_lower(spark):
    got = _apply(spark, T.nfkd_lower, ["Ｆｕｌｌｗｉｄｔｈ", "Ligature ﬁle"])
    assert got == [
        unicodedata.normalize("NFKD", "Ｆｕｌｌｗｉｄｔｈ").lower(),
        unicodedata.normalize("NFKD", "Ligature ﬁle").lower(),
    ]


@settings(max_examples=25, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_slugify_charset_property(spark, s):
    """Property: slugify output matches ^[a-z0-9_]*$ and never starts/ends
    with '_' (08…ipynb slug contract), for arbitrary unicode input."""
    [out] = _apply(spark, lambda c: T.slugify(c, 80), [s])
    assert re.fullmatch(r"[a-z0-9_]*", out or "")
    assert not (out or "").startswith("_") and not (out or "").endswith("_")


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), min_size=0, max_size=60))
def test_sanitize_idempotent_property(spark, s):
    """Property: sanitize(sanitize(x)) == sanitize(x) — the chain is a
    normal form, required for the two-stage prefilter design (SURVEY P3)."""
    [once] = _apply(spark, T.sanitize_text, [s])
    [twice] = _apply(spark, T.sanitize_text, [once])
    assert twice == once


_URL = st.builds(
    lambda scheme, host, path, q, frag: f"{scheme}://{host}/{path}?b=2&a={q}#{frag}",
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.sampled_from(["Example.COM", "hdx.HumData.org:443", "a.b.c:8080"]),
    st.text(alphabet="abcXYZ019/", min_size=0, max_size=20),
    st.integers(0, 99),
    st.text(alphabet="abc", min_size=0, max_size=5),
)


@settings(max_examples=25, deadline=None)
@given(_URL)
def test_canonicalize_idempotent_property(spark, url):
    """Property: canonicalization is idempotent — canon(canon(u)) == canon(u).
    The URL-seen set keys on xxhash64(canon), so a non-idempotent canon
    would split one URL across two seen-set entries (north rule)."""
    df = spark.createDataFrame([(url,)], ["u"])
    [once] = [
        r["c"] for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()
    ]
    df2 = spark.createDataFrame([(once,)], ["u"])
    [twice] = [
        r["c"] for r in df2.select(canonicalize_url(F.col("u")).alias("c")).collect()
    ]
    assert twice == once


def test_canonicalize_matches_python_reference(spark):
    """The column expression and canonicalize_url_py are the same function —
    including the scheme-less default (round-1 fast path collapsed every
    scheme-less URL to ':///' with ONE shared hash) and query sorting."""
    from hdx_metadata_crawler_spark.functions.url import canonicalize_url_py

    fixtures = [
        "HTTPS://Hdx.HumData.org:443/dataset/7?format=json&page=1#frag",
        "http://Example.COM:80/a/b?z=9&a=1&a=0",
        "https://example.org",                   # no path
        "https://example.org?x=1",               # query, no path
        "example.org/page1",                     # scheme-less
        "example.org/page2",                     # scheme-less, distinct
        "  https://pad.example.org/x  ",         # whitespace
        "https://h/p?",                          # empty query
        "https://h/p?single",                    # bare param
        # round-3 review regressions:
        "hdx.humdata.org/r?next=https://b.com",  # '://' in the QUERY of a
                                                 # scheme-less URL (redirect
                                                 # param) — anchored scheme
                                                 # detection on both sides
        "\thttps://tab.example.org/x\n",         # tab/newline padding —
                                                 # \s-trim on both sides
    ]
    df = spark.createDataFrame([(u,) for u in fixtures], ["u"])
    got = [
        r["c"] for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()
    ]
    expected = [canonicalize_url_py(u) for u in fixtures]
    assert got == expected
    # the two scheme-less URLs must stay DISTINCT after canonicalization
    assert got[4] != got[5]


def test_politeness_salt_matches_spark(spark):
    """zlib.crc32 == Spark crc32 for the politeness salt (the simulator's
    parity depends on this exact equality)."""
    urls = [f"https://h{i}.example.org/x{i}" for i in range(50)]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    got = {
        r["u"]: r["c"]
        for r in df.select(
            "u", F.crc32(F.encode("u", "utf-8")).alias("c")
        ).collect()
    }
    for u in urls:
        assert got[u] == zlib.crc32(u.encode("utf-8"))
