"""Regex-dialect parity for the signal bank (SURVEY §7.4 risk 3): every
fused pattern must match IDENTICALLY under Python re (the reference's
engine), Java regex (Spark rlike), and RE2 (the DuckDB oracle), across
fixture strings that exercise word boundaries, case flags, separators and
digit suffixes."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.functions.signal_bank import (
    N_PATTERNS,
    SECTIONS,
    SIGNAL_BANK,
    fuse_value_patterns,
    fused_bank,
    is_common_dialect,
    translate_pattern,
)

FIXTURES = [
    "table scan fast merge window",
    "TABLE SCAN",                     # case-flag branches only
    "tablescan",                      # boundary: no \b between the words
    "table-scan merge12 join",        # .? separator + digit suffix
    "prefixtable table",              # \b at start of second token only
    "stream batch stream  batch",     # double space (\s+ form)
    "",                               # empty
    "key agg row sort spark vector customer query big group filter",
    "hash merge hash-merge hashXmerge",
    "value part value6 part99 value123",
]


def test_bank_is_at_reference_scale():
    assert len(SECTIONS) == 11
    assert N_PATTERNS >= 300
    fused = fused_bank()
    assert len(fused) == 11 * 8
    # fusion is a real reduction: one probe per value, not per pattern
    assert len(fused) * 3 <= N_PATTERNS


def test_translate_pattern_rules():
    # leading global flag becomes the scoped form (identical in all engines)
    assert translate_pattern(r"(?i)\bWORD\b") == r"(?i:\bWORD\b)"
    # already-common patterns pass through
    assert translate_pattern(r"\b(a|b)\b") == r"\b(a|b)\b"
    # engine-specific constructs are refused (pandas-UDF fallback territory):
    # backrefs (numeric + named), lookaround, possessive, atomic groups,
    # Java named groups, and Python-only inline flags (a/L/u/x)
    for bad in (
        r"(a)\1", r"(?=x)y", r"(?<=x)y", r"a*+b",
        r"(?P<g>fl)(?P=g)", r"(?>ab)c", r"(?<name>x)y",
        r"(?x)\bflood\b", r"(?u)\bword\b",
    ):
        assert not is_common_dialect(bad), bad
        with pytest.raises(ValueError):
            translate_pattern(bad)
    # common-dialect flags still translate
    assert translate_pattern(r"(?is)\bA.B\b") == r"(?is:\bA.B\b)"


def test_python_vs_spark_vs_duckdb_parity(spark):
    """The fixture test §7.4 #3 asks for: every fused pattern evaluated on
    every fixture string must agree across the three engines."""
    bank = fused_bank()
    fx = spark.createDataFrame([(i, s) for i, s in enumerate(FIXTURES)], ["i", "s"])
    # chunk the rlike columns so one collect covers all (pattern, fixture)
    cols = [
        F.col("s").rlike(pat).alias(f"p{k}") for k, (_, _, pat, _) in enumerate(bank)
    ]
    rows = fx.select("i", *cols).collect()
    spark_hits = {
        (r["i"], k): r[f"p{k}"] for r in rows for k in range(len(bank))
    }

    con = duckdb.connect()
    for k, (_, _, pat, _) in enumerate(bank):
        compiled = re.compile(pat)
        for i, s in enumerate(FIXTURES):
            py = compiled.search(s) is not None
            jv = spark_hits[(i, k)]
            ddb = con.execute(
                "SELECT regexp_matches(?, ?)", [s, pat]
            ).fetchone()[0]
            assert py == jv == ddb, (
                f"dialect drift: pattern={pat!r} fixture={s!r} "
                f"python={py} java={jv} re2={ddb}"
            )


def test_fusion_equals_member_or(spark):
    """The fused alternation is exactly the OR of its member patterns."""
    sec = SECTIONS[0]
    for value, info in SIGNAL_BANK[sec].items():
        fused = re.compile(fuse_value_patterns(info["patterns"]))
        members = [re.compile(translate_pattern(p)) for p in info["patterns"]]
        for s in FIXTURES:
            assert (fused.search(s) is not None) == any(
                m.search(s) for m in members
            ), (value, s)
