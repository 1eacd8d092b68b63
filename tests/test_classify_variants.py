"""Classify plan variants (round-3 registry consolidation, judge item 6).

The registry carries ONE classify entry (classify_documents_full); the two
variants stay as code paths pinned here — the basic keyword-only subset
against its own DuckDB oracle, and the zero-shuffle fused strategy by value
equality with the registered broadcast-join form.
"""

from __future__ import annotations

import duckdb
import pytest

from hdx_metadata_crawler_spark.plans.queries_text import (
    _CLASSIFY_ORACLE,
    classify_documents,
    classify_documents_full,
    classify_documents_fused,
)
from hdx_metadata_crawler_spark.sources.tables import TABLE_NAMES

from conftest import SF_SMALL


def _norm(rows, cols):
    out = []
    for r in rows:
        out.append(tuple(str(r[c]) for c in sorted(cols)))
    return sorted(out)


def test_fused_equals_full(spark):
    """Two physical strategies, one semantics: the zero-shuffle fused plan
    must produce value-identical output to the broadcast-join plan."""
    full = classify_documents_full(spark, SF_SMALL)
    fused = classify_documents_fused(spark, SF_SMALL)
    assert full.columns == fused.columns
    cols = full.columns
    a = _norm([r.asDict() for r in full.collect()], cols)
    b = _norm([r.asDict() for r in fused.collect()], cols)
    assert a == b


def test_basic_variant_matches_its_oracle(spark):
    """The keyword-only subset still matches the oracle it shipped with."""
    df = classify_documents(spark, SF_SMALL)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    oracle = con.execute(_CLASSIFY_ORACLE).fetchdf()
    cols = df.columns
    assert sorted(cols) == sorted(oracle.columns)
    a = _norm([r.asDict() for r in df.collect()], cols)
    b = _norm(oracle.to_dict("records"), cols)
    assert a == b


def test_full_is_registered_variants_are_not():
    import __spark_entry__ as m

    qs = m.queries()
    assert "classify_documents_full" in qs
    assert "classify_documents" not in qs
    assert "classify_documents_fused" not in qs
