"""Registry contract: every query runs at sf0.001, entry() works, and every
oracle key has a matching query key (driver contract)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "score_max" in df.columns and "confidence" in df.columns


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_small(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_SMALL)
    # schema resolves and the query executes end-to-end
    df.limit(3).collect()
    assert df.columns
