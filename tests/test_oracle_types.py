"""Cross-engine TYPE parity for every registered oracle.

The driver's correctness hasher is type-sensitive: round 1's only red row
(tier_matrix) was values-equal but DuckDB-HUGEINT vs Spark-bigint.  This
gate DESCRIBEs each oracle in DuckDB and compares against the Spark result
schema — any HUGEINT/DECIMAL leaking out of a DuckDB sum()/literal, or a
float-vs-int disagreement, fails here instead of at the driver.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_MEDIUM

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
RISKY = ("HUGEINT", "DECIMAL", "INT128")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_MEDIUM}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_types_match(spark, ddb, name):
    sql = entrymod.oracle_sql()[name]
    dtypes = {d[0]: d[1] for d in ddb.execute(f"DESCRIBE {sql}").fetchall()}
    stypes = dict(entrymod.queries()[name](spark, SF_MEDIUM).dtypes)
    assert set(dtypes) == set(stypes), (
        f"column sets differ: duckdb={sorted(dtypes)} spark={sorted(stypes)}"
    )
    for col, dt in dtypes.items():
        st = stypes[col]
        assert not any(r in dt.upper() for r in RISKY), (
            f"{name}.{col}: DuckDB type {dt} (add a CAST — the driver hashes "
            f"types; spark side is {st})"
        )
        d_float = "DOUBLE" in dt.upper() or "FLOAT" in dt.upper()
        s_float = st in ("double", "float")
        assert d_float == s_float, (
            f"{name}.{col}: float-vs-int drift duckdb={dt} spark={st}"
        )
