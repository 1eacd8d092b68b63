"""Readers for the driver-generated parquet test tables (TESTDATA.md).

Mirrors the reference's deterministic directory scans (SURVEY.md §2.1 S4,
``02…ipynb`` cell-3-1 ``iter_json_files`` with ``sorted(glob)``) — except
ordering is irrelevant under Spark's set semantics, so we just scan.  Column
pruning and predicate pushdown reach the parquet reader automatically because
every downstream query is declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all test tables as temp views so spark.sql() can use them."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
