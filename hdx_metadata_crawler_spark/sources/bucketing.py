"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders on
orderkey; frontier ⋈ seen on url_hash) is the shuffle of both sides.
Writing both tables bucketed by the join key with the same bucket count
pre-co-locates matching keys: Spark's scan exposes the bucketing as an
output partitioning, and the SortMergeJoin consumes it with NO Exchange on
either side.  The crawl engine's analogue is keeping `frontier` and `seen`
hash-partitioned by ``pmod(url_hash, P)`` across rounds (bloom.py uses the
same partition function), so every round's anti-join lines up.

Bucketing requires a table catalog (`saveAsTable`); callers pass a
warehouse-backed SparkSession.  `join_exchanges(df)` is the test hook: it
counts Exchange nodes in the join's physical plan, and the bucketing tests
assert it returns ZERO for the bucketed join (vs >= 2 for the plain-parquet
control).
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clear_orphaned_location(spark: SparkSession, table: str) -> None:
    """Remove a managed-table directory that survives without catalog
    metadata (a killed run's debris): the in-memory catalog forgets the
    table on restart but the warehouse path persists, and ``saveAsTable``
    then fails with LOCATION_ALREADY_EXISTS even in overwrite mode.

    Only unqualified (default-database) names are auto-cleared: a
    db-qualified name's managed location lives under ``<db>.db/``, and
    mapping it naively to ``<warehouse>/<name>`` could rmtree a LIVE
    default-database table that happens to share the trailing segment."""
    if "." in table:
        return  # qualified name: let saveAsTable surface any orphan
    if spark.catalog.tableExists(table):
        return  # catalog owns it; overwrite mode handles this case
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    parsed = urlparse(wh)
    wh_path = parsed.path if parsed.scheme in ("file", "") and parsed.path else wh
    loc = os.path.join(wh_path, table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8, sort: bool = True
) -> None:
    _clear_orphaned_location(df.sparkSession, table)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), key)


def join_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange nodes in the FINAL executed plan.

    Two traps the naive ``plan.count('Exchange')`` falls into: (a) with AQE
    on (session.py default) the pre-action plan is not final
    (isFinalPlan=false) — the frame is collected first so the adaptive plan
    has settled; (b) ``BroadcastExchange``/``ReusedExchange`` are not
    shuffles and must not count (a broadcast join would read as 1 'shuffle')
    — only partitioning exchanges match."""
    import re

    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # An AdaptiveSparkPlan's toString appends the pre-adaptive plan under an
    # "== Initial Plan ==" header — counting past it doubles every node.
    plan = plan.split("== Initial Plan ==")[0]
    return len(
        re.findall(
            r"\bExchange (hashpartitioning|rangepartitioning|"
            r"RoundRobinPartitioning|SinglePartition)",
            plan,
        )
    )
