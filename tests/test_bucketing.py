"""Bucketed co-located joins: same-bucket fact-fact join must plan with
zero Exchange nodes, and results must match the shuffled join exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.sources import bucketing
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    # Broadcast must not kick in, or the no-Exchange assertion is vacuous.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    bucketing.write_bucketed(li, "li_b", "l_orderkey", n_buckets=8)
    bucketing.write_bucketed(o, "o_b", "l_orderkey", n_buckets=8)
    yield spark
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    joined = bucketing.bucketed_join(spark, "li_b", "o_b", "l_orderkey")
    assert bucketing.join_exchanges(joined) == 0, (
        "bucketed fact-fact join must consume the bucketing with no Exchange"
    )


def test_unbucketed_join_does_shuffle(bucketed):
    """Control: the same join over plain parquet reads shuffles both sides."""
    spark = bucketed
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    assert bucketing.join_exchanges(li.join(o, "l_orderkey")) >= 2


def test_bucketed_join_results_match(bucketed):
    spark = bucketed
    got = (
        bucketing.bucketed_join(spark, "li_b", "o_b", "l_orderkey")
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2).alias("s"),
        )
        .collect()[0]
    )
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    exp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_quantity") * F.col("o_totalprice")), 2).alias("s"),
        )
        .collect()[0]
    )
    assert (got["n"], got["s"]) == (exp["n"], exp["s"])


def test_write_bucketed_recovers_from_orphaned_location(spark, tmp_path):
    """A killed run leaves the managed-table directory in the warehouse with
    no catalog entry; saveAsTable then raises LOCATION_ALREADY_EXISTS even in
    overwrite mode. write_bucketed must clear the orphan and succeed."""
    import os
    from urllib.parse import urlparse

    wh = spark.conf.get("spark.sql.warehouse.dir")
    parsed = urlparse(wh)
    wh_path = parsed.path if parsed.scheme in ("file", "") and parsed.path else wh
    orphan = os.path.join(wh_path, "orphan_b")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "debris.parquet"), "w") as f:
        f.write("not a real parquet file")
    assert not spark.catalog.tableExists("orphan_b")
    df = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    try:
        bucketing.write_bucketed(df, "orphan_b", "n_nationkey", n_buckets=4)
        assert spark.table("orphan_b").count() == df.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orphan_b")
