"""two_phase_rank must be bit-identical to the single-task global window
rank on a total sort key, across many partitions and repeated runs."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hdx_metadata_crawler_spark.operators.ranking import two_phase_rank


def test_two_phase_rank_equals_global_window(spark):
    df = (
        spark.range(0, 5000)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("priority"),
            F.concat(F.lit("u"), F.xxhash64("id").cast("string")).alias("key"),
        )
        .repartition(16)
    )
    w = Window.orderBy("priority", "key")
    expected = {
        r["id"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    for _ in range(2):  # determinism across evaluations
        got = {
            r["id"]: r["rank"]
            for r in two_phase_rank(df, ["priority", "key"], num_partitions=8).collect()
        }
        assert got == expected


def test_two_phase_rank_empty(spark):
    df = spark.range(0).select(F.col("id"), F.lit("k").alias("key"))
    assert two_phase_rank(df, ["key"]).count() == 0
