"""Similarity-search semantics: brute-force correctness on a hand-computed
fixture, LSH-ANN recall floor against brute force."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, IntegerType, StructField, StructType

from hdx_metadata_crawler_spark.operators import similarity
from tests.conftest import SF_MEDIUM


def test_bruteforce_hand_fixture(spark):
    schema = StructType(
        [StructField("vec_id", IntegerType()), StructField("embedding", ArrayType(FloatType()))]
    )
    data = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(data, schema)
    q = df.filter(F.col("vec_id") == 0)
    out = similarity.knn_bruteforce(df, q, k=3).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [1, 2, 3]
    top = next(r for r in out if r["rank"] == 1)
    expected = (0.9) / (1.0 * math.sqrt(0.81 + 0.01))
    assert abs(top["cos_sim"] - round(expected, 4)) < 1e-9


def test_lsh_recall_floor(spark):
    """12-table × 3-plane LSH with exact re-rank must recover >=50% of true
    top-3 neighbors on sf0.01."""
    e = spark.read.parquet(f"{SF_MEDIUM}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(e, q, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_lsh(e, q, dim=64, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall={recall}"


def test_lsh_bucket_deterministic(spark):
    e = spark.read.parquet(f"{SF_MEDIUM}/embeddings.parquet").limit(20)

    def buckets():
        return {
            r["vec_id"]: r["b"]
            for r in e.select(
                "vec_id", similarity.lsh_bucket(F.col("embedding"), 64, 8).alias("b")
            ).collect()
        }

    assert buckets() == buckets()
