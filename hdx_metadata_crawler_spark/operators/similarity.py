"""Similarity search over embedding columns (array<float>).

Engine-new surface for training-data pipelines (the reference has no
embeddings).  Two paths:

- brute-force cosine top-k: cross join queries × corpus, dot product via
  ``F.zip_with`` + ``F.aggregate`` (JVM-side, no Python).  Correct baseline;
  O(Q×N) — fine when Q is small or N fits a broadcast.
- LSH-bucketed ANN (random hyperplanes): sign-bit sketch per vector →
  candidates share a bucket → exact cosine only within buckets.  The scale
  path: shuffle key is the bucket, never all-pairs.

At 100 TB the corpus side stays partitioned; the query side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Deterministic pseudo-random hyperplanes: plane p component j derived from
# xxhash64 — avoids numpy RNG on the driver and is reproducible everywhere.


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(a: Column) -> Column:
    """float32 → float64 before any arithmetic so Spark and the DuckDB oracle
    compute in the same precision."""
    return F.transform(a, lambda x: x.cast("double"))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is broadcast (small side); ranking is a per-query-partition
    window — deterministic tie-break on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _plane_component(p: int, j: int) -> float:
    # Deterministic plane from a small LCG (stdlib-only, fixed seed).
    x = (1103515245 * (p * 1024 + j + 12345) + 12345) % (2**31)
    return (x % 2001 - 1000) / 1000.0


def lsh_bucket(vec_col: Column, dim: int, n_planes: int = 12, plane_offset: int = 0) -> Column:
    """Bucket id = integer formed by the sign bits of n_planes fixed random
    hyperplane projections (planes plane_offset..plane_offset+n_planes-1).
    Pure column algebra over literal planes."""
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.lit(0.0)
        for j in range(dim):
            proj = proj + F.element_at(vec_col, j + 1).cast("double") * F.lit(
                _plane_component(plane_offset + p, j)
            )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_tables(vec_col: Column, dim: int, n_tables: int, planes_per_table: int) -> Column:
    """OR-of-ANDs LSH: array of (table, bucket) structs — one AND-bucket per
    table, candidate iff ANY table bucket collides.  Recall for neighbors at
    angle θ: 1 - (1 - (1-θ/π)^r)^T."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(
                    vec_col, dim, planes_per_table, plane_offset=t * planes_per_table
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_tables: int = 12,
    planes_per_table: int = 3,
) -> DataFrame:
    """ANN top-k: exact cosine restricted to LSH candidates (OR-of-ANDs —
    candidate iff any of n_tables AND-buckets collides).

    The shuffle key is (table, bucket) — constant fan-out n_tables per vector,
    never all-pairs.  Recall rises with n_tables at linear candidate cost.
    """
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
        F.explode(lsh_tables(F.col(vec_col), dim, n_tables, planes_per_table)).alias("tb"),
    ).select("query_id", "qv", "tb.table", "tb.bucket")
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        F.explode(lsh_tables(F.col(vec_col), dim, n_tables, planes_per_table)).alias("tb"),
    ).select("neighbor_id", "cv", "tb.table", "tb.bucket")
    scored = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
