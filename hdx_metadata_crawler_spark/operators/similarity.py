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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

# Deterministic pseudo-random hyperplanes: plane p component j derived from
# a fixed LCG — no RNG state, reproducible on every executor.


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


def _plane_matrix(dim: int, n_planes: int, plane_offset: int = 0) -> np.ndarray:
    """(dim × n_planes) hyperplane matrix — identical values on every executor."""
    return np.array(
        [
            [_plane_component(plane_offset + p, j) for p in range(n_planes)]
            for j in range(dim)
        ],
        dtype=np.float64,
    )


def lsh_buckets(
    vec_col: Column, dim: int, n_tables: int = 12, planes_per_table: int = 3,
    plane_offset: int = 0,
) -> Column:
    """OR-of-ANDs LSH sketch: array of n_tables bucket ids (one AND-bucket of
    planes_per_table sign bits per table); a pair is a candidate iff ANY table
    bucket collides.  Recall for neighbors at angle θ: 1-(1-(1-θ/π)^r)^T.

    One Arrow-batched numpy matmul per batch — n_tables×planes_per_table×dim
    multiplies stay vectorized instead of becoming thousands of Catalyst
    expression nodes (which blew whole-stage codegen's 64 KB method limit and
    ran ~100× slower when expressed as column algebra)."""
    planes = _plane_matrix(dim, n_tables * planes_per_table, plane_offset)
    shifts = np.int64(1) << np.arange(planes_per_table, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ planes > 0).astype(np.int64)  # (n, tables*r)
        per_table = bits.reshape(len(vecs), n_tables, planes_per_table)
        out = (per_table * shifts).sum(axis=2)  # (n, tables)
        return pd.Series(list(out))

    return _buckets(vec_col)


def lsh_bucket(vec_col: Column, dim: int, n_planes: int = 12, plane_offset: int = 0) -> Column:
    """Single-table bucket id (sign-bit integer of n_planes projections)."""
    return F.element_at(
        lsh_buckets(vec_col, dim, n_tables=1, planes_per_table=n_planes,
                    plane_offset=plane_offset),
        1,
    )


def cosine_pairs_block(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold via block-broadcast GEMM.

    One side is broadcast as a dense normalized matrix (numpy); the other
    side streams through mapInPandas, and each Arrow batch does ONE matmul
    against the broadcast block, emitting only (id_a < id_b, sim >= t)
    pairs.  This replaces the row-at-a-time ``zip_with`` dot product
    (measured 65 s for 2k x 2k pairs at sf0.1 — higher-order-function
    allocation per element) with a vectorized kernel (<1 s).  At 100 TB the
    broadcast side is tiled into fixed-size blocks and the same stage runs
    once per block — compute stays the same, memory stays bounded.
    """
    import pandas as pd  # noqa: F811 — local so pickling the closure is cheap

    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bc_ids = spark.sparkContext.broadcast(ids)
    bc_mat = spark.sparkContext.broadcast(mat)

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def batches(it):
        all_ids, all_mat = bc_ids.value, bc_mat.value
        for pdf in it:
            q = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ all_mat.T  # (batch, N)
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            bi, bj = np.nonzero(
                (np.round(sims, 4) >= threshold) & (qids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": qids[bi],
                    "id_b": all_ids[bj],
                    "cos_sim": np.round(sims[bi, bj], 4),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(batches, out_schema)


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
        F.posexplode(
            lsh_buckets(F.col(vec_col), dim, n_tables, planes_per_table)
        ).alias("table", "bucket"),
    )
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        F.posexplode(
            lsh_buckets(F.col(vec_col), dim, n_tables, planes_per_table)
        ).alias("table", "bucket"),
    )
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
