"""Similarity-search queries over the `embeddings` table (engine-new)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..sources.tables import load_table
from .registry import register

_KNN_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
     idx AS (SELECT unnest(range(1, 65)) AS i),
     qd AS (SELECT query_id, i, CAST(qv[i] AS DOUBLE) AS x FROM q CROSS JOIN idx),
     cd AS (SELECT neighbor_id, i, CAST(cv[i] AS DOUBLE) AS x FROM c CROSS JOIN idx),
     dots AS (SELECT query_id, neighbor_id, sum(qd.x * cd.x) AS d
              FROM qd JOIN cd ON qd.i = cd.i
              WHERE query_id <> neighbor_id
              GROUP BY query_id, neighbor_id),
     norms AS (SELECT query_id AS id, sqrt(sum(x * x)) AS nrm FROM qd GROUP BY query_id),
     cnorms AS (SELECT neighbor_id AS id, sqrt(sum(x * x)) AS nrm FROM cd GROUP BY neighbor_id),
     scored AS (
       SELECT query_id, neighbor_id,
              round(coalesce(d / nullif(qn.nrm * cn.nrm, 0), 0), 4) AS cos_sim
       FROM dots JOIN norms qn ON dots.query_id = qn.id
                 JOIN cnorms cn ON dots.neighbor_id = cn.id)
SELECT query_id, neighbor_id, cos_sim, rank
FROM (SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= 3
"""


@register(
    "knn_bruteforce",
    _KNN_ORACLE,
    doc="Exact top-3 cosine neighbors for 10 query vectors — brute-force "
        "baseline: broadcast queries × partitioned corpus, zip_with dot "
        "product (JVM, no Python), per-query window rank.",
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.knn_bruteforce(e, q, k=3)


@register(
    "knn_lsh",
    None,  # approximate — recall vs knn_bruteforce asserted in tests/
    doc="ANN top-3 via multi-table random-hyperplane LSH (12 tables × 3 "
        "planes, OR-of-ANDs): exact cosine only within colliding buckets — "
        "the shuffle-on-(table,bucket) scale path. Rows-only driver check; "
        "recall floor vs brute force asserted in tests/test_similarity.py.",
)
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.knn_lsh(e, q, dim=64, k=3)


@register(
    "knn_ivf",
    None,  # approximate + iterative (k-means) — recall asserted in tests/
    doc="ANN top-3 via IVF: deterministic Lloyd k-means coarse quantizer "
        "(16 cells, 4 distributed passes — per-pass Arrow argmin vs the "
        "broadcast centroid block + one per-cell aggregate), corpus "
        "partitioned by cell, queries probe their 4 nearest cells, exact "
        "cosine only within probed cells. The second scale path beside "
        "knn_lsh: candidates ~ n_probe/n_cells of the corpus per query. "
        "Rows-only driver check; recall floor vs brute force asserted in "
        "tests/test_similarity.py.",
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return similarity.knn_ivf(e, q, dim=64, k=3, n_cells=16, n_probe=4)


@register(
    "label_centroid_stats",
    """
    SELECT label,
           count(*) AS n_vecs,
           round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS avg_dim0,
           round(avg(CAST(embedding[64] AS DOUBLE)), 4) AS avg_dim63
    FROM embeddings
    GROUP BY label
    """,
    doc="Per-label embedding stats (centroid components) — vector column "
        "aggregation staying JVM-side.",
)
def label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 4).alias("avg_dim0"),
        F.round(F.avg(F.element_at("embedding", 64).cast("double")), 4).alias("avg_dim63"),
    )
