"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``hdx_metadata_crawler_spark/``; the query registry is
``hdx_metadata_crawler_spark.plans.registry`` (each entry cites its SURVEY.md
§2 operator row).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hdx_metadata_crawler_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2, upgraded round 2 to the FULL A2 cascade):
    tag-weight broadcast join + keyword rlike scoring + org-hint substring
    join + exclusion floor → components with best-component fallback →
    candidate flag → confidence bucket, over the sf0.001 corpus."""
    from hdx_metadata_crawler_spark.plans.queries_text import classify_documents_full

    return classify_documents_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query (135/135 — the
    sketches/ANN use portable md5-derived hashes and inlined plane/k-means
    constants so DuckDB recomputes them independently; the round-4
    connected-components queries are closed against a recursive
    transitive-closure CTE; the round-5 streaming quality gate is closed
    against an append-mode per-microbatch oracle, round-5
    semantic_dedup re-runs the k-means quantizer + within-cell prune as
    chained CTEs shared with knn_ivf, and ann_recall_report nests the
    three existing top-k oracles as CTEs to score recall@3)."""
    return _registry.oracle_sql()
