"""Multimodal queries over the synthesized media table (binary payload +
typed metadata).  Oracles recompute the byte-level features in DuckDB from
the same source text (payload = utf-8 bytes of ASCII text, so byte i ==
ascii(char i))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..sources.tables import load_table
from .registry import register


@register(
    "media_features",
    """
    WITH t0 AS (SELECT doc_id, coalesce(text, '') AS text FROM documents)
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_kind,
           CAST(len(text) AS BIGINT)  AS n_bytes,
           ascii(substr(text, 1, 1))  AS head_byte,
           -- len=0 guard: sum over an empty unnest is NULL in SQL, but the
           -- engine's numpy sum over b'' is 0 — pin the empty-payload
           -- checksum to 0 on both sides
           CASE WHEN len(text) = 0 THEN 0
                ELSE CAST((SELECT sum(ascii(substr(text, CAST(i AS INT), 1)))
                           FROM unnest(range(1, len(text) + 1)) AS t(i)) % 1000
                     AS BIGINT)
           END                        AS byte_sum_mod,
           CASE WHEN len(text) = 0 THEN 0
                ELSE CAST(floor((SELECT avg(ascii(substr(text,
                            CAST(i % len(text) + 1 AS INT), 1)))
                     FROM unnest(range(0, 48)) AS t(i))) AS INT)
           END                        AS mean_pixel
    FROM t0
    """,
    doc="Binary-payload feature extraction via Arrow-batched mapInPandas "
        "(engine-new multimodal surface): size, head byte, checksum, and the "
        "stub-decoded mean pixel (decode_image stub — the real codec is "
        "NotImplementedError-gated; see operators/multimodal.py). Oracle "
        "recomputes every feature byte-for-byte from the source text, "
        "including the stub's cyclic 48-byte tiling (np.resize semantics) so "
        "the two sides agree at EVERY text length, not just len >= 48.",
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(d)
    return multimodal.extract_features(media)


@register(
    "frame_offsets",
    """
    SELECT doc_id,
           CAST(len(coalesce(text, '')) AS BIGINT) AS n_bytes,
           CAST(frame_offset AS BIGINT) AS frame_offset
    FROM documents,
         unnest(range(0, greatest(len(coalesce(text, '')) - 1, 0) + 1, 16))
           AS t(frame_offset)
    WHERE doc_id % 3 = 2
    """,
    doc="Video frame sampling: one row per stride-16 byte offset "
        "(sequence + explode — pure column algebra; a real frame decoder "
        "consumes the (payload, offset) pairs downstream).",
)
def frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(d)
    return multimodal.frame_sample(media, stride=16)


@register(
    "media_kind_stats",
    """
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_kind,
           count(*) AS n_media,
           round(avg(n_chars % 640 + 1), 4) AS avg_width,
           round(avg(n_chars % 480 + 1), 4) AS avg_height
    FROM documents
    GROUP BY 1
    """,
    doc="Metadata-only media stats — the query never touches the binary "
        "payload, so at scale the parquet scan prunes the blob column "
        "entirely (ReadSchema shows width/height/kind only).",
)
def media_kind_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(d).drop("payload")
    return media.groupBy("media_kind").agg(
        F.count("*").alias("n_media"),
        F.round(F.avg("width"), 4).alias("avg_width"),
        F.round(F.avg("height"), 4).alias("avg_height"),
    )
