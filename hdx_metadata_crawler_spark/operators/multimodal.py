"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (per the engine's training-data-pipeline surface): media lives as an
opaque ``binary`` column with a typed metadata struct beside it; decode /
feature-extract / resize / frame-sample run as Arrow-batched functions over
``mapInPandas`` so each executor processes whole record batches with numpy —
never per-row Python object hops.  At 100 TB the binary column dominates I/O,
so every operator here projects the binary away as early as the semantics
allow and the parquet scan prunes it for metadata-only queries.

The actual image/audio codecs are NOT in this container, so ``decode_image``
raises NotImplementedError unless the deterministic stub is requested; the
Spark-side plumbing (schemas, batch shapes, partitioning) is real and
oracle-tested via byte-level features that DuckDB can recompute.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_kind", StringType()),  # 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """documents -> media table: payload = utf-8 bytes of the text (an
    opaque deterministic blob standing in for encoded image/audio data),
    typed metadata derived from doc stats.  Entirely JVM-side."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        "doc_id",
        kind.alias("media_kind"),
        # NULL text is pinned to b'' (same convention as operators/dedup
        # shingles): unguarded, a NULL payload reaches extract_features'
        # numpy pass and len(None) crashes the whole job instead of
        # producing an empty-media row.
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("payload"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
    )


def decode_image(payload: bytes, stub: bool = False) -> np.ndarray:
    """Decode an encoded image payload to an HxWx3 array.

    The real decoder needs an image library that is not installed in this
    container — the plumbing around it is tested with the deterministic
    stub (bytes tiled into a fixed 4x4x3 frame)."""
    if not stub:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "call with stub=True for the deterministic fake decode"
        )
    buf = np.frombuffer(payload, dtype=np.uint8)
    tiled = np.resize(buf if buf.size else np.zeros(1, dtype=np.uint8), 48)
    return tiled.reshape(4, 4, 3)


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("head_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
        StructField("mean_pixel", IntegerType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload: size, head
    byte, checksum, and the stub-decoded mean pixel.  One numpy pass per
    record batch (mapInPandas) — the pattern a real decoder plugs into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            # Fully vectorized: ONE concatenated buffer + offset math (no
            # per-payload Python lambdas).  Per-segment sums come from a
            # prefix-sum difference, which unlike np.add.reduceat is exact
            # for zero-length segments.
            n = len(payloads)
            lengths = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]) if n else np.zeros(0, np.int64)
            csum = np.concatenate([[0], np.cumsum(buf, dtype=np.int64)])
            seg_sum = csum[starts + lengths] - csum[starts]
            nonempty = lengths > 0
            safe_idx = np.where(nonempty, starts, 0)
            head = np.where(
                nonempty, buf[safe_idx] if buf.size else np.zeros(n, np.uint8), 0
            ).astype("int32")
            # mean_pixel replicates decode_image(stub=True): the payload is
            # tiled cyclically to 48 bytes (np.resize), so the tiled total is
            # full_cycles * seg_sum + sum(first `rem` bytes).
            safe_len = np.maximum(lengths, 1)
            full, rem = 48 // safe_len, 48 % safe_len
            head_sum = csum[starts + rem] - csum[starts]
            tiled_total = np.where(nonempty, full * seg_sum + head_sum, 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": lengths,
                    "head_byte": head,
                    "byte_sum_mod": (seg_sum % 1000).astype("int64"),
                    "mean_pixel": (tiled_total // 48).astype("int32"),
                }
            )

    return media.mapInPandas(batches, _FEATURE_SCHEMA)


def frame_sample(media: DataFrame, stride: int = 16) -> DataFrame:
    """Frame sampling for 'video' payloads: one row per sampled frame offset
    (every ``stride`` bytes).  The offset enumeration is pure column algebra
    (sequence + explode) so Catalyst handles it; a real frame decoder would
    consume (payload, frame_offset) pairs in a downstream mapInPandas."""
    video = media.filter(F.col("media_kind") == "video")
    # long, not int: F.length/F.sequence return int32, but the oracle (and
    # sibling media_features) emit BIGINT — and at the multi-GB payloads
    # this module documents, int32 n_bytes would overflow.  A long-typed
    # sequence makes the exploded frame_offset long without a post-cast
    # (explode cannot be nested in a cast expression).
    n_bytes = F.length("payload").cast("long")
    offsets = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(n_bytes - 1, F.lit(0).cast("long")),
        F.lit(stride).cast("long"),
    )
    return video.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.explode(offsets).alias("frame_offset"),
    )
