"""Multimodal plumbing semantics: stub gating, deterministic features,
frame-sample shape, and binary-column pruning."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.operators import multimodal
from tests.conftest import SF_SMALL


def test_decode_image_gated():
    """The real codec path must be explicitly unavailable, not silently fake."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x01\x02\x03")


def test_decode_image_stub_deterministic():
    a = multimodal.decode_image(b"abcdef", stub=True)
    b = multimodal.decode_image(b"abcdef", stub=True)
    assert a.shape == (4, 4, 3)
    assert np.array_equal(a, b)
    # tiling: first bytes of the payload appear verbatim
    assert a.flatten()[0] == ord("a")


def test_features_match_bytes(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(20)
    media = multimodal.synthesize_media(docs)
    feats = {r["doc_id"]: r for r in multimodal.extract_features(media).collect()}
    for row in docs.collect():
        payload = row["text"].encode("utf-8")
        f_row = feats[row["doc_id"]]
        assert f_row["n_bytes"] == len(payload)
        assert f_row["head_byte"] == payload[0]
        assert f_row["byte_sum_mod"] == sum(payload) % 1000
        assert f_row["mean_pixel"] == int(
            multimodal.decode_image(payload, stub=True).mean()
        )


def test_frame_sample_offsets(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(30)
    media = multimodal.synthesize_media(docs)
    frames = multimodal.frame_sample(media, stride=16)
    rows = frames.collect()
    assert rows, "expected at least one video doc in the first 30"
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_offset"])
    for doc_id, offs in by_doc.items():
        n = next(r["n_bytes"] for r in rows if r["doc_id"] == doc_id)
        assert sorted(offs) == list(range(0, max(n - 1, 0) + 1, 16))


def test_metadata_query_prunes_payload(spark):
    """media_kind_stats never reads the binary column: the optimized plan's
    scan schema must not contain the payload/text bytes."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    media = multimodal.synthesize_media(docs).drop("payload")
    agg = media.groupBy("media_kind").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan
