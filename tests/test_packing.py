"""Distributed prefix-sum sequence packing: partition-count invariance,
stream contiguity, straddle math."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.functions.text import tokenize
from hdx_metadata_crawler_spark.operators.packing import pack_sequences


def _counted(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return d.select(
        "doc_id",
        F.size(tokenize(F.coalesce(F.col("text"), F.lit("")))).alias("n_tokens"),
    )


def test_packing_partition_count_invariant(spark):
    """Any contiguous range split yields the same global cumsum — the
    result must not depend on the parallelism chosen."""
    base = _counted(spark)
    a = sorted(map(tuple, pack_sequences(base, "doc_id", "n_tokens", 256, n_parts=2).collect()))
    b = sorted(map(tuple, pack_sequences(base, "doc_id", "n_tokens", 256, n_parts=8).collect()))
    assert a == b


def test_packing_stream_contiguous(spark):
    """In doc_id order, each doc starts exactly where the previous ended."""
    rows = sorted(
        pack_sequences(_counted(spark), "doc_id", "n_tokens", 256).collect(),
        key=lambda r: r["_id"],
    )
    pos = 0
    for r in rows:
        assert r["stream_start"] == pos
        pos += r["n_tokens"]


def test_packing_straddle_math(spark):
    """Hand-checked chunk ids, offsets and straddle counts (L=10),
    including an exact-boundary doc and a zero-token drop."""
    df = spark.createDataFrame(
        [(1, 4), (2, 6), (3, 25), (4, 0), (5, 1)],
        ["doc_id", "n_tokens"],
    )
    got = {
        r["_id"]: (r["stream_start"], r["seq_start"], r["seq_end"], r["seq_offset"], r["n_seqs"])
        for r in pack_sequences(df, "doc_id", "n_tokens", 10).collect()
    }
    assert got == {
        1: (0, 0, 0, 0, 1),     # tokens 0-3
        2: (4, 0, 0, 4, 1),     # tokens 4-9: exactly fills sequence 0
        3: (10, 1, 3, 0, 3),    # tokens 10-34: straddles sequences 1-3
        5: (35, 3, 3, 5, 1),    # doc 4 dropped (0 tokens); doc 5 at offset 5
    }


def test_packing_duplicate_ids_get_distinct_slices(spark):
    """The within-partition window uses an explicit ROWS frame: duplicate
    ids are distinct rows of the stream, not RANGE peers sharing one
    cumulative value (which would overlap their slices)."""
    df = spark.createDataFrame(
        [(1, 3), (1, 4), (2, 5)], ["doc_id", "n_tokens"]
    )
    rows = sorted(
        pack_sequences(df, "doc_id", "n_tokens", 10, n_parts=1).collect(),
        key=lambda r: r["stream_start"],
    )
    assert [(r["_id"], r["stream_start"], r["n_tokens"]) for r in rows] == [
        (1, 0, 3),
        (1, 3, 4),
        (2, 7, 5),
    ]
