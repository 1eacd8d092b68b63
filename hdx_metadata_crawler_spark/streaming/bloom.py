"""Partitioned Bloom-filter URL-seen set (north rule).

Design for the 10^10-URL frontier (SURVEY §4 physical strategy 1):

- The seen set is hash-partitioned: partition p owns url_hashes with
  ``pmod(url_hash, P) == p``.  Each partition materializes an m-bit Bloom
  bitset (k hash probes via Kirsch-Mitzenmacher double hashing h1 + i*h2).
  At 10^10 keys / P=4096 partitions / 10 bits-per-key, each partition bitset
  is ~3 GB total across the cluster and ~750 KB per partition — buildable
  with one ``applyInPandas`` pass and broadcastable in aggregate.
- Probe path: candidates are checked against the broadcast bitsets in a
  vectorized Arrow batch (numpy bit math, no per-row Python).  Bloom-NEGATIVE
  candidates are *definitely unseen* — they skip the exact join entirely.
  Bloom-POSITIVE candidates (true hits + ~1% false positives) are rescued
  with an exact anti-join on url_hash so a false positive can NEVER silently
  drop a URL (SURVEY §7.4 risk 2).
- In local tests P is small; the partitioning/probe mechanics are identical.

Deletion support (the cuckoo-filter fallback named by the north rule) lives
in ``cuckoo.py``: same partitioning and probe/rescue contract, 16-bit
partial-key cuckoo tables with true ``remove`` — swap ``build_blooms`` /
``bloom_anti_join`` for ``build_cuckoos`` / ``cuckoo_anti_join`` when the
crawl needs to retract seen-set entries (content expiry, seed retraction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

K_HASHES = 7


def _probe_positions(hashes: np.ndarray, m: int) -> np.ndarray:
    """(n, K) bit positions via double hashing; hashes is uint64."""
    h1 = (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((hashes >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    i = np.arange(K_HASHES, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def build_blooms(
    seen: DataFrame,
    hash_col: str = "url_hash",
    n_partitions: int = 16,
    bits_per_key_budget_keys: int = 4096,
) -> DataFrame:
    """seen(url_hash) → blooms(partition_id, m, bitset binary).

    m is sized for ``bits_per_key_budget_keys`` keys/partition at 10 bits/key
    (~1% FP at k=7); the production path would size from
    ``approx_count_distinct`` per partition instead of a constant.
    """
    m = max(1024, 10 * bits_per_key_budget_keys)
    schema = StructType(
        [
            StructField("partition_id", IntegerType()),
            StructField("m", LongType()),
            StructField("bitset", BinaryType()),
        ]
    )

    def build_one(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m, dtype=bool)
        hashes = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        if len(hashes):
            pos = _probe_positions(hashes, m)
            bits[pos.ravel()] = True
        return pd.DataFrame(
            {"partition_id": [key[0]], "m": [m], "bitset": [np.packbits(bits).tobytes()]}
        )

    return (
        seen.withColumn("partition_id", F.pmod(F.col(hash_col), F.lit(n_partitions)).cast("int"))
        .groupBy("partition_id")
        .applyInPandas(build_one, schema)
    )


def merge_blooms(
    old: DataFrame,
    additions: DataFrame,
    hash_col: str = "url_hash",
    n_partitions: int = 16,
) -> DataFrame:
    """blooms ∪ bloom(additions) — per-partition bitwise OR.

    Bloom filters are monotone: the union of two filters over key sets A and
    B is the elementwise OR of their bitsets.  Maintaining the seen-set
    filter incrementally (OR in each round's newly-finalized URLs) makes the
    per-round filter cost O(round additions) instead of O(total seen) —
    at a 10^10-URL seen set, rebuilding from scratch each round would be the
    dominant cost of the whole crawl loop."""
    fresh = build_blooms(additions, hash_col=hash_col, n_partitions=n_partitions)
    o = old.select(
        F.col("partition_id"), F.col("m").alias("m_old"), F.col("bitset").alias("b_old")
    )
    n = fresh.select(
        F.col("partition_id"), F.col("m").alias("m_new"), F.col("bitset").alias("b_new")
    )

    schema = StructType(
        [
            StructField("partition_id", IntegerType()),
            StructField("m", LongType()),
            StructField("bitset", BinaryType()),
        ]
    )

    def or_one(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return right.rename(columns={"m_new": "m", "b_new": "bitset"})[
                ["partition_id", "m", "bitset"]
            ]
        if right.empty:
            return left.rename(columns={"m_old": "m", "b_old": "bitset"})[
                ["partition_id", "m", "bitset"]
            ]
        lo, ro = left.iloc[0], right.iloc[0]
        assert lo["m_old"] == ro["m_new"], "bloom sizes must match to merge"
        merged = (
            np.frombuffer(lo["b_old"], dtype=np.uint8)
            | np.frombuffer(ro["b_new"], dtype=np.uint8)
        ).tobytes()
        return pd.DataFrame(
            {"partition_id": [key[0]], "m": [lo["m_old"]], "bitset": [merged]}
        )

    return (
        o.groupBy("partition_id")
        .cogroup(n.groupBy("partition_id"))
        .applyInPandas(or_one, schema)
    )


def bloom_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: DataFrame,
    hash_col: str = "url_hash",
    n_partitions: int = 16,
) -> DataFrame:
    """candidates ∖ seen, bloom-accelerated and false-drop-free.

    Plan: broadcast the (small) bloom bitsets to every task; a vectorized
    probe marks each candidate maybe-seen / definitely-unseen.  Only the
    maybe-seen slice (≈ |true hits| + 1% of rest) takes the exact anti-join
    shuffle; the definitely-unseen slice passes through shuffle-free.  At
    10^10 frontier scale this turns a full frontier×seen shuffle into a
    broadcast probe + a small rescue join.
    """
    spark = candidates.sparkSession
    bloom_rows = blooms.collect()
    bloom_map = {
        r["partition_id"]: (r["m"], np.unpackbits(np.frombuffer(r["bitset"], dtype=np.uint8)))
        for r in bloom_rows
    }
    bc = spark.sparkContext.broadcast(bloom_map)
    n_part_bc = spark.sparkContext.broadcast(n_partitions)

    @F.pandas_udf(BooleanType())
    def maybe_seen(h: pd.Series) -> pd.Series:
        bm = bc.value
        if not bm:
            return pd.Series(np.zeros(len(h), dtype=bool))
        hashes = h.to_numpy(dtype=np.int64).view(np.uint64)
        parts = (h.to_numpy(dtype=np.int64) % n_part_bc.value + n_part_bc.value) % n_part_bc.value
        out = np.zeros(len(h), dtype=bool)
        for p in np.unique(parts):
            if p not in bm:
                continue
            m, bits = bm[p]
            mask = parts == p
            pos = _probe_positions(hashes[mask], m)
            out[mask] = bits[pos].all(axis=1)
        return pd.Series(out)

    # Persist the flagged frontier: both branches (pass-through and rescue)
    # consume it, and without a persist the probe UDF + candidate lineage
    # would be recomputed once per branch (measured ~2x the probe cost per
    # round).  The engine releases it at the end of each round via
    # release_persisted(); at cluster scale this is the round's shuffle
    # output staying materialized, which Spark does anyway.
    flagged = candidates.withColumn("_maybe_seen", maybe_seen(F.col(hash_col))).persist()
    _PERSISTED.append(flagged)
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    rescue = (
        flagged.filter(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(seen.select(hash_col).distinct(), hash_col, "left_anti")
    )
    return definitely_new.unionByName(rescue)


_PERSISTED: list[DataFrame] = []


def release_persisted() -> None:
    """Unpersist intermediates pinned by bloom_anti_join (call per round)."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
