"""Partitioned cuckoo-filter URL-seen set — the deletion-capable fallback
named by the north rule (bloom filters cannot delete; a crawl that re-queues
URLs after content expiry, or retracts poisoned seeds, needs removal).

Standard cuckoo filter (Fan et al., CoNEXT'14 'Cuckoo Filter: Practically
Better Than Bloom'): buckets of ``SLOTS`` 16-bit fingerprints; key x lives in
bucket ``i1 = h(x) % m`` or ``i2 = i1 XOR h(fp(x)) % m`` (partial-key cuckoo
hashing, so i1 is recoverable from (i2, fp) — required for eviction chains
and deletes).  Same partitioning scheme as bloom.py: partition p owns
url_hashes with pmod(url_hash, P) == p; each partition's filter is built in
one ``applyInPandas`` pass and the probe is a broadcast + vectorized batch
check with the same exact-rescue anti-join (a filter positive can NEVER
silently drop a URL; a filter negative is definitely-unseen).

Deletes: ``remove`` drops one copy of the fingerprint from either candidate
bucket — after a delete, membership for that key reports false (no
tombstones, constant space), which a counting Bloom needs 8x space to match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SLOTS = 4  # fingerprints per bucket
MAX_KICKS = 500
_FP_BITS = 16
_EMPTY = np.uint16(0)


def _fingerprint(hashes: np.ndarray) -> np.ndarray:
    """Non-zero 16-bit fingerprint from the high hash bits (0 marks empty)."""
    fp = ((hashes >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _bucket1(hashes: np.ndarray, m: int) -> np.ndarray:
    # Mix before reducing mod m: the raw low bits are ALREADY consumed by the
    # pmod(url_hash, n_partitions) partition key, so within one partition
    # every key shares them — `h % m` (m a power of two divisible by P)
    # would confine all primary buckets to m/P slots, and measured insert
    # failure then hits at ~55% load instead of the designed 84%
    # (code-review finding, verified by simulation).  The SplitMix64-style
    # multiply+xorshift decorrelates bucket choice from the partition bits.
    h = hashes * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(29)
    return (h % np.uint64(m)).astype(np.int64)


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    # partial-key hashing: i2 = i1 XOR (h(fp) mod m).  m MUST be a power of
    # two so XOR keeps the bucket in range AND alt(alt(b)) == b — the
    # involution eviction chains and deletes depend on (a '% m' here would
    # silently break that symmetry and corrupt lookups after evictions).
    assert m & (m - 1) == 0, "cuckoo bucket count must be a power of two"
    h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(m)
    return (bucket.astype(np.uint64) ^ h).astype(np.int64)


class CuckooTable:
    """One partition's table: (m buckets x SLOTS) uint16 fingerprints."""

    def __init__(self, m: int, table: np.ndarray | None = None):
        self.m = m
        self.table = table if table is not None else np.zeros((m, SLOTS), dtype=np.uint16)

    # -- single-key ops (used by the per-partition build/remove loops) ------
    def _try_put(self, bucket: int, fp: np.uint16) -> bool:
        row = self.table[bucket]
        empty = np.nonzero(row == _EMPTY)[0]
        if empty.size:
            row[empty[0]] = fp
            return True
        return False

    def insert(self, h: np.uint64, rng_state: int) -> bool:
        fp = _fingerprint(np.array([h], dtype=np.uint64))[0]
        b1 = int(_bucket1(np.array([h], dtype=np.uint64), self.m)[0])
        b2 = int(_alt_bucket(np.array([b1]), np.array([fp]), self.m)[0])
        if self._try_put(b1, fp) or self._try_put(b2, fp):
            return True
        # eviction chain (deterministic slot choice: derived from the state)
        bucket, cur = (b1 if rng_state % 2 == 0 else b2), fp
        for kick in range(MAX_KICKS):
            slot = (rng_state + kick) % SLOTS
            cur, self.table[bucket, slot] = self.table[bucket, slot], cur
            bucket = int(_alt_bucket(np.array([bucket]), np.array([cur]), self.m)[0])
            if self._try_put(bucket, cur):
                return True
        return False  # table too full — caller must resize

    def remove(self, h: np.uint64) -> bool:
        fp = _fingerprint(np.array([h], dtype=np.uint64))[0]
        b1 = int(_bucket1(np.array([h], dtype=np.uint64), self.m)[0])
        b2 = int(_alt_bucket(np.array([b1]), np.array([fp]), self.m)[0])
        for b in (b1, b2):
            hit = np.nonzero(self.table[b] == fp)[0]
            if hit.size:
                self.table[b, hit[0]] = _EMPTY
                return True
        return False

    # -- vectorized probe ---------------------------------------------------
    def contains(self, hashes: np.ndarray) -> np.ndarray:
        fp = _fingerprint(hashes)
        b1 = _bucket1(hashes, self.m)
        b2 = _alt_bucket(b1, fp, self.m)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, m: int, raw: bytes) -> "CuckooTable":
        return cls(m, np.frombuffer(raw, dtype=np.uint16).reshape(m, SLOTS).copy())


CUCKOO_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType()),
        StructField("n_partitions", IntegerType()),
        StructField("m", LongType()),
        StructField("table", BinaryType()),
    ]
)


def _check_partitioning(rows, n_partitions: int, where: str) -> None:
    """Same cross-call invariant as bloom._check_partitioning: probing,
    merging, or removing with a different P than the tables were built with
    silently bypasses the filter for absent partitions (false negatives) or
    routes removals to the wrong table."""
    for r in rows:
        if r["n_partitions"] != n_partitions:
            raise ValueError(
                f"{where}: cuckoo tables were built with n_partitions="
                f"{r['n_partitions']} but called with {n_partitions}"
            )


def build_cuckoos(
    seen: DataFrame,
    hash_col: str = "url_hash",
    n_partitions: int = 16,
    keys_budget: int = 4096,
) -> DataFrame:
    """seen(url_hash) -> cuckoos(partition_id, m, table).  m sized for
    ~84% max load at SLOTS=4 (the regime where cuckoo insert still succeeds
    w.h.p.), rounded up to a power of two (required by partial-key hashing);
    production sizes from approx_count_distinct per partition."""
    m = 1 << max(6, int(np.ceil(np.log2(keys_budget / (SLOTS * 0.84)))))

    def build_one(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        t = CuckooTable(m)
        hashes = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        for i, h in enumerate(hashes):
            if not t.insert(h, i):
                raise RuntimeError(
                    f"cuckoo partition {key[0]} over capacity (m={m})"
                )
        return pd.DataFrame(
            {"partition_id": [key[0]], "n_partitions": [n_partitions],
             "m": [m], "table": [t.to_bytes()]}
        )

    return (
        seen.withColumn(
            "partition_id", F.pmod(F.col(hash_col), F.lit(n_partitions)).cast("int")
        )
        .groupBy("partition_id")
        .applyInPandas(build_one, CUCKOO_SCHEMA)
    )


def cuckoo_remove(
    cuckoos: DataFrame,
    removals: DataFrame,
    hash_col: str = "url_hash",
    n_partitions: int = 16,
    strict: bool = True,
) -> DataFrame:
    """Delete keys from the filter: co-group removals with their partition's
    table, drop one fingerprint copy per key, emit the updated table.  This
    is the operation Bloom fundamentally cannot do.

    PRECONDITION (standard cuckoo-filter semantics, Fan et al. §3.3): callers
    may only remove keys that were previously inserted.  Deleting a
    never-inserted key whose fingerprint happens to collide would evict
    another key's fingerprint, creating a false NEGATIVE — which breaks the
    'filter negative is definitely-unseen' contract and would silently
    re-crawl seen URLs.  With ``strict=True`` (default) a removal that finds
    no matching fingerprint raises instead of being silently ignored; verify
    membership against the exact seen table first if the removal set may
    contain non-members."""
    keyed = removals.withColumn(
        "partition_id", F.pmod(F.col(hash_col), F.lit(n_partitions)).cast("int")
    ).select("partition_id", hash_col)

    def update_one(key, tables: pd.DataFrame, rems: pd.DataFrame) -> pd.DataFrame:
        if tables.empty:
            if strict and not rems.empty:
                raise RuntimeError(
                    f"cuckoo_remove: partition {key[0]} has {len(rems)} removals "
                    "but no filter table — removals must target inserted keys"
                )
            return tables
        row = tables.iloc[0]
        t = CuckooTable(int(row["m"]), np.frombuffer(row["table"], dtype=np.uint16)
                        .reshape(int(row["m"]), SLOTS).copy())
        failed = 0
        for h in rems[hash_col].to_numpy(dtype=np.int64).view(np.uint64):
            if not t.remove(h):
                failed += 1
        if failed and strict:
            raise RuntimeError(
                f"cuckoo_remove: {failed} removal(s) in partition {key[0]} found "
                "no fingerprint — removing never-inserted keys corrupts the "
                "filter (see docstring precondition)"
            )
        return pd.DataFrame(
            {"partition_id": [key[0]], "n_partitions": [n_partitions],
             "m": [t.m], "table": [t.to_bytes()]}
        )

    _check_partitioning(
        cuckoos.select("partition_id", "n_partitions").collect(),
        n_partitions, "cuckoo_remove",
    )
    return cuckoos.groupBy("partition_id").cogroup(
        keyed.groupBy("partition_id")
    ).applyInPandas(update_one, CUCKOO_SCHEMA)


def cuckoo_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    cuckoos: DataFrame,
    hash_col: str = "url_hash",
    n_partitions: int = 16,
) -> DataFrame:
    """candidates ∖ seen with the cuckoo probe + exact rescue — identical
    contract to bloom.bloom_anti_join (false-drop-free).

    Co-partitioned executor-side probe, same shape as bloom_anti_join:
    candidates cogroup with the cuckoo table on ``pmod(hash, P)`` so each
    task holds exactly one partition's table and the driver holds none
    (the previous collect-all + whole-map broadcast hit the same 10^10-key
    driver memory wall as the bloom probe).  The n_partitions invariant is
    validated inside the probe task and surfaces at action time.
    """
    cand = candidates.withColumn(
        "_cuckoo_part", F.pmod(F.col(hash_col), F.lit(n_partitions)).cast("int")
    )
    out_schema = StructType(
        cand.schema.fields + [StructField("_maybe_seen", BooleanType())]
    )

    def probe(key: tuple, cpdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
        if cpdf.empty:
            return cpdf.assign(_maybe_seen=pd.Series(dtype=bool))
        if tpdf.empty:
            return cpdf.assign(_maybe_seen=False)
        row = tpdf.iloc[0]
        if int(row["n_partitions"]) != n_partitions:
            raise ValueError(
                f"cuckoo_anti_join: tables were built with n_partitions="
                f"{int(row['n_partitions'])} but probed with {n_partitions} — "
                "seen-set keys would silently bypass the filter"
            )
        hashes = cpdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        t = CuckooTable.from_bytes(int(row["m"]), row["table"])
        return cpdf.assign(_maybe_seen=t.contains(hashes))

    flagged = (
        cand.groupBy("_cuckoo_part")
        .cogroup(
            cuckoos.withColumnRenamed("partition_id", "_cuckoo_part").groupBy("_cuckoo_part")
        )
        .applyInPandas(probe, out_schema)
        .drop("_cuckoo_part")
        .persist()
    )
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    # no .distinct(): left_anti is insensitive to right-side duplicates
    # (see bloom.bloom_anti_join — same O(|seen|)-shuffle-per-round saving)
    rescue = (
        flagged.filter(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(seen.select(hash_col), hash_col, "left_anti")
    )
    out = definitely_new.unionByName(rescue)
    _PERSISTED.append(flagged)
    return out


_PERSISTED: list[DataFrame] = []


def release_persisted() -> None:
    """Unpersist intermediates pinned by cuckoo_anti_join (mirrors
    bloom.release_persisted / ranking.release_persisted — call once the
    round's outputs are consumed; previously these leaked into bloom's
    registry, which standalone cuckoo callers never release)."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
