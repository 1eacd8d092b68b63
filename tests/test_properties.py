"""Property-based invariants (hypothesis) for the safety-critical pieces:

1. Bloom seen-set: NO false negatives for any key set/partitioning — a
   false negative would silently re-crawl a seen URL (the contract the whole
   frontier dedup rests on).
2. Cuckoo filter: membership after inserts, true negatives after removes.
3. Dialect translator: translated patterns match identically under Python re
   for random pattern/word combinations from the generator idioms.
4. simhash: identical token multisets (any order/duplication) → identical
   fingerprint (distinct-token set semantics).
"""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hdx_metadata_crawler_spark.functions.signal_bank import (
    fuse_value_patterns,
    translate_pattern,
)
from hdx_metadata_crawler_spark.streaming.bloom import (
    _probe_positions,
    _sized_m,
)
from hdx_metadata_crawler_spark.streaming.cuckoo import CuckooTable

WORDS = ["table", "scan", "merge", "stream", "batch", "join", "key", "value"]


@given(
    keys=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                  min_size=1, max_size=300, unique=True),
)
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(keys):
    """Every inserted key must probe positive (numpy kernel level — the same
    code path the Spark build/probe UDFs call)."""
    arr = np.array(keys, dtype=np.int64).view(np.uint64)
    m = _sized_m(len(keys))
    bits = np.zeros(m, dtype=bool)
    bits[_probe_positions(arr, m).ravel()] = True
    assert bits[_probe_positions(arr, m)].all(axis=1).all()


@given(
    keys=st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                  min_size=1, max_size=100, unique=True),
    n_remove=st.integers(min_value=0, max_value=100),
)
@settings(max_examples=50, deadline=None)
def test_cuckoo_insert_contains_remove(keys, n_remove):
    arr = np.array(keys, dtype=np.int64).view(np.uint64)
    m = 1 << max(6, int(np.ceil(np.log2(max(len(keys), 4) / (4 * 0.5)))))
    t = CuckooTable(m)
    for i, h in enumerate(arr):
        assert t.insert(h, i), "insert must succeed at <=50% load"
    assert t.contains(arr).all(), "no false negatives after insert"
    removed = arr[: min(n_remove, len(arr))]
    for h in removed:
        assert t.remove(h), "removing a member must succeed"
    kept = arr[min(n_remove, len(arr)):]
    if len(kept):
        assert t.contains(kept).all(), "survivors must stay members"


@given(
    w1=st.sampled_from(WORDS),
    w2=st.sampled_from(WORDS),
    probe=st.lists(
        st.sampled_from(list("abcdefg") + [" ", ".", "-", "_"] + WORDS),
        max_size=12,
    ).map("".join),
)
@settings(max_examples=100, deadline=None)
def test_translate_and_fuse_preserve_python_semantics(w1, w2, probe):
    """fuse(translate(patterns)) must equal the OR of the raw Python
    patterns on arbitrary probe strings (the reference evaluates raw Python
    patterns; the engine evaluates the fused/translated form)."""
    pats = [rf"\b({w1}|{w2})\b", rf"\b{w1}.?{w2}\b", rf"(?i)\b{w1.upper()}\b"]
    fused = re.compile(fuse_value_patterns(pats))
    raw = [re.compile(translate_pattern(p)) for p in pats]
    assert (fused.search(probe) is not None) == any(
        r.search(probe) for r in raw
    )


@given(
    toks=st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=30, deadline=None)
def test_simhash_order_and_duplication_invariant(spark, toks, seed):
    """simhash64 is a function of the DISTINCT token set: permuting or
    duplicating tokens must not change the fingerprint."""
    import random as _random

    from hdx_metadata_crawler_spark.operators import dedup

    rng = _random.Random(seed)
    shuffled = toks[:]
    rng.shuffle(shuffled)
    duplicated = shuffled + [rng.choice(toks) for _ in range(3)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, " ".join(shuffled)), (3, " ".join(duplicated))],
        ["doc_id", "text"],
    )
    out = {r["_id"]: r["simhash"] for r in dedup.simhash64(df, "doc_id", "text").collect()}
    assert out[1] == out[2] == out[3]


# ---------------------------------------------------------------------------
# 5. Streaming near-dup gate: bucket-union == brute force, across restarts
# ---------------------------------------------------------------------------

class _StubState:
    """Minimal GroupState stand-in for driving the pure state function."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _drive_gate(batches):
    """Run _neardup_gate_fn over (doc_id, fp) batches exactly as the
    stateful shuffle would: group rows by pigeonhole bucket, one state per
    bucket persisted across batches.  Returns the deduped emission set."""
    import pandas as pd

    from hdx_metadata_crawler_spark.streaming.stateful import _neardup_gate_fn

    states: dict = {}
    out = set()
    for batch in batches:
        groups: dict = {}
        for doc_id, fp in batch:
            for c in range(4):
                key = (c, (fp >> (16 * c)) & 0xFFFF)
                groups.setdefault(key, []).append(
                    {"doc_id": doc_id, "simhash": fp}
                )
        for key, rows in groups.items():
            state = states.setdefault(key, _StubState())
            for pdf in _neardup_gate_fn(key, iter([pd.DataFrame(rows)]), state):
                for r in pdf.itertuples(index=False):
                    out.add((int(r.doc_id), int(r.partner_id)))
    return out


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1),
             min_size=0, max_size=12),
    st.integers(min_value=0, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_neardup_gate_union_equals_brute_force_across_restarts(fps, cut):
    """For ANY fingerprints and ANY batch split point, the union of the
    per-bucket emissions (deduped) equals the brute-force 'every earlier
    doc within hamming<=3' set — the pigeonhole routing is exact and the
    state carries across batches.  Replaying the first batch afterwards
    must add nothing (idempotence under re-delivery)."""
    docs = list(enumerate(fps))
    cut = min(cut, len(docs))
    batches = [docs[:cut], docs[cut:], docs[:cut]]  # third = replay
    got = _drive_gate(batches)
    expect = {
        (i, j)
        for j, fj in docs
        for i, fi in docs
        if j < i and bin(fi ^ fj).count("1") <= 3
    }
    assert got == expect


# ---------------------------------------------------------------------------
# 6. Winnowing theorem: any >= w + n - 1 token shared run shares a print
# ---------------------------------------------------------------------------

_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=3)


@given(
    st.lists(_tok, min_size=0, max_size=25),
    st.lists(_tok, min_size=6, max_size=6),
    st.lists(_tok, min_size=0, max_size=25),
    st.lists(_tok, min_size=0, max_size=25),
    st.lists(_tok, min_size=0, max_size=25),
)
@settings(max_examples=120, deadline=None)
def test_winnowing_theorem_property(pre_a, run, post_a, pre_b, post_b):
    """Schleimer et al.'s guarantee on the pure twin (which the corpus
    test proves fingerprint-identical to the Spark operator): two texts
    sharing ANY run of w + n - 1 = 6 tokens share >= 1 fingerprint hash,
    and per-doc fingerprints never exceed the window count."""
    from tests.test_dedup import _py_winnow

    text_a = " ".join(pre_a + run + post_a)
    text_b = " ".join(pre_b + run + post_b)
    n_a, fp_a = _py_winnow(text_a)
    n_b, fp_b = _py_winnow(text_b)
    assert {h for _, h in fp_a} & {h for _, h in fp_b}
    assert len(fp_a) <= max(n_a - 4, 0) + 1
    assert len(fp_b) <= max(n_b - 4, 0) + 1
