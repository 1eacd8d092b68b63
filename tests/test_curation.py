"""Curation-operator unit tests: PII bank, Gopher rules, BPE split parity,
int8 quantization invariants.

The registered queries are oracle-checked end-to-end by the driver /
verify_local; these tests pin the branches the synthetic corpus cannot
reach (punctuation/digit BPE arms, the word-len / alpha Gopher failures,
zero vectors) and cross-engine regex parity on crafted strings.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.operators import curation as cu


# ---------------------------------------------------------------------------
# PII bank
# ---------------------------------------------------------------------------

PII_SAMPLES = [
    # (raw, expected_redacted)
    ("mail me at jo.doe+x@sub.example.org today", "mail me at [EMAIL] today"),
    ("two u1@a.io and u2@b.co here", "two [EMAIL] and [EMAIL] here"),
    ("node 192.168.0.1 up", "node [IP] up"),
    ("call +1 555 0192837 now", "call [PHONE] now"),
    ("dial 555-0192-837", "dial [PHONE]"),
    # ordering case: the IP is redacted BEFORE the phone pass, so the
    # greedy digit-run match stops at the [IP] tag instead of swallowing
    # the dotted quad into one mega-match.
    ("call +1 555 22 10.1.0.9 end", "call [PHONE] [IP] end"),
    ("clean text with no pii", "clean text with no pii"),
]


def test_pii_redaction_spark_matches_expected(spark):
    df = spark.createDataFrame([(r,) for r, _ in PII_SAMPLES], "raw string")
    got = [
        r["c"]
        for r in df.select(cu.redact_pii(F.col("raw")).alias("c")).collect()
    ]
    assert got == [e for _, e in PII_SAMPLES]


def test_pii_redaction_duckdb_twin_matches_spark():
    con = duckdb.connect()
    expr = cu.redact_pii_sql("raw")
    for raw, expected in PII_SAMPLES:
        got = con.sql(f"SELECT {expr} FROM (SELECT ? AS raw)", params=[raw]).fetchone()[0]
        assert got == expected, raw


def test_pii_bank_python_re_agrees():
    """Third engine: plain Python re over the same literals (the bank is
    written in the Java∩RE2∩Python common dialect)."""
    for raw, expected in PII_SAMPLES:
        s = raw
        for _, pattern, repl in cu.PII_BANK:
            s = re.sub(pattern, repl.replace("\\", "\\\\"), s)
        assert s == expected, raw


# ---------------------------------------------------------------------------
# BPE-ish split
# ---------------------------------------------------------------------------

BPE_SAMPLES = [
    "key agg row",
    "x123 and 45 apples",
    "wait... what?!",
    "a  b   c",  # multi-space runs
    "...leading punct",
    "",
]


def test_bpe_split_tri_engine_parity(spark):
    con = duckdb.connect()
    pat = cu.BPE_SPLIT_PATTERN
    df = spark.createDataFrame([(s,) for s in BPE_SAMPLES], "raw string")
    spark_toks = [
        r["t"]
        for r in df.select(
            F.regexp_extract_all(F.col("raw"), F.lit(pat), F.lit(0)).alias("t")
        ).collect()
    ]
    for raw, sp_t in zip(BPE_SAMPLES, spark_toks):
        duck_t = con.sql(
            f"SELECT regexp_extract_all(?, '{pat}')", params=[raw]
        ).fetchone()[0]
        py_t = re.findall(pat, raw)
        assert sp_t == duck_t == py_t, raw
        # lossless split: concatenation restores the input
        assert "".join(sp_t) == raw


# ---------------------------------------------------------------------------
# Gopher rules — crafted docs reaching every fail branch
# ---------------------------------------------------------------------------

def _gopher_row(spark, text: str):
    from hdx_metadata_crawler_spark.functions.text import tokenize

    toks = tokenize(F.coalesce(F.col("text"), F.lit("")))
    stop = F.array([F.lit(w) for w in cu.GOPHER_STOPWORDS])
    n = F.size(toks)
    denom = F.greatest(n, F.lit(1))
    mean_len = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
        * F.lit(1.0)
        / denom
    )
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) * F.lit(1.0) / denom
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        n.alias("n"),
        mean_len.alias("mean_len"),
        alpha.alias("alpha"),
        stop_hits.alias("stop_hits"),
    ).collect()[0]


def test_gopher_short_doc_fails_word_floor(spark):
    r = _gopher_row(spark, "tiny doc")
    assert r["n"] < cu.GOPHER_MIN_WORDS


def test_gopher_long_words_fail_mean_len_cap(spark):
    r = _gopher_row(spark, " ".join(["supercalifragilistic"] * 60))
    assert r["mean_len"] > cu.GOPHER_MAX_MEAN_WORD_LEN


def test_gopher_digit_doc_fails_alpha_ratio(spark):
    r = _gopher_row(spark, " ".join(str(i) for i in range(60)))
    assert r["alpha"] < cu.GOPHER_MIN_ALPHA_RATIO


def test_gopher_no_stopwords_fails_floor(spark):
    r = _gopher_row(spark, " ".join(["word"] * 60))
    assert r["stop_hits"] < cu.GOPHER_MIN_STOP_HITS


def test_gopher_passing_doc(spark):
    body = ("the quick brown fox jumps over that lazy dog with zeal " * 6).strip()
    r = _gopher_row(spark, body)
    assert r["n"] >= cu.GOPHER_MIN_WORDS
    assert cu.GOPHER_MIN_MEAN_WORD_LEN <= r["mean_len"] <= cu.GOPHER_MAX_MEAN_WORD_LEN
    assert r["alpha"] >= cu.GOPHER_MIN_ALPHA_RATIO
    assert r["stop_hits"] >= cu.GOPHER_MIN_STOP_HITS


# ---------------------------------------------------------------------------
# int8 quantization invariants
# ---------------------------------------------------------------------------

def _quantize(spark, vec):
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    arr = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    scale = (
        F.coalesce(F.array_max(F.transform(arr, F.abs)), F.lit(0.0))
        / F.lit(cu.QUANT_LEVELS)
    )
    base = df.select(arr.alias("arr"), scale.alias("scale"))
    s = F.col("scale")
    q = F.when(
        s > 0,
        F.transform(F.col("arr"), lambda x: F.floor(x / s + F.lit(0.5)).cast("long")),
    ).otherwise(F.transform(F.col("arr"), lambda x: F.lit(0).cast("long")))
    return base.select("scale", q.alias("q"), "arr").collect()[0]


def test_quantize_zero_vector(spark):
    r = _quantize(spark, [0.0] * 8)
    assert r["scale"] == 0.0
    assert r["q"] == [0] * 8


def test_quantize_range_and_reconstruction(spark):
    vec = [1.0, -1.0, 0.5, -0.25, 0.0, 0.003, -0.999, 0.42]
    r = _quantize(spark, vec)
    assert max(r["q"]) == cu.QUANT_LEVELS  # max |x| hits +127 exactly
    assert min(r["q"]) == -cu.QUANT_LEVELS
    assert all(-cu.QUANT_LEVELS <= v <= cu.QUANT_LEVELS for v in r["q"])
    # reconstruction error bounded by half a quantization step
    for x, qv in zip(r["arr"], r["q"]):
        assert abs(x - qv * r["scale"]) <= r["scale"] * 0.5 + 1e-12


def test_quantize_query_registered_with_oracle():
    from hdx_metadata_crawler_spark.plans import registry

    registry._ensure_loaded()
    for name in (
        "pii_redaction",
        "gopher_quality_filter",
        "bpe_token_profile",
        "embedding_quantize_int8",
    ):
        assert name in registry.REGISTRY
        assert registry.REGISTRY[name].oracle is not None


# ---------------------------------------------------------------------------
# Curation funnel
# ---------------------------------------------------------------------------

def test_curation_funnel_monotone_and_anchored(spark):
    """Stage counts are a monotone non-increasing chain, anchored at the
    corpus count, and every stage genuinely fires on the test corpus
    (oracle parity is the driver's job; this pins the funnel SHAPE)."""
    from tests.conftest import SF_SMALL
    from hdx_metadata_crawler_spark.plans.queries_curation import curation_funnel

    rows = {
        r["stage"]: r
        for r in curation_funnel(spark, SF_SMALL).collect()
    }
    n_corpus = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert rows["corpus"]["n_docs"] == n_corpus
    order = [
        "corpus",
        "eval_heldout",
        "repetition_ok",
        "quality_keep",
        "exact_unique",
        "neardup_survivor",
        "decontaminated",
        "mix_sampled",
    ]
    counts = [rows[s]["n_docs"] for s in order]
    tokens = [rows[s]["n_tokens"] for s in order]
    assert counts == sorted(counts, reverse=True)
    assert tokens == sorted(tokens, reverse=True)
    assert all(rows[s]["monotone_ok"] for s in order)
    # the interesting stages actually drop documents on this corpus
    assert rows["eval_heldout"]["n_docs"] < rows["corpus"]["n_docs"]
    assert rows["quality_keep"]["n_docs"] < rows["repetition_ok"]["n_docs"]
    assert rows["neardup_survivor"]["n_docs"] < rows["exact_unique"]["n_docs"]
    assert rows["mix_sampled"]["n_docs"] < rows["decontaminated"]["n_docs"]
    assert rows["mix_sampled"]["n_docs"] > 0


def test_funnel_stage_keep_sets_are_nested_subsets(spark, tmp_path):
    """Round 5 (verdict item 8): every stage's keep-SET must be a subset of
    the previous stage's, per document, on a randomized corpus — count
    monotonicity alone could pass a reordered-flag bug by coincidence
    (two stages swapping 1-for-1 keeps counts monotone)."""
    import random

    from hdx_metadata_crawler_spark.plans.queries_curation import (
        _funnel_stage_flags,
    )

    rng = random.Random(20260819)
    # 5-7 char words so healthy docs clear the mean-word-length floor (3.0)
    vocab = [f"word{i:02d}" for i in range(40)]
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    rows = []
    did = 0

    def add(text, source):
        nonlocal did
        rows.append((did, text, "en", source, len(text)))
        did += 1

    for _ in range(60):
        # mixed-quality docs: random length (some under the Gopher word
        # floor), random stopword density, occasional numeric-only tokens
        n = rng.choice([10, 30, 60, 120, 400])
        words = [
            rng.choice(stops) if rng.random() < 0.2 else rng.choice(vocab)
            for _ in range(n)
        ]
        if rng.random() < 0.2:
            words = ["12345" if rng.random() < 0.5 else w for w in words]
        add(" ".join(words), f"s{rng.randrange(4)}")
    # heavy intra-doc repetition (trips the rep_bp stage)
    for _ in range(8):
        add(" ".join(["loop phrase body here"] * 40), "s0")
    # exact duplicate groups (trip the first-seen dedup stage)
    for _ in range(6):
        base = " ".join(
            rng.choice(stops) if rng.random() < 0.25 else rng.choice(vocab)
            for _ in range(80)
        )
        for _ in range(3):
            add(base, f"s{rng.randrange(4)}")
    # near-duplicates (trip the simhash component stage): one-token edits
    seed_words = [
        rng.choice(stops) if rng.random() < 0.25 else rng.choice(vocab)
        for _ in range(90)
    ]
    for k in range(5):
        w = list(seed_words)
        w[k] = f"edit{k}"
        add(" ".join(w), "s1")

    # benchmark-leak plant (trips the decontamination stage): the eval split
    # is a deterministic md5 ticket on doc_id, so compute it HERE and keep
    # appending healthy docs carrying a shared verbatim phrase until the
    # plant spans both sides of the split — >=1 eval doc (dictionary side)
    # and >=3 non-eval docs (the contaminated survivors c7 must drop).
    import hashlib

    def is_eval(doc_id: int) -> bool:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16) % 20 == 0

    leak = "shared benchmark phrase alpha bravo charlie delta echo"
    n_eval = n_noneval = 0
    while n_eval < 1 or n_noneval < 3:
        filler = " ".join(
            rng.choice(stops) if rng.random() < 0.25 else rng.choice(vocab)
            for _ in range(70)
        )
        side = is_eval(did)
        add(f"{filler} {leak} unique{did} tail words here", "s2")
        if side:
            n_eval += 1
        else:
            n_noneval += 1

    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    flags = _funnel_stage_flags(spark, str(tmp_path)).select(
        "doc_id", *[f"c{i}" for i in range(1, 9)]
    )
    collected = flags.collect()
    assert len(collected) == len(rows)
    for r in collected:
        chain = [r[f"c{i}"] for i in range(1, 9)]
        for i in range(1, 8):
            assert not (chain[i] and not chain[i - 1]), (
                f"doc {r['doc_id']}: stage c{i + 1} keeps a doc stage "
                f"c{i} dropped — flags {chain}"
            )
    # every filtering stage must actually fire on this corpus, or the
    # subset assertion above is vacuous for it (c8/mix may keep everything
    # a source's weight allows, so only c2..c7 are required to drop)
    kept = {i: sum(1 for r in collected if r[f"c{i}"]) for i in range(1, 9)}
    for i in range(2, 8):
        assert kept[i] < kept[i - 1], f"stage c{i} dropped nothing: {kept}"
