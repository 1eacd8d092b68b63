"""Curation queries: PII redaction, Gopher quality rules, BPE-ish token
profile, int8 embedding quantization.

All four are map-only column algebra over one scan (documents or
embeddings) — zero shuffles, zero Python, fully whole-stage-codegen'd; at
100 TB each costs exactly one corpus read and parallelizes per-split.
Constants (pattern banks, thresholds, stop words) live in
``operators/curation.py`` and are interpolated into BOTH engines
(CLAUDE.md shared-constants rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..operators.curation import (
    BPE_SPLIT_PATTERN,
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_RATIO,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
    PII_BANK,
    QUANT_LEVELS,
    inject_pii,
    inject_pii_sql,
)
from ..operators.dedup import MD5_BASE28_SQL, md5_base28
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def _pii_oracle() -> str:
    aug = inject_pii_sql("text", "doc_id")
    # Sequential count-then-redact per kind, so counts == what was redacted
    # (a later pattern must never see bytes an earlier one consumed).
    steps, expr = [], "aug"
    for kind, pattern, repl in PII_BANK:
        steps.append(f"len(regexp_extract_all({expr}, '{pattern}')) AS n_{kind}")
        expr = f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"
    clean_hash = MD5_BASE28_SQL.format(x="clean")
    return f"""
    SELECT doc_id, n_email, n_ip, n_phone,
           len(clean) AS n_chars_clean,
           {clean_hash} AS clean_hash
    FROM (
      SELECT doc_id, {', '.join(steps)}, {expr} AS clean
      FROM (SELECT doc_id, {aug} AS aug FROM documents)
    )
    """


@register(
    "pii_redaction",
    _pii_oracle(),
    doc="PII detect + redact for training-data curation (engine-new; the "
        "standard pre-release scrub pass). The synthetic corpus carries no "
        "natural PII, so a deterministic doc_id-keyed subset gets synthetic "
        "emails/IPs/phones appended IDENTICALLY in both engines (the "
        "jsonschema_validation fault-injection pattern) — the value hash "
        "covers real match+redact behaviour via per-kind counts plus a "
        "portable md5 of the redacted text. Bank order (email, ip, phone) "
        "is semantic: each pattern sees only what earlier ones left.",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = inject_pii(F.col("text"), F.col("doc_id"))
    counts = []
    for kind, pattern, repl in PII_BANK:
        counts.append(
            F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).alias(f"n_{kind}")
        )
        c = F.regexp_replace(c, pattern, repl)
    return d.select(
        "doc_id",
        *counts,
        F.length(c).alias("n_chars_clean"),
        md5_base28(c).alias("clean_hash"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rules
# ---------------------------------------------------------------------------

def _gopher_oracle() -> str:
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
    SELECT doc_id, n_words,
           round(mean_word_len, 4) AS mean_word_len,
           round(alpha_ratio, 4)   AS alpha_ratio,
           stop_hits,
           pass_words, pass_word_len, pass_alpha, pass_stop,
           (pass_words AND pass_word_len AND pass_alpha AND pass_stop) AS keep
    FROM (
      SELECT doc_id, n_words, mean_word_len, alpha_ratio, stop_hits,
             (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
               AS pass_words,
             (mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
              AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN}) AS pass_word_len,
             (alpha_ratio >= {GOPHER_MIN_ALPHA_RATIO}) AS pass_alpha,
             (stop_hits >= {GOPHER_MIN_STOP_HITS}) AS pass_stop
      FROM (
        SELECT doc_id,
               len(toks) AS n_words,
               coalesce(list_sum(list_transform(toks, t -> len(t))), 0) * 1.0
                 / greatest(len(toks), 1) AS mean_word_len,
               len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) * 1.0
                 / greatest(len(toks), 1) AS alpha_ratio,
               len(list_filter(toks, t -> t IN ({stop_list}))) AS stop_hits
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                                    '[^a-z0-9]+'),
                                 t -> t <> '') AS toks
              FROM documents)
      )
    )
    """


@register(
    "gopher_quality_filter",
    _gopher_oracle(),
    doc="Gopher-rule quality filter (Rae et al. 2021 §A1.1, public): word "
        "count bounds, mean word length bounds, alphabetic-word ratio, "
        "stop-word floor -> per-rule flags + keep verdict. Thresholds are "
        "shared constants; flags compare the UNROUNDED doubles in both "
        "engines (identical expression tree -> identical IEEE results), "
        "rounded copies are display-only. Map-only, one scan.",
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.coalesce(F.col("text"), F.lit("")))
    stop = F.array([F.lit(w) for w in GOPHER_STOPWORDS])
    n_words = F.size(toks)
    denom = F.greatest(n_words, F.lit(1))
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    mean_word_len = tok_chars * F.lit(1.0) / denom
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) * F.lit(1.0) / denom
    )
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    pass_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    pass_word_len = (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN) & (
        mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN
    )
    pass_alpha = alpha_ratio >= GOPHER_MIN_ALPHA_RATIO
    pass_stop = stop_hits >= GOPHER_MIN_STOP_HITS
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        pass_words.alias("pass_words"),
        pass_word_len.alias("pass_word_len"),
        pass_alpha.alias("pass_alpha"),
        pass_stop.alias("pass_stop"),
        (pass_words & pass_word_len & pass_alpha & pass_stop).alias("keep"),
    )


# ---------------------------------------------------------------------------
# BPE-ish tokenizer profile
# ---------------------------------------------------------------------------

@register(
    "bpe_token_profile",
    f"""
    SELECT doc_id, n_bpe_tokens, n_ws_tokens,
           round(len(low) * 1.0 / greatest(n_bpe_tokens, 1), 4) AS chars_per_token,
           round(n_bpe_tokens * 1.0 / greatest(n_ws_tokens, 1), 4) AS fertility
    FROM (
      SELECT doc_id, low,
             len(regexp_extract_all(low, '{BPE_SPLIT_PATTERN}')) AS n_bpe_tokens,
             len(list_filter(string_split_regex(low, '[^a-z0-9]+'),
                             t -> t <> '')) AS n_ws_tokens
      FROM (SELECT doc_id, lower(coalesce(text, '')) AS low FROM documents)
    )
    """,
    doc="Token-count profile under a BPE-ish pre-tokenizer (GPT-2 split "
        "rule simplified to the Java∩RE2 common dialect — the original's "
        "trailing-space lookahead is not RE2-expressible): tokens per doc, "
        "bytes-per-token compression proxy, and fertility vs plain "
        "whitespace tokens. Map-only, one scan.",
)
def bpe_token_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.coalesce(F.col("text"), F.lit("")))
    n_bpe = F.size(F.regexp_extract_all(low, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))
    n_ws = F.size(tokenize(low))
    return d.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
        F.round(F.length(low) * F.lit(1.0) / F.greatest(n_bpe, F.lit(1)), 4).alias(
            "chars_per_token"
        ),
        F.round(n_bpe * F.lit(1.0) / F.greatest(n_ws, F.lit(1)), 4).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# int8 embedding quantization
# ---------------------------------------------------------------------------

@register(
    "embedding_quantize_int8",
    f"""
    SELECT vec_id, n_dims, scale_uu,
           CAST(coalesce(list_sum(q), 0) AS BIGINT)                    AS sum_q,
           CAST(coalesce(list_sum(list_transform(q, v -> v * v)), 0) AS BIGINT)
                                                                       AS sum_q2,
           len(list_filter(q, v -> v <> 0))                            AS nnz,
           CASE WHEN scale > 0 THEN CAST(coalesce(list_max(
                  list_transform(arr, x -> floor(
                    abs(x - floor(x / scale + 0.5) * scale) / scale * 10000
                    + 0.5))), 0) AS BIGINT)
                ELSE 0 END                                             AS max_err_bp
    FROM (
      SELECT vec_id, arr, scale, len(arr) AS n_dims,
             CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_uu,
             CASE WHEN scale > 0
                  THEN list_transform(arr,
                         x -> CAST(floor(x / scale + 0.5) AS BIGINT))
                  ELSE list_transform(arr, x -> CAST(0 AS BIGINT)) END AS q
      FROM (
        SELECT vec_id, arr,
               coalesce(list_max(list_transform(arr, x -> abs(x))), 0)
                 / {QUANT_LEVELS} AS scale
        FROM (SELECT vec_id,
                     list_transform(embedding, v -> CAST(v AS DOUBLE)) AS arr
              FROM embeddings)
      )
    )
    """,
    doc="Symmetric int8 scalar quantization of the embedding column — the "
        "storage/transfer compressor in front of ANN at 100 TB (4x smaller "
        "vectors, int8 GEMM). Per-vector scale = max|x|/127; quantize = "
        "floor(x/scale + 0.5) (identical half-up in BOTH engines — plain "
        "round() diverges on exact halves, CLAUDE.md). All outputs are "
        "exact integers (scale in micro-units, q checksums, max "
        "reconstruction error in basis points of scale) so the value hash "
        "has zero float-rounding surface. Map-only, one scan.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    arr = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    scale = (
        F.coalesce(F.array_max(F.transform(arr, F.abs)), F.lit(0.0))
        / F.lit(QUANT_LEVELS)
    )
    base = e.select(
        "vec_id",
        arr.alias("arr"),
        scale.alias("scale"),
        F.size(arr).alias("n_dims"),
        F.floor(scale * 1000000 + F.lit(0.5)).cast("long").alias("scale_uu"),
    )
    s = F.col("scale")
    q = F.when(
        s > 0,
        F.transform(F.col("arr"), lambda x: F.floor(x / s + F.lit(0.5)).cast("long")),
    ).otherwise(F.transform(F.col("arr"), lambda x: F.lit(0).cast("long")))
    err_bp = F.when(
        s > 0,
        F.coalesce(
            F.array_max(
                F.transform(
                    F.col("arr"),
                    lambda x: F.floor(
                        F.abs(x - F.floor(x / s + F.lit(0.5)) * s) / s * 10000
                        + F.lit(0.5)
                    ),
                )
            ),
            F.lit(0.0),
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    qd = base.select("vec_id", "n_dims", "scale_uu", "scale", "arr", q.alias("q"))
    return qd.select(
        "vec_id",
        "n_dims",
        "scale_uu",
        F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda a, v: a + v).alias(
            "sum_q"
        ),
        F.aggregate(
            F.col("q"), F.lit(0).cast("long"), lambda a, v: a + v * v
        ).alias("sum_q2"),
        F.size(F.filter(F.col("q"), lambda v: v != 0)).alias("nnz"),
        err_bp.alias("max_err_bp"),
    )
