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
    PII_BANK,
    QUANT_LEVELS,
    gopher_metrics,
    gopher_metrics_sql,
    gopher_pass,
    gopher_pass_sql,
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
    # fan_out A/B at sf0.1 (BASELINE.md protocol): 0.79 -> 0.33 s (2.4x)
    d = load_table(spark, sf_dir, "documents", fan_out=True)
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
    m = gopher_metrics_sql("toks")
    fl = gopher_pass_sql()
    return f"""
    SELECT doc_id, n_words,
           round(mean_word_len, 4) AS mean_word_len,
           round(alpha_ratio, 4)   AS alpha_ratio,
           stop_hits,
           {fl['pass_words']} AS pass_words,
           {fl['pass_word_len']} AS pass_word_len,
           {fl['pass_alpha']} AS pass_alpha,
           {fl['pass_stop']} AS pass_stop,
           {fl['keep']} AS keep
    FROM (
      SELECT doc_id,
             {m['n_words']} AS n_words,
             {m['mean_word_len']} AS mean_word_len,
             {m['alpha_ratio']} AS alpha_ratio,
             {m['stop_hits']} AS stop_hits
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(coalesce(text, '')),
                                                  '[^a-z0-9]+'),
                               t -> t <> '') AS toks
            FROM documents)
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
    # fan_out A/B at sf0.1: 0.68 -> 0.31 s (2.2x)
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    m = gopher_metrics(tokenize(F.coalesce(F.col("text"), F.lit(""))))
    fl = gopher_pass(m)
    return d.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        F.round(m["mean_word_len"], 4).alias("mean_word_len"),
        F.round(m["alpha_ratio"], 4).alias("alpha_ratio"),
        m["stop_hits"].alias("stop_hits"),
        fl["pass_words"].alias("pass_words"),
        fl["pass_word_len"].alias("pass_word_len"),
        fl["pass_alpha"].alias("pass_alpha"),
        fl["pass_stop"].alias("pass_stop"),
        fl["keep"].alias("keep"),
    )


def _keep_rates_oracle() -> str:
    m = gopher_metrics_sql("toks")
    keep = gopher_pass_sql()["keep"]
    return f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 10000 // count(*)
                AS BIGINT) AS keep_bp
    FROM (
      SELECT source, {keep} AS keep
      FROM (
        SELECT source,
               {m['n_words']} AS n_words,
               {m['mean_word_len']} AS mean_word_len,
               {m['alpha_ratio']} AS alpha_ratio,
               {m['stop_hits']} AS stop_hits
        FROM (SELECT coalesce(source, '') AS source,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                                    '[^a-z0-9]+'),
                                 t -> t <> '') AS toks
              FROM documents)
      )
    )
    GROUP BY source
    """


@register(
    "quality_keep_rates",
    _keep_rates_oracle(),
    doc="Per-source Gopher-rule keep rates in exact integer basis points — "
        "the report that tells a mixing policy which sources the quality "
        "filter is about to gut (a source with keep_bp 900 cannot deliver "
        "its configured mix weight). Shares the Gopher metric/pass "
        "builders with gopher_quality_filter and the curation funnel "
        "(single source of truth); one scan, one map-side-combined "
        "aggregate keyed on source.",
)
def quality_keep_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    fl = gopher_pass(gopher_metrics(tokenize(F.coalesce(F.col("text"), F.lit("")))))
    keep = fl["keep"].cast("long")
    return (
        d.select(
            F.coalesce(F.col("source"), F.lit("")).alias("source"),
            keep.alias("keep"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").alias("n_keep"),
            F.expr("CAST(div(sum(keep) * 10000, count(*)) AS BIGINT)").alias(
                "keep_bp"
            ),
        )
    )


def _stream_gate_oracle() -> str:
    from ..streaming.stateful import TRIP_KEEP_BP_FLOOR, TRIP_MIN_DOCS

    # Under availableNow on one parquet file the stream is ONE micro-batch,
    # so each source emits exactly one cumulative row == the batch keep-rate
    # report; the trip rule is interpolated from the SAME constants the
    # state function applies (shared-constants rule).
    return f"""
    SELECT source, n_docs, n_keep, keep_bp,
           (n_docs >= {TRIP_MIN_DOCS} AND keep_bp < {TRIP_KEEP_BP_FLOOR})
             AS tripped
    FROM ({_keep_rates_oracle()})
    """


@register(
    "stream_quality_gate",
    _stream_gate_oracle(),
    doc="Streaming Gopher quality gate (round 5): documents arrive as a "
        "Structured-Streaming source, the per-doc Gopher verdict is "
        "computed map-only INSIDE the stream from the shared batch "
        "builders, and applyInPandasWithState keyed by source maintains "
        "cumulative keep/drop counters in the checkpointed state store — "
        "emitting a running keep-rate row plus a circuit-breaker verdict "
        "(>= 20 docs AND keep_bp < 3500 trips) each micro-batch the source "
        "appears in.  The live form of quality_keep_rates: state is two "
        "longs per source, the stateful shuffle carries (source, bool), "
        "and counters survive restarts (see "
        "test_quality_gate_state_survives_across_runs).",
)
def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import quality_gate_stream
    from .queries_streaming import drain_stream_to_memory, stream_table

    docs = stream_table(spark, sf_dir, "documents")
    fl = gopher_pass(
        gopher_metrics(tokenize(F.coalesce(F.col("text"), F.lit(""))))
    )
    flagged = docs.select(
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        fl["keep"].alias("keep"),
    )
    return drain_stream_to_memory(
        spark, quality_gate_stream(flagged), "stream_qgate"
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
    # fan_out A/B at sf0.1: 0.34 -> 0.13 s (2.7x)
    d = load_table(spark, sf_dir, "documents", fan_out=True)
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


# ---------------------------------------------------------------------------
# Curation funnel — the training-data twin of pipeline_funnel
# ---------------------------------------------------------------------------

CURATION_STAGES = [
    "corpus",
    "eval_heldout",
    "repetition_ok",
    "quality_keep",
    "exact_unique",
    "neardup_survivor",
    "decontaminated",
    "mix_sampled",
]


def _curation_funnel_oracle() -> str:
    from ..operators import sampling
    from .queries_dedup import (
        EVAL_SPLIT_SQL,
        _components_oracle_ctes,
        _decontam_ctes,
        _repetition_ctes,
    )
    from ..operators.curation import REP_MAX_BP

    m = gopher_metrics_sql("toks")
    keep = gopher_pass_sql()["keep"]
    ticket = sampling.mix_ticket_sql("doc_id", sampling.MIX_SALT)
    rate = sampling.rate_bp_case_sql(
        "source", sampling.MIX_WEIGHTS_BP, sampling.DEFAULT_MIX_BP
    )
    stage_rows = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS stage_order, '{name}' AS stage, "
        f"CAST(sum(CASE WHEN c{i + 1} THEN 1 ELSE 0 END) AS BIGINT) AS n_docs, "
        f"CAST(sum(CASE WHEN c{i + 1} THEN n_toks ELSE 0 END) AS BIGINT) AS n_tokens "
        "FROM b8"
        for i, name in enumerate(CURATION_STAGES)
    )
    return f"""
    WITH RECURSIVE
    b0 AS (
      SELECT doc_id, text, source,
             list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    b1 AS (
      SELECT doc_id, text, source, len(toks) AS n_toks,
             {m['n_words']} AS n_words,
             {m['mean_word_len']} AS mean_word_len,
             {m['alpha_ratio']} AS alpha_ratio,
             {m['stop_hits']} AS stop_hits,
             NOT {EVAL_SPLIT_SQL} AS s2x,
             md5(coalesce(text, '')) AS digest,
             ({ticket} < {rate}) AS s8x
      FROM b0
    ),
    b2 AS (SELECT *, {keep} AS s4x FROM b1),
    {_repetition_ctes('documents')},
    b3 AS (
      SELECT b2.*, (rep.rep_bp <= {REP_MAX_BP}) AS s3x
      FROM b2 JOIN rep USING (doc_id)
    ),
    b4 AS (
      SELECT *, s2x AS c2, s2x AND s3x AS c3, s2x AND s3x AND s4x AS c4
      FROM b3
    ),
    winners AS (SELECT digest, min(doc_id) AS keep_id FROM b4 WHERE c4 GROUP BY digest),
    b5 AS (
      SELECT b4.*, coalesce(c4 AND b4.doc_id = w.keep_id, FALSE) AS c5
      FROM b4 LEFT JOIN winners w USING (digest)
    ),
    surv5 AS (SELECT doc_id, text FROM b5 WHERE c5),
    {_components_oracle_ctes('surv5')},
    nd_dropped AS (SELECT doc_id FROM comp WHERE doc_id <> component_id),
    {_decontam_ctes('documents')},
    b6 AS (
      SELECT b5.*, c5 AND doc_id NOT IN (SELECT doc_id FROM nd_dropped) AS c6
      FROM b5
    ),
    b7 AS (
      SELECT b6.*, c6 AND NOT coalesce(dc.contaminated, FALSE) AS c7
      FROM b6 LEFT JOIN dc USING (doc_id)
    ),
    b8 AS (SELECT *, TRUE AS c1, c7 AND s8x AS c8 FROM b7),
    funnel AS (
    {stage_rows}
    )
    SELECT stage_order, stage, n_docs, n_tokens,
           coalesce(n_docs <= lag(n_docs) OVER (ORDER BY stage_order), TRUE)
             AS monotone_ok
    FROM funnel
    """


@register(
    "curation_funnel",
    _curation_funnel_oracle(),
    doc="End-to-end training-data curation funnel — the pipeline a 100 TB "
        "corpus actually runs, chained as ONE dataflow reusing the REAL "
        "stage implementations: held-out eval split (the SAME md5 ticket "
        "split the decontamination dictionary is built from) -> intra-doc "
        "repetition filter (rep_bp <= threshold) -> Gopher quality rules "
        "-> exact first-seen dedup among survivors -> simhash "
        "connected-components near-dup survivor (min-id canonical) -> "
        "benchmark decontamination -> deterministic source-weighted mix. "
        "Emits cumulative per-stage doc AND token counts plus the "
        "monotonicity invariant, all value-hashed against a DuckDB oracle "
        "that recomputes the whole chain (including the recursive "
        "transitive closure) from the shared CTE builders — one source of "
        "truth per stage, so no stage can drift from its standalone query.",
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    wide = _funnel_stage_flags(spark, sf_dir)
    aggs = []
    for i in range(1, 9):
        ci = F.col(f"c{i}")
        aggs.append(F.sum(ci.cast("long")).alias(f"n{i}"))
        aggs.append(
            F.sum(F.when(ci, F.col("n_toks")).otherwise(F.lit(0))).alias(f"t{i}")
        )
    sums = wide.agg(*aggs)
    stack_expr = ", ".join(
        f"{i + 1}, '{name}', n{i + 1}, t{i + 1}"
        for i, name in enumerate(CURATION_STAGES)
    )
    stacked = sums.selectExpr(
        f"stack(8, {stack_expr}) as (stage_order, stage, n_docs, n_tokens)"
    )
    w = Window.orderBy("stage_order")
    return stacked.withColumn(
        "monotone_ok",
        F.coalesce(F.col("n_docs") <= F.lag("n_docs").over(w), F.lit(True)),
    )


def _funnel_stage_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cumulative stage flags (doc_id, n_toks, c1..c8) — the whole
    funnel dataflow except the final aggregate.  Split out so the subset
    property test can assert c_{{i+1}} => c_i PER DOCUMENT on a randomized
    corpus (count monotonicity alone could pass a reordered-flag bug by
    coincidence)."""
    from ..operators import dedup, sampling
    from ..operators.curation import REP_MAX_BP
    from .queries_dedup import eval_split_col

    # fan_out: every stage below is per-row heavy (tokenize + Gopher
    # metrics + 3-gram explode + md5 + downstream simhash) and the test
    # parquet is single-row-group — measured 21.1 s -> 11.6 s warm at
    # sf0.1 (the same A/B basis as BASELINE.md's fan-out table).
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = tokenize(F.coalesce(F.col("text"), F.lit("")))
    fl = gopher_pass(gopher_metrics(toks))
    mix_ok = sampling.mix_ticket(F.col("doc_id"), sampling.MIX_SALT) < (
        sampling.rate_bp_column(
            F.col("source"), sampling.MIX_WEIGHTS_BP, sampling.DEFAULT_MIX_BP
        )
    )
    base = d.select(
        "doc_id",
        "text",
        F.size(toks).alias("n_toks"),
        (~eval_split_col()).alias("s2x"),
        fl["keep"].alias("s4x"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("digest"),
        mix_ok.alias("s8x"),
    )
    rep = dedup.repetition_scores(d, "doc_id", "text", n=3).select(
        F.col("_id").alias("doc_id"), (F.col("rep_bp") <= REP_MAX_BP).alias("s3x")
    )
    wide = (
        base.join(rep, "doc_id")
        .withColumn("c2", F.col("s2x"))
        .withColumn("c3", F.col("c2") & F.col("s3x"))
        .withColumn("c4", F.col("c3") & F.col("s4x"))
    )
    # exact first-seen dedup among the c4 survivors (min doc_id per digest)
    winners = wide.filter("c4").groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    # Eager localCheckpoint: everything above (tokenize + Gopher metrics +
    # the repetition explode-aggregate + the winners self-aggregate) is
    # consumed by TWO separate action chains — the connected-components
    # materialization below and the final funnel aggregate — and would
    # otherwise be recomputed per action (~2x the funnel's scan cost,
    # measured 4.5 s of an 8.8 s warm run at sf0.01).
    wide = (
        wide.join(winners, "digest", "left")
        .withColumn(
            "c5",
            F.coalesce(F.col("c4") & (F.col("doc_id") == F.col("keep_id")), F.lit(False)),
        )
        .localCheckpoint(eager=True)
    )
    # near-dup survivor among the c5 survivors: simhash pairs -> components.
    # Pair RESTRICTION property (fingerprints are per-doc, so the pair set
    # of any subset equals the full-corpus pair tier filtered to endpoints
    # in the subset): reuse the process-memoized corpus pair tier the whole
    # CC family shares (queries_dedup._simhash_pair_tier) and restrict it
    # with two id semi-joins, instead of re-fingerprinting + re-bucketing
    # the survivors — measured 12.3 s -> ~9 s warm at sf0.1, and the DuckDB
    # oracle still computes the pairs over surv5 directly, so the value
    # hash PROVES the restriction equality end-to-end.
    from .queries_dedup import _simhash_pair_tier

    surv5 = wide.filter("c5").select("doc_id", "text")
    s5_ids = surv5.select("doc_id")
    pairs = (
        _simhash_pair_tier(spark, sf_dir)
        .join(s5_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi")
        .join(s5_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
        .select("id_a", "id_b")
    )
    nd_dropped = (
        dedup.connected_components(pairs)
        .filter(F.col("id") != F.col("comp"))
        .select(F.col("id").alias("doc_id"), F.lit(True).alias("nd_drop"))
    )
    wide = wide.join(nd_dropped, "doc_id", "left").withColumn(
        "c6", F.col("c5") & F.col("nd_drop").isNull()
    )
    # benchmark decontamination (vs the SAME held-out split)
    contam = dedup.ngram_decontaminate(
        d.filter(~eval_split_col()), d.filter(eval_split_col()), "doc_id", "text", n=5
    ).select(F.col("_id").alias("doc_id"), "contaminated")
    wide = (
        wide.join(contam, "doc_id", "left")
        .withColumn(
            "c7", F.col("c6") & ~F.coalesce(F.col("contaminated"), F.lit(False))
        )
        .withColumn("c8", F.col("c7") & F.col("s8x"))
        .withColumn("c1", F.lit(True))
    )
    return wide


# ---------------------------------------------------------------------------
# Shard manifest — train-shard export planning
# ---------------------------------------------------------------------------

N_SHARDS = 32
SHARD_SALT = "shard:"
_SHARD_KEY_SQL = f"'{SHARD_SALT}' || CAST(doc_id AS VARCHAR)"
SHARD_ID_SQL = f"({MD5_BASE28_SQL.format(x=_SHARD_KEY_SQL)} % {N_SHARDS})"


def shard_id_col() -> "F.Column":
    """Deterministic shard assignment — salted md5 ticket mod N_SHARDS
    (content-independent, so re-running the export after upstream edits
    keeps every unchanged doc in the same shard)."""
    return (
        md5_base28(F.concat(F.lit(SHARD_SALT), F.col("doc_id").cast("string")))
        % N_SHARDS
    )


@register(
    "shard_manifest",
    f"""
    SELECT {SHARD_ID_SQL} AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(
                 string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
                 t -> t <> ''))) AS BIGINT) AS n_tokens,
           CAST(sum(len(coalesce(text, ''))) AS BIGINT) AS n_bytes,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM documents
    GROUP BY 1
    """,
    doc="Train-shard export manifest: deterministic salted-ticket shard "
        "assignment (content-independent, stable under re-export) + "
        "per-shard doc/token/byte/source stats and the doc_id range — the "
        "planning table a 100 TB shard writer partitions by. One scan, one "
        "map-side-combined aggregate keyed on shard_id; the writer itself "
        "would repartition(shard_id) and write per-partition files, so the "
        "manifest IS the skew check (token totals per shard) before the "
        "expensive write.",
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    return d.groupBy(shard_id_col().alias("shard_id")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokenize(text)).cast("long")).alias("n_tokens"),
        F.sum(F.length(text).cast("long")).alias("n_bytes"),
        F.countDistinct("source").alias("n_sources"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# ---------------------------------------------------------------------------
# BPE merge candidates — the first tokenizer-training iteration
# ---------------------------------------------------------------------------

TOP_MERGES = 50


@register(
    "bpe_merge_candidates",
    f"""
    WITH pt AS (
      SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                                       '{BPE_SPLIT_PATTERN}')) AS w
      FROM documents
    ),
    prs AS (
      SELECT unnest(list_transform(range(1, len(w)),
                                   i -> substring(w, i, 2))) AS pair
      FROM pt WHERE len(w) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS cnt
    FROM prs
    GROUP BY pair
    ORDER BY cnt DESC, pair ASC
    LIMIT {TOP_MERGES}
    """,
    doc="BPE tokenizer-training step: corpus-wide frequencies of adjacent "
        "character pairs within pre-tokens (the quantity the first BPE "
        "merge maximizes), top candidates under a TOTAL order (count desc, "
        "pair asc). Explode -> map-side-combined count over a tiny "
        "(chars^2-bounded) key space -> top-k: at 100 TB the shuffle "
        "carries only the pre-combined pair counts per map partition, "
        "never the corpus. Iterating merges = re-running this with the "
        "learned vocabulary applied; the per-iteration dataflow is "
        "identical.",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out A/B at sf0.1: 0.90 -> 0.53 s (1.7x); shard_manifest and
    # tfidf_top_terms measured neutral-to-worse and stay plain.
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    low = F.lower(F.coalesce(F.col("text"), F.lit("")))
    w = F.explode(
        F.regexp_extract_all(low, F.lit(BPE_SPLIT_PATTERN), F.lit(0))
    ).alias("w")
    pairs = d.select(w).filter(F.length("w") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(TOP_MERGES)
    )


# ---------------------------------------------------------------------------
# token-budget mixture planner (round 5).  The planning op that precedes
# corpus_mix_sample: given a target TRAINING TOKEN BUDGET and the per-source
# mix weights (operators/sampling.py MIX_WEIGHTS_BP — the same single source
# of truth the sampler draws against), how many tokens does each source get
# and how many EPOCHS of that source does the allocation imply?  epochs > 1
# means the mix oversamples (repeats) the source — the flag a pipeline owner
# checks before a run, since repeated data changes loss dynamics.
TOKEN_BUDGET = 500_000  # target training tokens for the planning report


def _mix_epochs_oracle() -> str:
    from ..operators import sampling

    rate = sampling.rate_bp_case_sql(
        "source", sampling.MIX_WEIGHTS_BP, sampling.DEFAULT_MIX_BP
    )
    return f"""
    WITH base AS (
      SELECT coalesce(source, '') AS source,
             len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                '[^a-z0-9]+'),
                             t -> t <> '')) AS n_toks
      FROM documents
    ),
    per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS avail_tokens,
             CAST({rate} AS BIGINT) AS weight_bp
      FROM base GROUP BY source
    ),
    tot AS (SELECT sum(weight_bp) AS total_w FROM per),
    alloc AS (
      SELECT p.*,
             CAST((p.weight_bp * {TOKEN_BUDGET}
                   - (p.weight_bp * {TOKEN_BUDGET}) % t.total_w)
                  / t.total_w AS BIGINT) AS alloc_tokens
      FROM per p CROSS JOIN tot t
    )
    SELECT source, n_docs, avail_tokens, weight_bp, alloc_tokens,
           CASE WHEN avail_tokens = 0 THEN 0.0
                ELSE round(alloc_tokens / avail_tokens, 4) END AS epochs,
           (CASE WHEN avail_tokens = 0 THEN 0.0
                 ELSE round(alloc_tokens / avail_tokens, 4) END) > 1.0
             AS oversampled
    FROM alloc
    """


@register(
    "mix_epochs_plan",
    _mix_epochs_oracle(),
    doc="Token-budget mixture planner: per source, available tokens "
        "(whitespace/alnum tokenization — the same regex every token query "
        "uses), the mix weight (operators/sampling.py MIX_WEIGHTS_BP, the "
        "SAME constants corpus_mix_sample draws against), the token "
        "allocation at TOKEN_BUDGET (exact floor division via the "
        "(x - x%d)/d parity form), implied epochs (allocated/available, "
        "4 dp), and the oversampled flag (epochs > 1 = the mix repeats the "
        "source).  Plan: one scan -> map-side-combined per-source "
        "aggregate; the budget normalizer rides a broadcast 1-row cross "
        "join (the tfidf_top_terms device), so nothing returns to the "
        "driver and the only shuffle keys on source (strata-sized).",
)
def mix_epochs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sampling

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        F.size(tokenize(F.coalesce(F.col("text"), F.lit("")))).alias("n_toks"),
    )
    per = (
        toks.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("avail_tokens"),
        )
        .withColumn(
            "weight_bp",
            sampling.rate_bp_column(
                F.col("source"), sampling.MIX_WEIGHTS_BP, sampling.DEFAULT_MIX_BP
            ).cast("long"),
        )
    )
    # budget normalizer as a window over the strata-sized per-source frame
    # (round-5 continuation): the crossJoin(broadcast(per.agg(...))) form
    # recomputed the corpus scan + tokenize + aggregate for the total's
    # branch (no ReusedExchange across differing aggregate shapes)
    from pyspark.sql import Window

    j = per.withColumn(
        "total_w", F.sum("weight_bp").over(Window.partitionBy(F.lit(1)))
    )
    prod = F.col("weight_bp") * F.lit(TOKEN_BUDGET)
    alloc = ((prod - prod % F.col("total_w")) / F.col("total_w")).cast("long")
    j = j.withColumn("alloc_tokens", alloc)
    epochs = F.when(F.col("avail_tokens") == 0, F.lit(0.0)).otherwise(
        F.round(F.col("alloc_tokens") / F.col("avail_tokens"), 4)
    )
    return j.select(
        "source",
        "n_docs",
        "avail_tokens",
        "weight_bp",
        "alloc_tokens",
        epochs.alias("epochs"),
        (epochs > 1.0).alias("oversampled"),
    )


def _pii_hit_oracle() -> str:
    from ..operators.curation import PII_BANK, inject_pii_sql

    # sequential match-count chain: each kind counts on the text AFTER the
    # earlier kinds were redacted — the exact hits redact_pii's in-order
    # replace chain performs (emails first so later digit sweeps never see
    # their local parts)
    ctes = [
        "b0 AS (SELECT coalesce(source, '') AS source, "
        f"{inject_pii_sql('text', 'doc_id')} AS t0 FROM documents)"
    ]
    for i, (kind, pat, repl) in enumerate(PII_BANK):
        ctes.append(
            f"b{i + 1} AS (SELECT source, "
            f"CAST(len(regexp_extract_all(t{i}, '{pat}')) AS BIGINT) AS n_{kind}, "
            + (", ".join(f"n_{k}" for k, _, _ in PII_BANK[:i]) + ", " if i else "")
            + f"regexp_replace(t{i}, '{pat}', '{repl}', 'g') AS t{i + 1} "
            f"FROM b{i})"
        )
    last = len(PII_BANK)
    aggs = ", ".join(
        f"CAST(sum(n_{k}) AS BIGINT) AS m_{k}, "
        f"CAST(sum(CASE WHEN n_{k} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_{k}"
        for k, _, _ in PII_BANK
    )
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT source, '{k}' AS kind, d_{k} AS n_docs_hit, m_{k} AS n_matches FROM per"
        for k, _, _ in PII_BANK
    )
    cte = ",\n    ".join(ctes)
    return f"""
    WITH {cte},
    per AS (SELECT source, {aggs} FROM b{last} GROUP BY source)
    {unions}
    """


@register(
    "pii_hit_report",
    _pii_hit_oracle(),
    doc="PII-redaction audit: per (source, kind), how many documents hit "
        "each PII pattern and how many total matches the redaction chain "
        "replaces — the report a privacy owner reads next to "
        "pii_redaction's output (which source leaks emails, where the "
        "dotted quads concentrate).  Counts follow the SAME in-order "
        "semantics as redact_pii (each kind counted after earlier kinds "
        "are redacted), and the pattern bank, replacement tags and "
        "injection device are the operators/curation.py constants "
        "interpolated once.  Plan: map-only regexp counting chained in "
        "one projection cascade, one strata-sized aggregate, a 3-way "
        "stack — zero-hit strata kept as explicit zero rows so silence "
        "and absence are distinguishable.  Exact integers end to end.",
)
def pii_hit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import PII_BANK, inject_pii

    d = load_table(spark, sf_dir, "documents")
    rows = d.select(
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        inject_pii(F.col("text"), F.col("doc_id")).alias("t0"),
    )
    for i, (kind, pat, repl) in enumerate(PII_BANK):
        rows = rows.select(
            "*",
            F.size(
                F.regexp_extract_all(F.col(f"t{i}"), F.lit(pat), F.lit(0))
            ).cast("long").alias(f"n_{kind}"),
            F.regexp_replace(F.col(f"t{i}"), pat, repl).alias(f"t{i + 1}"),
        )
    per = rows.groupBy("source").agg(
        *[
            a
            for k, _, _ in PII_BANK
            for a in (
                F.sum(f"n_{k}").cast("long").alias(f"m_{k}"),
                F.sum((F.col(f"n_{k}") > 0).cast("int")).cast("long").alias(f"d_{k}"),
            )
        ]
    )
    stack_args = ", ".join(f"'{k}', d_{k}, m_{k}" for k, _, _ in PII_BANK)
    return per.select(
        "source",
        F.expr(
            f"stack({len(PII_BANK)}, {stack_args}) AS (kind, n_docs_hit, n_matches)"
        ),
    )
