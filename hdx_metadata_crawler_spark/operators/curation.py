"""Corpus-curation operators: PII redaction, Gopher-style quality rules,
BPE-ish tokenizer profiling, and int8 embedding quantization.

Engine-new surface (the reference crawls + classifies; these are the
standard curation passes a training-data pipeline runs downstream —
same family as the dedup ladder in ``operators/dedup.py`` and the mixing
step in ``operators/sampling.py``).  Design rules:

- **Everything JVM-side.**  All four operators are pure column algebra
  (regexp/array/arithmetic builtins) — zero Python UDFs, zero shuffles:
  each is a map-only pass that composes with the scan's codegen stage, so
  at 100 TB the cost is one corpus read, embarrassingly parallel.
- **Single source of truth.**  Pattern banks, thresholds, and stop-word
  lists live HERE and are interpolated into both the Spark plan and the
  DuckDB oracle SQL (CLAUDE.md shared-constants rule).  Every regex is
  written in the Java∩RE2 common dialect (no lookarounds, no
  backreferences) so the same literal runs in both engines.
- **Deterministic fault injection.**  The synthetic corpus is word-salad
  with no natural PII, so ``pii_redaction`` appends synthetic PII to a
  deterministic doc_id-keyed subset IDENTICALLY in both engines (the same
  pattern ``jsonschema_validation`` uses for schema faults): the driver's
  value hash then covers real match/redact behaviour, not a vacuous
  all-zeros frame.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# PII bank — (kind, pattern, replacement), applied IN ORDER (emails first:
# their local parts contain digits a later sweep must not see; IPs before
# phones so dotted quads are gone before the digit-run pattern looks).
# Patterns are Java∩RE2: character classes + bounded quantifiers only.
# --------------------------------------------------------------------------
PII_BANK: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "[EMAIL]"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
    ("phone", r"\+?[0-9][0-9 -]{6,}[0-9]", "[PHONE]"),
)

# Deterministic PII injection — divisors chosen coprime so subsets overlap
# partially (some docs draw 2–3 kinds, most none).
INJECT_EMAIL_MOD = 7
INJECT_IP_MOD = 13
INJECT_PHONE_MOD = 17


def inject_pii(text: Column, doc_id: Column) -> Column:
    """Augmented text: NULL-safe base + doc_id-keyed synthetic PII."""
    did = doc_id.cast("long")
    email = F.when(
        did % INJECT_EMAIL_MOD == 0,
        F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.org now")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % INJECT_IP_MOD == 0,
        F.concat(
            F.lit(" node at 10."),
            (did % 256).cast("string"),
            F.lit(".0."),
            (did % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % INJECT_PHONE_MOD == 0,
        F.concat(F.lit(" call +1 555 "), (1000000 + did % 1000000).cast("string")),
    ).otherwise(F.lit(""))
    return F.concat(F.coalesce(text, F.lit("")), email, ip, phone)


def inject_pii_sql(text_expr: str, id_expr: str) -> str:
    """DuckDB twin of ``inject_pii`` (same subsets, same byte layout).

    ``id_expr`` must be non-negative (doc ids are), so DuckDB's truncating
    ``%`` agrees with Spark's.
    """
    return (
        f"coalesce({text_expr}, '')"
        f" || CASE WHEN {id_expr} % {INJECT_EMAIL_MOD} = 0 THEN"
        f" ' contact user' || CAST({id_expr} AS VARCHAR) || '@example.org now'"
        f" ELSE '' END"
        f" || CASE WHEN {id_expr} % {INJECT_IP_MOD} = 0 THEN"
        f" ' node at 10.' || CAST({id_expr} % 256 AS VARCHAR)"
        f" || '.0.' || CAST({id_expr} % 100 AS VARCHAR) ELSE '' END"
        f" || CASE WHEN {id_expr} % {INJECT_PHONE_MOD} = 0 THEN"
        f" ' call +1 555 ' || CAST(1000000 + {id_expr} % 1000000 AS VARCHAR)"
        f" ELSE '' END"
    )


def redact_pii(text: Column) -> Column:
    """Apply the PII bank in order; replacements are literal tags."""
    c = text
    for _, pattern, repl in PII_BANK:
        c = F.regexp_replace(c, pattern, repl)
    return c


def redact_pii_sql(text_expr: str) -> str:
    """DuckDB twin — note the explicit 'g' flag (DuckDB's regexp_replace
    replaces only the FIRST match by default; Spark replaces all)."""
    expr = text_expr
    for _, pattern, repl in PII_BANK:
        expr = f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"
    return expr


# --------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021 §A1.1, public) — thresholds
# adapted to the synthetic corpus so both keep/drop branches fire.
# --------------------------------------------------------------------------
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_RATIO = 0.80  # fraction of words containing a letter
GOPHER_MIN_STOP_HITS = 2
# Gopher's list is (the, be, to, of, and, that, have, with); kept verbatim.
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")

def gopher_metrics(toks: Column) -> dict[str, Column]:
    """The four Gopher rule metrics from a token-array column (Spark side).
    Shared by ``gopher_quality_filter`` and the curation funnel — ONE
    definition so the rule can never drift between the two queries."""
    stop = F.array([F.lit(w) for w in GOPHER_STOPWORDS])
    n_words = F.size(toks)
    denom = F.greatest(n_words, F.lit(1))
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return {
        "n_words": n_words,
        "mean_word_len": tok_chars * F.lit(1.0) / denom,
        "alpha_ratio": F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        * F.lit(1.0)
        / denom,
        "stop_hits": F.size(F.filter(toks, lambda t: F.array_contains(stop, t))),
    }


def gopher_metrics_sql(toks_expr: str) -> dict[str, str]:
    """DuckDB twins of ``gopher_metrics`` (same names, same math)."""
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return {
        "n_words": f"len({toks_expr})",
        "mean_word_len": (
            f"coalesce(list_sum(list_transform({toks_expr}, t -> len(t))), 0)"
            f" * 1.0 / greatest(len({toks_expr}), 1)"
        ),
        "alpha_ratio": (
            f"len(list_filter({toks_expr}, t -> regexp_matches(t, '[a-z]')))"
            f" * 1.0 / greatest(len({toks_expr}), 1)"
        ),
        "stop_hits": f"len(list_filter({toks_expr}, t -> t IN ({stop_list})))",
    }


def gopher_pass(m: dict[str, Column]) -> dict[str, Column]:
    """Per-rule pass flags + keep from the metric columns (UNROUNDED —
    identical expression trees give identical IEEE doubles in both
    engines; rounding is display-only)."""
    flags = {
        "pass_words": (m["n_words"] >= GOPHER_MIN_WORDS)
        & (m["n_words"] <= GOPHER_MAX_WORDS),
        "pass_word_len": (m["mean_word_len"] >= GOPHER_MIN_MEAN_WORD_LEN)
        & (m["mean_word_len"] <= GOPHER_MAX_MEAN_WORD_LEN),
        "pass_alpha": m["alpha_ratio"] >= GOPHER_MIN_ALPHA_RATIO,
        "pass_stop": m["stop_hits"] >= GOPHER_MIN_STOP_HITS,
    }
    flags["keep"] = (
        flags["pass_words"]
        & flags["pass_word_len"]
        & flags["pass_alpha"]
        & flags["pass_stop"]
    )
    return flags


def gopher_pass_sql() -> dict[str, str]:
    """DuckDB twins of ``gopher_pass`` over columns named like the
    ``gopher_metrics_sql`` keys (wrap metrics in a subquery first)."""
    flags = {
        "pass_words": (
            f"(n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})"
        ),
        "pass_word_len": (
            f"(mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}"
            f" AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN})"
        ),
        "pass_alpha": f"(alpha_ratio >= {GOPHER_MIN_ALPHA_RATIO})",
        "pass_stop": f"(stop_hits >= {GOPHER_MIN_STOP_HITS})",
    }
    flags["keep"] = (
        f"({flags['pass_words']} AND {flags['pass_word_len']}"
        f" AND {flags['pass_alpha']} AND {flags['pass_stop']})"
    )
    return flags


# --------------------------------------------------------------------------
# Curation-funnel thresholds (the chained keep/drop pipeline).
# --------------------------------------------------------------------------
REP_MAX_BP = 100  # drop docs whose repeated-3-gram fraction exceeds 1%

# --------------------------------------------------------------------------
# BPE-ish pre-tokenizer (GPT-2 style, simplified to the Java∩RE2 dialect:
# the original's \s+(?!\S) lookahead is not RE2-expressible).  Runs of
# letters / digits / punctuation each form one token, with an optional
# leading space glued on; residual space runs are their own tokens.
# --------------------------------------------------------------------------
BPE_SPLIT_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"

# --------------------------------------------------------------------------
# int8 symmetric quantization — scale = max|x| / 127 per vector.
# quantize = floor(x/scale + 0.5) (identical half-up in BOTH engines;
# plain round() is banned by CLAUDE.md: engines disagree on exact halves).
# --------------------------------------------------------------------------
QUANT_LEVELS = 127
