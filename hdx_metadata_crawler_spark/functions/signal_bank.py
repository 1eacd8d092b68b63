"""Signal-dictionary-scale pattern bank: ~300 regexes in 11 sections, with
Python→Java/RE2 dialect translation and per-value alternation fusion.

The reference evaluates ~300 compiled patterns from
``config/signal_dictionary.yaml`` (11 sections, each mapping an RDLS codelist
value to a pattern list + confidence — ``:27,116,188,290,324,398,407,421,
443,471``), merging each value's pattern list into one alternation when it
probes (``'|'.join(info['patterns'])``, ``08…ipynb`` cell 11).  SURVEY §7.4
risk 3 flags the regex-dialect drift (Python ``re`` vs Java vs the DuckDB
oracle's RE2): inline ``(?i)`` is position-restricted in modern Python,
while the scoped form ``(?i:...)`` parses identically in all three engines;
backreferences and lookaround exist in Python/Java but NOT in RE2.

This module carries:
- the bank itself — deterministic synthetic config data with the exact
  section/value/patterns/confidence structure of signal_dictionary.yaml,
  sized at reference scale (~300 patterns) and using the reference's pattern
  idioms (``\\b`` anchors, ``.?`` separators, alternation groups, inline
  case flags);
- ``translate_pattern`` — the Python→common-dialect translator (leading
  ``(?i)`` → scoped ``(?i:...)``) plus the compatibility gate that routes
  patterns using engine-specific constructs to the pandas-UDF fallback;
- ``fuse_value_patterns`` — the per-value alternation fusion (~3x fewer
  rlike evaluations, mirroring the reference's merge).
"""

from __future__ import annotations

import re

# Confidence levels of the signal dictionary header (high 0.9 / medium 0.7 /
# low 0.5).
CONFIDENCE_LEVELS = {"high": 0.9, "medium": 0.7, "low": 0.5}

# The 11 sections — one per RDLS codelist the reference maps
# (signal_dictionary.yaml:27,116,188,290,324,398,407,421,443,471 + socio).
SECTIONS = [
    "hazard_type", "process_type", "exposure_category", "impact_metric",
    "quantity_kind", "analysis_type", "function_type", "approach",
    "relationship", "impact_type", "frequency_type",
]

_VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "line", "sort", "window", "spark", "order",
    "data", "column", "join", "small", "customer", "query", "big", "stream",
    "group", "filter", "vector",
]

_VALUES_PER_SECTION = 8


def _make_patterns(si: int, vi: int) -> list[str]:
    """Deterministic pattern list for section si, value vi — cycles through
    the reference's pattern idioms over the synthetic vocabulary."""
    n = len(_VOCAB)
    w = [_VOCAB[(si * 11 + vi * 3 + k) % n] for k in range(4)]
    pats = [
        rf"\b({w[0]}|{w[1]})\b",            # alternation group (flood|flooding)
        rf"\b{w[1]}.?{w[2]}\b",             # separator form (coastal.?flood)
        rf"(?i)\b{w[2].upper()}\b",         # leading inline flag (translated)
    ]
    if vi % 2 == 0:
        pats.append(rf"\b{w[3]}\s+{w[0]}\b")  # whitespace pair
    if vi % 4 == 0:
        pats.append(rf"\b{w[0]}\d{{0,2}}\b")  # optional digit suffix (fl\d{8})
    return pats


# section -> value -> {"patterns": [...], "confidence": level}
SIGNAL_BANK: dict[str, dict[str, dict]] = {
    section: {
        f"{section}_v{vi}": {
            "patterns": _make_patterns(si, vi),
            "confidence": ["high", "medium", "low"][vi % 3],
        }
        for vi in range(_VALUES_PER_SECTION)
    }
    for si, section in enumerate(SECTIONS)
}

N_PATTERNS = sum(
    len(v["patterns"]) for sec in SIGNAL_BANK.values() for v in sec.values()
)

# Constructs that do NOT survive all three engines (Python re / Java / RE2):
# numeric AND named backreferences and lookaround are absent from RE2;
# possessive quantifiers, atomic groups, and \G are Java-only; Python-only
# group syntax ((?P<..>, (?P=..)) parses nowhere else.  Patterns using them
# fall back to the pandas-UDF evaluator instead of rlike.
_UNSAFE = re.compile(
    r"\\[0-9]"          # numeric backreference
    r"|\(\?=|\(\?!"     # lookahead
    r"|\(\?<"           # lookbehind AND Java-style named groups
    r"|\(\?P[<=]"       # Python named group / named backreference
    r"|\(\?>"           # atomic group (Java-only)
    r"|[*+?]\+"         # possessive quantifier (Java-only)
    r"|\\G"             # anchor (Java-only)
)

# Inline flags safe in ALL three dialects: i (case), m (multiline), s
# (dotall).  Python-only flags (a, L, u, x) must NOT be translated to the
# scoped form — RE2/Java reject or reinterpret them.
_LEADING_FLAG = re.compile(r"^\(\?([ims]+)\)")
_ANY_LEADING_FLAG = re.compile(r"^\(\?([a-zA-Z]+)\)")


def is_common_dialect(pattern: str) -> bool:
    """True when the pattern parses and matches identically in Python re,
    Java (Spark rlike), and RE2 (the DuckDB oracle)."""
    if _UNSAFE.search(pattern) is not None:
        return False
    m = _ANY_LEADING_FLAG.match(pattern)
    if m and not set(m.group(1)) <= set("ims"):
        return False  # Python-only flag (a/L/u/x): no cross-dialect form
    return True


def translate_pattern(pattern: str) -> str:
    """Python-style pattern → the common dialect.

    Leading global inline flags ``(?i)p`` become the scoped form ``(?i:p)``:
    Python ≥3.11 rejects ``(?i)`` anywhere but position 0, Java/RE2 scope it
    to the enclosing group — the scoped form means the same thing in all
    three.  Raises on patterns that cannot cross dialects (use the
    pandas-UDF fallback for those).
    """
    if not is_common_dialect(pattern):
        raise ValueError(f"pattern needs the Python-UDF fallback: {pattern!r}")
    m = _LEADING_FLAG.match(pattern)
    if m:
        return f"(?{m.group(1)}:{pattern[m.end():]})"
    return pattern


def fuse_value_patterns(patterns: list[str]) -> str:
    """One alternation per codelist value (the reference's
    ``'|'.join(info['patterns'])`` merge) — each branch non-capturing so the
    fused pattern is semantically the OR of its members in every dialect."""
    return "|".join(f"(?:{translate_pattern(p)})" for p in patterns)


def fused_bank() -> list[tuple[str, str, str, float]]:
    """[(section, value, fused_pattern, confidence)] — the probe table.
    ~{N} raw patterns fuse to one alternation per (section, value)."""
    out = []
    for section in SECTIONS:
        for value, info in SIGNAL_BANK[section].items():
            out.append(
                (
                    section,
                    value,
                    fuse_value_patterns(info["patterns"]),
                    CONFIDENCE_LEVELS[info["confidence"]],
                )
            )
    return out
