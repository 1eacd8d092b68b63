"""Text-normalization column expressions.

Re-expresses the reference's per-row string helpers as pure Catalyst column
expressions (whole-stage-codegen'd, no Python in the hot path):

- ``sanitize_text``   <- ``06…ipynb:552-640 sanitize_text`` (HTML strip, entity
  decode, unicode punctuation normalize, whitespace collapse).  The cp1252
  mojibake repair step is the one part that genuinely needs Python; it lives in
  ``fix_mojibake`` as a vectorized pandas UDF, applied only where a cheap
  mojibake marker predicate fires.
- ``slugify``         <- ``01…ipynb:514 slugify`` / ``06…ipynb slugify_token``.
- ``normalize_title`` <- ``08…ipynb:1196 normalize_title`` (dup-title grouping key).
- ``tokenize``        — whitespace/punct tokenizer used by the text-analysis and
  dedup operators (engine-new; training-data-pipeline surface).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Unicode punctuation the reference maps to ASCII (06…ipynb:552 sanitize_text):
# curly quotes, en/em dashes, non-breaking space.  SRC and DST are PAIRED BY
# POSITION and must stay the same length: round 3 found DST one char long
# (an extra '-'), which silently sent NBSP to '-' instead of ' ', fusing
# words in scraped HTML ('flood\xa0risk' -> 'flood-risk') and corrupting
# every downstream tokenize / dedup-key / \b-pattern match.
_UNICODE_SRC = "‘’“”–— "
_UNICODE_DST = "''\"\"-- "
assert len(_UNICODE_SRC) == len(_UNICODE_DST)

# HTML entity decode table, IN ORDER.  '&amp;' must decode LAST: decoding it
# first double-unescapes escaped entities ('a &amp;lt; b' — which renders as
# 'a &lt; b' — would become 'a < b', one decode too many).  The DuckDB
# sanitize oracle is generated from this same table (queries_extractors).
ENTITY_TABLE: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def sanitize_text(col: Column) -> Column:
    """HTML-strip + entity-decode + punctuation-normalize + whitespace-collapse."""
    c = F.regexp_replace(col, r"<[^>]+>", " ")  # strip tags
    for entity, char in ENTITY_TABLE:
        c = F.replace(c, F.lit(entity), F.lit(char))
    c = F.translate(c, _UNICODE_SRC, _UNICODE_DST)
    c = F.regexp_replace(c, r"…", "...")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def slugify(col: Column, max_len: int = 80) -> Column:
    """lowercase, non-alnum -> '_', squeeze, trim, truncate (01…ipynb:514)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9]+", "_")
    c = F.regexp_replace(c, r"_+", "_")
    c = F.regexp_replace(c, r"^_|_$", "")
    return F.substring(c, 1, max_len)


def normalize_title(col: Column) -> Column:
    """Duplicate-title grouping key (08…ipynb:1196): lowercase, strip punct,
    collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokenize(col: Column) -> Column:
    """Split on non-alphanumeric runs -> array<string> of lowercase tokens."""
    return F.filter(
        F.split(F.lower(col), r"[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )


@pandas_udf(StringType())
def fix_mojibake(s: pd.Series) -> pd.Series:
    """cp1252->utf8 repair (06…ipynb:552 sanitize_text step 1), vectorized.

    The marker gate lives INSIDE the UDF (a vectorized str.contains), not in
    a surrounding F.when: Spark hoists Python UDFs out of conditionals and
    runs them on every row regardless (the same silent no-op gate url.py's
    module docstring documents for round 1's URL UDF), so the in-Python
    prefilter is the only gate that actually skips the per-row
    encode/decode attempts.  Rows still pay the Arrow round-trip — callers
    on genuinely hot paths should DataFrame-filter/union instead.
    """
    mask = s.notna() & s.str.contains(MOJIBAKE_MARKER, regex=True, na=False)
    if not mask.any():
        return s

    def _fix(x):
        try:
            return x.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return x

    out = s.copy()
    out[mask] = s[mask].map(_fix)
    return out


@pandas_udf(StringType())
def nfkd_lower(s: pd.Series) -> pd.Series:
    """NFKD-normalize + casefold (02…ipynb cell-2-1 ``norm_str``), vectorized.
    Spark has no NFKD builtin (SURVEY §2.8 unicode row), so this is one of
    the engine's few pandas UDFs — keep it off hot paths; comparison keys
    that only need ASCII folding should use normalize_title instead."""
    import unicodedata

    # casefold, not lower: the cited norm_str casefolds, and the two differ
    # on e.g. 'ß' (lower 'ß' vs casefold 'ss') — comparison keys must match
    # the reference's
    return s.map(
        lambda x: unicodedata.normalize("NFKD", x).casefold()
        if x is not None else None
    )


MOJIBAKE_MARKER = r"(Ã|â€|Â)"


def repair_text(col: Column) -> Column:
    """Mojibake repair.  NOT wrapped in F.when: Spark hoists Python UDFs out
    of conditionals and evaluates them on every row anyway, so a JVM-side
    gate is a no-op that only hides the cost — the real prefilter is the
    vectorized marker mask inside fix_mojibake."""
    return fix_mojibake(col)
