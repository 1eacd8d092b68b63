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
# curly quotes, en/em dashes, ellipsis, non-breaking space.
_UNICODE_SRC = "‘’“”–— "
_UNICODE_DST = "''\"\"--- "


def sanitize_text(col: Column) -> Column:
    """HTML-strip + entity-decode + punctuation-normalize + whitespace-collapse."""
    c = F.regexp_replace(col, r"<[^>]+>", " ")  # strip tags
    c = F.regexp_replace(c, r"&nbsp;", " ")
    c = F.regexp_replace(c, r"&amp;", "&")
    c = F.regexp_replace(c, r"&lt;", "<")
    c = F.regexp_replace(c, r"&gt;", ">")
    c = F.regexp_replace(c, r"&quot;", '"')
    c = F.regexp_replace(c, r"&#39;", "'")
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

    Only rows whose text contains a mojibake marker (e.g. 'Ã', 'â€') should be
    routed here; everything else stays JVM-side.
    """

    def _fix(x):
        if x is None:
            return None
        try:
            repaired = x.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return x
        return repaired

    return s.map(_fix)


@pandas_udf(StringType())
def nfkd_lower(s: pd.Series) -> pd.Series:
    """NFKD-normalize + casefold (02…ipynb cell-2-1 ``norm_str``), vectorized.
    Spark has no NFKD builtin (SURVEY §2.8 unicode row), so this is one of
    the engine's few pandas UDFs — keep it off hot paths; comparison keys
    that only need ASCII folding should use normalize_title instead."""
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFKD", x).lower() if x is not None else None
    )


MOJIBAKE_MARKER = r"(Ã|â€|Â)"


def repair_text(col: Column) -> Column:
    """Conditional mojibake repair: cheap JVM predicate gates the pandas UDF."""
    return F.when(col.rlike(MOJIBAKE_MARKER), fix_mojibake(col)).otherwise(col)
