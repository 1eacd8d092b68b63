"""Deterministic hash-based sampling for training-data mixing.

The mixing step of a corpus pipeline: each source (or any stratum) gets a
target inclusion rate, and membership is decided by a salted content-free
hash of the document id — NOT by ``df.sample``/rand(), which draws a
different corpus every run and cannot be oracle-checked.  Properties the
hash-ticket design buys at 100 TB:

- **map-only**: no shuffle, no count pass, no sort — the filter runs inside
  the scan's codegen stage and composes with predicate pushdown;
- **reproducible**: the same doc draws the same ticket in every run,
  cluster size, and engine (portable md5 form — DuckDB computes the
  identical ticket), so a mix is a *specification*, not a snapshot;
- **monotone**: raising a stratum's weight only ADDS documents (a doc is
  kept iff ticket < rate), so mix ablations are supersets of each other
  and cache/dedup work on the smaller mix is reusable;
- **salted**: independent mixes (train/val splits, ablation draws) use
  different salts, giving independent tickets from the same ids.

Engine-new surface (the reference crawls + classifies; mixing is the
downstream training-data op this engine adds, same family as the dedup
ladder in ``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import MD5_BASE28_SQL, md5_base28

# Default corpus mix for the `corpus_mix_sample` query — ONE source of
# truth interpolated into both the Spark plan and the DuckDB oracle
# (CLAUDE.md shared-constants rule).  Rates are integer BASIS POINTS.
MIX_WEIGHTS_BP: dict[str, int] = {
    "src0": 10000,  # keep everything
    "src1": 8000,
    "src2": 6000,
    "src3": 5000,
    "src4": 2500,
    "src5": 1000,
}
DEFAULT_MIX_BP = 4000
MIX_SALT = "mix1"
TICKET_MOD = 10000


def mix_ticket(id_col: Column, salt: str) -> Column:
    """Deterministic per-id ticket in [0, TICKET_MOD) — portable md5 form."""
    return (
        md5_base28(F.concat(id_col.cast("string"), F.lit(":" + salt)))
        % TICKET_MOD
    )


def mix_ticket_sql(id_expr: str, salt: str) -> str:
    """DuckDB twin of ``mix_ticket`` (same digest, same modulus)."""
    base = MD5_BASE28_SQL.format(x=f"CAST({id_expr} AS VARCHAR) || ':{salt}'")
    return f"({base} % {TICKET_MOD})"


def rate_bp_column(strata_col: Column, weights_bp: dict[str, int], default_bp: int) -> Column:
    """Per-row target rate: chained literal whens (JVM-side, codegen'd)."""
    expr = None
    for key, bp in sorted(weights_bp.items()):
        cond = strata_col == key
        expr = F.when(cond, bp) if expr is None else expr.when(cond, bp)
    out = expr.otherwise(default_bp) if expr is not None else F.lit(default_bp)
    return out.cast("int")


def rate_bp_case_sql(strata_expr: str, weights_bp: dict[str, int], default_bp: int) -> str:
    """DuckDB twin of ``rate_bp_column`` — built from the SAME dict."""
    whens = " ".join(
        f"WHEN '{key}' THEN {bp}" for key, bp in sorted(weights_bp.items())
    )
    return f"CAST(CASE {strata_expr} {whens} ELSE {default_bp} END AS INTEGER)"


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weights_bp: dict[str, int] | None = None,
    default_bp: int = DEFAULT_MIX_BP,
    salt: str = MIX_SALT,
) -> DataFrame:
    """Keep each row iff its salted id-ticket falls under its stratum's
    rate.  Adds ``ticket`` and ``rate_bp`` columns so the output doubles as
    the audit worksheet (expected rate vs the draw that admitted the row).
    """
    if weights_bp is None:
        weights_bp = MIX_WEIGHTS_BP
    return (
        df.withColumn("ticket", mix_ticket(F.col(id_col), salt))
        .withColumn("rate_bp", rate_bp_column(F.col(strata_col), weights_bp, default_bp))
        .filter(F.col("ticket") < F.col("rate_bp"))
    )
