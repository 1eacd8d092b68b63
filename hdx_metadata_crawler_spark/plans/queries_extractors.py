"""Extractor/report-layer queries (SURVEY v4-v6): the OSM multi-rule
detector, text sanitization, return-period extraction with event assembly,
composite confidence scoring + tiering, pivot/cube reports, missing-field
explode counts, dim-table country resolution, and the pilot shortlist.

Every query is pure column algebra (no Python in the row path) with a
DuckDB oracle; reference citations per operator in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.folds import any_of, when_chain
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# P4 — OSM detector: multi-rule boolean predicate with reasons + strong set
# (02…ipynb:437-560 detect_osm: 4 strong rules => flag, else >=2 supporting)
# ---------------------------------------------------------------------------

_RULES = [
    ("rule_table", "table"),
    ("rule_stream", "stream"),
    ("rule_join", "join"),
    ("rule_window", "window"),
    ("rule_vector", "vector"),
    ("rule_merge", "merge"),
]
_STRONG = ["rule_table", "rule_stream"]


@register(
    "osm_detector",
    f"""
    WITH rules AS (
      SELECT doc_id,
             {', '.join(f"regexp_matches(text, '{pat}') AS {name}"
                        for name, pat in _RULES)}
      FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(
             list_filter([{', '.join(f"CASE WHEN {name} THEN '{name}' ELSE NULL END"
                                     for name, _ in _RULES)}],
                         x -> x IS NOT NULL), ','), '') AS reasons,
           (rule_table OR rule_stream) AS strong_hit,
           ({' + '.join(f"CASE WHEN {name} THEN 1 ELSE 0 END"
                        for name, _ in _RULES if name not in _STRONG)})
             AS n_supporting,
           ((rule_table OR rule_stream)
            OR ({' + '.join(f"CASE WHEN {name} THEN 1 ELSE 0 END"
                            for name, _ in _RULES if name not in _STRONG)}) >= 2)
             AS flagged
    FROM rules
    """,
    doc="Multi-rule boolean detector with fired-reasons evidence (SURVEY P4, "
        "02…ipynb:437-560 detect_osm: strong-rule => flag, else >=2 "
        "supporting rules). Pure column expressions — per-rule booleans, "
        "reasons via filtered literal array, no UDF.",
)
def osm_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rules = d.select(
        "doc_id", *[F.col("text").rlike(pat).alias(name) for name, pat in _RULES]
    )
    reasons = F.filter(
        F.array(*[
            F.when(F.col(name), F.lit(name)).otherwise(F.lit(None))
            for name, _ in _RULES
        ]),
        lambda x: x.isNotNull(),
    )
    supporting = [name for name, _ in _RULES if name not in _STRONG]
    n_supporting = sum(F.col(n).cast("int") for n in supporting)
    strong_hit = F.col(_STRONG[0]) | F.col(_STRONG[1])
    return rules.select(
        "doc_id",
        F.concat_ws(",", reasons).alias("reasons"),
        strong_hit.alias("strong_hit"),
        n_supporting.alias("n_supporting"),
        (strong_hit | (n_supporting >= 2)).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# P3 — fast text prefilter as an explicit two-stage filter
# (02…ipynb:385-434: FAST_MARKERS substring scan of the RAW text BEFORE the
# expensive parse/detect; the prefilter is a SUPERSET test — final detection
# stays authoritative).  Markers cover every token the detector's rules can
# fire on, so prefilter-false rows can be skipped without loss.
# ---------------------------------------------------------------------------

FAST_MARKERS = ["table", "stream", "join", "window", "vector", "merge"]


@register(
    "osm_prefilter",
    f"""
    SELECT doc_id,
           ({' OR '.join(f"contains(text, '{m}')" for m in FAST_MARKERS)})
             AS maybe_osm,
           ((regexp_matches(text, 'table') OR regexp_matches(text, 'stream'))
            OR ({' + '.join(f"CASE WHEN regexp_matches(text, '{name.split('_')[1]}') THEN 1 ELSE 0 END"
                            for name in ('rule_join', 'rule_window', 'rule_vector', 'rule_merge'))}) >= 2)
             AS flagged
    FROM documents
    """,
    doc="Two-stage fast prefilter (SURVEY P3, 02…ipynb:385-434 "
        "prefilter_maybe_osm): cheap substring markers over the raw text "
        "gate the multi-rule regex detector; the superset property "
        "(flagged => maybe_osm) is asserted in tests so prefilter-false "
        "rows are provably skippable. At 100 TB the contains() predicate "
        "costs a vectorized scan; the regex bank only runs on survivors.",
)
def osm_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    maybe = any_of(F.col("text").contains(m) for m in FAST_MARKERS)
    strong = F.col("text").rlike("table") | F.col("text").rlike("stream")
    supporting = sum(
        F.col("text").rlike(p).cast("int") for p in ("join", "window", "vector", "merge")
    )
    return d.select(
        "doc_id",
        maybe.alias("maybe_osm"),
        (strong | (supporting >= 2)).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# P10 — loss false-positive exclusions + weak-signal downgrade
# (11…ipynb:2541 LOSS_EXCLUSION_PATTERNS with [\s._-]? separators; applied
# at :3087-3100: exclusion hit + only generic signals => drop entirely,
# exclusion hit + strong signals => keep but FILTER OUT the generic ones).
# ---------------------------------------------------------------------------

LOSS_SIGNAL_PATTERNS: list[tuple[str, str]] = [
    ("economic_loss", r"\b(value|customer)\b"),
    ("human_loss", r"\bline\b"),
    ("infrastructure_damage", r"\b(column|part)\b"),
    ("general_loss", r"\b(data|row)\b"),  # the weak/generic signal
]
LOSS_EXCLUSION_PATTERNS: list[str] = [
    r"\bslow[\s._-]?value\b",
    r"\bslow[\s._-]?line\b",
    r"\bsmall[\s._-]?value\b",
    r"\bbig[\s._-]?data\b",
]
_WEAK_SIGNALS = ("general_loss",)


@register(
    "loss_signal_detection",
    f"""
    WITH sig AS (
      SELECT doc_id,
             ({' OR '.join(f"regexp_matches(text, '{p}')" for p in LOSS_EXCLUSION_PATTERNS)})
               AS has_exclusion,
             {', '.join(f"regexp_matches(text, '{p}') AS s_{name}"
                        for name, p in LOSS_SIGNAL_PATTERNS)}
      FROM documents
    )
    SELECT doc_id, has_exclusion,
           coalesce(concat_ws(',',
             {', '.join(f"CASE WHEN s_{name} THEN '{name}' END"
                        for name, _ in LOSS_SIGNAL_PATTERNS)}), '') AS detected,
           coalesce(concat_ws(',',
             {', '.join(f"CASE WHEN s_{name} AND NOT (has_exclusion AND {str(name in _WEAK_SIGNALS).lower()}) THEN '{name}' END"
                        for name, _ in LOSS_SIGNAL_PATTERNS)}), '') AS kept,
           ({' OR '.join(f"(s_{name} AND NOT (has_exclusion AND {str(name in _WEAK_SIGNALS).lower()}))"
                         for name, _ in LOSS_SIGNAL_PATTERNS)}) AS extract_loss
    FROM sig
    """,
    doc="Loss false-positive exclusions + weak-signal downgrade (SURVEY P10; "
        "11…ipynb:2541 LOSS_EXCLUSION_PATTERNS '[\\s._-]?'-separated pairs, "
        "applied :3087: exclusion + only-generic signals => drop, exclusion "
        "+ strong signals => strip the generic ones). Pure column algebra, "
        "one scan, no shuffle.",
)
def loss_signal_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    has_excl = any_of(F.col("text").rlike(p) for p in LOSS_EXCLUSION_PATTERNS)
    sig = {name: F.col("text").rlike(p) for name, p in LOSS_SIGNAL_PATTERNS}
    kept_flags = {
        name: sig[name] & ~(has_excl & F.lit(name in _WEAK_SIGNALS))
        for name, _ in LOSS_SIGNAL_PATTERNS
    }
    extract_loss = any_of(kept_flags[name] for name, _ in LOSS_SIGNAL_PATTERNS)
    return d.select(
        "doc_id",
        has_excl.alias("has_exclusion"),
        F.concat_ws(
            ",", *[F.when(sig[n], F.lit(n)) for n, _ in LOSS_SIGNAL_PATTERNS]
        ).alias("detected"),
        F.concat_ws(
            ",", *[F.when(kept_flags[n], F.lit(n)) for n, _ in LOSS_SIGNAL_PATTERNS]
        ).alias("kept"),
        extract_loss.alias("extract_loss"),
    )


# ---------------------------------------------------------------------------
# P7 — text sanitization chain (06…ipynb:552-640 sanitize_text)
# Messy wrapper exercising every chain member: tags, all six entities,
# curly quotes, en/em dash, ellipsis, NBSP, whitespace runs.
_SANITIZE_TAIL_A = "</p>&nbsp;&amp; “"
_SANITIZE_TAIL_B = "” &#39;q&#39; – — … &lt;tag&gt;  end"


def _sanitize_oracle() -> str:
    """DuckDB twin of functions/text.sanitize_text, generated from the SAME
    constants (ENTITY_TABLE, translate src/dst) in the SAME order."""
    from ..functions.text import ENTITY_TABLE, _UNICODE_DST, _UNICODE_SRC

    def q(s: str) -> str:
        return s.replace("'", "''")

    messy = f"'<p>' || text || '{q(_SANITIZE_TAIL_A)}' || lang || '{q(_SANITIZE_TAIL_B)}'"
    c = f"regexp_replace({messy}, '<[^>]+>', ' ', 'g')"
    for a, b in ENTITY_TABLE:
        c = f"replace({c}, '{q(a)}', '{q(b)}')"
    c = f"translate({c}, '{q(_UNICODE_SRC)}', '{q(_UNICODE_DST)}')"
    c = f"replace({c}, '…', '...')"
    c = f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"
    return f"SELECT doc_id, {c} AS clean_text FROM documents WHERE doc_id < 100"
# ---------------------------------------------------------------------------

@register(
    "sanitize_text",
    _sanitize_oracle(),
    doc="Sanitization chain (SURVEY P7, 06…ipynb:552-640 sanitize_text): "
        "runs THE shared functions/text.sanitize_text helper — HTML strip, "
        "full entity decode (&nbsp; &amp; &lt; &gt; &quot; &#39;), "
        "curly-quote/dash translate, ellipsis normalize, whitespace "
        "collapse — on a messy wrapper that exercises every chain member; "
        "the oracle mirrors the chain step-for-step, generated from the "
        "same constants so the two cannot drift.  (The cp1252 mojibake "
        "repair step is the one pandas-UDF member of the chain; exercised "
        "in tests/test_functions_text.py.)",
)
def sanitize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as _t

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    messy = F.concat(
        F.lit("<p>"), F.col("text"), F.lit(_SANITIZE_TAIL_A),
        F.col("lang"), F.lit(_SANITIZE_TAIL_B),
    )
    return d.select("doc_id", _t.sanitize_text(messy).alias("clean_text"))


# ---------------------------------------------------------------------------
# v5 — return-period extraction + hazard event assembly
# (09…ipynb:357 RP_PATTERNS + _extract_return_periods year-guard;
#  event build: one event per RP, event_rate = round(1/rp, 6), ids
#  event_set_{uuid8}_{i} — 09…ipynb:402 build_hazard_block)
# ---------------------------------------------------------------------------


def _rp_list() -> "F.Column":
    """Shared return-period extraction expression (09…ipynb RP_PATTERNS +
    year-guard): synthetic rp_text from user_id, extract all integer runs,
    keep rp > 0 outside the 2000-2099 year window, distinct + sorted.  ONE
    definition for both the per-event query and the record assembly so the
    guard cannot drift between the two surfaces."""
    rp_text = F.concat(
        F.lit("flood hazard "), (F.col("user_id") * 5).cast("string"),
        F.lit("-year return period, sensor 2021 and "),
        (F.col("user_id") * 10).cast("string"), F.lit(" year event"),
    )
    return F.array_sort(
        F.array_distinct(
            F.filter(
                F.transform(
                    F.regexp_extract_all(rp_text, F.lit("[0-9]+"), 0),
                    lambda x: x.cast("int"),
                ),
                lambda rp: (rp > 0) & ~rp.between(2000, 2099),
            )
        )
    )


# DuckDB twin of _rp_list — ONE fragment interpolated into both oracles
# (return_period_events and rdls_record_assembly), completing the Spark-side
# one-definition invariant above on the SQL side too.
_RP_TEXT_SQL = (
    "'flood hazard ' || CAST(user_id * 5 AS VARCHAR)"
    " || '-year return period, sensor 2021 and '"
    " || CAST(user_id * 10 AS VARCHAR) || ' year event'"
)
_RP_LIST_SQL = f"""list_sort(list_distinct(
               list_filter(
                 list_transform(regexp_extract_all({_RP_TEXT_SQL}, '[0-9]+'),
                                x -> CAST(x AS INTEGER)),
                 rp -> rp > 0 AND NOT (rp BETWEEN 2000 AND 2099))))"""


@register(
    "return_period_events",
    f"""
    WITH rps AS (
      SELECT event_id, {_RP_LIST_SQL} AS rp_list
      FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           'event_set_' || CAST(event_id AS VARCHAR) || '_'
             || CAST(i - 1 AS VARCHAR)                    AS event_set_id,
           rp_list[i]                                     AS return_period,
           round(1.0 / rp_list[i], 6)                     AS event_rate
    FROM rps, unnest(range(1, len(rp_list) + 1)) AS t(i)
    WHERE len(rp_list) > 0
    """,
    doc="Return-period extraction + per-RP event assembly (SURVEY §2.8 "
        "regex-extract + v5: 09…ipynb RP_PATTERNS, year-guard 2000-2099, "
        "event_rate=round(1/rp,6), deterministic event ids via posexplode — "
        "09…ipynb:402 build_hazard_block builds one event per RP).",
)
def return_period_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    rp_list = _rp_list()
    return (
        ev.select("event_id", rp_list.alias("rp_list"))
        .filter(F.size("rp_list") > 0)
        .select("event_id", F.posexplode("rp_list").alias("i", "return_period"))
        .select(
            "event_id",
            F.concat_ws(
                "_", F.lit("event_set"), F.col("event_id"), F.col("i")
            ).alias("event_set_id"),
            "return_period",
            F.round(F.lit(1.0) / F.col("return_period"), 6).alias("event_rate"),
        )
    )


@register(
    "rdls_record_assembly",
    f"""
    WITH rps AS (
      SELECT event_id, {_RP_LIST_SQL} AS rp_list
      FROM events WHERE event_id < 1000
    )
    SELECT event_id,
           to_json(struct_pack(
             id := 'rdls_hzd-' || CAST(event_id AS VARCHAR),
             risk_data_type := ['hazard'],
             event_sets := [struct_pack(
               id := 'event_set_' || CAST(event_id AS VARCHAR) || '_0',
               events := list_transform(rp_list, rp -> struct_pack(
                 id := 'event_' || CAST(event_id AS VARCHAR) || '_'
                       || CAST(rp AS VARCHAR),
                 return_period := rp,
                 rate_ppm := CAST(round(1000000.0 / rp) AS BIGINT))))]
           )) AS record_json
    FROM rps
    WHERE len(rp_list) > 0
    """,
    doc="Nested RDLS-style record assembly (SURVEY §1 nested output records, "
        "06…ipynb:1343-1520 build_rdls_record + 09…ipynb:402 "
        "build_hazard_block): hazard.event_sets[].events[] built with pure "
        "struct/transform column algebra, serialized with to_json — the "
        "oracle builds byte-identical JSON via DuckDB struct_pack/to_json. "
        "Rates carried as integer ppm so float formatting can't diverge "
        "between serializers.",
)
def rdls_record_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    rp_list = _rp_list()
    eid = F.col("event_id").cast("string")
    record = F.struct(
        F.concat(F.lit("rdls_hzd-"), eid).alias("id"),
        F.array(F.lit("hazard")).alias("risk_data_type"),
        F.array(
            F.struct(
                F.concat(F.lit("event_set_"), eid, F.lit("_0")).alias("id"),
                F.transform(
                    F.col("rp_list"),
                    lambda rp: F.struct(
                        F.concat(
                            F.lit("event_"), eid, F.lit("_"), rp.cast("string")
                        ).alias("id"),
                        rp.alias("return_period"),
                        F.round(F.lit(1000000.0) / rp)
                        .cast("long")
                        .alias("rate_ppm"),
                    ),
                ).alias("events"),
            )
        ).alias("event_sets"),
    )
    return (
        ev.select("event_id", rp_list.alias("rp_list"))
        .filter(F.size("rp_list") > 0)
        .select("event_id", F.to_json(record).alias("record_json"))
    )


# ---------------------------------------------------------------------------
# v5 — NB10 tier-cascade merge (_merge_tiers, 10…ipynb:679; SURVEY §7.4 risk
# 5).  Three scan tiers with fixed confidences (T1 title/name/tags = 1.0,
# T2 resources = 0.85, T3 notes/methodology = 0.6, 10…ipynb:523-526) merge
# per category under these rules:
#   1. Tier 1 always included.
#   2. Tier 2 adds new categories OR corroborates (+0.05, cap 1.0).
#   3. Tier 3 ONLY corroborates (+0.05, cap 1.0) — it may introduce
#      categories only when tiers 1+2 found NOTHING AT ALL for the document
#      (the 'if final:' check is per-document, not per-category).
# The synthetic document's three tier fields are byte ranges of its text
# (title = [1,80], resources = [81,160], notes = the rest).
# ---------------------------------------------------------------------------

TIER1_CONFIDENCE = 1.0
TIER2_CONFIDENCE = 0.85
TIER3_CONFIDENCE = 0.6
CORROBORATION_BOOST = 0.05

TIER_CATEGORIES: list[tuple[str, str]] = [
    ("infrastructure", r"\btable\b"),
    ("population", r"\bstream\b"),
    ("roads", r"\bjoin\b"),
    ("agriculture", r"\bvector\b"),
    ("energy", r"\bwindow\b"),
]


def _tier_merge_oracle() -> str:
    hits = ",\n             ".join(
        f"regexp_matches(substr(text, 1, 80), '{p}') AS t1_{c}, "
        f"regexp_matches(substr(text, 81, 80), '{p}') AS t2_{c}, "
        f"regexp_matches(substr(text, 161, 100000), '{p}') AS t3_{c}"
        for c, p in TIER_CATEGORIES
    )
    any12 = " OR ".join(f"t1_{c} OR t2_{c}" for c, _ in TIER_CATEGORIES)
    branches = ", ".join(
        f"""CASE
          WHEN t1_{c} THEN struct_pack(
            category := '{c}',
            confidence := round(least(1.0, {TIER1_CONFIDENCE}
              + (CASE WHEN t2_{c} THEN {CORROBORATION_BOOST} ELSE 0 END)
              + (CASE WHEN t3_{c} THEN {CORROBORATION_BOOST} ELSE 0 END)), 2),
            tier_source := 'tier1',
            corroborated := (t2_{c} OR t3_{c}))
          WHEN t2_{c} THEN struct_pack(
            category := '{c}',
            confidence := round(least(1.0, {TIER2_CONFIDENCE}
              + (CASE WHEN t3_{c} THEN {CORROBORATION_BOOST} ELSE 0 END)), 2),
            tier_source := 'tier2',
            corroborated := t3_{c})
          WHEN t3_{c} AND NOT any12 THEN struct_pack(
            category := '{c}',
            confidence := {TIER3_CONFIDENCE},
            tier_source := 'tier3',
            corroborated := false)
        END"""
        for c, _ in TIER_CATEGORIES
    )
    return f"""
    WITH hits AS (
      SELECT doc_id, {hits}
      FROM documents
    ),
    flagged AS (SELECT *, ({any12}) AS any12 FROM hits),
    merged AS (
      SELECT doc_id,
             unnest(list_filter([{branches}], x -> x IS NOT NULL)) AS m
      FROM flagged
    )
    SELECT doc_id, m.category AS category,
           CAST(m.confidence AS DOUBLE) AS confidence,
           m.tier_source AS tier_source, m.corroborated AS corroborated
    FROM merged
    """


@register(
    "tier_merge",
    _tier_merge_oracle(),
    doc="NB10 tier-cascade merge as pure column algebra (10…ipynb:679 "
        "_merge_tiers; SURVEY §7.4 risk 5): T1 always in; T2 adds-or-boosts "
        "(+0.05 cap 1.0); T3 boosts only — unless tiers 1+2 found nothing "
        "document-wide, in which case T3 may introduce (the fallback arm). "
        "One select + explode of per-category structs, no shuffle; per-branch "
        "unit fixtures in tests/test_tier_merge.py.",
)
def tier_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return tier_merge_frame(d)


def tier_merge_frame(d: DataFrame) -> DataFrame:
    """The merge applied to any frame with (doc_id, text) — shared by the
    registered query and the branch-coverage unit fixtures."""
    t1f = F.substring("text", 1, 80)
    t2f = F.substring("text", 81, 80)
    t3f = F.substring("text", 161, 100000)
    hit = {
        c: (t1f.rlike(p), t2f.rlike(p), t3f.rlike(p)) for c, p in TIER_CATEGORIES
    }
    any12 = any_of(hit[c][0] | hit[c][1] for c, _ in TIER_CATEGORIES)

    def branch(c: str):
        t1, t2, t3 = hit[c]
        boost = F.lit(CORROBORATION_BOOST)
        return (
            F.when(
                t1,
                F.struct(
                    F.lit(c).alias("category"),
                    F.round(
                        F.least(
                            F.lit(1.0),
                            F.lit(TIER1_CONFIDENCE)
                            + F.when(t2, boost).otherwise(0.0)
                            + F.when(t3, boost).otherwise(0.0),
                        ),
                        2,
                    ).alias("confidence"),
                    F.lit("tier1").alias("tier_source"),
                    (t2 | t3).alias("corroborated"),
                ),
            )
            .when(
                t2,
                F.struct(
                    F.lit(c).alias("category"),
                    F.round(
                        F.least(
                            F.lit(1.0),
                            F.lit(TIER2_CONFIDENCE) + F.when(t3, boost).otherwise(0.0),
                        ),
                        2,
                    ).alias("confidence"),
                    F.lit("tier2").alias("tier_source"),
                    t3.alias("corroborated"),
                ),
            )
            .when(
                t3 & ~any12,
                F.struct(
                    F.lit(c).alias("category"),
                    F.lit(TIER3_CONFIDENCE).alias("confidence"),
                    F.lit("tier3").alias("tier_source"),
                    F.lit(False).alias("corroborated"),
                ),
            )
        )

    merged = F.filter(
        F.array(*[branch(c) for c, _ in TIER_CATEGORIES]), lambda x: x.isNotNull()
    )
    return (
        d.select("doc_id", F.explode(merged).alias("m"))
        .select(
            "doc_id",
            F.col("m.category").alias("category"),
            F.col("m.confidence").alias("confidence"),
            F.col("m.tier_source").alias("tier_source"),
            F.col("m.corroborated").alias("corroborated"),
        )
    )


# ---------------------------------------------------------------------------
# v5 — NB10 metric inference scoped by category (10…ipynb:745
# _detect_dimensions_for_category + :765 _detect_quantity_kind):
#   dims detected at 0.8; if the category's DEFAULT dim is among them it
#   wins at 0.85; if none detected, the default at 0.5.  Quantity kind =
#   first matching pattern in fixed order at 0.8, else the category default
#   at 0.5 (CATEGORY_DEFAULT_METRICS = first VALID_TRIPLETS entry, :237).
# ---------------------------------------------------------------------------

DIMENSION_PATTERNS: list[tuple[str, str]] = [
    ("structure", r"\bcolumn\b"),
    ("content", r"\bdata\b"),
    ("population", r"\bcustomer\b"),
]
QUANTITY_PATTERNS: list[tuple[str, str]] = [
    ("count", r"\bsort\b"),
    ("area", r"\bbig\b"),
    ("currency", r"\border\b"),
]
CATEGORY_DEFAULT_METRICS: dict[str, tuple[str, str]] = {
    "infrastructure": ("structure", "count"),
    "population": ("population", "count"),
    "roads": ("content", "area"),
    "agriculture": ("content", "count"),
    "energy": ("structure", "currency"),
}


def _category_default_cols(cat: Column) -> tuple[Column, Column]:
    """(default_dimension, default_quantity) per category with the
    'content'/'count' else-arm — THE default fold; exposure_metric_inference
    and triplet_constraint_validation both read it (a change to a category
    default lands in both queries and both oracles or nowhere)."""
    dd = qq = None
    for c, (d, q) in CATEGORY_DEFAULT_METRICS.items():
        b = cat == c
        dd = F.when(b, d) if dd is None else dd.when(b, d)
        qq = F.when(b, q) if qq is None else qq.when(b, q)
    return dd.otherwise("content"), qq.otherwise("count")


def _category_default_sql(cat_sql: str = "category") -> tuple[str, str]:
    """DuckDB twins of _category_default_cols."""
    dd = "CASE " + " ".join(
        f"WHEN {cat_sql} = '{c}' THEN '{d}'"
        for c, (d, _) in CATEGORY_DEFAULT_METRICS.items()
    ) + " ELSE 'content' END"
    qq = "CASE " + " ".join(
        f"WHEN {cat_sql} = '{c}' THEN '{q}'"
        for c, (_, q) in CATEGORY_DEFAULT_METRICS.items()
    ) + " ELSE 'count' END"
    return dd, qq


def _metric_inference_oracle() -> str:
    dim_hits = ", ".join(
        f"regexp_matches(text, '{p}') AS d_{n}" for n, p in DIMENSION_PATTERNS
    )
    qty_hits = ", ".join(
        f"regexp_matches(text, '{p}') AS q_{n}" for n, p in QUANTITY_PATTERNS
    )
    any_dim = " OR ".join(f"d_{n}" for n, _ in DIMENSION_PATTERNS)
    first_dim = "CASE " + " ".join(
        f"WHEN d_{n} THEN '{n}'" for n, _ in DIMENSION_PATTERNS
    ) + " END"
    first_qty = "CASE " + " ".join(
        f"WHEN q_{n} THEN '{n}'" for n, _ in QUANTITY_PATTERNS
    ) + " END"
    def_dim, def_qty = _category_default_sql()
    def_dim_hit = "CASE " + " ".join(
        f"WHEN category = '{c}' THEN d_{d}" for c, (d, _) in CATEGORY_DEFAULT_METRICS.items()
    ) + " ELSE d_content END"
    cats = ", ".join(
        f"CASE WHEN regexp_matches(text, '{p}') THEN '{c}' END"
        for c, p in TIER_CATEGORIES
    )
    return f"""
    WITH hits AS (
      SELECT doc_id, {dim_hits}, {qty_hits},
             unnest(list_filter([{cats}], x -> x IS NOT NULL)) AS category
      FROM documents
    )
    SELECT doc_id, category,
           CASE WHEN ({any_dim}) AND ({def_dim_hit}) THEN {def_dim}
                WHEN ({any_dim}) THEN {first_dim}
                ELSE {def_dim} END AS dimension,
           CAST(CASE WHEN ({any_dim}) AND ({def_dim_hit}) THEN 0.85
                     WHEN ({any_dim}) THEN 0.8
                     ELSE 0.5 END AS DOUBLE) AS dim_confidence,
           coalesce({first_qty}, {def_qty}) AS quantity_kind,
           CAST(CASE WHEN {first_qty} IS NOT NULL THEN 0.8 ELSE 0.5 END
                AS DOUBLE) AS qty_confidence
    FROM hits
    """


@register(
    "exposure_metric_inference",
    _metric_inference_oracle(),
    doc="Category-scoped metric inference (10…ipynb:745/:765): detected "
        "dimensions at 0.8, category-default preferred at 0.85, default "
        "fallback at 0.5; quantity kind first-match 0.8 / default 0.5 "
        "(CATEGORY_DEFAULT_METRICS from VALID_TRIPLETS). One scan, one "
        "explode, no shuffle — constraint tables folded as literal "
        "when-chains (SURVEY §2.8 map/struct row).",
)
def exposure_metric_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Evaluate every dimension/quantity regex ONCE PER DOCUMENT, before the
    # category explode (mirroring the oracle's hits CTE): referencing the
    # raw rlike expressions after explode would re-run each regex once per
    # exploded category row — up to |categories|x the regex work.
    hit_cols = d.select(
        "doc_id",
        "text",
        *[F.col("text").rlike(p).alias(f"_d_{n}") for n, p in DIMENSION_PATTERNS],
        *[F.col("text").rlike(p).alias(f"_q_{n}") for n, p in QUANTITY_PATTERNS],
    )
    dim_hit = {n: F.col(f"_d_{n}") for n, _ in DIMENSION_PATTERNS}
    qty_hit = {n: F.col(f"_q_{n}") for n, _ in QUANTITY_PATTERNS}
    any_dim = any_of(dim_hit[n] for n, _ in DIMENSION_PATTERNS)
    first_dim = when_chain((dim_hit[n], F.lit(n)) for n, _ in DIMENSION_PATTERNS)
    first_qty = when_chain((qty_hit[n], F.lit(n)) for n, _ in QUANTITY_PATTERNS)

    cat = F.col("category")
    def_dim, def_qty = _category_default_cols(cat)
    def_dim_hit = None
    for c, (dd, _qq) in CATEGORY_DEFAULT_METRICS.items():
        b = cat == c
        def_dim_hit = (
            F.when(b, dim_hit[dd]) if def_dim_hit is None else def_dim_hit.when(b, dim_hit[dd])
        )
    def_dim_hit = def_dim_hit.otherwise(dim_hit["content"])

    cats = F.filter(
        F.array(*[
            F.when(F.col("text").rlike(p), F.lit(c)) for c, p in TIER_CATEGORIES
        ]),
        lambda x: x.isNotNull(),
    )
    exploded = hit_cols.select(
        "doc_id",
        *[F.col(f"_d_{n}") for n, _ in DIMENSION_PATTERNS],
        *[F.col(f"_q_{n}") for n, _ in QUANTITY_PATTERNS],
        F.explode(cats).alias("category"),
    )
    return exploded.select(
        "doc_id",
        "category",
        F.when(any_dim & def_dim_hit, def_dim)
        .when(any_dim, first_dim)
        .otherwise(def_dim)
        .alias("dimension"),
        F.when(any_dim & def_dim_hit, 0.85)
        .when(any_dim, 0.8)
        .otherwise(0.5)
        .alias("dim_confidence"),
        F.coalesce(first_qty, def_qty).alias("quantity_kind"),
        F.when(first_qty.isNotNull(), 0.8).otherwise(0.5).alias("qty_confidence"),
    )


# ---------------------------------------------------------------------------
# v5 — constraint-table validation with default fallback (10…ipynb:196
# VALID_TRIPLETS: per-category allowed (dimension, quantity) pairs, first
# entry = the category default; 11…ipynb _validate_function_metrics falls
# back to the defaults when an inferred combination violates the table).
# ---------------------------------------------------------------------------

VALID_TRIPLETS: dict[str, list[tuple[str, str]]] = {
    "infrastructure": [("structure", "count"), ("structure", "currency")],
    "population": [("population", "count")],
    "roads": [("content", "area"), ("content", "count")],
    "agriculture": [("content", "count"), ("content", "area")],
    "energy": [("structure", "currency"), ("structure", "count")],
}
# invariant the reference asserts at load time (10…ipynb:237): defaults are
# the first VALID_TRIPLETS entry per category
assert all(
    VALID_TRIPLETS[c][0] == CATEGORY_DEFAULT_METRICS[c] for c in VALID_TRIPLETS
)


@register(
    "triplet_constraint_validation",
    f"""
    WITH inferred AS ({_metric_inference_oracle()}),
    triplets(t_category, t_dimension, t_quantity) AS (VALUES
      {', '.join(f"('{c}', '{d}', '{q}')" for c, pairs in VALID_TRIPLETS.items() for d, q in pairs)}
    )
    SELECT i.doc_id, i.category,
           (t.t_category IS NOT NULL) AS constraint_ok,
           CASE WHEN t.t_category IS NOT NULL THEN i.dimension
                ELSE ({_category_default_sql('i.category')[0]}) END AS dimension_final,
           CASE WHEN t.t_category IS NOT NULL THEN i.quantity_kind
                ELSE ({_category_default_sql('i.category')[1]}) END AS quantity_final
    FROM inferred i
    LEFT JOIN triplets t
      ON i.category = t.t_category AND i.dimension = t.t_dimension
         AND i.quantity_kind = t.t_quantity
    """,
    doc="Constraint-table validation with default fallback (10…ipynb:196 "
        "VALID_TRIPLETS + 11…ipynb _validate_function_metrics): inferred "
        "(category, dimension, quantity) joined to the broadcast constraint "
        "dim; violations fall back to the category's default pair (the "
        "table's first entry — the load-time invariant the reference "
        "asserts). Broadcast join, zero fact shuffle.",
)
def triplet_constraint_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    inferred = exposure_metric_inference(spark, sf_dir)
    spark_triplets = spark.createDataFrame(
        [(c, d, q) for c, pairs in VALID_TRIPLETS.items() for d, q in pairs],
        ["t_category", "t_dimension", "t_quantity"],
    )
    j = inferred.join(
        F.broadcast(spark_triplets),
        (F.col("category") == F.col("t_category"))
        & (F.col("dimension") == F.col("t_dimension"))
        & (F.col("quantity_kind") == F.col("t_quantity")),
        "left",
    )
    ok = F.col("t_category").isNotNull()
    def_dim, def_qty = _category_default_cols(F.col("category"))
    return j.select(
        "doc_id",
        "category",
        ok.alias("constraint_ok"),
        F.when(ok, F.col("dimension")).otherwise(def_dim).alias("dimension_final"),
        F.when(ok, F.col("quantity_kind")).otherwise(def_qty).alias("quantity_final"),
    )


# ---------------------------------------------------------------------------
# v5 — NB11 currency detection (10…ipynb:776 _detect_currency / 11…ipynb
# CURRENCY_PATTERNS): first-matching word pattern wins; fallback scans
# standalone [A-Z]{3} tokens against the COMMON_CURRENCIES allowlist.
# ---------------------------------------------------------------------------

CURRENCY_PATTERNS: list[tuple[str, str]] = [
    (r"\b(usd|us[\s._-]?dollar)\b", "USD"),
    (r"\b(eur|euro)\b", "EUR"),
    (r"\b(gbp|pound[\s._-]?sterling)\b", "GBP"),
]
COMMON_CURRENCIES = ("USD", "EUR", "GBP", "JPY", "INR", "CHF")


@register(
    "currency_detection",
    f"""
    WITH t AS (
      SELECT doc_id,
             text || (CASE doc_id % 7
                        WHEN 0 THEN ' usd cost'
                        WHEN 1 THEN ' in euro'
                        WHEN 2 THEN ' JPY 100'
                        WHEN 3 THEN ' INR and XYZ'
                        ELSE '' END) AS txt
      FROM documents
    )
    SELECT doc_id,
           coalesce(
             {" ".join(f"CASE WHEN regexp_matches(txt, '{p}') THEN '{c}' END,"
                       for p, c in CURRENCY_PATTERNS)}
             list_filter(regexp_extract_all(txt, '\\b[A-Z]{{3}}\\b'),
                         u -> list_contains({list(COMMON_CURRENCIES)}, u))[1],
             '') AS currency
    FROM t
    """,
    doc="ISO-4217 currency detection (10…ipynb:776 _detect_currency): "
        "first-matching word pattern wins, then the standalone-uppercase-"
        "triple fallback filtered by the COMMON_CURRENCIES allowlist, else "
        "''. First-match = when-chain; fallback = regexp_extract_all + "
        "filter + element_at. Deterministic currency suffixes are appended "
        "by doc_id so every branch occurs in the corpus.",
)
def currency_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 7 == 0, " usd cost")
        .when(F.col("doc_id") % 7 == 1, " in euro")
        .when(F.col("doc_id") % 7 == 2, " JPY 100")
        .when(F.col("doc_id") % 7 == 3, " INR and XYZ")
        .otherwise("")
    )
    txt = F.concat(F.col("text"), suffix)
    first_pat = when_chain((txt.rlike(p), F.lit(c)) for p, c in CURRENCY_PATTERNS)
    allow = F.array(*[F.lit(c) for c in COMMON_CURRENCIES])
    fallback = F.try_element_at(
        F.filter(
            F.regexp_extract_all(txt, F.lit(r"\b[A-Z]{3}\b"), 0),
            lambda u: F.array_contains(allow, u),
        ),
        F.lit(1),
    )
    return d.select(
        "doc_id",
        F.coalesce(first_pat, fallback, F.lit("")).alias("currency"),
    )


# ---------------------------------------------------------------------------
# A9/A10 — composite confidence scoring, tiering, tier pivot
# (13…ipynb:949 compute_composite_confidence, weights .40/.25/.20/.15,
#  tier thresholds .8/.5 at :149; cell 19/20 tier x validity counts)
# ---------------------------------------------------------------------------

def _composite(d: DataFrame) -> DataFrame:
    from ..functions.scoring import composite_confidence, tier_of

    coverage = F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
    richness = F.least(F.lit(1.0), F.size(F.split("text", " ")) / F.lit(60.0))
    schema_s = F.when(F.col("lang") == "en", 1.0).otherwise(0.5)
    metadata = F.when(F.col("source").rlike("^src1"), 1.0).otherwise(0.8)
    # THE NB13 formula + tier ladder (functions/scoring.py) — tiering reads
    # the unrounded score; output rounds to 4 dp for display/oracle parity
    composite = composite_confidence(coverage, richness, schema_s, metadata)
    tier = tier_of(composite)
    return d.select(
        "doc_id",
        F.round(coverage, 4).alias("coverage"),
        F.round(richness, 4).alias("richness"),
        F.round(composite, 4).alias("composite"),
        tier.alias("tier"),
        F.col("lang"),
    )


_COMPOSITE_ORACLE_BODY = """
  SELECT doc_id,
         round(least(1.0, n_chars / 400.0), 4) AS coverage,
         round(least(1.0, len(string_split(text, ' ')) / 60.0), 4) AS richness,
         round(least(1.0, n_chars / 400.0) * 0.40
               + least(1.0, len(string_split(text, ' ')) / 60.0) * 0.25
               + (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.5 END) * 0.20
               + (CASE WHEN regexp_matches(source, '^src1') THEN 1.0 ELSE 0.8 END)
                 * 0.15, 4) AS composite,
         CASE WHEN least(1.0, n_chars / 400.0) * 0.40
                   + least(1.0, len(string_split(text, ' ')) / 60.0) * 0.25
                   + (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.5 END) * 0.20
                   + (CASE WHEN regexp_matches(source, '^src1') THEN 1.0 ELSE 0.8 END)
                     * 0.15 >= 0.8 THEN 'high'
              WHEN least(1.0, n_chars / 400.0) * 0.40
                   + least(1.0, len(string_split(text, ' ')) / 60.0) * 0.25
                   + (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.5 END) * 0.20
                   + (CASE WHEN regexp_matches(source, '^src1') THEN 1.0 ELSE 0.8 END)
                     * 0.15 >= 0.5 THEN 'medium'
              ELSE 'low' END AS tier,
         lang
  FROM documents
"""


@register(
    "composite_scoring",
    f"SELECT doc_id, coverage, richness, composite, tier, lang FROM ({_COMPOSITE_ORACLE_BODY})",
    doc="Composite confidence scoring + tier ladder (SURVEY A9, "
        "13…ipynb:949: weighted 0.40 coverage + 0.25 richness + 0.20 schema "
        "+ 0.15 metadata; tiers at 0.8/0.5).",
)
def composite_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _composite(load_table(spark, sf_dir, "documents"))


@register(
    "tier_matrix",
    f"""
    SELECT tier,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
           CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_other
    FROM ({_COMPOSITE_ORACLE_BODY})
    GROUP BY tier
    """,
    doc="Tier distribution 2-D pivot (SURVEY A10, 13…ipynb cell 19/20 tier x "
        "validity counts). Expressed as sum-of-when (a single hash aggregate, "
        "identical plan shape to pivot with a fixed value list but emitting "
        "the same BIGINT type as the oracle's sum(CASE) — DuckDB sums to "
        "HUGEINT, hence the explicit casts on both sides).",
)
def tier_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _composite(load_table(spark, sf_dir, "documents"))
    return scored.groupBy("tier").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("n_other"),
    )


# ---------------------------------------------------------------------------
# A11 — cube / grouping-set report (06…ipynb cell 22 multi-key reports)
# ---------------------------------------------------------------------------

@register(
    "cube_report",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE aggregation — the unified form of the reference's repeated "
        "same-data-different-key reports (SURVEY A11, 06…ipynb cell 22, "
        "12…ipynb:937 stats).",
)
def cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "cnt",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# A12 — missing-field explode-count (07…ipynb cell 13)
# ---------------------------------------------------------------------------

@register(
    "missing_fields_top",
    """
    SELECT field, count(*) AS cnt
    FROM (
      SELECT unnest(string_split(
        concat_ws(';',
          CASE WHEN doc_id % 2 = 0 THEN 'title' END,
          CASE WHEN doc_id % 3 = 0 THEN 'notes' END,
          CASE WHEN doc_id % 5 = 0 THEN 'license' END,
          CASE WHEN doc_id % 7 = 0 THEN 'methodology' END,
          CASE WHEN doc_id % 11 = 0 THEN 'caveats' END), ';')) AS field
      FROM documents
    )
    WHERE field <> ''
    GROUP BY field
    ORDER BY cnt DESC, field
    LIMIT 20
    """,
    doc="Missing-field explode-count (SURVEY A12, 07…ipynb cell 13: split "
        "';' -> explode -> value_counts top-20). The ';'-list is synthesized "
        "deterministically from doc_id.",
)
def missing_fields_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    missing = F.concat_ws(
        ";",
        F.when(F.col("doc_id") % 2 == 0, "title"),
        F.when(F.col("doc_id") % 3 == 0, "notes"),
        F.when(F.col("doc_id") % 5 == 0, "license"),
        F.when(F.col("doc_id") % 7 == 0, "methodology"),
        F.when(F.col("doc_id") % 11 == 0, "caveats"),
    )
    return (
        d.select(F.explode(F.split(missing, ";")).alias("field"))
        .filter(F.col("field") != "")
        .groupBy("field")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "field")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J8 — country-name resolution: fixes table -> dim table -> fallback,
# plus region -> member expansion (06…ipynb:794 country_name_to_iso3,
# :675 REGION_TO_COUNTRIES)
# ---------------------------------------------------------------------------

_NATION_FIXES = [("NATION_3", "FX3"), ("NATION_17", "FX17"), ("NATION_9", "FX9")]


@register(
    "country_resolution",
    f"""
    WITH fixes(fix_name, fix_code) AS (
      VALUES {', '.join(f"('{n}', '{c}')" for n, c in _NATION_FIXES)}
    ),
    dim AS (SELECT n_nationkey, n_name,
                   'ISO' || CAST(n_nationkey AS VARCHAR) AS dim_code
            FROM nation)
    SELECT c_custkey,
           coalesce(f.fix_code, d.dim_code, 'UNK') AS resolved_code
    FROM customer c
    LEFT JOIN dim d ON c.c_nationkey = d.n_nationkey
    LEFT JOIN fixes f ON d.n_name = f.fix_name
    """,
    doc="Country resolution via coalesce chain over broadcast dims (SURVEY "
        "J8, 06…ipynb:794: fixes table first, then the main dim table, then "
        "fallback code). Both dims are broadcast — zero shuffle on the fact "
        "side.",
)
def country_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dim = n.select(
        "n_nationkey",
        "n_name",
        F.concat(F.lit("ISO"), F.col("n_nationkey").cast("string")).alias("dim_code"),
    )
    fixes = c.sparkSession.createDataFrame(_NATION_FIXES, ["fix_name", "fix_code"])
    return (
        c.join(F.broadcast(dim), c.c_nationkey == dim.n_nationkey, "left")
        .join(F.broadcast(fixes), dim.n_name == fixes.fix_name, "left")
        .select(
            "c_custkey",
            F.coalesce("fix_code", "dim_code", F.lit("UNK")).alias("resolved_code"),
        )
    )


@register(
    "region_member_expansion",
    """
    SELECT r.r_name AS region, n.n_name AS member,
           count(c.c_custkey) AS n_customers
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Region -> member-country expansion + per-member rollup (SURVEY J8 "
        "region expansion: join to region_members then explode — "
        "06…ipynb:675 REGION_TO_COUNTRIES).",
)
def region_member_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        r.join(F.broadcast(n), n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("member"))
        .agg(F.count("c_custkey").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# v5 — signal-dictionary-scale extraction: ~330 patterns in 11 sections
# fused to one alternation per codelist value (SURVEY §4 custom optimization;
# 08…ipynb cell 11 merge '|'.join(patterns); dialect risk §7.4 #3 handled by
# functions/signal_bank.translate_pattern and pinned by
# tests/test_signal_bank.py's Python-vs-Spark fixture parity).
# ---------------------------------------------------------------------------

from ..functions.signal_bank import N_PATTERNS, fused_bank  # noqa: E402


def _signal_bank_oracle() -> str:
    branches = ", ".join(
        f"""CASE WHEN regexp_matches(text, '{pat}') THEN
              struct_pack(section := '{sec}', value := '{val}',
                          confidence := CAST({conf} AS DOUBLE)) END"""
        for sec, val, pat, conf in fused_bank()
    )
    return f"""
    SELECT doc_id, m.section AS section, m.value AS value,
           m.confidence AS confidence
    FROM (
      SELECT doc_id,
             unnest(list_filter([{branches}], x -> x IS NOT NULL)) AS m
      FROM documents
    )
    """


@register(
    "signal_bank_extraction",
    _signal_bank_oracle(),
    doc=f"Signal-dictionary-scale classify: {N_PATTERNS} raw patterns "
        "(11 sections x 8 codelist values, signal_dictionary.yaml structure) "
        "fused to one alternation per value — one rlike per VALUE, not per "
        "pattern (~4x fewer regex evaluations, the reference's own merge "
        "optimization). The literal when-array is built in chunks and "
        "concatenated so no single codegen method crosses janino's 64KB "
        "limit; one scan, no shuffle, one explode.",
)
def signal_bank_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    bank = fused_bank()
    chunk_size = 22
    arrays = []
    for i in range(0, len(bank), chunk_size):
        arrays.append(
            F.array(
                *[
                    F.when(
                        F.col("text").rlike(pat),
                        F.struct(
                            F.lit(sec).alias("section"),
                            F.lit(val).alias("value"),
                            F.lit(conf).alias("confidence"),
                        ),
                    )
                    for sec, val, pat, conf in bank[i : i + chunk_size]
                ]
            )
        )
    matched = F.filter(F.concat(*arrays), lambda x: x.isNotNull())
    return d.select("doc_id", F.explode(matched).alias("m")).select(
        "doc_id",
        F.col("m.section").alias("section"),
        F.col("m.value").alias("value"),
        F.col("m.confidence").alias("confidence"),
    )


# ---------------------------------------------------------------------------
# J3 — hazard cross-reference with TEXT-INFERENCE FALLBACK
# (11…ipynb:947 _infer_hazard_context: xref hit -> validated fields with
#  per-field defaults; xref miss -> first-matching hazard-type pattern over
#  the text, then the same defaults; analysis_type falls back to 'empirical'
#  when missing or outside the codelist).  Round 1 had the coalesce chain
#  only; this adds the inference arm — the 'fallback-on-missing path must
#  match exactly' risk SURVEY §7.4 #6 flags.
# ---------------------------------------------------------------------------

# First-match-wins pattern order (HAZARD_TYPE_PATTERNS, 11…ipynb cell 4),
# over the synthetic vocabulary.
HAZARD_TYPE_PATTERNS: list[tuple[str, str]] = [
    ("flood", r"hash|merge"),
    ("earthquake", r"vector"),
    ("cyclone", r"spark"),
]
HAZARD_PROCESS_DEFAULT = {
    "flood": "fluvial_flood",
    "earthquake": "ground_motion",
    "cyclone": "wind",
}
DEFAULT_INTENSITY_MEASURE = {
    "flood": "fl_wd:m",
    "earthquake": "PGA:g",
    "cyclone": "v_ect:km/h",
}
def _sql_in(values: tuple[str, ...]) -> str:
    """Explicit SQL IN-list — str(tuple) renders ('x',) with a trailing
    comma (a DuckDB syntax error) the moment a codelist shrinks to one."""
    return "(" + ", ".join("'" + v.replace("'", "''") + "'" for v in values) + ")"


_VALID_ANALYSIS = ("probabilistic", "deterministic", "empirical")
_HAZARDS = ["flood", "earthquake", "cyclone"]


def _xref_case(col: str = "doc_id") -> str:
    return (f"CASE WHEN {col} % 3 = 0 THEN 'flood' "
            f"WHEN {col} % 3 = 1 THEN 'earthquake' ELSE 'cyclone' END")


@register(
    "hazard_context_resolution",
    f"""
    WITH xref AS (
      SELECT doc_id AS x_doc_id,
             {_xref_case()} AS x_hazard,
             CASE WHEN doc_id % 2 = 0 THEN
               (CASE WHEN doc_id % 3 = 0 THEN 'fluvial_flood'
                     WHEN doc_id % 3 = 1 THEN 'ground_motion'
                     ELSE 'wind' END) END AS x_process,
             CASE WHEN doc_id % 5 = 0 THEN 'deterministic'
                  ELSE 'not_a_codelist_value' END AS x_analysis,
             CASE WHEN doc_id % 7 <> 0 THEN
               (CASE WHEN doc_id % 3 = 0 THEN 'fl_wd:m'
                     WHEN doc_id % 3 = 1 THEN 'PGA:g'
                     ELSE 'v_ect:km/h' END) END AS x_im
      FROM documents WHERE doc_id % 4 = 0
    ),
    inferred AS (
      SELECT d.doc_id,
             CASE WHEN x.x_doc_id IS NOT NULL THEN 'xref'
                  WHEN {" OR ".join(f"regexp_matches(d.text, '{p}')" for _, p in HAZARD_TYPE_PATTERNS)}
                  THEN 'text' END AS context_source,
             coalesce(x.x_hazard,
                      CASE WHEN regexp_matches(d.text, '{HAZARD_TYPE_PATTERNS[0][1]}') THEN 'flood'
                           WHEN regexp_matches(d.text, '{HAZARD_TYPE_PATTERNS[1][1]}') THEN 'earthquake'
                           WHEN regexp_matches(d.text, '{HAZARD_TYPE_PATTERNS[2][1]}') THEN 'cyclone'
                      END) AS hazard_primary,
             x.x_doc_id IS NOT NULL AS from_xref,
             x.x_process, x.x_analysis, x.x_im
      FROM documents d LEFT JOIN xref x ON d.doc_id = x.x_doc_id
    )
    SELECT doc_id, context_source, hazard_primary,
           coalesce(x_process,
             CASE hazard_primary WHEN 'flood' THEN 'fluvial_flood'
                  WHEN 'earthquake' THEN 'ground_motion'
                  WHEN 'cyclone' THEN 'wind' END) AS hazard_process_primary,
           CASE WHEN hazard_primary IS NULL THEN NULL
                WHEN from_xref AND x_analysis IN {_sql_in(_VALID_ANALYSIS)}
                THEN x_analysis ELSE 'empirical' END AS hazard_analysis_type,
           coalesce(x_im,
             CASE hazard_primary WHEN 'flood' THEN 'fl_wd:m'
                  WHEN 'earthquake' THEN 'PGA:g'
                  WHEN 'cyclone' THEN 'v_ect:km/h' END) AS intensity_measure
    FROM inferred
    """,
    doc="Hazard-context resolution: broadcast-left xref join with the "
        "text-inference fallback arm (SURVEY J3; 11…ipynb:947 "
        "_infer_hazard_context): xref hit -> validated fields with "
        "per-field defaults (process default by hazard, analysis_type -> "
        "'empirical' when outside the codelist, intensity default by "
        "hazard); miss -> first-matching pattern in fixed order, same "
        "defaults, 'empirical' analysis. Dims broadcast; zero fact shuffle.",
)
def hazard_context_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    x_hazard = (
        F.when(F.col("doc_id") % 3 == 0, "flood")
        .when(F.col("doc_id") % 3 == 1, "earthquake")
        .otherwise("cyclone")
    )
    xref = d.filter(F.col("doc_id") % 4 == 0).select(
        F.col("doc_id").alias("x_doc_id"),
        x_hazard.alias("x_hazard"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.element_at(
                F.create_map(
                    *[F.lit(v) for kv in HAZARD_PROCESS_DEFAULT.items() for v in kv]
                ),
                x_hazard,
            ),
        ).alias("x_process"),
        F.when(F.col("doc_id") % 5 == 0, "deterministic")
        .otherwise("not_a_codelist_value")
        .alias("x_analysis"),
        F.when(
            F.col("doc_id") % 7 != 0,
            F.element_at(
                F.create_map(
                    *[F.lit(v) for kv in DEFAULT_INTENSITY_MEASURE.items() for v in kv]
                ),
                x_hazard,
            ),
        ).alias("x_im"),
    )
    j = d.join(F.broadcast(xref), d.doc_id == xref.x_doc_id, "left")

    # first match wins, fixed order
    text_inferred = when_chain(
        (F.col("text").rlike(pat), F.lit(hz)) for hz, pat in HAZARD_TYPE_PATTERNS
    )
    hazard_primary = F.coalesce(F.col("x_hazard"), text_inferred)
    from_xref = F.col("x_doc_id").isNotNull()
    proc_default = F.element_at(
        F.create_map(*[F.lit(v) for kv in HAZARD_PROCESS_DEFAULT.items() for v in kv]),
        hazard_primary,
    )
    im_default = F.element_at(
        F.create_map(*[F.lit(v) for kv in DEFAULT_INTENSITY_MEASURE.items() for v in kv]),
        hazard_primary,
    )
    return j.select(
        "doc_id",
        F.when(from_xref, "xref")
        .when(text_inferred.isNotNull(), "text")
        .alias("context_source"),
        hazard_primary.alias("hazard_primary"),
        F.coalesce(F.col("x_process"), proc_default).alias("hazard_process_primary"),
        F.when(hazard_primary.isNull(), F.lit(None).cast("string"))
        .when(
            from_xref & F.col("x_analysis").isin(*_VALID_ANALYSIS), F.col("x_analysis")
        )
        .otherwise("empirical")
        .alias("hazard_analysis_type"),
        F.coalesce(F.col("x_im"), im_default).alias("intensity_measure"),
    )


# ---------------------------------------------------------------------------
# v5 — reference-year extraction (11…ipynb _extract_reference_year): regex
# (\d{4}) from dataset_date, 1900-2100 guard, fallback to last_modified,
# else NULL.  Synthetic date fields derived from doc_id so every branch
# (valid primary, out-of-range primary + valid fallback, both missing)
# occurs in the corpus.
# ---------------------------------------------------------------------------

@register(
    "reference_year_extraction",
    """
    WITH fields AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN '20' || lpad(CAST(doc_id % 26 AS VARCHAR), 2, '0')
                            || '-06-01'
               WHEN 1 THEN 'updated 9999'
               ELSE '' END AS dataset_date,
             CASE doc_id % 3
               WHEN 0 THEN 'mod 2019-01-02'
               WHEN 1 THEN 'n/a'
               ELSE '1850 vintage' END AS last_modified
      FROM documents
    )
    SELECT doc_id,
           coalesce(
             CASE WHEN CAST(coalesce(nullif(regexp_extract(dataset_date,
                         '([0-9]{4})', 1), ''), '0') AS INTEGER)
                       BETWEEN 1900 AND 2100
                  THEN CAST(regexp_extract(dataset_date, '([0-9]{4})', 1)
                            AS INTEGER) END,
             CASE WHEN CAST(coalesce(nullif(regexp_extract(last_modified,
                         '([0-9]{4})', 1), ''), '0') AS INTEGER)
                       BETWEEN 1900 AND 2100
                  THEN CAST(regexp_extract(last_modified, '([0-9]{4})', 1)
                            AS INTEGER) END
           ) AS reference_year
    FROM fields
    """,
    doc="Reference-year extraction with range guard + field fallback chain "
        "(11…ipynb _extract_reference_year: first 4-digit run of "
        "dataset_date if 1900-2100, else of last_modified, else NULL). "
        "regexp_extract + guard as column algebra; SURVEY §2.8 regex-extract "
        "+ date families.",
)
def reference_year_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dataset_date = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("20"),
                F.lpad((F.col("doc_id") % 26).cast("string"), 2, "0"),
                F.lit("-06-01"),
            ),
        )
        .when(F.col("doc_id") % 4 == 1, "updated 9999")
        .otherwise("")
    )
    last_modified = (
        F.when(F.col("doc_id") % 3 == 0, "mod 2019-01-02")
        .when(F.col("doc_id") % 3 == 1, "n/a")
        .otherwise("1850 vintage")
    )

    def guarded_year(col):
        y = F.regexp_extract(col, r"([0-9]{4})", 1)
        yi = F.coalesce(F.nullif(y, F.lit("")), F.lit("0")).cast("int")
        return F.when(yi.between(1900, 2100), yi)

    return d.select(
        "doc_id",
        F.coalesce(
            guarded_year(dataset_date), guarded_year(last_modified)
        ).alias("reference_year"),
    )


# ---------------------------------------------------------------------------
# v5 — NB09 compound-tag expansion (09…ipynb:257 COMPOUND_HDX_TAGS: one HDX
# tag implies MULTIPLE hazard types, e.g. cyclones-hurricanes-typhoons →
# [cyclone, storm_surge]).  Tag detected in the document's token set →
# explode to its implied types via a broadcast dim.
# ---------------------------------------------------------------------------

COMPOUND_TAGS: list[tuple[str, str]] = [
    ("batch", "flood"), ("batch", "landslide"),
    ("vector", "earthquake"), ("vector", "tsunami"),
    ("spark", "cyclone"), ("spark", "storm_surge"), ("spark", "extreme_wind"),
]


@register(
    "compound_tag_expansion",
    f"""
    WITH compound(tag, implied_type) AS (VALUES
      {', '.join(f"('{t}', '{h}')" for t, h in COMPOUND_TAGS)}
    ),
    toks AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))) AS tag
      FROM documents
    )
    SELECT doc_id, tag, implied_type
    FROM toks JOIN compound USING (tag)
    """,
    doc="Compound-tag → multi-hazard expansion (09…ipynb:257 "
        "COMPOUND_HDX_TAGS): document tags joined to the exploded compound "
        "dim (broadcast) — one row per implied hazard type. Same dim-"
        "expansion shape as region_member_expansion, driven from text-"
        "derived tags.",
)
def compound_tag_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tag")
    )
    compound = d.sparkSession.createDataFrame(COMPOUND_TAGS, ["tag", "implied_type"])
    return toks.join(F.broadcast(compound), "tag").select(
        "doc_id", "tag", "implied_type"
    )


# ---------------------------------------------------------------------------
# v5 — NB11 socio-economic indicator extraction (11…ipynb:395
# SOCIOECONOMIC_INDICATORS + :1147 _extract_socio_economic): per-indicator
# first-pattern match deduped by code at confidence 0.7; generic fallback
# (SOCIO_VULN, 0.5) ONLY when no specific indicator fired; and the
# single-indicator false-positive filter — one lone 'insufficient' indicator
# (standalone density / generic) is not evidence of vulnerability and drops
# the whole extraction.
# ---------------------------------------------------------------------------

SOCIO_INDICATORS: list[tuple[str, str, str, str]] = [
    # (code, name, scheme, fused pattern — [\s._-]? separators like the ref)
    ("POV_HEADCOUNT", "Poverty headcount ratio", "Custom", r"\bkey[\s._-]?value\b"),
    ("HDI", "Human Development Index", "Custom", r"\bhash[\s._-]?merge\b|\bhdi\b"),
    ("SVI_OVERALL", "Social Vulnerability Index", "CDC-SVI", r"\bsort[\s._-]?order\b"),
    ("FOOD_SECURITY", "Food security classification", "Custom", r"\bgroup[\s._-]?filter\b"),
    ("POP_DENSITY", "Population density", "Custom", r"\bcustomer[\s._-]?query\b"),
    ("AGE_65_PLUS", "Elderly population percentage", "Custom", r"\bbig[\s._-]?small\b"),
]
GENERIC_SOCIO_PATTERN = r"\bvector\b"
SINGLE_INDICATOR_INSUFFICIENT = ("POP_DENSITY", "SOCIO_VULN")
# NOTE: a generic-only detection yields exactly one SOCIO_VULN indicator,
# which the single-insufficient filter then drops — so SOCIO_VULN can never
# appear in the OUTPUT.  This is faithful: the reference has the identical
# interaction (generic fallback appends one SOCIO_VULN, 11…ipynb:1177, and
# the P5 filter at :1199 declares standalone SOCIO_VULN 'too ambiguous' and
# returns []).  The arm still matters: it is the reference's documented
# shape, and relaxing SINGLE_INDICATOR_INSUFFICIENT re-activates it.
# tests/test_golden_samples.py pins the never-survives behavior.


def _socio_oracle() -> str:
    hits = ", ".join(
        f"regexp_matches(text, '{p}') AS h_{code}"
        for code, _, _, p in SOCIO_INDICATORS
    )
    specific = ", ".join(
        f"""CASE WHEN h_{code} THEN struct_pack(
              indicator_code := '{code}', indicator_name := '{name}',
              scheme := '{scheme}', confidence := CAST(0.7 AS DOUBLE)) END"""
        for code, name, scheme, _ in SOCIO_INDICATORS
    )
    return f"""
    WITH hits AS (
      SELECT doc_id, {hits},
             regexp_matches(text, '{GENERIC_SOCIO_PATTERN}') AS h_generic
      FROM documents
    ),
    built AS (
      SELECT doc_id,
             CASE WHEN len(list_filter([{specific}], x -> x IS NOT NULL)) > 0
                  THEN list_filter([{specific}], x -> x IS NOT NULL)
                  WHEN h_generic THEN [struct_pack(
                    indicator_code := 'SOCIO_VULN',
                    indicator_name := 'Socio-economic vulnerability indicator',
                    scheme := 'Custom', confidence := CAST(0.5 AS DOUBLE))]
                  ELSE [] END AS inds
      FROM hits
    )
    SELECT doc_id, i.indicator_code AS indicator_code,
           i.indicator_name AS indicator_name, i.scheme AS scheme,
           i.confidence AS confidence
    FROM (
      SELECT doc_id, unnest(inds) AS i
      FROM built
      WHERE NOT (len(inds) = 1
                 AND inds[1].indicator_code IN {_sql_in(SINGLE_INDICATOR_INSUFFICIENT)})
    )
    """


@register(
    "socioeconomic_indicators",
    _socio_oracle(),
    doc="Socio-economic indicator extraction (11…ipynb:395 + :1147): "
        "code-deduped specific indicators at 0.7, SOCIO_VULN generic "
        "fallback at 0.5 only when nothing specific fired, and the "
        "single-insufficient-indicator drop filter. One scan, one explode, "
        "no shuffle.",
)
def socioeconomic_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    specific = F.filter(
        F.array(*[
            F.when(
                F.col("text").rlike(p),
                F.struct(
                    F.lit(code).alias("indicator_code"),
                    F.lit(name).alias("indicator_name"),
                    F.lit(scheme).alias("scheme"),
                    F.lit(0.7).alias("confidence"),
                ),
            )
            for code, name, scheme, p in SOCIO_INDICATORS
        ]),
        lambda x: x.isNotNull(),
    )
    generic = F.array(
        F.struct(
            F.lit("SOCIO_VULN").alias("indicator_code"),
            F.lit("Socio-economic vulnerability indicator").alias("indicator_name"),
            F.lit("Custom").alias("scheme"),
            F.lit(0.5).alias("confidence"),
        )
    )
    empty = F.array().cast(
        "array<struct<indicator_code:string,indicator_name:string,"
        "scheme:string,confidence:double>>"
    )
    inds = (
        F.when(F.size(specific) > 0, specific)
        .when(F.col("text").rlike(GENERIC_SOCIO_PATTERN), generic)
        .otherwise(empty)
    )
    # try_element_at, not element_at: ~20% of docs have inds = [] and only
    # And-conjunct short-circuit order protects ANSI element_at from
    # INVALID_ARRAY_INDEX — an optimizer reorder must degrade to null
    # (filter keeps the row), not crash the query.
    kept = d.select("doc_id", inds.alias("inds")).filter(
        ~(
            (F.size("inds") == 1)
            & F.try_element_at("inds", F.lit(1))["indicator_code"].isin(
                *SINGLE_INDICATOR_INSUFFICIENT
            )
        )
    )
    return kept.select("doc_id", F.explode("inds").alias("i")).select(
        "doc_id",
        F.col("i.indicator_code").alias("indicator_code"),
        F.col("i.indicator_name").alias("indicator_name"),
        F.col("i.scheme").alias("scheme"),
        F.col("i.confidence").alias("confidence"),
    )


# ---------------------------------------------------------------------------
# W1 — pilot shortlist: top-N per bucket, buckets ordered by size
# (02…ipynb:785 make_pilot_shortlist, PILOT_MAX_PER_BUCKET)
# ---------------------------------------------------------------------------

@register(
    "pilot_shortlist",
    """
    WITH sized AS (
      SELECT c_custkey, c_name, c_mktsegment,
             c_nationkey % 5 AS theme,
             count(*) OVER (PARTITION BY c_mktsegment, c_nationkey % 5)
               AS bucket_size,
             row_number() OVER (PARTITION BY c_mktsegment, c_nationkey % 5
                                ORDER BY c_name, c_custkey) AS rn
      FROM customer
    )
    SELECT c_mktsegment AS segment, theme, bucket_size, rn, c_custkey, c_name
    FROM sized WHERE rn <= 3
    """,
    doc="Top-N per (segment, theme) bucket with bucket sizes (SURVEY W1, "
        "02…ipynb:785 make_pilot_shortlist: <=N per bucket ordered by name; "
        "bucket ordering via the size column). One window shuffle, two "
        "functions over the same frame.",
)
def pilot_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    theme = (F.col("c_nationkey") % 5).alias("theme")
    w = Window.partitionBy("c_mktsegment", "theme")
    w_rn = w.orderBy("c_name", "c_custkey")
    return (
        c.select("c_custkey", "c_name", "c_mktsegment", theme)
        .withColumn("bucket_size", F.count("*").over(w))
        .withColumn("rn", F.row_number().over(w_rn))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("c_mktsegment").alias("segment"), "theme", "bucket_size",
            "rn", "c_custkey", "c_name",
        )
    )
