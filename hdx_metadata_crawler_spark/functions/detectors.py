"""Real-codelist hazard-type and exposure-category detectors.

First-match-wins keyword banks over the FULL RDLS v0.3 codelists (11 hazard
types, 7 exposure categories) — the engine analogue of the reference's
hazard/exposure detection keyword tables (``09…ipynb`` hazard patterns,
``10…ipynb`` category patterns).  Pattern ORDER is part of the contract:
specific families come before general ones (coastal_flood and tsunami
before flood; convective_storm's tornado/hail before strong_wind's generic
wind), mirroring the reference's first-match short-circuit
(``09…ipynb`` ``_match_patterns``).

Verified by the reference's own mechanism: curated golden-sample suites at
the reference's breadth (~55 hazard samples across all 11 types, ~31
exposure samples across all 7 categories) with MATCH/MISS/EDGE verdicts and
per-category match-rate gates — tests/test_golden_samples.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (hazard_type, case-insensitive pattern) — first match wins, top to bottom.
HAZARD_DETECT_PATTERNS: list[tuple[str, str]] = [
    ("coastal_flood", r"(?i)\b(coastal\s+flood\w*|storm\s+surge|sea[-\s]level\s+rise)\b"),
    ("tsunami", r"(?i)\btsunami\w*\b"),
    # volcanic before flood: 'lahar inundation' must resolve volcanic, not
    # trip flood's generic 'inundation' (caught by golden sample vo-3)
    ("volcanic", r"(?i)\b(volcan\w*|eruption\w*|ash\s*fall\w*|lahar\w*|pyroclastic\w*|lava)\b"),
    ("flood", r"(?i)\b(flood\w*|inundation|riverine|fluvial|pluvial)\b"),
    ("earthquake", r"(?i)\b(earthquake\w*|seismic\w*|ground\s+motion|liquefaction|epicent\w+)\b"),
    ("drought", r"(?i)\b(drought\w*|rainfall\s+deficit|water\s+scarcity)\b"),
    ("extreme_temperature", r"(?i)\b(heat\s*wave\w*|cold\s*wave\w*|extreme\s+(heat|cold|temperature)\w*)\b"),
    ("wildfire", r"(?i)\b(wild\s*fire\w*|bush\s*fire\w*|forest\s+fire\w*|burned?\s+area)\b"),
    # hail needs the noun forms only: 'hail(\s*storm|stone)?' with a hard \b
    # keeps 'hailstorm'/'hail storms'/'hailstones'/bare 'hail' but rejects
    # the verb 'hailed/hailing/hails' ('widely hailed wind atlas' must fall
    # through to strong_wind, not classify as convective_storm)
    ("convective_storm", r"(?i)\b(tornado\w*|hail(\s*storm\w*|stone\w*)?\b|convective\s+storm\w*|derecho\w*)\b"),
    ("strong_wind", r"(?i)\b(cyclone\w*|hurricane\w*|typhoon\w*|strong\s+wind\w*|wind\s+speed|gale\w*)\b"),
    ("landslide", r"(?i)\b(landslide\w*|mud\s*slide\w*|debris\s+flow\w*|rock\s*fall\w*|avalanche\w*)\b"),
]

# (exposure_category, pattern) — first match wins.
EXPOSURE_DETECT_PATTERNS: list[tuple[str, str]] = [
    # no bare 'footprint': 'carbon footprint indicators' is an emissions
    # dataset, not building exposure — footprints count only with a
    # building context word ('building footprints' already hits building\w*)
    ("buildings", r"(?i)\b(building\w*|housing\s+(stock|units?)|dwelling\w*)\b"),
    ("infrastructure", r"(?i)\b(infrastructure|roads?\s+network\w*|bridge\w*|power\s+grid\w*|pipeline\w*|railway\w*|hospitals?|airports?)\b"),
    ("population", r"(?i)\b(population\w*|census\w*|demograph\w*|inhabitant\w*|household\s+survey\w*)\b"),
    ("agriculture", r"(?i)\b(crop\w*|agricultur\w*|livestock|farm\w*|irrigat\w*|harvest\w*)\b"),
    ("natural_environment", r"(?i)\b(forest\s+cover|wetland\w*|ecosystem\w*|mangrove\w*|protected\s+area\w*|biodiversity)\b"),
    ("economic_indicator", r"(?i)\b(gdp|gross\s+domestic|economic\s+(output|activity|indicator)\w*|income\s+level\w*)\b"),
    ("development_index", r"(?i)\b(human\s+development\s+index|hdi\b|poverty\s+(index|rate)|deprivation\s+index|vulnerability\s+index)\w*"),
]


def _first_match(col: Column, bank: list[tuple[str, str]]) -> Column:
    chain = None
    for label, pat in bank:
        b = (col.rlike(pat), F.lit(label))
        chain = F.when(*b) if chain is None else chain.when(*b)
    return chain


def detect_hazard_type(text: Column) -> Column:
    """First matching hazard type from the 11-type codelist bank (null when
    none fire)."""
    return _first_match(text, HAZARD_DETECT_PATTERNS)


def detect_exposure_category(text: Column) -> Column:
    """First matching exposure category from the 7-category bank."""
    return _first_match(text, EXPOSURE_DETECT_PATTERNS)


# ---------------------------------------------------------------------------
# Vulnerability signal bank (11…ipynb cell 6: FUNCTION_TYPE_PATTERNS +
# SOCIOECONOMIC_INDICATORS).  Unlike hazard/exposure, vulnerability detection
# is MULTI-LABEL in the reference (``_detect_function_types`` returns a list;
# each socio indicator fires independently), so the detector returns the
# array of every label that fires, in bank order.
# ---------------------------------------------------------------------------
VULN_DETECT_PATTERNS: list[tuple[str, str]] = [
    # function types (4, RDLS function keys)
    ("vulnerability", r"(?i)\b(vulnerability|damage)[\s._-]?(curve|function)s?\b"
                      r"|(?i)\b(mean[\s._-]?damage[\s._-]?ratio|mdr)\b"
                      r"|(?i)\bdepth[\s._-]?damage\b"),
    ("fragility", r"(?i)\bfragility[\s._-]?(curve|function)s?\b"
                  r"|(?i)\b(probability[\s._-]?of[\s._-]?damage|failure[\s._-]?probability)\b"
                  r"|(?i)\b(capacity[\s._-]?spectrum|pushover)\b"
                  r"|(?i)\b(lognormal[\s._-]?fragility|damage[\s._-]?state)\b"),
    ("damage_to_loss", r"(?i)\b(damage[\s._-]?to[\s._-]?loss|consequence[\s._-]?functions?)\b"
                       r"|(?i)\bloss[\s._-]?(function|model)s?\b"
                       r"|(?i)\b(repair|replacement)[\s._-]?cost[\s._-]?(function|ratio|curve)s?\b"),
    ("engineering_demand", r"(?i)\bengineering[\s._-]?demand\b"
                           r"|(?i)\binter[\s._-]?storey[\s._-]?drift\b"
                           r"|(?i)\b(floor[\s._-]?acceleration|peak[\s._-]?floor)\b"
                           r"|(?i)\bspectral[\s._-]?displacement\b"),
    # socio-economic indicator codes (cell 6 SOCIOECONOMIC_INDICATORS)
    ("POV_HEADCOUNT", r"(?i)\b(poverty[\s._-]?(headcount|ratio|index|rate)"
                      r"|below[\s._-]?poverty[\s._-]?line|poor[\s._-]?population)\b"),
    ("HDI", r"(?i)\b(human[\s._-]?development[\s._-]?index|hdi)\b"),
    ("SVI_OVERALL", r"(?i)\b(social[\s._-]?vulnerability[\s._-]?index|svi"
                    r"|socio[\s._-]?economic[\s._-]?vulnerability[\s._-]?index)\b"),
    ("FOOD_SECURITY", r"(?i)\b(food[\s._-]?(in)?security|ipc[\s._-]?(phase|classification)"
                      r"|food[\s._-]?crisis|famine[\s._-]?early[\s._-]?warning)\b"),
    ("DISPLACEMENT_VULN", r"(?i)\b(internally[\s._-]?displaced|idp[\s._-]?(settlement|camp|population)s?"
                          r"|displacement[\s._-]?tracking)\b"),
    ("MALNUTRITION", r"(?i)\b(mal)?nutrition\b|(?i)\b(stunting|wasting[\s._-]?prevalence)\b"),
]

# ---------------------------------------------------------------------------
# Loss signal bank (11…ipynb cell 23: LOSS_SIGNAL_PATTERNS — 8 categories —
# + LOSS_EXCLUSION_PATTERNS).  An exclusion hit drops the WHOLE record
# (reference ``_check_exclusions``), not just the matching label.
# ---------------------------------------------------------------------------
LOSS_DETECT_PATTERNS: list[tuple[str, str]] = [
    ("human_loss", r"(?i)\b(casualt(y|ies)|fatalit(y|ies)|mortalit(y|ies)|death"
                   r"|killed|dead|perished|deceased|injur(y|ies|ed)|wounded"
                   r"|hospitalized|missing[\s._-]?persons?|unaccounted)\b"),
    ("displacement", r"(?i)\b(displaced|displacement|evacuated|evacuation|homeless"
                     r"|shelter[\s._-]?(less|need)|internally[\s._-]?displaced|idp"
                     r"|refugee[\s._-]?(flow|movement|crisis))\b"),
    ("affected_population", r"(?i)\b(affected[\s._-]?(population|people|persons?|households?|communit\w*)"
                            r"|people[\s._-]?(affected|impacted|in[\s._-]?need)"
                            r"|population[\s._-]?(affected|exposed|at[\s._-]?risk))\b"),
    ("economic_loss", r"(?i)\b((economic|financial|monetary)[\s._-]?loss(es)?"
                      r"|(damage|repair|replacement)[\s._-]?costs?"
                      r"|insured[\s._-]?loss(es)?|insurance[\s._-]?claims?"
                      r"|aal|average[\s._-]?annual[\s._-]?loss"
                      r"|expected[\s._-]?loss|probable[\s._-]?maximum[\s._-]?loss|pml)\b"),
    ("structural_damage", r"(?i)\b(building[\s._-]?(damage|destroyed|collapsed|affected)"
                          r"|structural[\s._-]?damage|house[\s._-]?(damage|destroyed)"
                          r"|infrastructure[\s._-]?(damage|destroyed|loss)"
                          r"|damage[\s._-]?(state|ratio|assessment|survey))\b"),
    ("agricultural_loss", r"(?i)\b(crop[\s._-]?(loss|damage|failure|destroyed)"
                          r"|agricultural[\s._-]?(loss|damage|impact)"
                          r"|livestock[\s._-]?(loss|death|mortality)"
                          r"|harvest[\s._-]?(loss|failure|damage))\b"),
    ("catastrophe_model", r"(?i)\b(cat[\s._-]?model\w*|catastrophe[\s._-]?model\w*"
                          r"|risk[\s._-]?model\w*|loss[\s._-]?model\w*"
                          r"|loss[\s._-]?exceedance|ep[\s._-]?curves?)\b"),
    ("general_loss", r"(?i)\b((natural[\s._-]?)?disaster[\s._-]?(loss|damage|impact|incident)s?"
                     r"|damage[\s._-]?and[\s._-]?loss(es)?"
                     r"|post[\s._-]?disaster[\s._-]?(needs?|assessment|damage)"
                     r"|pdna|dala|rapid[\s._-]?damage[\s._-]?assessment)\b"),
]

LOSS_DETECT_EXCLUSIONS: list[str] = [
    r"(?i)\b(data|packet|signal)[\s._-]?loss\b",
    r"(?i)\b(weight|hair|blood)[\s._-]?loss\b",
    r"(?i)\bloss[\s._-]?of[\s._-]?(data|signal|connectivity|precision)\b",
    r"(?i)\b(profit[\s._-]?and[\s._-]?loss|p&l)\b",
]


def _multi_match(col: Column, bank: list[tuple[str, str]]) -> Column:
    """Array of every bank label whose pattern fires, in bank order."""
    return F.filter(
        F.array(*[F.when(col.rlike(pat), F.lit(label)) for label, pat in bank]),
        lambda x: x.isNotNull(),
    )


def detect_vulnerability_signals(text: Column) -> Column:
    """array<string> of vulnerability signals: function types
    (vulnerability/fragility/damage_to_loss/engineering_demand) and
    socio-economic indicator codes — multi-label, like the reference's
    VulnerabilityExtractor (11…ipynb cell 8)."""
    return _multi_match(text, VULN_DETECT_PATTERNS)


def detect_loss_signals(text: Column) -> Column:
    """array<string> of loss signal types; EMPTY when any exclusion pattern
    fires (the reference drops the whole record on exclusion,
    11…ipynb cell 24 ``_check_exclusions``)."""
    excluded = None
    for pat in LOSS_DETECT_EXCLUSIONS:
        hit = text.rlike(pat)
        excluded = hit if excluded is None else (excluded | hit)
    return F.when(excluded, F.array().cast("array<string>")).otherwise(
        _multi_match(text, LOSS_DETECT_PATTERNS)
    )
