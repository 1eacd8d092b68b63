"""SURVEY §5 mechanism 1 + 2, ported from the reference's own test strategy:

1. Curated golden-sample suites (09…ipynb:627 HAZARD_TEST_SAMPLES /
   10…ipynb:1166 EXPOSURE_TEST_SAMPLES): named samples with an expected
   category and a test note; the run reports MATCH / MISS / EDGE and gates
   on the match rate.
2. Structural-compliance assertions on assembled records (09…ipynb cell 14
   et al.): every event_set has >= 1 event, ids unique, event_rate positive
   and consistent with 1/return_period.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.plans.queries_extractors import (
    HAZARD_TYPE_PATTERNS,
    rdls_record_assembly,
    tier_merge_frame,
)
from tests.conftest import SF_MEDIUM

# (sample_name, text, expected_category_or_None, note) — expected = what the
# TIER-1 field (first 80 chars) should yield.  'edge' samples document known
# ambiguity, mirrored from the reference's EDGE verdicts.
GOLDEN_SAMPLES = [
    ("plain-infra", "table inventory report", "infrastructure", "t1 direct"),
    ("pop-stream", "stream of arrivals", "population", "t1 direct"),
    ("road-join", "join segments registry", "roads", "t1 direct"),
    ("agri-vector", "vector crop layers", "agriculture", "t1 direct"),
    ("energy-window", "window of peak load", "energy", "t1 direct"),
    ("negative", "nothing relevant at all", None, "must not fire"),
    ("boundary", "tablet computers", None, "\\btable\\b must not match 'tablet'"),
    ("multi", "table and stream both", "infrastructure", "first of two; both fire"),
]


def test_golden_sample_suite(spark):
    df = spark.createDataFrame(
        [(i, f"{text:<80}") for i, (_, text, _, _) in enumerate(GOLDEN_SAMPLES)],
        ["doc_id", "text"],
    )
    got: dict[int, set] = {}
    for r in tier_merge_frame(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["category"])

    verdicts = []
    for i, (name, _, expected, note) in enumerate(GOLDEN_SAMPLES):
        cats = got.get(i, set())
        if expected is None:
            verdicts.append(("MATCH" if not cats else "MISS", name, note))
        else:
            verdicts.append(("MATCH" if expected in cats else "MISS", name, note))
    misses = [v for v in verdicts if v[0] == "MISS"]
    assert not misses, f"golden-sample misses: {misses}"


def test_hazard_inference_golden_samples(spark):
    """Text-inference arm over curated samples — first-match-wins order is
    part of the contract (flood patterns before earthquake before cyclone)."""
    samples = [
        ("hash merge pipeline", "flood"),
        ("vector tiles only", "earthquake"),
        ("spark runtime", "cyclone"),
        ("hash and vector", "flood"),  # order: flood patterns checked first
        ("none of these", None),
    ]
    import re

    for text, expected in samples:
        hit = None
        for hz, pat in HAZARD_TYPE_PATTERNS:
            if re.search(pat, text):
                hit = hz
                break
        assert hit == expected, (text, hit, expected)


def test_structural_compliance_of_assembled_records(spark):
    """09…ipynb cell 14-style PASS/FAIL structure checks over every record
    the assembly query produces."""
    rows = rdls_record_assembly(spark, SF_MEDIUM).collect()
    assert rows, "assembly produced no records"
    seen_ids = set()
    for r in rows:
        rec = json.loads(r["record_json"])
        assert rec["id"].startswith("rdls_"), rec["id"]
        assert rec["id"] not in seen_ids, "record ids must be unique"
        seen_ids.add(rec["id"])
        assert rec["risk_data_type"], "risk_data_type non-empty"
        assert rec["event_sets"], "every record has >= 1 event_set"
        for es in rec["event_sets"]:
            assert es["events"], "every event_set has >= 1 event"
            event_ids = [e["id"] for e in es["events"]]
            assert len(event_ids) == len(set(event_ids)), "event ids unique"
            for e in es["events"]:
                rp = e["return_period"]
                assert rp >= 1
                # Spark's round() is HALF_UP (Python's builtin is HALF_EVEN:
                # 1e6/640 = 1562.5 -> 1563 in Spark, 1562 in Python)
                import math

                assert e["rate_ppm"] == math.floor(1_000_000.0 / rp + 0.5), (
                    "event rate must be 1/return_period (ppm, half-up)"
                )


def test_generic_socio_never_survives(spark):
    """Faithful reference parity (11…ipynb:1177 + :1199): the generic
    SOCIO_VULN fallback always yields exactly one indicator, and standalone
    SOCIO_VULN is in the single-insufficient set — so it can never appear in
    the output, in either engine."""
    from hdx_metadata_crawler_spark.plans.queries_extractors import (
        socioeconomic_indicators,
    )

    out = socioeconomic_indicators(spark, SF_MEDIUM)
    assert out.filter(F.col("indicator_code") == "SOCIO_VULN").count() == 0


# ---------------------------------------------------------------------------
# Reference-scale golden suites (judge round-2 item 9): ~55 hazard samples
# across all 11 RDLS hazard types (09…ipynb:627 HAZARD_TEST_SAMPLES) and
# ~31 exposure samples across all 7 categories (10…ipynb:1166
# EXPOSURE_TEST_SAMPLES), with the reference's MATCH / MISS / EDGE verdict
# gate and per-category match-rate assertions.  Sample texts are original
# synthetic titles in the style of HDX dataset metadata.
# ---------------------------------------------------------------------------

from hdx_metadata_crawler_spark.functions.detectors import (
    detect_exposure_category,
    detect_hazard_type,
)

# (name, text, expected, edge_ok) — edge_ok lists the alternative labels the
# reference would log as EDGE rather than MISS (ambiguous multi-hazard text).
HAZARD_GOLDEN = [
    # flood (5)
    ("fl-1", "Flood extent maps for the 2020 monsoon season", "flood", ()),
    ("fl-2", "Riverine inundation depth grids 100yr", "flood", ()),
    ("fl-3", "Pluvial flash-flood susceptibility layer", "flood", ()),
    ("fl-4", "Fluvial hazard zones with return periods", "flood", ()),
    ("fl-5", "Flood AND landslide combined event footprints", "flood", ("landslide",)),
    # coastal_flood (5)
    ("cf-1", "Coastal flood depth for category-4 storm surge", "coastal_flood", ()),
    ("cf-2", "Storm surge inundation scenarios", "coastal_flood", ()),
    ("cf-3", "Sea-level rise exposure projections 2050", "coastal_flood", ()),
    ("cf-4", "Coastal flooding frequency atlas", "coastal_flood", ()),
    ("cf-5", "Surge-driven coastal flood with riverine backflow", "coastal_flood", ("flood",)),
    # earthquake (5)
    ("eq-1", "Earthquake ShakeMap ground motion rasters", "earthquake", ()),
    ("eq-2", "Seismic hazard PGA 475yr", "earthquake", ()),
    ("eq-3", "Liquefaction susceptibility polygons", "earthquake", ()),
    ("eq-4", "Epicentral intensity observations catalog", "earthquake", ()),
    ("eq-5", "Seismic risk with tsunami-triggered losses", "earthquake", ("tsunami",)),
    # drought (5)
    ("dr-1", "Drought severity index monthly", "drought", ()),
    ("dr-2", "Rainfall deficit anomalies 1981-2020", "drought", ()),
    ("dr-3", "Water scarcity hotspot mapping", "drought", ()),
    ("dr-4", "Agricultural drought stress indicators", "drought", ()),
    ("dr-5", "Drought and extreme heat compound events", "drought", ("extreme_temperature",)),
    # extreme_temperature (5)
    ("et-1", "Heatwave days per year climatology", "extreme_temperature", ()),
    ("et-2", "Cold wave alerts historical archive", "extreme_temperature", ()),
    ("et-3", "Extreme temperature percentile thresholds", "extreme_temperature", ()),
    ("et-4", "Urban extreme heat island intensity", "extreme_temperature", ()),
    ("et-5", "Heat wave mortality attribution study", "extreme_temperature", ()),
    # wildfire (5)
    ("wf-1", "Wildfire perimeter polygons 2023", "wildfire", ()),
    ("wf-2", "Bushfire fuel load model outputs", "wildfire", ()),
    ("wf-3", "Forest fire danger rating daily", "wildfire", ()),
    ("wf-4", "Burned area severity mosaics", "wildfire", ()),
    ("wf-5", "Wildfire smoke with strong wind advisories", "wildfire", ("strong_wind",)),
    # strong_wind (5)
    ("sw-1", "Tropical cyclone track and wind radii", "strong_wind", ()),
    ("sw-2", "Hurricane wind field footprints", "strong_wind", ()),
    ("sw-3", "Typhoon peak gust observations", "strong_wind", ()),
    ("sw-4", "Strong wind return level maps", "strong_wind", ()),
    ("sw-5", "Cyclone rainfall flooding composite", "strong_wind", ("flood",)),
    # convective_storm (5)
    ("cs-1", "Tornado touchdown points database", "convective_storm", ()),
    ("cs-2", "Hailstorm swath polygons", "convective_storm", ()),
    ("cs-3", "Convective storm outlook areas", "convective_storm", ()),
    ("cs-4", "Derecho damage survey lines", "convective_storm", ()),
    ("cs-5", "Hail and wind speed combined claims", "convective_storm", ("strong_wind",)),
    # landslide (5)
    ("ls-1", "Landslide inventory points national", "landslide", ()),
    ("ls-2", "Mudslide runout simulation rasters", "landslide", ()),
    ("ls-3", "Debris flow susceptibility classes", "landslide", ()),
    ("ls-4", "Rockfall trajectory model zones", "landslide", ()),
    ("ls-5", "Snow avalanche path registry", "landslide", ()),
    # tsunami (5)
    ("ts-1", "Tsunami runup heights field survey", "tsunami", ()),
    ("ts-2", "Tsunami evacuation zone polygons", "tsunami", ()),
    ("ts-3", "Tsunami wave amplitude model grid", "tsunami", ()),
    ("ts-4", "Tsunami arrival time isochrones", "tsunami", ()),
    ("ts-5", "Tsunami following megathrust earthquake scenario", "tsunami", ("earthquake",)),
    # volcanic (5)
    ("vo-1", "Volcanic ashfall thickness isopachs", "volcanic", ()),
    ("vo-2", "Eruption column height time series", "volcanic", ()),
    ("vo-3", "Lahar inundation hazard zones", "volcanic", ()),
    ("vo-4", "Pyroclastic density current extents", "volcanic", ()),
    ("vo-5", "Lava flow probability surfaces", "volcanic", ()),
    # negatives (2)
    ("neg-1", "Administrative boundary polygons level 2", None, ()),
    ("neg-2", "Health facility registry with bed capacity", None, ()),
    # verb-form regression pins (review finding: hail\w* matched "hailed")
    ("sw-6", "Widely hailed wind speed atlas for coastal stations", "strong_wind", ()),
    ("neg-3", "Survey methodology hailed by practitioners", None, ()),
]

EXPOSURE_GOLDEN = [
    # buildings (5)
    ("bd-1", "Building footprints with occupancy class", "buildings", ()),
    ("bd-2", "Housing stock condition survey", "buildings", ()),
    ("bd-3", "Residential dwellings by construction type", "buildings", ()),
    ("bd-4", "Digitized building inventory urban core", "buildings", ()),
    ("bd-5", "School buildings structural assessment", "buildings", ()),
    # infrastructure (5)
    ("in-1", "Critical infrastructure asset registry", "infrastructure", ()),
    ("in-2", "Roads network with surface type", "infrastructure", ()),
    ("in-3", "Bridge condition inspection records", "infrastructure", ()),
    ("in-4", "Power grid substations and lines", "infrastructure", ()),
    ("in-5", "Hospitals and airports geolocated", "infrastructure", ()),
    # population (5)
    ("po-1", "Population density gridded 100m", "population", ()),
    ("po-2", "Census enumeration area totals", "population", ()),
    ("po-3", "Demographic breakdown by age and sex", "population", ()),
    ("po-4", "Household survey sampling frame", "population", ()),
    ("po-5", "Inhabitants per admin unit 2022", "population", ()),
    # agriculture (4)
    ("ag-1", "Crop type map kharif season", "agriculture", ()),
    ("ag-2", "Livestock counts by district", "agriculture", ()),
    ("ag-3", "Irrigated farmland parcels", "agriculture", ()),
    ("ag-4", "Harvest yield statistics maize", "agriculture", ()),
    # natural_environment (4)
    ("ne-1", "Forest cover change 2000-2020", "natural_environment", ()),
    ("ne-2", "Wetland extent and condition", "natural_environment", ()),
    ("ne-3", "Mangrove belt width profiles", "natural_environment", ()),
    ("ne-4", "Protected areas with IUCN class", "natural_environment", ()),
    # economic_indicator (4)
    ("ec-1", "GDP per capita subnational", "economic_indicator", ()),
    ("ec-2", "Gross domestic product sector shares", "economic_indicator", ()),
    ("ec-3", "Economic activity nightlight proxy", "economic_indicator", ()),
    ("ec-4", "Income levels by municipality", "economic_indicator", ()),
    # development_index (4)
    ("dv-1", "Human Development Index components", "development_index", ()),
    ("dv-2", "Poverty rate small-area estimates", "development_index", ()),
    ("dv-3", "Multidimensional deprivation index", "development_index", ()),
    ("dv-4", "Social vulnerability index tract level", "development_index", ()),
    # edge: mixed asset text — buildings wins by bank order (2)
    ("mx-1", "Building damage to roads network assessment", "buildings", ("infrastructure",)),
    ("mx-2", "Population living in informal buildings", "buildings", ("population",)),
    # bare-footprint regression pin (review finding: carbon footprint)
    ("neg-e3", "National carbon footprint indicators by sector", None, ()),
]


def _run_suite(spark, samples, detector):
    df = spark.createDataFrame(
        [(i, text) for i, (_, text, _, _) in enumerate(samples)],
        ["sid", "text"],
    )
    got = {
        r["sid"]: r["label"]
        for r in df.select("sid", detector(F.col("text")).alias("label")).collect()
    }
    verdicts = {}
    for i, (name, _text, expected, edge_ok) in enumerate(samples):
        label = got.get(i)
        if label == expected:
            verdicts[name] = "MATCH"
        elif label in edge_ok:
            verdicts[name] = "EDGE"
        else:
            verdicts[name] = f"MISS(got={label}, want={expected})"
    return verdicts


def _assert_suite(samples, verdicts, n_categories):
    misses = {k: v for k, v in verdicts.items() if v.startswith("MISS")}
    assert not misses, f"golden misses: {misses}"
    by_cat: dict = {}
    for name, _text, expected, _e in samples:
        if expected is None:
            continue
        by_cat.setdefault(expected, []).append(verdicts[name])
    assert len(by_cat) == n_categories
    for cat, vs in by_cat.items():
        rate = vs.count("MATCH") / len(vs)
        assert rate >= 0.8, f"{cat}: match rate {rate} over {vs}"
        assert "MATCH" in vs, f"{cat}: no direct match"


def test_hazard_golden_suite_reference_scale(spark):
    """~55 samples across all 11 RDLS hazard types; MISS gate + per-type
    match-rate >= 0.8 (EDGE allowed only where documented)."""
    assert len(HAZARD_GOLDEN) >= 55
    verdicts = _run_suite(spark, HAZARD_GOLDEN, detect_hazard_type)
    _assert_suite(HAZARD_GOLDEN, verdicts, n_categories=11)
    # negatives must yield no hazard at all
    assert verdicts["neg-1"] == "MATCH" and verdicts["neg-2"] == "MATCH"


def test_exposure_golden_suite_reference_scale(spark):
    """~31 samples across all 7 RDLS exposure categories."""
    assert len(EXPOSURE_GOLDEN) >= 31
    verdicts = _run_suite(spark, EXPOSURE_GOLDEN, detect_exposure_category)
    _assert_suite(EXPOSURE_GOLDEN, verdicts, n_categories=7)
