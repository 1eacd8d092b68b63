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
