"""E/V/L nested block assembly + NB06 translate + full-schema gate.

The oracle queries check each surface in isolation (byte-identical JSON);
these tests check the CROSS-surface contract the reference enforces end to
end: base records merged with their hazard/exposure/vulnerability/loss
blocks must validate against the full RDLS v0.3 schema with invalid == 0
(the NB07/NB13 quality gate, ``07…ipynb`` cell 17 "invalid==0 and
missing==0"), and the schema itself must carry the real standard's shape.
"""

from __future__ import annotations

import json

import pytest
from jsonschema import Draft202012Validator

from hdx_metadata_crawler_spark.functions.rdls_schema import (
    EXPOSURE_CATEGORIES,
    FULL_RDLS_SCHEMA,
    HAZARD_TYPES,
    IMPACT_METRICS,
    METRIC_DIMENSIONS,
    PROCESS_TYPES,
    TAXONOMIES,
)
from hdx_metadata_crawler_spark.plans.queries_blocks import (
    exposure_block_assembly,
    full_schema_validation,
    loss_block_assembly,
    translate_records,
    vulnerability_block_assembly,
)

from conftest import SF_SMALL


def test_schema_carries_the_real_standard_shape():
    s = FULL_RDLS_SCHEMA
    assert s["required"] == [
        "id", "title", "risk_data_type", "attributions", "spatial",
        "license", "resources",
    ]
    assert len(s["$defs"]) == 37
    assert len(HAZARD_TYPES) == 11
    assert len(PROCESS_TYPES) == 30
    assert len(EXPOSURE_CATEGORIES) == 7
    assert len(IMPACT_METRICS) == 20
    assert len(METRIC_DIMENSIONS) == 6
    assert len(TAXONOMIES) == 12
    # the four function defs require the same 10 fields (the reference's
    # FUNCTION_MANDATORY_FIELDS check, 11…ipynb cell 14)
    for fd in ("VulnerabilityFunction", "FragilityFunction",
               "DamageToLossFunction", "EngineeringDemandFunction"):
        assert len(s["$defs"][fd]["required"]) == 10
    assert s["$defs"]["Losses"]["properties"]["impact_and_losses"]["required"] == [
        "impact_type", "impact_modelling", "impact_metric", "quantity_kind",
        "loss_type", "loss_approach", "loss_frequency_type",
    ]
    Draft202012Validator.check_schema(s)


@pytest.fixture(scope="module")
def merged_records(spark):
    """Base records joined with their assembled E/V/L blocks (doc_id keyed),
    merged driver-side into complete RDLS records — the NB12-style
    integration of NB06 output with extractor blocks, at test scale."""
    base = {
        r["doc_id"]: json.loads(r["record_json"])
        for r in translate_records(spark, SF_SMALL).collect()
    }
    exp = {
        r["doc_id"]: json.loads(r["exposure_json"])
        for r in exposure_block_assembly(spark, SF_SMALL).collect()
    }
    vul = {
        r["doc_id"]: json.loads(r["vulnerability_json"])
        for r in vulnerability_block_assembly(spark, SF_SMALL).collect()
    }
    lss = {
        r["doc_id"]: json.loads(r["loss_json"])
        for r in loss_block_assembly(spark, SF_SMALL).collect()
    }
    out = {}
    for doc_id, rec in base.items():
        rec = dict(rec)
        if doc_id in exp:
            rec["exposure"] = exp[doc_id]
        if doc_id in vul:
            rec["vulnerability"] = vul[doc_id]
        if doc_id in lss:
            rec["loss"] = lss[doc_id]
        out[doc_id] = rec
    return out


def test_merged_records_pass_full_schema(merged_records):
    """invalid == 0 over complete records (base + E/V/L blocks).

    One documented exception class: the exposure builder mirrors the
    reference in emitting ``currency`` (possibly '') for EVERY monetary
    metric (10…ipynb:1093 ``metric['currency'] = metric_currency``), while
    the schema's currency codelist has no '' — exactly the record class the
    reference's own NB13 validator flags.  Those records must fail ONLY on
    the empty currency; everything else must be clean.
    """
    v = Draft202012Validator(FULL_RDLS_SCHEMA)
    assert len(merged_records) > 100
    n_with_blocks = sum(
        1 for r in merged_records.values()
        if "exposure" in r or "vulnerability" in r or "loss" in r
    )
    assert n_with_blocks > 50
    invalid = {}
    for doc_id, rec in merged_records.items():
        errs = [e.message for e in v.iter_errors(rec)]
        if errs:
            invalid[doc_id] = errs
    unexpected = {
        doc_id: errs
        for doc_id, errs in invalid.items()
        if not all("'' is not one of" in e for e in errs)
    }
    assert unexpected == {}, f"non-currency schema failures: {unexpected}"
    # the empty-currency class must actually occur (the branch is real)
    assert invalid, "expected some empty-currency records in the corpus"


def test_block_distribution(merged_records):
    """Every component block type occurs; exposure ids keep the skip gaps."""
    kinds = {"exposure": 0, "vulnerability": 0, "loss": 0}
    gap_seen = False
    for rec in merged_records.values():
        for k in kinds:
            if k in rec:
                kinds[k] += 1
        for item in rec.get("exposure", []):
            idx = int(item["id"].rsplit("_", 1)[1])
            if idx > 1 and item is rec["exposure"][0]:
                gap_seen = True  # first item numbered >1 => earlier category skipped
    assert all(n > 10 for n in kinds.values()), kinds
    assert gap_seen, "expected id gaps from schema-invalid category skips"


def test_vulnerability_entries_constraint_valid(merged_records):
    """Group 1 + Group 3 invariants hold on every emitted function entry
    (the reference's structural-compliance assertions, 11…ipynb cell 14)."""
    from hdx_metadata_crawler_spark.plans.queries_blocks import (
        FUNCTION_TYPE_CONSTRAINTS,
        IMPACT_METRIC_CONSTRAINTS,
    )

    n = 0
    for rec in merged_records.values():
        funcs = rec.get("vulnerability", {}).get("functions", {})
        for ftype, entries in funcs.items():
            allowed, _default = FUNCTION_TYPE_CONSTRAINTS[ftype]
            for e in entries:
                n += 1
                assert e["impact_metric"] in allowed
                eq, atypes = IMPACT_METRIC_CONSTRAINTS[e["impact_metric"]]
                assert e["quantity_kind"] == eq
                assert e["impact_type"] in atypes
                assert e["hazard_primary"] is not None
                assert e["category"] is not None
    assert n > 20


def test_loss_entries_asset_triplets(merged_records):
    from hdx_metadata_crawler_spark.plans.queries_blocks import (
        VALID_ASSET_TRIPLETS,
    )

    n = 0
    for rec in merged_records.values():
        for entry in rec.get("loss", {}).get("losses", []):
            n += 1
            allowed = VALID_ASSET_TRIPLETS[entry["asset_category"]]
            assert entry["asset_dimension"] in allowed
            ial = entry["impact_and_losses"]
            assert len(
                [k for k in ("impact_type", "impact_modelling", "impact_metric",
                             "quantity_kind", "loss_type", "loss_approach",
                             "loss_frequency_type") if k in ial]
            ) == 7
            if "currency" in ial:
                assert ial["quantity_kind"] == "monetary"
                assert ial["currency"] != ""
    assert n > 20


def test_full_schema_validation_catches_both_fault_classes(spark):
    rows = full_schema_validation(spark, SF_SMALL).collect()
    missing = [r for r in rows if r["doc_id"] % 17 == 4]
    enum = [r for r in rows if r["doc_id"] % 17 == 9]
    clean = [r for r in rows if r["doc_id"] % 17 not in (4, 9)]
    assert missing and all(
        not r["is_valid"] and r["error_summary"] == "missing:attributions"
        for r in missing
    )
    assert enum and all(
        not r["is_valid"] and r["error_summary"].startswith("enum:'hazardous'")
        for r in enum
    )
    assert clean and all(r["is_valid"] for r in clean)


def test_pipeline_funnel_monotone_and_populated(spark):
    """The funnel is a real funnel: counts never increase stage-to-stage,
    every stage is populated, and the big drops happen where the pipeline
    semantics say they must (HEVL detection, integration ladder, schema
    gate) — the shape of the reference's STORY.md funnel."""
    from hdx_metadata_crawler_spark.plans.queries_blocks import pipeline_funnel

    rows = sorted(
        pipeline_funnel(spark, SF_SMALL).collect(),
        key=lambda r: r["stage_order"],
    )
    counts = [r["n_docs"] for r in rows]
    names = [r["stage"] for r in rows]
    assert names[0] == "crawled" and names[-1] == "tier_high"
    assert counts[0] == 500
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[-1] > 0
    # the three semantic drops exist
    assert counts[4] < counts[3]   # hevl_any < after_overrides
    assert counts[5] < counts[4]   # integrated < hevl_any
    assert counts[6] < counts[5]   # schema_valid < integrated
