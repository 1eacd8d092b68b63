"""The reference's own 15-combination unit table (12…ipynb:742 _test_cases)
ported against the column-algebra integration ladder: every non-empty HEVL
flag combination must produce the expected filename prefix (loss >
vulnerability > exposure > hazard) and validity (REQUIRE_HE_FOR_VL guard)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.plans.queries_integration import (
    COMPONENT_ORDER,
    integrate_frame,
)

# (components, expected_prefix, expected_valid) — verbatim from 12…ipynb:742.
REFERENCE_CASES = [
    (["hazard"], "rdls_hzd", True),
    (["exposure"], "rdls_exp", True),
    (["vulnerability"], "rdls_vln", False),
    (["loss"], "rdls_lss", False),
    (["hazard", "exposure"], "rdls_exp", True),
    (["hazard", "vulnerability"], "rdls_vln", True),
    (["hazard", "loss"], "rdls_lss", True),
    (["exposure", "vulnerability"], "rdls_vln", True),
    (["exposure", "loss"], "rdls_lss", True),
    (["vulnerability", "loss"], "rdls_lss", False),
    (["hazard", "exposure", "vulnerability"], "rdls_vln", True),
    (["hazard", "exposure", "loss"], "rdls_lss", True),
    (["hazard", "vulnerability", "loss"], "rdls_lss", True),
    (["exposure", "vulnerability", "loss"], "rdls_lss", True),
    (["hazard", "exposure", "vulnerability", "loss"], "rdls_lss", True),
]


def _frame(spark, cases):
    rows = []
    for i, (comps, _, _) in enumerate(cases):
        row = {"doc_id": i}
        for c in COMPONENT_ORDER:
            row[f"has_{c}"] = c in comps
            row[f"block_{c}"] = True  # all declared blocks exist
        row["has_base"] = True
        row["old_id"] = f"rdls_hzd-hdx_{i}"
        row["raw_desc"] = "A record"
        rows.append(row)
    return spark.createDataFrame(rows)


def test_all_15_combinations(spark):
    assert len(REFERENCE_CASES) == 15
    out = {r["doc_id"]: r for r in integrate_frame(_frame(spark, REFERENCE_CASES)).collect()}
    for i, (comps, expected_prefix, expected_valid) in enumerate(REFERENCE_CASES):
        r = out[i]
        assert r["declared_types"] == ",".join(
            c for c in COMPONENT_ORDER if c in comps
        ), comps
        if expected_valid:
            assert r["status"] == "ok", (comps, r["status"])
            assert r["final_id"].startswith(expected_prefix + "-hdx_"), comps
            assert r["actual_types"] == r["declared_types"]
            # terminal-punctuation rule: 'A record' gains a period
            assert r["description"].startswith("A record. [Source:")
        else:
            assert r["status"].startswith("standalone_vl_invalid("), (comps, r["status"])
            assert r["final_id"] is None and r["description"] is None


def test_reconcile_drops_blockless_components(spark):
    """Declared H+E+L where the loss block is missing reconciles to H+E with
    the exposure prefix; declared H+V where the V block is missing reconciles
    to hazard-only."""
    rows = [
        {
            "doc_id": 0,
            "has_hazard": True, "has_exposure": True,
            "has_vulnerability": False, "has_loss": True,
            "block_hazard": True, "block_exposure": True,
            "block_vulnerability": True, "block_loss": False,
            "has_base": True, "old_id": "rdls_hzd-hdx_0", "raw_desc": "x.",
        },
        {
            "doc_id": 1,
            "has_hazard": True, "has_exposure": False,
            "has_vulnerability": True, "has_loss": False,
            "block_hazard": True, "block_exposure": True,
            "block_vulnerability": False, "block_loss": True,
            "has_base": True, "old_id": "rdls_hzd-hdx_1", "raw_desc": "x.",
        },
        # all declared blocks missing -> no_actual_hevl_blocks
        {
            "doc_id": 2,
            "has_hazard": True, "has_exposure": False,
            "has_vulnerability": False, "has_loss": False,
            "block_hazard": False, "block_exposure": True,
            "block_vulnerability": True, "block_loss": True,
            "has_base": True, "old_id": "rdls_hzd-hdx_2", "raw_desc": "x.",
        },
        # base record missing -> no_nb06_record (before reconcile)
        {
            "doc_id": 3,
            "has_hazard": True, "has_exposure": False,
            "has_vulnerability": False, "has_loss": False,
            "block_hazard": True, "block_exposure": True,
            "block_vulnerability": True, "block_loss": True,
            "has_base": False, "old_id": "rdls_hzd-hdx_3", "raw_desc": "x.",
        },
    ]
    out = {r["doc_id"]: r for r in integrate_frame(spark.createDataFrame(rows)).collect()}
    assert out[0]["status"] == "ok"
    assert out[0]["actual_types"] == "hazard,exposure"
    assert out[0]["final_id"] == "rdls_exp-hdx_0"
    assert out[1]["status"] == "ok"
    assert out[1]["actual_types"] == "hazard"
    assert out[1]["final_id"] == "rdls_hzd-hdx_1"
    assert out[2]["status"] == "no_actual_hevl_blocks"
    assert out[3]["status"] == "no_nb06_record"
    # no-period rule: 'x.' already terminal, no extra period
    assert out[0]["description"].startswith("x. [Source:")


def test_no_signals_row(spark):
    rows = [
        {
            "doc_id": 0,
            **{f"has_{c}": False for c in COMPONENT_ORDER},
            **{f"block_{c}": True for c in COMPONENT_ORDER},
            "has_base": True, "old_id": "rdls_hzd-hdx_0", "raw_desc": "",
        }
    ]
    out = integrate_frame(spark.createDataFrame(rows)).collect()[0]
    assert out["status"] == "no_hevl_signals"
