"""P3 prefilter superset property + P10 loss-exclusion downgrade branches."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.plans.queries_extractors import (
    loss_signal_detection,
    osm_prefilter,
)
from tests.conftest import SF_MEDIUM


def test_prefilter_is_superset_of_detector(spark):
    """02…ipynb's prefilter contract: maybe_osm=false rows are provably
    skippable — no flagged row may be prefilter-negative."""
    out = osm_prefilter(spark, SF_MEDIUM)
    leaked = out.filter(F.col("flagged") & ~F.col("maybe_osm")).count()
    assert leaked == 0
    # and the prefilter is not vacuous (it rejects something on real data
    # OR passes everything only because every doc genuinely has markers)
    assert out.count() > 0


def test_loss_exclusion_downgrade_branches(spark):
    rows = [
        # strong + generic, no exclusion -> both kept
        (1, "customer data here"),
        # strong + generic + exclusion -> generic stripped, strong kept
        (2, "customer data slow value"),
        # ONLY generic + exclusion -> dropped entirely (the P5 fix)
        (3, "data big data"),
        # only generic, no exclusion -> kept
        (4, "plain data row"),
        # exclusion separator variants fire: slow_value / slow-line
        (5, "customer slow_value"),
        (6, "line slow-line"),
        # nothing
        (7, "nothing here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from hdx_metadata_crawler_spark.plans.queries_extractors import (
        LOSS_EXCLUSION_PATTERNS,
        LOSS_SIGNAL_PATTERNS,
        _WEAK_SIGNALS,
    )

    has_excl = None
    for p in LOSS_EXCLUSION_PATTERNS:
        c = F.col("text").rlike(p)
        has_excl = c if has_excl is None else (has_excl | c)
    sig = {n: F.col("text").rlike(p) for n, p in LOSS_SIGNAL_PATTERNS}
    kept = {
        n: sig[n] & ~(has_excl & F.lit(n in _WEAK_SIGNALS))
        for n, _ in LOSS_SIGNAL_PATTERNS
    }
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            has_excl.alias("has_exclusion"),
            F.concat_ws(",", *[F.when(kept[n], F.lit(n)) for n, _ in LOSS_SIGNAL_PATTERNS]).alias("kept"),
        ).collect()
    }
    assert not out[1]["has_exclusion"]
    assert out[1]["kept"] == "economic_loss,general_loss"
    assert out[2]["has_exclusion"]
    assert out[2]["kept"] == "economic_loss"          # generic stripped
    assert out[3]["has_exclusion"]
    assert out[3]["kept"] == ""                       # dropped entirely
    assert not out[4]["has_exclusion"]
    assert out[4]["kept"] == "general_loss"
    assert out[5]["has_exclusion"] and out[6]["has_exclusion"]
    assert out[7]["kept"] == ""


def test_exclusion_branch_fires_on_corpus(spark):
    """The deterministic corpus actually exercises the exclusion branch."""
    out = loss_signal_detection(spark, SF_MEDIUM)
    assert out.filter(F.col("has_exclusion")).count() > 0
    assert out.filter(F.col("has_exclusion") & (F.col("kept") != F.col("detected"))).count() > 0
