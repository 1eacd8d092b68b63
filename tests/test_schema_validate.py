"""Draft2020-12 jsonschema validation gate (SURVEY §5 oracle 4 + §2.10 #5):
every record the assembly pipeline produces must validate (invalid == 0, the
reference's quality-gate condition), and the error categorizer must agree
with the reference's _summarize_errors buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.functions.schema_validate import (
    jsonschema_validate,
    summarize_errors,
)
from hdx_metadata_crawler_spark.plans.queries_extractors import rdls_record_assembly
from tests.conftest import SF_MEDIUM


def test_assembled_records_all_valid(spark):
    """Quality gate: invalid == 0 over the real rdls_record_assembly output
    (the reference gates packaging on exactly this condition)."""
    records = rdls_record_assembly(spark, SF_MEDIUM)
    validated = records.select(jsonschema_validate(F.col("record_json")).alias("v"))
    counts = validated.agg(
        F.count("*").alias("total"),
        F.sum(F.when(~F.col("v.is_valid"), 1).otherwise(0)).alias("invalid"),
    ).collect()[0]
    assert counts["total"] > 0
    assert counts["invalid"] == 0, "assembled records must pass the schema gate"


def test_invalid_records_categorized(spark):
    """Fault classes land in the right _summarize_errors buckets."""
    rows = [
        # missing required risk_data_type
        ('{"id": "rdls_hzd-1", "event_sets": [{"id": "s", "events": '
         '[{"id": "e", "return_period": 10, "rate_ppm": 100000}]}]}',),
        # enum violation
        ('{"id": "rdls_hzd-2", "risk_data_type": ["hazardous"], "event_sets": '
         '[{"id": "s", "events": [{"id": "e", "return_period": 10, '
         '"rate_ppm": 100000}]}]}',),
        # type error (return_period as string)
        ('{"id": "rdls_hzd-3", "risk_data_type": ["hazard"], "event_sets": '
         '[{"id": "s", "events": [{"id": "e", "return_period": "ten", '
         '"rate_ppm": 100000}]}]}',),
        # unparseable
        ("{not json",),
        # fully valid
        ('{"id": "rdls_hzd-5", "risk_data_type": ["hazard"], "event_sets": '
         '[{"id": "s", "events": [{"id": "e", "return_period": 10, '
         '"rate_ppm": 100000}]}]}',),
    ]
    df = spark.createDataFrame(rows, ["record_json"])
    out = [
        r["v"]
        for r in df.select(jsonschema_validate(F.col("record_json")).alias("v"))
        .collect()
    ]
    assert out[0]["error_summary"] == "missing:risk_data_type"
    assert out[1]["error_summary"].startswith("enum:")
    assert out[2]["error_summary"].startswith("type:")
    assert out[3]["error_summary"].startswith("other:")
    assert out[4]["is_valid"] and out[4]["error_summary"] == ""
    assert all(not o["is_valid"] for o in out[:4])


def test_summarizer_matches_reference_format():
    """Bucket format parity with 13…ipynb:1129: sorted, deduped, capped at 3,
    '; '-joined in missing/enum/type/anyOf/other order."""
    errs = [
        "'title' is a required property",
        "'id' is a required property",
        "'id' is a required property",
        "'x' is not one of ['a', 'b']",
        "5 is not of type 'string'",
        "something odd happened",
    ]
    assert summarize_errors(errs) == (
        "missing:id,title; enum:'x' is not one of ['a', 'b']; "
        "type:5 is not of type 'string'; other:1"
    )
    assert summarize_errors([]) == ""
