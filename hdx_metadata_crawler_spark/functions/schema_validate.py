"""Draft 2020-12 JSON-Schema validation as an iterator-based pandas UDF.

The reference validates every produced RDLS record against
``rdls_schema_v0.3.json`` (Draft2020-12: 7 required top-level fields + 37
codelist enums) and categorizes errors — ``06…ipynb:1701``, ``07…ipynb:437``,
``13…ipynb:523`` with the categorizer ``13…ipynb:1129 _summarize_errors``.
SURVEY §2.10 #5 keeps this as one of the six legitimate pandas UDFs: schema
validation is recursive tree-walking the Catalyst expression language cannot
express.

Spark shape: ``pandas_udf`` in ITERATOR form so the ``Draft202012Validator``
is compiled once per executor task (not per batch, never per row); each batch
then runs plain ``json.loads`` + ``validator.iter_errors``.  The column-
algebra fast path (``queries_quality.validate_records``) stays the scalable
first-pass filter; this UDF is the authoritative gate, matching the
reference's two-mechanism test strategy (SURVEY §5 oracle 2 + 4).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# RDLS-style schema literal for the engine's assembled hazard records
# (rdls_record_assembly): the same structural idioms as rdls_schema_v0.3.json
# — required top-level fields, a closed risk_data_type codelist, nested
# required fields, and integer range constraints.
RDLS_RECORD_SCHEMA: dict = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["id", "risk_data_type", "event_sets"],
    "properties": {
        "id": {"type": "string", "pattern": "^rdls_"},
        "risk_data_type": {
            "type": "array",
            "minItems": 1,
            "items": {"enum": ["hazard", "exposure", "vulnerability", "loss"]},
        },
        "event_sets": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "required": ["id", "events"],
                "properties": {
                    "id": {"type": "string"},
                    "events": {
                        "type": "array",
                        "minItems": 1,
                        "items": {
                            "type": "object",
                            "required": ["id", "return_period", "rate_ppm"],
                            "properties": {
                                "id": {"type": "string"},
                                "return_period": {"type": "integer", "minimum": 1},
                                "rate_ppm": {"type": "integer", "minimum": 0},
                            },
                        },
                    },
                },
            },
        },
    },
}

VALIDATION_RESULT = StructType(
    [
        StructField("is_valid", BooleanType()),
        StructField("n_errors", IntegerType()),
        StructField("error_summary", StringType()),
        StructField("errors", ArrayType(StringType())),
    ]
)

_REQUIRED_RE = re.compile(r"'([^']+)' is a required property")


def summarize_errors(errors: list[str]) -> str:
    """Categorize validator messages — same buckets and format as the
    reference's ``13…ipynb:1129 _summarize_errors`` (missing/enum/type/anyOf/
    other, sorted, '; '-joined; enum/type/anyOf paths capped at 3, while
    missing_field deliberately lists EVERY field — the reference applies no
    cap there either)."""
    if not errors:
        return ""
    cats: dict[str, list[str]] = {
        "missing_field": [], "invalid_enum": [], "type_error": [],
        "anyOf": [], "other": [],
    }
    for e in errors:
        if "is a required property" in e:
            m = _REQUIRED_RE.search(e)
            cats["missing_field"].append(m.group(1) if m else "?")
        elif "is not one of" in e or "enum" in e.lower():
            cats["invalid_enum"].append(e.split(":")[0] if ":" in e else e[:50])
        elif "is not of type" in e:
            cats["type_error"].append(e.split(":")[0] if ":" in e else e[:50])
        elif "anyOf" in e or "is not valid under any" in e:
            cats["anyOf"].append(e.split(":")[0] if ":" in e else e[:50])
        else:
            cats["other"].append(e[:50])
    parts = []
    if cats["missing_field"]:
        parts.append("missing:" + ",".join(sorted(set(cats["missing_field"]))))
    if cats["invalid_enum"]:
        parts.append("enum:" + ",".join(sorted(set(cats["invalid_enum"]))[:3]))
    if cats["type_error"]:
        parts.append("type:" + ",".join(sorted(set(cats["type_error"]))[:3]))
    if cats["anyOf"]:
        parts.append("anyOf:" + ",".join(sorted(set(cats["anyOf"]))[:3]))
    if cats["other"]:
        parts.append(f"other:{len(cats['other'])}")
    return "; ".join(parts)


def jsonschema_validate(json_col: Column, schema: dict | None = None) -> Column:
    """json string column -> struct(is_valid, n_errors, error_summary, errors).

    Iterator-form pandas UDF: the Draft2020-12 validator compiles once per
    task and is reused across every Arrow batch of that task.
    """
    schema_literal = json.dumps(schema or RDLS_RECORD_SCHEMA)

    @F.pandas_udf(VALIDATION_RESULT)
    def _validate(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        from jsonschema import Draft202012Validator

        validator = Draft202012Validator(json.loads(schema_literal))
        for s in batches:
            valid, n_err, summaries, all_errs = [], [], [], []
            for raw in s:
                if raw is None:
                    errs = ["null record"]
                else:
                    try:
                        obj = json.loads(raw)
                        errs = sorted(
                            e.message for e in validator.iter_errors(obj)
                        )
                    except (json.JSONDecodeError, TypeError) as exc:
                        errs = [f"unparseable: {exc}"[:80]]
                valid.append(not errs)
                n_err.append(len(errs))
                summaries.append(summarize_errors(errs))
                all_errs.append(errs)
            yield pd.DataFrame(
                {
                    "is_valid": valid,
                    "n_errors": n_err,
                    "error_summary": summaries,
                    "errors": all_errs,
                }
            )

    return _validate(json_col)
