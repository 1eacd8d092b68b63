"""Record-quality queries: shape normalization, coercion, duplicate-title
grouping, and schema-style validation (SURVEY P1/P9/A6 + §5 oracle 2/4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.schema_validate import jsonschema_validate
from ..functions.text import normalize_title
from ..sources.tables import load_table
from .registry import register


@register(
    "record_shape_normalize",
    """
    SELECT event_id,
           coalesce(CAST(json_extract_string(wrapped, '$.k') AS INTEGER),
                    CAST(json_extract_string(wrapped, '$.dataset.k') AS INTEGER),
                    -1) AS k_norm
    FROM (
      SELECT event_id,
             CASE WHEN event_id % 2 = 0 THEN props
                  ELSE '{"dataset": ' || props || '}' END AS wrapped
      FROM events
    )
    WHERE event_id < 3000
    """,
    doc="Record-shape normalization: unwrap the {'dataset': {...}} fallback "
        "wrapper via coalesce over both JSON paths (SURVEY P1, 02…ipynb "
        "cell-2-1 normalize_dataset_record). Half the rows are wrapped "
        "deterministically to exercise both shapes.",
)
def record_shape_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    wrapped = F.when(F.col("event_id") % 2 == 0, F.col("props")).otherwise(
        F.concat(F.lit('{"dataset": '), F.col("props"), F.lit("}"))
    )
    return ev.select(
        "event_id",
        F.coalesce(
            F.get_json_object(wrapped, "$.k").cast("int"),
            F.get_json_object(wrapped, "$.dataset.k").cast("int"),
            F.lit(-1),
        ).alias("k_norm"),
    )


@register(
    "bool_coercion",
    """
    SELECT raw,
           CASE WHEN lower(trim(raw)) IN ('true', '1', 'yes', 'y') THEN true
                WHEN lower(trim(raw)) IN ('false', '0', 'no', 'n', '') THEN false
                ELSE NULL END AS as_bool,
           count(*) AS cnt
    FROM (
      SELECT CASE event_id % 7
               WHEN 0 THEN 'true' WHEN 1 THEN ' True ' WHEN 2 THEN '1'
               WHEN 3 THEN 'YES'  WHEN 4 THEN 'false'  WHEN 5 THEN '0'
               ELSE 'maybe' END AS raw
      FROM events
    )
    GROUP BY raw
    """,
    doc="Robust CSV bool round-trip coercion (SURVEY P9, 05…ipynb "
        "_to_bool_series: 'true'/'1'/'yes' => True, unknown => NULL).",
)
def bool_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 7 == 0, "true")
        .when(F.col("event_id") % 7 == 1, " True ")
        .when(F.col("event_id") % 7 == 2, "1")
        .when(F.col("event_id") % 7 == 3, "YES")
        .when(F.col("event_id") % 7 == 4, "false")
        .when(F.col("event_id") % 7 == 5, "0")
        .otherwise("maybe")
    )
    low = F.lower(F.trim(F.col("raw")))
    as_bool = (
        F.when(low.isin("true", "1", "yes", "y"), F.lit(True))
        .when(low.isin("false", "0", "no", "n", ""), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
    return (
        ev.select(raw.alias("raw"))
        .groupBy("raw")
        .agg(F.count("*").alias("cnt"))
        .select("raw", as_bool.alias("as_bool"), "cnt")
    )


@register(
    "dup_titles",
    """
    SELECT norm_title, count(*) AS n_docs, min(doc_id) AS first_doc_id
    FROM (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(substr(text, 1, 30)),
                    '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm_title
      FROM documents
    )
    GROUP BY norm_title
    HAVING count(*) > 1
    """,
    doc="Duplicate-title grouping on the normalized key (SURVEY A6, "
        "08…ipynb:1196 normalize_title + value_counts>1). The 'title' is the "
        "first 30 chars of text (the synthetic corpus has no separate title "
        "column).",
)
def dup_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            normalize_title(F.substring("text", 1, 30)).alias("norm_title"),
        )
        .groupBy("norm_title")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


# Required-field / codelist validation — the engine form of the reference's
# JSON-Schema oracle (06…ipynb:1701, 13…ipynb:523 Draft2020-12 validation +
# error categorization :1129).  Full jsonschema runs in tests when the lib is
# present; the in-engine validator is pure column algebra so it scales.

_VALID_LANGS = ("en", "fr", "es", "de", "pt")


@register(
    "validate_records",
    f"""
    SELECT doc_id,
           (text IS NOT NULL AND text <> ''
            AND lang IN {str(tuple(_VALID_LANGS))}
            AND n_chars > 0) AS is_valid,
           coalesce(array_to_string(list_filter([
             CASE WHEN text IS NULL OR text = '' THEN 'missing_text' END,
             CASE WHEN lang NOT IN {str(tuple(_VALID_LANGS))} THEN 'bad_lang' END,
             CASE WHEN n_chars <= 0 THEN 'bad_n_chars' END
           ], x -> x IS NOT NULL), ';'), '') AS errors
    FROM documents
    """,
    doc="Structural validation with error categorization (SURVEY §5 "
        "mechanisms 2/4: required fields present, codelist membership; "
        "06…ipynb:1701 / 13…ipynb:1129 _summarize_errors). Pure column "
        "algebra — the Draft2020-12 jsonschema UDF path is exercised in "
        "tests when the library is available.",
)
def validate_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    checks = [
        ((F.col("text").isNull()) | (F.col("text") == ""), "missing_text"),
        (~F.col("lang").isin(*_VALID_LANGS), "bad_lang"),
        (F.col("n_chars") <= 0, "bad_n_chars"),
    ]
    errors = F.filter(
        F.array(*[F.when(cond, F.lit(tag)).otherwise(F.lit(None)) for cond, tag in checks]),
        lambda x: x.isNotNull(),
    )
    return d.select(
        "doc_id",
        (
            F.col("text").isNotNull()
            & (F.col("text") != "")
            & F.col("lang").isin(*_VALID_LANGS)
            & (F.col("n_chars") > 0)
        ).alias("is_valid"),
        F.concat_ws(";", errors).alias("errors"),
    )


# NB13 HEVL completeness introspection (13…ipynb:758 check_hevl_completeness):
# parse each produced RDLS JSON record and report block presence/structure —
# declared component count, event-set/event counts, return-period presence.
# The engine side uses real JSON parsing (from_json + nested array ops) over
# the records the assembly query emits; the oracle introspects the identical
# JSON with DuckDB's json functions.

@register(
    "hevl_completeness",
    """
    WITH rps AS (
      SELECT event_id,
             list_sort(list_distinct(
               list_filter(
                 list_transform(regexp_extract_all(
                   'flood hazard ' || CAST(user_id * 5 AS VARCHAR)
                     || '-year return period, sensor 2021 and '
                     || CAST(user_id * 10 AS VARCHAR) || ' year event',
                   '[0-9]+'), x -> CAST(x AS INTEGER)),
                 rp -> rp > 0 AND NOT (rp BETWEEN 2000 AND 2099)))) AS rp_list
      FROM events WHERE event_id < 1000
    ),
    recs AS (
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
      FROM rps WHERE len(rp_list) > 0
    )
    SELECT event_id,
           (json_array_length(record_json, '$.event_sets') > 0) AS has_hazard,
           CAST(json_array_length(record_json, '$.risk_data_type') AS INT)
             AS declared_component_count,
           CAST(json_array_length(record_json, '$.event_sets') AS INT)
             AS hazard_event_sets,
           CAST(json_array_length(record_json, '$.event_sets[0].events') AS INT)
             AS hazard_events_count,
           (json_array_length(record_json, '$.event_sets[0].events') > 0)
             AS hazard_has_return_periods
    FROM recs
    """,
    doc="HEVL completeness introspection (SURVEY §5 oracle 2; 13…ipynb:758 "
        "check_hevl_completeness): block presence, declared-vs-actual "
        "component counts, event-set/event cardinalities, return-period "
        "presence — real JSON parsing (from_json into the typed record "
        "schema + nested array ops) over the records the assembly query "
        "produces, vs DuckDB json-path introspection of identical JSON.",
)
def hevl_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_extractors import rdls_record_assembly

    recs = rdls_record_assembly(spark, sf_dir)
    schema = (
        "id string, risk_data_type array<string>, "
        "event_sets array<struct<id:string, events:array<struct<"
        "id:string, return_period:int, rate_ppm:bigint>>>>"
    )
    parsed = recs.select(
        "event_id", F.from_json("record_json", schema).alias("r")
    )
    events0 = F.col("r.event_sets")[0]["events"]
    return parsed.select(
        "event_id",
        (F.size("r.event_sets") > 0).alias("has_hazard"),
        F.size("r.risk_data_type").alias("declared_component_count"),
        F.size("r.event_sets").alias("hazard_event_sets"),
        F.size(events0).alias("hazard_events_count"),
        # size > 0, structurally identical to the oracle's
        # json_array_length(events) > 0 — an exists() over return_period
        # would silently diverge if assembly ever emitted a NULL rp
        (F.size(events0) > 0).alias("hazard_has_return_periods"),
    )


# Draft2020-12 jsonschema validation (SURVEY §2.10 #5; 06…ipynb:1701,
# 13…ipynb:523+1129).  Records are RDLS-style hazard assemblies with two
# deterministic fault classes injected so both the valid and the invalid
# paths are exercised: event_id%10==3 drops the required risk_data_type
# (to_json omits null fields), event_id%10==7 writes a value outside the
# codelist.  The oracle knows the construction rule, so the expected verdict
# and the categorized summary (same buckets/format as the reference's
# _summarize_errors) are ground truth, not a reimplementation of jsonschema.

_ENUM_MSG_50 = "'hazardous' is not one of ['hazard', 'exposure', '"
_ENUM_MSG_SQL = _ENUM_MSG_50.replace("'", "''")


@register(
    "jsonschema_validation",
    f"""
    SELECT event_id,
           (event_id % 10 NOT IN (3, 7))                        AS is_valid,
           CASE WHEN event_id % 10 IN (3, 7) THEN 1 ELSE 0 END  AS n_errors,
           CASE WHEN event_id % 10 = 3 THEN 'missing:risk_data_type'
                WHEN event_id % 10 = 7 THEN 'enum:{_ENUM_MSG_SQL}'
                ELSE '' END                                     AS error_summary
    FROM events
    WHERE event_id < 1000
    """,
    doc="Draft2020-12 JSON-Schema validation via iterator pandas UDF "
        "(SURVEY §2.10 #5; validator compiled once per task): required "
        "fields, codelist enums, nested constraints; error summaries follow "
        "13…ipynb:1129 _summarize_errors bucket format. Engine runs the real "
        "jsonschema library; the oracle derives expected verdicts from the "
        "deterministic fault-injection rule.",
)
def jsonschema_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    eid = F.col("event_id").cast("string")
    rp = (F.col("event_id") % 97 + 1).cast("int")
    risk = (
        F.when(F.col("event_id") % 10 == 3, F.lit(None).cast("array<string>"))
        .when(F.col("event_id") % 10 == 7, F.array(F.lit("hazardous")))
        .otherwise(F.array(F.lit("hazard")))
    )
    record = F.struct(
        F.concat(F.lit("rdls_hzd-"), eid).alias("id"),
        risk.alias("risk_data_type"),
        F.array(
            F.struct(
                F.concat(F.lit("event_set_"), eid).alias("id"),
                F.array(
                    F.struct(
                        F.concat(F.lit("event_"), eid).alias("id"),
                        rp.alias("return_period"),
                        F.round(F.lit(1000000.0) / rp).cast("long").alias("rate_ppm"),
                    )
                ).alias("events"),
            )
        ).alias("event_sets"),
    )
    validated = ev.select(
        "event_id", jsonschema_validate(F.to_json(record)).alias("v")
    )
    return validated.select(
        "event_id",
        F.col("v.is_valid").alias("is_valid"),
        F.col("v.n_errors").alias("n_errors"),
        F.col("v.error_summary").alias("error_summary"),
    )
