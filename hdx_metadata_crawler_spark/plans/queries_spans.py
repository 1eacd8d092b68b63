"""Interleaved-span analytics queries — the input_hint table shape
``(doc_id, spans: array<struct<kind,text,media_ref,offset:int>>)`` consumed
as a first-class analytics surface (reassembly, media dedup, structure
stats).  The span table is synthesized deterministically from ``documents``
(operators/spans.py rule); the DuckDB oracle recomputes every output in
closed form from the same base table + rule while the Spark side runs the
real array/struct pipeline (the queries_multimodal synthesis-oracle
pattern).  The crawl frontier emits exactly this shape
(streaming/frontier.py build_spans), so these are the queries a user runs
over the crawled corpus itself."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import spans as sp
from ..operators.ranking import politeness_slot_columns, politeness_slot_sql
from ..sources.tables import load_table
from .registry import register

# closed forms for m = doc_id % 3 (the synthesis rule):
_M = "(doc_id % 3)"
# concatenated 'resource r<j>' labels per m
_LABELS = "(CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'resource r0' ELSE 'resource r0resource r1' END)"
_LABEL_LEN = "(CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 11 ELSE 22 END)"
_REF_SQL = (
    "'https://cdn' || CAST(rid % 2 AS VARCHAR) "
    "|| '.example.org/media/m' || CAST(rid AS VARCHAR) || '.png'"
)
# host closed form + the Spark-side extraction regex over the ref URL —
# pinned together: both must track operators/spans.media_ref_for's URL shape
_HOST_SQL = "'cdn' || CAST(rid % 2 AS VARCHAR) || '.example.org'"
_HOST_RE = r"^https?://([^/]+)/"
# SQL twin of operators/spans.media_ref_for's (doc_id, j) -> rid explode —
# single source for every oracle that derives the media-ref universe.
_OCC_CTE = f"""occ AS (
      SELECT doc_id, (doc_id * 7 + 13 * j) % {sp.REF_UNIVERSE} AS rid
      FROM documents, unnest(range(0, doc_id % 3)) AS t(j)
    )"""


@register(
    "span_reassembly",
    f"""
    SELECT doc_id,
           CAST(2 + 2 * {_M} AS BIGINT) AS n_spans,
           CAST({_M} AS BIGINT)         AS n_media,
           substr(text, 1, {sp.TITLE_LEN}) || {_LABELS}
             || substr(text, {sp.TITLE_LEN + 1}) AS full_text,
           text AS title_notes
    FROM documents
    """,
    doc="Document reassembly FROM the interleaved span array (input_hint "
        "shape; the frontier's output format, streaming/frontier.py "
        "build_spans): text spans concatenated in offset order, span/media "
        "counts, and the title+notes round-trip — all computed by array "
        "algebra over the spans column (sort-by-offset, filter, transform, "
        "array_join; one map stage, zero shuffle). Oracle recomputes every "
        "column in closed form from the synthesis rule.",
)
def span_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = sp.reassemble(sp.synthesize_spans(d))
    return out.select(
        "doc_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_media").cast("long").alias("n_media"),
        "full_text",
        "title_notes",
    )


@register(
    "media_ref_dedup",
    f"""
    WITH {_OCC_CTE}
    SELECT {_REF_SQL} AS media_ref,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs,
           min(doc_id) AS first_doc
    FROM occ
    GROUP BY rid
    """,
    doc="Exact media-reference dedup over the interleaved table: explode "
        "media spans, group by ref — occurrence count, distinct-doc count, "
        "first-seen doc (the A7 first-seen policy applied to the media "
        "axis). One shuffle keyed on the ref; the shared-ref universe "
        "(rid = (doc_id*7+13j) mod 101) makes dedup semantics real. At "
        "100 TB this is the media-asset dedup pass a crawl pipeline runs "
        "before fetching binaries.",
)
def media_ref_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return sp.media_catalog(sp.synthesize_spans(d))


@register(
    "span_interleave_stats",
    f"""
    SELECT CAST({_M} AS BIGINT) AS n_media,
           count(*) AS n_docs,
           CAST(sum(2 + 2 * {_M}) AS BIGINT) AS total_spans,
           CAST(sum(CASE WHEN {_M} = 0 THEN 0 ELSE 2 * {_M} END) AS BIGINT)
             AS total_transitions,
           round(avg(len(text) + {_LABEL_LEN}), 2) AS avg_text_chars
    FROM documents
    GROUP BY {_M}
    """,
    doc="Interleave-structure statistics from the span array: per-doc "
        "kind-transition count (zip_with over adjacent kinds), span counts "
        "and text volume, aggregated by media arity. The structural "
        "profile of an interleaved text+media corpus — transitions and "
        "modality mix — computed without the payload ever leaving the "
        "array column.",
)
def span_interleave_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = sp.interleave_metrics(sp.synthesize_spans(d))
    return m.groupBy(F.col("n_media").cast("long").alias("n_media")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_spans").cast("long")).alias("total_spans"),
        F.sum(F.col("n_transitions").cast("long")).alias("total_transitions"),
        F.round(F.avg("text_chars"), 2).alias("avg_text_chars"),
    )


@register(
    "media_fetch_schedule",
    f"""
    WITH {_OCC_CTE},
    refs AS (
      SELECT {_REF_SQL} AS media_ref,
             {_HOST_SQL} AS host,
             min(doc_id) AS first_doc
      FROM occ GROUP BY rid
    )
    SELECT media_ref, host, first_doc,
           {politeness_slot_sql("first_doc, media_ref")}
    FROM refs
    """,
    doc="Second-tier fetch plan: the media-asset dedup catalog "
        "(media_ref_dedup's first-seen pass) scheduled into per-host "
        "politeness slots at 2 req/slot, earliest-seen assets first — the "
        "binary-fetch round a crawl pipeline runs AFTER the page crawl, "
        "over refs the interleaved span table surfaced. One ref-keyed "
        "dedup shuffle + one host-partitioned window; host comes from the "
        "ref URL itself (regexp extract, JVM-side).",
)
def media_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cat = sp.media_catalog(sp.synthesize_spans(d)).select(
        "media_ref",
        F.regexp_extract("media_ref", _HOST_RE, 1).alias("host"),
        "first_doc",
    )
    return politeness_slot_columns(
        cat, order_cols=["first_doc", "media_ref"]
    ).select("media_ref", "host", "first_doc", "fetch_seq", "time_slot")


# deterministic crawl-arrival time: 2024-01-01 UTC + (doc_id*37 % 5000) min
_TS_EPOCH = 1_704_067_200
# integer epoch seconds — ALL window/watermark arithmetic in the oracle is
# integer math on instants, never rendered timestamps, so the comparison is
# immune to the DuckDB session TimeZone (to_timestamp/date_trunc/strftime
# render TIMESTAMPTZ in host-local time and only match Spark on UTC hosts).
_EPOCH_SQL = f"({_TS_EPOCH} + (doc_id * 37 % 5000) * 60)"
_WSTART_SQL = f"(({_EPOCH_SQL} // 3600) * 3600)"


def _arrival_epoch() -> F.Column:
    """Python twin of _EPOCH_SQL — the single Spark-side source of the
    deterministic arrival rule; keep in lockstep with the SQL constant."""
    return (F.lit(_TS_EPOCH) + (F.col("doc_id") * 37 % 5000) * 60).cast("long")


@register(
    "stream_media_firstseen",
    f"""
    WITH {_OCC_CTE},
    ranked AS (
      SELECT rid, doc_id,
             CAST({_EPOCH_SQL} AS BIGINT) AS ts_epoch,
             row_number() OVER (PARTITION BY rid
                                ORDER BY {_EPOCH_SQL}, doc_id) AS rn
      FROM occ
    )
    SELECT {_REF_SQL} AS media_ref,
           {_HOST_SQL} AS host,
           doc_id AS first_doc,
           ts_epoch AS first_epoch
    FROM ranked WHERE rn = 1
    """,
    doc="Streaming second-tier fetch frontier: media_ref_dedup's first-seen "
        "pass as TRUE Structured-Streaming state (applyInPandasWithState "
        "keyed by media_ref) over the arriving interleaved span table — "
        "span synthesis + media explode map-only inside the stream, then "
        "one stateful shuffle on the ref; each ref is emitted exactly once "
        "with its earliest (arrival, doc) occurrence and suppressed forever "
        "after via the checkpointed per-ref state bit. Host is derived "
        "JVM-side from the emitted ref. Under availableNow on one file the "
        "source is one batch, so the oracle is first-occurrence-per-ref by "
        "(arrival epoch, doc_id) — pure integer math, timezone-free.",
)
def stream_media_firstseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import media_first_seen_stream
    from .queries_streaming import drain_stream_to_memory, stream_table

    docs = stream_table(spark, sf_dir, "documents")
    occurrences = sp.media_occurrences(sp.synthesize_spans(docs)).select(
        "media_ref",
        F.col("doc_id").cast("long").alias("doc_id"),
        _arrival_epoch().alias("ts_epoch"),
    )
    out = drain_stream_to_memory(
        spark, media_first_seen_stream(occurrences), "stream_media"
    )
    return out.select(
        "media_ref",
        F.regexp_extract("media_ref", _HOST_RE, 1).alias("host"),
        "first_doc",
        "first_epoch",
    )


@register(
    "stream_span_ingest",
    f"""
    SELECT CAST({_WSTART_SQL} AS BIGINT) AS window_start_epoch,
           count(*) AS n_docs,
           CAST(sum(doc_id % 3) AS BIGINT) AS media_spans,
           CAST(sum(2 + 2 * (doc_id % 3)) AS BIGINT) AS total_spans,
           CAST(sum(len(text) + {_LABEL_LEN}) AS BIGINT) AS text_chars
    FROM documents
    WHERE {_WSTART_SQL} + 3600
          <= (SELECT max({_EPOCH_SQL}) FROM documents) - 7200
    GROUP BY 1
    """,
    doc="Streaming ingest of the interleaved span table (input_hint shape): "
        "a Structured-Streaming read of arriving documents, span synthesis "
        "+ per-doc interleave metrics computed as array algebra INSIDE the "
        "stream (map-only, streaming-safe), then a watermarked hourly "
        "rollup of doc/span/media volume in APPEND mode — each window "
        "emitted once when the 2h watermark passes, state evicted "
        "(the scale-correct form; same contract as stream_hourly_rollup). "
        "Arrival time derives deterministically from doc_id, and windows "
        "are reported as epoch seconds: Spark's tumbling windows align on "
        "the raw instant, so window.start cast to long equals the oracle's "
        "pure-integer floor(epoch/3600)*3600 under ANY session timezone.",
)
def stream_span_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_streaming import drain_stream_to_memory, stream_table

    docs = stream_table(spark, sf_dir, "documents")
    metrics = sp.interleave_metrics(
        sp.synthesize_spans(docs)
    ).withColumn("ts", F.timestamp_seconds(_arrival_epoch()))
    rollup = (
        metrics.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_media").cast("long")).alias("media_spans"),
            F.sum(F.col("n_spans").cast("long")).alias("total_spans"),
            F.sum(F.col("text_chars").cast("long")).alias("text_chars"),
        )
    )
    return drain_stream_to_memory(spark, rollup, "stream_spans").select(
        F.col("window.start").cast("long").alias("window_start_epoch"),
        "n_docs",
        "media_spans",
        "total_spans",
        "text_chars",
    )
