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
    WITH occ AS (
      SELECT doc_id, (doc_id * 7 + 13 * j) % {sp.REF_UNIVERSE} AS rid
      FROM documents, unnest(range(0, doc_id % 3)) AS t(j)
    )
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
