"""Operators over the interleaved text+media span table — the engine's
input_hint shape ``(doc_id, spans: array<struct<kind:string, text:string,
media_ref:string, offset:int>>)``.

The crawl frontier WRITES this shape (streaming/frontier.py build_spans);
these operators are the analytics that CONSUME it: text reassembly, media
reference cataloguing/dedup, and interleave-structure statistics.  All pure
array/struct column algebra — a span row never leaves the JVM, and every
operator is a single map stage over the spans column (plus whatever
aggregation the caller adds), so at 100 TB they scale as scans.

For oracle-checked registry queries the span table is SYNTHESIZED
deterministically from the ``documents`` table (the established
queries_multimodal pattern: the DuckDB oracle recomputes the expected
output from the same base table + rule, while the Spark side exercises the
real array pipeline end-to-end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# media spans per doc: doc_id % 3 (0 exercises the no-media branch)
N_MEDIA_MOD = 3
# shared-ref universe: rid = (doc_id*7 + 13*j) % 101 — many docs share a
# ref, so media dedup has real first-seen semantics
REF_UNIVERSE = 101
TITLE_LEN = 40


def text_span(txt: Column) -> Column:
    """One input_hint text span (offset stamped later by stamp_offsets).
    THE span-struct constructor — the frontier's build_spans and the
    synthetic analytics corpus both assemble through here, so the crawled
    shape and the analytics shape cannot drift apart."""
    return F.struct(
        F.lit("text").alias("kind"), txt.alias("text"),
        F.lit("").alias("media_ref"),
    )


def media_span(ref: Column) -> Column:
    """One input_hint media span (see text_span)."""
    return F.struct(
        F.lit("media").alias("kind"), F.lit("").alias("text"),
        ref.alias("media_ref"),
    )


def stamp_offsets(raw: Column) -> Column:
    """Stamp each span's array position as the int offset field — the final
    step of input_hint span assembly."""
    return F.transform(
        raw,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )




def media_ref_for(doc_id: Column, j: Column) -> Column:
    """Deterministic shared media reference (doc_id, j) -> URL."""
    rid = (doc_id * 7 + j * 13) % REF_UNIVERSE
    return F.concat(
        F.lit("https://cdn"), (rid % 2).cast("string"),
        F.lit(".example.org/media/m"), rid.cast("string"), F.lit(".png"),
    )


def synthesize_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> (doc_id, spans) in the exact
    input_hint schema.  Layout per doc (m = doc_id % 3 media spans):
    [text:title(40 chars)] + m x ([text:'resource r<j>'] + [media:ref]) +
    [text:notes(rest)] — genuinely interleaved, mirroring the frontier's
    title/resources/notes structure (streaming/frontier.py build_spans)."""
    did = F.col("doc_id")
    m = did % N_MEDIA_MOD
    title = F.substring("text", 1, TITLE_LEN)
    notes = F.expr(f"substring(text, {TITLE_LEN + 1})")
    pairs = F.when(
        m > 0,
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), m - 1),
                lambda j: F.array(
                    text_span(F.concat(F.lit("resource r"), j.cast("string"))),
                    media_span(media_ref_for(did, j)),
                ),
            )
        ),
    ).otherwise(F.array().cast(
        "array<struct<kind:string,text:string,media_ref:string>>"
    ))
    raw = F.concat(F.array(text_span(title)), pairs, F.array(text_span(notes)))
    return documents.select("doc_id", stamp_offsets(raw).alias("spans"))


def _sorted_spans(spans: Column) -> Column:
    """Offset-order guarantee: array_sort on the int offset (struct compare
    would also work but this states the contract)."""
    return F.array_sort(
        spans, lambda a, b: (a["offset"] - b["offset"]).cast("int")
    )


def reassemble(df: DataFrame) -> DataFrame:
    """Per-doc reassembly from the span array alone: full text (text spans
    concatenated in offset order), span/media counts, and the title+notes
    round-trip flag (the input_hint per-row invariant, checked from the
    ARRAY side)."""
    spans = _sorted_spans(F.col("spans"))
    texts = F.transform(
        F.filter(spans, lambda s: s["kind"] == "text"), lambda s: s["text"]
    )
    return df.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.size(F.filter(spans, lambda s: s["kind"] == "media")).alias("n_media"),
        F.array_join(texts, "").alias("full_text"),
        # <2 text spans: element_at(1)/(−1) would alias the same span (or go
        # NULL on zero) — define title_notes as '' / the lone span instead.
        F.when(F.size(texts) >= 2,
               F.concat(F.element_at(texts, 1), F.element_at(texts, -1)))
        .when(F.size(texts) == 1, F.element_at(texts, 1))
        .otherwise(F.lit(""))
        .alias("title_notes"),
    )


def media_occurrences(df: DataFrame) -> DataFrame:
    """Explode media spans -> one row per (doc_id, media_ref) occurrence.
    Map-only (streaming-safe); the single place that knows which span kind
    carries a media reference."""
    return df.select(
        "doc_id", F.explode(F.filter("spans", lambda s: s["kind"] == "media")).alias("s")
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))


def media_catalog(df: DataFrame) -> DataFrame:
    """Explode media spans -> per-ref occurrence stats with first-seen doc
    (exact media dedup over the interleaved table: one shuffle on the ref).
    """
    exploded = media_occurrences(df)
    return exploded.groupBy("media_ref").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )


def interleave_metrics(df: DataFrame) -> DataFrame:
    """Per-doc interleave structure from the array: kind-transition count
    (adjacent spans of different kind), span counts, text volume."""
    spans = _sorted_spans(F.col("spans"))
    kinds = F.transform(spans, lambda s: s["kind"])
    n = F.size(kinds)
    # greatest(n-1, 0): slice() rejects negative lengths at runtime, and an
    # empty spans array (legal in the input_hint schema) would pass -1.
    adj = F.greatest(n - 1, F.lit(0))
    trans = F.size(
        F.filter(
            F.zip_with(
                F.slice(kinds, 1, adj),
                F.slice(kinds, 2, adj),
                lambda a, b: a != b,
            ),
            lambda x: x,
        )
    )
    text_chars = F.aggregate(
        F.filter(spans, lambda s: s["kind"] == "text"),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.length(s["text"]),
    )
    return df.select(
        "doc_id",
        F.size(F.filter(spans, lambda s: s["kind"] == "media")).alias("n_media"),
        n.alias("n_spans"),
        trans.alias("n_transitions"),
        text_chars.alias("text_chars"),
    )
