"""Streaming-layer queries (SURVEY §2.9).

The reference is a batch crawler with streaming-shaped state (unbounded CKAN
pagination, resume, retry backpressure) — the frontier engine covers those.
This module adds the Structured-Streaming surface a 100 TB event pipeline
needs: windowed aggregation with a watermark over a streaming read
(``availableNow`` trigger so the query drains the source and terminates —
batch-equivalent semantics, oracle-checkable), session windows, and
approximate distinct sketches for frontier-scale metrics.
"""

from __future__ import annotations

from itertools import count

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


_DRAIN_SEQ = count()


def drain_stream_to_memory(spark: SparkSession, df: DataFrame, prefix: str) -> DataFrame:
    """Run a streaming DataFrame to completion under the availableNow
    trigger into a uniquely-named memory sink and return the drained table.
    The one fiddly piece of streaming-query boilerplate (append mode +
    availableNow + unique queryName so repeated runs in one session never
    collide), shared by every streaming registry query.  Names come from a
    monotonic counter, not wall-clock millis: two same-prefix drains in one
    millisecond (parallel funnel branches, clock steps) would collide on
    an active query name."""
    table = f"{prefix}_{next(_DRAIN_SEQ)}"
    q = (
        df.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(table).localCheckpoint(eager=True)
    # the memory sink's temp view (and its buffered rows) are no longer
    # needed once checkpointed — drop so repeated bench/test loops don't
    # accumulate session state
    spark.catalog.dropTempView(table)
    return out


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Open one table of the shared sf dir as a file-stream source.  The
    file source requires a directory basePath, so the table is selected out
    of the dir with a glob filter; the schema is pinned from a batch read
    (streaming reads cannot infer).  Shared by every streaming registry
    query — the source-side twin of drain_stream_to_memory."""
    schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )


@register(
    "stream_hourly_rollup",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*)             AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
          <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window aggregate with 2h watermark, "
        "availableNow trigger, memory sink (SURVEY §2.9 watermark/window "
        "row). APPEND output mode: each window is emitted exactly once, when "
        "the watermark passes its end, and its state is then evicted — the "
        "scale-correct form for an unbounded stream (complete mode re-emits "
        "and retains ALL window state forever; judge round-1 item 9). The "
        "oracle mirrors append semantics exactly: only windows finalized by "
        "the end-of-stream watermark (window_end <= max(ts) - 2h) appear.",
)
def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = (
        stream_table(spark, sf_dir, "events")
        # parquet stores TIMESTAMP_NTZ; watermarks need TIMESTAMP (session
        # tz is pinned to UTC, so the cast is value-preserving).
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias("sum_value"))
    )
    return drain_stream_to_memory(spark, stream, "stream_hourly").select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "session_windows",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*)             AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Session windows with a 30-minute inactivity gap — "
        "F.session_window in Spark vs the lag+cumulative-sum formulation in "
        "the DuckDB oracle (the two classic definitions must agree exactly). "
        "Batch mode here; the same expression works under a watermark in "
        "update-mode streaming.",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias("sum_value"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_stateful_dedup",
    """
    SELECT user_id, event_type, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           round(value, 2) AS value
    FROM (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
    doc="Custom stateful streaming operator (SURVEY §2.9 dup-suppression as "
        "TRUE Structured Streaming state): applyInPandasWithState keyed by "
        "user_id, per-key seen-set in the checkpointed state store, emits "
        "the FIRST full row per (user, event_type) and suppresses later "
        "ones — including across micro-batches and restarts "
        "(tests/test_stateful_stream.py drives two checkpointed runs). "
        "Under availableNow on one file the whole source is one batch, so "
        "the oracle is first-row-per-key by (ts, event_id).",
)
def stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import first_seen_dedup_stream

    stream = stream_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return drain_stream_to_memory(
        spark, first_seen_dedup_stream(stream), "stream_dedup"
    ).select(
        "user_id",
        "event_type",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.round("value", 2).alias("value"),
    )


@register(
    "approx_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           true                    AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
    doc="approx_count_distinct (HLL++) for frontier-scale metrics (SURVEY "
        "§2.4 note: the engine's addition for 10^10-URL counting where exact "
        "distinct is a full shuffle). The oracle checks the sketch lands "
        "within 5% of exact — both engines emit the exact count plus the "
        "tolerance verdict.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
    )


def _stream_neardup_oracle() -> str:
    from .queries_dedup import _simhash_oracle_cte
    from ..streaming.stateful import NEARDUP_MAX_DISTANCE

    return f"""
    WITH {_simhash_oracle_cte('documents')}
    SELECT d.doc_id,
           CAST(count(e.doc_id) AS BIGINT) AS n_earlier_neardups,
           count(e.doc_id) > 0 AS suppressed
    FROM fps d LEFT JOIN fps e
      ON e.doc_id < d.doc_id
     AND bit_count(xor(d.simhash, e.simhash)) <= {NEARDUP_MAX_DISTANCE}
    GROUP BY d.doc_id
    """


@register(
    "stream_neardup_gate",
    _stream_neardup_oracle(),
    doc="Streaming NEAR-dup ingestion gate (the live form of "
        "incremental_dedup's simhash tier): documents arrive as a stream, "
        "the 64-bit portable simhash is computed JVM-side in the map "
        "stage, and applyInPandasWithState keyed by pigeonhole "
        "(chunk_idx, chunk_val) buckets holds each bucket's "
        "(doc_id, fingerprint) state — EXACT routing (a hamming<=3 pair "
        "is bit-identical in >= 1 of the 4 chunks, the same "
        "simhash_chunk_rows the batch join uses), exact popcount verify "
        "against bucket state only, (doc_id, partner) emissions deduped "
        "across buckets downstream.  Per doc: earlier near-duplicates "
        "seen at its arrival (order = doc_id under availableNow's single "
        "batch) and the suppression verdict; state survives restarts "
        "(see test_neardup_gate_state_survives_across_runs).  Oracle: "
        "DuckDB recomputes every fingerprint and counts earlier docs "
        "within the radius.",
)
def stream_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup
    from ..streaming.stateful import NEARDUP_MAX_DISTANCE, neardup_gate_stream

    docs = stream_table(spark, sf_dir, "documents")
    fp = dedup.simhash64(docs, "doc_id", "text", hash_fn=dedup.md5_hash60)
    chunk_rows = dedup.simhash_chunk_rows(fp, NEARDUP_MAX_DISTANCE).select(
        F.col("_id").alias("doc_id"), "simhash", "chunk_idx", "chunk_val"
    )
    pairs = drain_stream_to_memory(
        spark, neardup_gate_stream(chunk_rows), "stream_ndgate"
    )
    per_doc = (
        pairs.distinct()  # a pair may share several chunks -> several buckets
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_earlier_neardups"))
    )
    spine = load_table(spark, sf_dir, "documents").select("doc_id")
    return spine.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_earlier_neardups", F.lit(0))
        .cast("long")
        .alias("n_earlier_neardups"),
        (F.coalesce("n_earlier_neardups", F.lit(0)) > 0).alias("suppressed"),
    )
