"""Sequence packing for pretraining batches: concat-then-chunk.

The last mile of a training-data pipeline: documents (in a deterministic
order) are conceptually concatenated into one token stream and sliced into
fixed-length training sequences; each doc needs to know which sequence its
tokens start in, at what offset, and how many sequences it straddles.
That is a GLOBAL prefix sum over per-doc token counts — the one primitive
a naive Spark translation gets wrong at scale, because the obvious
``Window.orderBy(id)`` with no partition key collapses the whole corpus
into a single task.

Scale-correct shape (classic distributed prefix sum):

1. range-partition the (id, tokens) projection on the id so each partition
   holds a contiguous id run;
2. within-partition running sum via a window PARTITIONED by the partition
   id (the shuffle moves P whole groups, never one);
3. per-partition totals — P rows, bounded by cluster parallelism, not by
   data — get their own tiny cumulative sum and are broadcast-joined back
   as starting offsets.

The result is independent of P (asserted in tests): any contiguous split
yields the same global cumsum.  Everything is integer arithmetic, so the
DuckDB oracle (a plain single-node window cumsum) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    seq_len: int,
    n_parts: int | None = None,
) -> DataFrame:
    """Assign each doc its slice of the packed token stream.

    Docs are ordered by ``id_col`` (total, deterministic); zero-token docs
    are dropped (they occupy no stream positions).  Output per doc:
    ``n_tokens``, ``stream_start`` (global token offset), ``seq_start`` /
    ``seq_end`` (ids of the fixed-length sequences the doc touches),
    ``seq_offset`` (position within its first sequence), ``n_seqs``
    (sequences straddled).
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(token_count_col).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .repartitionByRange(n_parts, F.col("_id"))
        .withColumn("_pid", F.spark_partition_id())
    )
    # ROWS frame, not the default RANGE frame: duplicate ids must get
    # DISTINCT running sums (RANGE peers would share one cumulative value,
    # overlapping their stream slices and diverging from the oracle's
    # explicit ROWS window).
    within = (
        Window.partitionBy("_pid")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Eager localCheckpoint pins the sampled range boundaries and the
    # nondeterministic spark_partition_id to ONE materialization: `local`
    # feeds both the per-partition totals and the final join, and without
    # pinning, a plan that re-executes the range exchange per branch
    # (exchange reuse off, or a cache race) could assign boundary rows
    # different _pid values in each branch — silently corrupting every
    # offset after the first divergent boundary.  (On a cluster, swap for
    # ``checkpoint`` against durable storage, as in connected_components.)
    local = base.withColumn(
        "_local_end", F.sum("n_tokens").over(within)
    ).localCheckpoint(eager=True)
    # P rows total — bounded by the chosen parallelism, not by the data —
    # so the single-partition window over the partials is safe by design.
    totals = local.groupBy("_pid").agg(F.sum("n_tokens").alias("_ptot"))
    offsets = totals.withColumn(
        "_poffset",
        F.coalesce(
            F.sum("_ptot").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_poffset")
    packed = local.join(F.broadcast(offsets), "_pid").select(
        "_id",
        "n_tokens",
        (F.col("_poffset") + F.col("_local_end") - F.col("n_tokens")).alias(
            "stream_start"
        ),
    )
    L = F.lit(int(seq_len)).cast("long")
    return packed.select(
        "_id",
        "n_tokens",
        "stream_start",
        F.expr(f"CAST(div(stream_start, {int(seq_len)}) AS BIGINT)").alias(
            "seq_start"
        ),
        F.expr(
            f"CAST(div(stream_start + n_tokens - 1, {int(seq_len)}) AS BIGINT)"
        ).alias("seq_end"),
        (F.col("stream_start") % L).alias("seq_offset"),
        (
            F.expr(f"CAST(div(stream_start + n_tokens - 1, {int(seq_len)}) AS BIGINT)")
            - F.expr(f"CAST(div(stream_start, {int(seq_len)}) AS BIGINT)")
            + F.lit(1)
        ).alias("n_seqs"),
    )
