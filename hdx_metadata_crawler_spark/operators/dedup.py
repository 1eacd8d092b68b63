"""Deduplication operators for large-scale corpus curation.

Four tiers, cheapest-first — the standard training-data pipeline ladder
(engine-new surface; the reference only does exact content-hash dup detection,
``07…ipynb:458 sha256_file`` + first-seen map, SURVEY A8):

1. exact        — hash-groupBy on normalized content; one shuffle on the hash.
2. ngram        — n-gram shingle Jaccard via shingle-inverted-index self-join;
                  exact but quadratic-in-collision-group; used to verify (3).
3. minhash_lsh  — MinHash signatures + banded LSH: candidate pairs only where
                  a band bucket collides.  At 100 TB this is THE scalable path:
                  shuffle is on (band_id, band_hash) buckets, never all-pairs.
4. simhash      — 64-bit SimHash fingerprints; near-dups differ in few bits.

All hashing is Spark's builtin ``xxhash64`` (JVM, codegen'd, seedable via an
extra literal column) — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from ..functions.text import tokenize

import itertools
import threading

# serializes connected_components' global-temp-view handoff (see its body);
# the counter keeps concurrent loops' view names collision-free
_CC_CONF_LOCK = threading.Lock()
_CC_VIEW_SEQ = itertools.count()


def shingles(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (space-joined), distinct.

    NULL text is pinned to '' BEFORE tokenizing: unguarded, Spark's
    three-valued logic routes NULL through the otherwise-branch to [''],
    while the DuckDB oracles' array_to_string yields [NULL] — one NULL-text
    row would silently diverge every sketch oracle.  With the coalesce both
    engines treat a NULL document exactly like an empty one."""
    # Single source of truth for gram construction: ``ngram_grams`` (below)
    # builds the multiplicity-preserving array; set semantics are just a
    # distinct over it, so tokenization / short-doc fallback can never
    # diverge between repetition scores and the sketch tiers.
    return F.array_distinct(ngram_grams(text_col, n))


def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str, digest_text: bool = False
) -> DataFrame:
    """Keep the first (min id) row per key — SURVEY A7/A8 first-seen policy.

    One hash-shuffle on the key.  ``digest_text=True`` is the wide-key
    (content-keyed) path: the grouping key is collapsed to ONE 60-bit
    portable md5 digest over the NULL-pinned key columns BEFORE the
    exchange, so the shuffle carries 8 bytes per row instead of the
    document text (a ~1000x shuffle-volume cut for content dedup at
    100 TB).  Output key column is then ``key_digest``; callers join
    ``keep_id`` back to the corpus when they need the text.  DuckDB twin
    of the digest: ``MD5_HASH60_SQL`` over the same expression — for one
    key column that is the column itself; for several, each column is
    digested FIRST and the \\x1f join runs over the decimal digest
    strings, so a value containing \\x1f can never shift bytes across a
    column boundary (('x\\x1fy','z') vs ('x','y\\x1fz') collide under a
    naive raw-text join) — digest-equal on both engines even in the
    (2^-60) collision case, so oracles stay hash-identical.
    """
    if digest_text:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols
        ]
        if len(parts) == 1:
            key = md5_hash60(parts[0])
        else:
            key = md5_hash60(
                F.concat_ws(
                    "\x1f", *[md5_hash60(p).cast("string") for p in parts]
                )
            )
        return (
            df.select(key.alias("key_digest"), F.col(id_col))
            .groupBy("key_digest")
            .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        )
    return df.groupBy(*key_cols).agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))


def shingle_index(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Inverted index (id, shingle) — the join key for Jaccard / the input to
    MinHash.  Distinct per doc."""
    return df.select(
        F.col(id_col).alias("_id"), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs (id_a < id_b, jaccard).

    Plan: inverted index self-join on the SHINGLE DIGEST → per-pair
    intersection count → join per-doc shingle counts →
    |A∩B| / (|A|+|B|-|A∩B|).  Digest-first (round 5): the shingle is
    projected to a 60-bit portable md5 digest in the map stage, so the
    self-join exchange and the hot-shingle frequency aggregate shuffle
    8-byte keys instead of n-gram text (the DuckDB oracle joins on the
    identical digest, so even a 2^-60 collision stays hash-identical).
    Hot shingles remain the skew risk at scale — AQE skew-split handles
    moderate cases, and ``max_doc_freq`` is the production lever: shingles
    appearing in more than that many documents are dropped from the JOIN
    side before the self-join (a shingle in k docs contributes k^2/2 join
    rows, so one corpus-wide stop-shingle otherwise dominates the whole
    shuffle).  Per-doc sizes keep counting ALL shingles, so capping only
    LOWERS intersection counts: estimated jaccard becomes a lower bound and
    near-identical pairs (which share rare shingles too) still surface —
    the cap trades tail recall for a bounded join, exactly like MinHash
    banding.  ``None`` (the oracle default) is exact.
    """
    idx = shingle_index(df, id_col, text_col, n).select(
        "_id", md5_hash60(F.col("shingle")).alias("sh_h")
    )
    # eager checkpoint: the digest index feeds FOUR branches (self-join a,
    # self-join b, per-doc sizes, optionally the hot-shingle filter) — each
    # re-ran the corpus text scan + explode + md5 (4 full text passes in
    # .explain).  The materialized index is (id, 8-byte digest) rows, an
    # order of magnitude smaller than the text it replaces re-reading.
    idx = idx.localCheckpoint(eager=True)
    sizes = idx.groupBy("_id").agg(F.count("*").alias("n_sh"))
    if max_doc_freq is not None:
        hot = (
            idx.groupBy("sh_h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("sh_h")
        )
        idx = idx.join(F.broadcast(hot), "sh_h", "left_anti")
    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, (F.col("a.sh_h") == F.col("b.sh_h")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 32,
    hash_fn=None, base_hash_fn=None,
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(shingle, i) — computed SHUFFLE-FREE as array_min(transform(...))
    per hash over a materialized shingle column.

    Round 1 exploded the shingle inverted index and aggregated num_hashes
    mins in one groupBy — correct, but the explode pushes ~|shingles|x the
    row count through an Exchange before the combine.  The higher-order form
    keeps everything in one map stage (same wall locally; at cluster scale
    the 100x-amplified shuffle is gone).  The projection barrier between
    shingle construction and the 32 array_mins is load-bearing: inlining the
    shingles expression makes Catalyst re-evaluate tokenize+slice per hash
    (measured 15x slower) — Spark does not common-subexpression-eliminate
    across higher-order lambda arguments.
    """
    if base_hash_fn is not None:
        # Portable form: ONE base digest per shingle (projection barrier),
        # then num_hashes affine universal-hash mins over the base array.
        base = df.select(
            F.col(id_col).alias("_id"),
            F.transform(
                shingles(F.col(text_col), n), lambda s: base_hash_fn(s)
            ).alias("_bh"),
        )

        def _min_hash(i: int):
            a, b = affine_consts(i)
            return F.array_min(
                F.transform("_bh", lambda h: (h * a + b) % MINHASH_PRIME)
            )

        return base.select(
            "_id",
            F.array(*[_min_hash(i) for i in range(num_hashes)]).alias("signature"),
        )

    if hash_fn is None:
        # seeded xxhash64 (production default); per-(shingle, seed) hash fn
        def hash_fn(s, i):
            return F.xxhash64(s, F.lit(i))

    base = df.select(
        F.col(id_col).alias("_id"), shingles(F.col(text_col), n).alias("_sh")
    )
    def _min_hash(i: int):
        # NOTE: the lambda must take exactly ONE parameter — F.transform
        # sniffs the arity, and a two-arg lambda is given (element, index),
        # which would silently shadow the seed.  Closure capture of i is
        # safe: transform() invokes the lambda eagerly at plan build time.
        return F.array_min(F.transform("_sh", lambda s: hash_fn(s, i)))

    return base.select(
        "_id",
        F.array(*[_min_hash(i) for i in range(num_hashes)]).alias("signature"),
    )


MINHASH_PRIME = 2_147_483_647  # 2^31 - 1

def md5_base28(col: Column) -> Column:
    """28-bit portable base hash (first 7 hex chars of md5) — ONE digest per
    shingle; per-seed minhash values derive from it via affine universal
    hashing (affine_consts), so the portable signature path does a single
    md5 per shingle instead of num_hashes of them (measured 2.15x faster on
    the bench corpus, still byte-reproducible in DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


# DuckDB twins of md5_base28 / md5_hash60 (below) — .format(x=<expr>) into
# oracle SQL.  Single source of truth: every oracle that mirrors an
# md5-keyed sketch must use these, so a change to the hash definition can
# never leave a Spark column and its SQL twin silently divergent.
MD5_BASE28_SQL = "('0x' || substr(md5({x}), 1, 7))::BIGINT"
MD5_HASH60_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

# DuckDB cosine over two double-list columns — THE oracle cosine
# (zero-denominator => 0, round 4 dp, matching operators/similarity.cosine).
# .format(a=..., b=...) into every cosine oracle; one definition so a change
# to the convention can never leave one oracle silently divergent.
COSINE_SQL = (
    "round(coalesce(list_dot_product({a}, {b})"
    " / nullif(sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})), 0), 0), 4)"
)


def affine_consts(i: int) -> tuple[int, int]:
    """Deterministic multiplier/offset for seed i: (a*h + b) mod (2^31-1).
    a < 2^31 and h < 2^28 keep the product under 2^59 — no 64-bit overflow
    in either engine, so Spark and DuckDB compute identical values."""
    a = (2_654_435_761 * (i + 1)) % MINHASH_PRIME | 1
    b = (40_503 * (i + 7) + 12_345) % MINHASH_PRIME
    return a, b


def minhash_band_buckets(
    sig: DataFrame, bands: int = 8, rows_per_band: int = 4,
    bucket_hash_fn=None,
) -> DataFrame:
    """The banded (_id, band, bucket) frame: each signature hashed per band
    over its rows_per_band slots — the SINGLE construction
    ``minhash_lsh_candidates`` joins on and ``lsh_bucket_stats`` audits
    (one definition, so the audit can never drift from the join).  Arity
    must be validated by the caller (see minhash_lsh_candidates)."""
    if bucket_hash_fn is None:
        bucket_hash_fn = F.xxhash64
    return sig.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    bucket_hash_fn(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("signature", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    sig: DataFrame, bands: int = 8, rows_per_band: int = 4,
    num_hashes: int | None = None, bucket_hash_fn=None,
) -> DataFrame:
    """Banded LSH: hash each band of the signature; docs sharing any band
    bucket are candidate pairs.  Shuffle key = (band, band_hash) — constant
    fan-out per doc, never all-pairs.  Returns distinct (id_a < id_b).

    Pass ``num_hashes`` (the signature length) so the banding arity is
    validated statically; without it, one cheap probe row is read.  A
    mismatch must not pass silently: out-of-range element_at slots either
    throw under ANSI mode or (ANSI off) hash the identical '' for every
    doc, quietly turning the bucket join all-pairs.
    """
    if num_hashes is None:
        first = sig.select(F.size("signature")).first()
        num_hashes = first[0] if first is not None else bands * rows_per_band
    if bands * rows_per_band > num_hashes:
        # ValueError, not assert: python -O strips asserts, and this is the
        # guard the docstring promises — silent out-of-range banding turns
        # the bucket join all-pairs.
        raise ValueError(
            f"bands({bands}) x rows_per_band({rows_per_band}) exceeds the "
            f"signature length ({num_hashes})"
        )
    banded = minhash_band_buckets(sig, bands, rows_per_band, bucket_hash_fn)
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )


def minhash_jaccard_estimate(sig: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of equal signature
    slots (zip_with, JVM-side)."""
    sa = sig.select(F.col("_id").alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sig.select(F.col("_id").alias("id_b"), F.col("signature").alias("sig_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.round(
                F.aggregate(
                    F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.size("sig_a"),
                4,
            ),
        )
        .select("id_a", "id_b", "est_jaccard")
    )


def md5_hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash from the first 15 hex chars of
    md5 — JVM-side (md5 + conv are builtins) and PORTABLE: DuckDB computes
    the identical value via ``('0x' || substr(md5(x),1,15))::BIGINT``, which
    makes md5-keyed sketches fully oracle-checkable.  xxhash64 stays the
    production default (one hash pass vs md5's four rounds); the sketch
    algebra is hash-agnostic, so correctness transfers."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash64(
    df: DataFrame, id_col: str, text_col: str, hash_fn=None
) -> DataFrame:
    """64-bit SimHash per doc: for each bit position, sum ±1 over token
    hashes; bit = 1 iff the sum is positive.

    ``hash_fn`` (Column -> Column) defaults to xxhash64; pass ``md5_hash60``
    for the oracle-checkable variant (top 4 bits then always 0 — the bit
    algebra is unchanged).

    SHUFFLE-FREE form: the token-hash array is materialized once (projection
    barrier — Spark does not CSE across higher-order lambdas, see
    minhash_signatures), then 64 ``aggregate()`` bit-sums run in the same
    map stage.  Round 1 exploded tokens and hash-aggregated 64 sums — one
    token-amplified Exchange that this form removes at identical local wall
    time.  NOTE the aggregate merge lambda must take exactly (acc, elem) —
    like transform, aggregate sniffs lambda arity, so loop variables are
    bound via the enclosing function, not default args.
    """
    if hash_fn is None:
        hash_fn = F.xxhash64
    base = df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.array_distinct(tokenize(F.col(text_col))), lambda t: hash_fn(t)
        ).alias("_th"),
    )

    def bit_sum(i: int):
        return F.aggregate(
            "_th",
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim + F.when(
            bit_sum(i) > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return base.select("_id", sim.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """Connected components over near-dup PAIRS → (id, component_id) where
    component_id = min node id in the component (deterministic canonical
    representative, independent of iteration schedule).

    The missing last step of the dedup ladder: the sketch tiers emit PAIRS
    (a~b, b~c), but a keep/drop decision needs CLUSTERS — transitively, a, b
    and c are one duplicate group with ONE canonical survivor.  (Engine-new
    surface like the rest of the ladder; the reference's exact-hash
    first-seen map, 07…ipynb:458, is the degenerate single-edge case.)

    Plan (iterative min-label propagation + pointer jumping):
      labels(id) := id
      repeat:  (1) neighbor step — comp(id) = min(comp(id), min over
                   neighbors comp(nbr)): one join edges⋈labels keyed on the
                   node id + one min-aggregate;
               (2) pointer-jump step — comp(id) = comp(comp(id)) (path
                   halving): one labels⋈labels self-join.
      until no label changed.

    The neighbor step alone needs O(diameter) rounds; the jump step halves
    label-chain depth each round, so convergence is O(log n) rounds of
    constant shuffle count — the standard large-scale CC recipe (the
    small-star/large-star family).  Per round the shuffles are keyed on
    node id over (node, label) pairs only — document payloads never enter
    the loop, and the symmetric edge list is deduped + persisted once.
    Each round's labels are eagerly ``localCheckpoint``-ed: a plain persist
    truncates EXECUTION but not the LOGICAL plan, and this loop references
    ``stepped`` three times per round (twice through the jump self-join),
    so without lineage truncation the analyzed plan grows ~4^rounds and
    OOMs the driver within a handful of iterations.  (On a fault-tolerant
    cluster run, point ``spark.sparkContext.setCheckpointDir`` at durable
    storage and swap ``localCheckpoint`` for ``checkpoint`` — same
    truncation, executor-loss-safe.)  Skew note: a mega-component's hub
    label is a hot reduce key; the min-aggregate is algebraic (map-side
    partial min), so the hot key arrives pre-combined per map partition.

    Cost shape (profiled at sf0.1: 271k pairs / 2.8k nodes / 5 rounds):
    the loop is task-overhead bound, not data bound, so the shuffle width
    is sized to the EDGE COUNT (``rows_per_partition``, capped at the
    session's ``spark.sql.shuffle.partitions``) instead of inheriting the
    session width — 32 partitions of ~100 rows each cost more in task
    launches than they save in parallelism.  The adjacency is repartitioned
    once on the probe key (``dst``) at that width so the per-round
    neighbor join reuses its layout without a fresh Exchange, and the
    convergence check reads a ``_prev`` column carried INTO the round's
    checkpoint (labels vs the previous round) rather than re-joining the
    two label snapshots — one tiny count on checkpointed data per round.
    The convergence test must compare against the PREVIOUS ROUND's labels,
    not the intra-round pre-jump labels: on a star a–hub, b–hub with
    id(hub) > id(a) > id(b), round 1's neighbor step relabels only the hub
    and the jump is the identity, so a post-jump-vs-pre-jump check would
    terminate with a and b still in singleton components
    (``tests/test_dedup.py::test_connected_components_star_premature``).

    Raises after ``max_iters`` non-converged rounds rather than returning
    partially-propagated labels (a silent wrong canonical id would merge or
    split dedup groups downstream).

    Tried and REJECTED by measurement: two neighbor+jump sub-steps per
    checkpointed round (halves the action count at the price of a deeper
    plan per job) — interleaved best-of-4 at sf0.1 read 2.72 s vs 2.26 s
    for the single-step form; the extra self-join depth inside each job
    costs more than the saved job launches.
    """
    spark = pairs.sparkSession
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    # one action against the (possibly expensive) upstream pair pipeline:
    # everything below reads the persisted symmetric edge list
    n_edges = sym.count()
    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_parts = max(1, min(base_parts, -(-n_edges // rows_per_partition)))
    # The loop's shuffle width comes from spark.sql.shuffle.partitions:
    # explicit per-frame repartition(n_parts, key) was tried and REJECTED
    # by measurement — EnsureRequirements re-exchanges joins at the session
    # width anyway (localCheckpoint does not preserve outputPartitioning,
    # and co-partitioned inputs of different widths get re-shuffled), so
    # the explicit form paid the conf-width exchanges PLUS its own
    # (+1.7-2.4 s/query at sf0.1).  Round 5: the narrowing is SESSION-
    # SCOPED — the whole loop plans on a child ``spark.newSession()``
    # (shared SparkContext / SharedState, so the cache manager still serves
    # the persisted edge list, but runtime SQL confs are per-session), and
    # the edge list crosses sessions through a global temp view.  Queries
    # issued concurrently on the caller's session therefore NEVER plan at
    # the narrowed width (pinned by
    # tests/test_dedup.py::test_cc_loop_does_not_narrow_caller_session);
    # the module lock stays as belt-and-braces for the shared global-temp
    # namespace.  The returned labels frame is re-bound to the caller's
    # session the same way (the view resolves eagerly, so dropping it
    # after binding is safe).
    cc_spark = spark.newSession()
    cc_spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    with _CC_CONF_LOCK:
        edge_view = f"cc_edges_{next(_CC_VIEW_SEQ)}"
        adj = None
        try:
            # view + adj setup INSIDE the try: if the repartition/persist
            # analysis raises, the finally still drops the global view and
            # unpersists the edge list (they would otherwise outlive the
            # call for the session's lifetime)
            sym.createOrReplaceGlobalTempView(edge_view)
            adj = (
                cc_spark.table(f"global_temp.{edge_view}")
                .repartition(n_parts, "dst")
                .persist()
            )
            labels = (
                adj.select(F.col("src").alias("id"))
                .distinct()
                .select("id", F.col("id").alias("comp"))
                .localCheckpoint(eager=True)
            )
            sym.unpersist()
            for _ in range(max_iters):
                nbr_min = (
                    adj.join(labels, adj["dst"] == labels["id"])
                    .groupBy("src")
                    .agg(F.min("comp").alias("nbr_comp"))
                )
                stepped = (
                    labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
                    .select(
                        "id",
                        F.least(
                            F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                        ).alias("comp"),
                        labels["comp"].alias("_prev"),
                    )
                    .persist()
                )
                # pointer jumping: comp := comp(comp) (labels is total over
                # the node set and comp values are node ids, so the lookup
                # always hits; left join keeps the row when comp == id)
                mapping = stepped.select(
                    F.col("id").alias("jid"), F.col("comp").alias("jcomp")
                )
                # eager localCheckpoint truncates the logical plan each round
                # (see docstring: the plan otherwise grows ~4^rounds); the
                # convergence count rides the SAME job as an observed metric
                # (CollectMetrics) instead of a second per-round action —
                # measured ~0.2-0.3 s/round of pure job-launch overhead at
                # sf0.1.  sum over an empty frame is NULL -> coalesce to 0
                # so the empty-pairs edge terminates on round 1.
                obs = Observation()
                new_labels = (
                    stepped.join(mapping, stepped["comp"] == mapping["jid"], "left")
                    .select(
                        "id",
                        F.coalesce("jcomp", F.col("comp")).alias("comp"),
                        "_prev",
                    )
                    .observe(
                        obs,
                        F.coalesce(
                            F.sum((F.col("comp") != F.col("_prev")).cast("long")),
                            F.lit(0),
                        ).alias("changed"),
                    )
                    .localCheckpoint(eager=True)
                )
                stepped.unpersist()
                changed = obs.get["changed"]
                labels = new_labels.select("id", "comp")
                if changed == 0:
                    out_view = f"cc_labels_{next(_CC_VIEW_SEQ)}"
                    labels.createOrReplaceGlobalTempView(out_view)
                    try:
                        # eager analysis binds the checkpointed labels into
                        # the caller's session before the view disappears
                        return spark.table(f"global_temp.{out_view}")
                    finally:
                        spark.catalog.dropGlobalTempView(out_view)
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} rounds — "
                "pointer jumping bounds rounds at O(log n), so this indicates a "
                "pathological input (or max_iters set too low for its size)"
            )
        finally:
            sym.unpersist()
            if adj is not None:
                adj.unpersist()
            spark.catalog.dropGlobalTempView(edge_view)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_chunk_rows(fp: DataFrame, max_distance: int = 3) -> DataFrame:
    """Pigeonhole chunk rows for a (_id, simhash) frame: the 64-bit
    fingerprint split into ``max_distance + 1`` equal chunks, one row per
    (chunk_idx, chunk_val) — ANY pair within the distance is bit-identical
    in at least one chunk, so (chunk_idx, chunk_val) bucket routing is
    EXACT (never drops a true near-dup).  Single source of truth shared by
    the batch pair join (``simhash_hamming_pairs``) and the streaming
    ingestion gate (``streaming/stateful.py neardup_gate_stream``) — the
    two must route identically or the stream's suppression set silently
    diverges from the batch tier."""
    n_chunks = max_distance + 1
    assert 64 % n_chunks == 0, "chunk count must divide 64"
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return fp.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select("_id", "simhash", "ch.chunk_idx", "ch.chunk_val")


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 3,
    hash_fn=None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_distance, WITHOUT
    all-pairs: pigeonhole chunk bucketing.

    Split the 64-bit fingerprint into ``max_distance + 1`` equal chunks; a
    pair within distance k differs in <= k bits, so at least one of the k+1
    chunks is bit-identical (pigeonhole) — candidates are exactly the pairs
    sharing a (chunk_idx, chunk_value) bucket, verified with the exact
    ``bit_count(xor)`` distance.  Shuffle key = (chunk_idx, chunk_value):
    constant fan-out k+1 per doc, never a cross join — this turns the round-1
    fingerprints-only tier into an actual dedup path at scale.  Recall is
    EXACT (the pigeonhole bound is a guarantee, not probabilistic) —
    asserted against brute force in tests/test_dedup.py.

    Chunking width stays 64/n_chunks even for a 60-bit hash (bits 60-63
    always 0): chunking only the 60 live bits was tried and REJECTED by
    measurement — simhash bits are correlated across similar docs, so the
    narrower chunks produced MORE hot-bucket collisions, not fewer (2.9M
    vs 2.4M candidates at width 15 vs 16 on sf0.1).

    No cache on the fingerprint sub-plan: both self-join sides shuffle the
    identical chunk plan, so Spark's ReusedExchange computes the expensive
    bit-sum stage once already — an eager cache ADDS a job and measured
    slower (5.8s vs 3.0s warm at sf0.1).  Most of a cold run is whole-stage
    codegen compiling the 64-term bit-sum expression, not data.
    """
    fp = simhash64(df, id_col, text_col, hash_fn=hash_fn)
    chunks = simhash_chunk_rows(fp, max_distance)

    x = chunks.alias("x")
    y = chunks.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.chunk_idx") == F.col("y.chunk_idx"))
            & (F.col("x.chunk_val") == F.col("y.chunk_val"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(
            F.col("x._id").alias("id_a"),
            F.col("y._id").alias("id_b"),
            hamming64(F.col("x.simhash"), F.col("y.simhash")).alias("hamming"),
        )
    )
    # verify BEFORE dedup: hamming is identical for every duplicate of a
    # pair, so filtering first is equivalent — and the distinct then
    # shuffles only the true near-dup pairs instead of every shared-chunk
    # candidate with both fingerprint payloads.
    return candidates.filter(
        F.col("hamming") <= max_distance
    ).dropDuplicates(["id_a", "id_b"])


def ngram_grams(text_col: Column, n: int = 3) -> Column:
    """Word n-gram array WITH multiplicity (no array_distinct) — same
    tokenization + short-doc fallback as ``shingles`` so repetition scores
    and set-semantics sketches stay mutually comparable."""
    toks = tokenize(F.coalesce(text_col, F.lit("")))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def repetition_scores(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Intra-document repetition via n-gram multiplicity — the quality
    filter a training-data pipeline runs BEFORE cross-doc dedup (boilerplate
    and generator loops repeat phrases inside one document; cross-doc
    sketches never see that).

    Per doc: total n-grams, distinct n-grams, repeated fraction in integer
    BASIS POINTS (``(total - distinct) * 10000 div total`` — exact integer
    arithmetic on both engines; a double ratio rounds exact halves in
    opposite directions, CLAUDE.md math rule), and the hottest gram's
    multiplicity.

    Plan: explode grams → project each gram to a 60-bit portable md5 digest
    IN THE SAME MAP STAGE → (doc, digest) count with map-side partial
    aggregation → per-doc re-aggregate.  Neither exchange carries text: the
    first shuffles (id, 8-byte digest) rows — at 100 TB that is the
    difference between shuffling ~10x the corpus text and shuffling a fixed
    16 bytes per gram.  The digest is the md5 twin (``md5_hash60``) so the
    DuckDB oracle groups by the identical value — multiplicity counts agree
    on both engines even in the negligible-collision case.
    """
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(ngram_grams(F.col(text_col), n)).alias("gram"),
    ).select("_id", md5_hash60(F.col("gram")).alias("gram_h"))
    per_gram = grams.groupBy("_id", "gram_h").agg(F.count("*").alias("c"))
    return per_gram.groupBy("_id").agg(
        F.sum("c").alias("n_grams"),
        F.count("*").alias("n_distinct_grams"),
        F.expr("CAST(div((sum(c) - count(*)) * 10000, sum(c)) AS BIGINT)").alias(
            "rep_bp"
        ),
        F.max("c").alias("top_gram_count"),
    )


def ngram_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its distinct
    word n-grams appear ANYWHERE in the eval set (the overlap test used to
    strip benchmark leakage from training corpora).

    Returns (id, n_shingles, n_overlap, contam_bp, contaminated) for EVERY
    corpus doc — zero-overlap docs included, so the output is the full
    keep/drop worksheet, not just the hits.

    Plan: the eval side is a benchmark suite — tiny and fixed relative to a
    100 TB corpus — so its distinct shingle dictionary is broadcast and the
    corpus-side inverted index LEFT-joins it with a hit marker; one
    downstream per-doc aggregate then yields BOTH the shingle count
    (``count(*)``) and the overlap count (``count(hit)``, nulls skipped) —
    a single corpus scan and a single map-side-combined shuffle, no second
    pass to fetch per-doc sizes.  Every doc emits >= 1 shingle (the
    short-doc fallback), so zero-overlap docs survive the aggregate and
    the output stays the complete worksheet.  The overlap fraction is
    emitted in exact integer basis points (see ``repetition_scores``).
    """
    # The short-doc/NULL-text fallback emits '' as the whole-doc shingle;
    # an empty EVAL doc must not put '' in the dictionary, or every empty
    # corpus doc would read as 100% contaminated.  (Non-empty short-doc
    # fallbacks stay: an eval doc's whole text matching a corpus doc IS
    # leakage.)
    eval_sh = (
        eval_set.select(
            F.explode(shingles(F.col(text_col), n)).alias("shingle")
        )
        .filter(F.col("shingle") != "")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    idx = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    return (
        idx.join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_overlap"),
            F.expr(
                "CAST(div(count(_hit) * 10000, count(*)) AS BIGINT)"
            ).alias("contam_bp"),
            (F.count("_hit") > 0).alias("contaminated"),
        )
    )


def incremental_dedup(
    new_batch: DataFrame,
    existing: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 3,
    hash_fn=None,
) -> DataFrame:
    """Cross-snapshot dedup: classify each NEW document against an EXISTING
    corpus as exact_dup / near_dup / novel — the shape a 100 TB pipeline
    actually runs at ingestion time.  Re-deduplicating the whole corpus per
    snapshot is O(corpus) every day; the incremental form touches
    O(new batch + matched buckets) only, because the existing side's digest
    set and simhash chunk index are precomputed once and stored (here they
    are derived inline from ``existing`` so the operator is
    self-contained; at scale, persist ``exact tier`` digests and the
    chunked fingerprints bucketed on their join keys and both joins run
    without shuffling the corpus — see sources/bucketing.py).

    Tiers (verdict precedence exact_dup > near_dup > novel):
      1. exact: md5 digest of the text semi-matched against existing
         digests (NULL text == empty text per the repo-wide rule);
      2. near: simhash64 pigeonhole chunks (see simhash_hamming_pairs) —
         new-side chunks join existing-side chunks on (chunk_idx,
         chunk_val), exact ``bit_count(xor)`` verify at <= max_distance;
         per new doc, the count of distinct existing near-matches and the
         minimum hamming distance (-1 when none, NULL-free output).

    Both joins key on digests/fingerprints — document text never enters a
    shuffle.  The chunk join's fan-out is the constant (max_distance + 1)
    per doc on each side, never all-pairs.
    """
    n_chunks = max_distance + 1
    assert 64 % n_chunks == 0, "chunk count must divide 64"
    width = 64 // n_chunks
    mask = (1 << width) - 1

    def digests(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_digest"),
        )

    def chunked(df: DataFrame) -> DataFrame:
        fp = simhash64(df, id_col, text_col, hash_fn=hash_fn)
        return fp.select(
            "_id",
            "simhash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("chunk_idx"),
                            F.shiftrightunsigned(F.col("simhash"), c * width)
                            .bitwiseAND(F.lit(mask))
                            .alias("chunk_val"),
                        )
                        for c in range(n_chunks)
                    ]
                )
            ).alias("ch"),
        ).select("_id", "simhash", "ch.chunk_idx", "ch.chunk_val")

    exact_hits = (
        digests(new_batch)
        .join(
            # no distinct: semi joins dedup their right side internally
            digests(existing).select("_digest"),
            "_digest",
            "left_semi",
        )
        .select("_id", F.lit(True).alias("_is_exact"))
    )
    nx = chunked(new_batch).alias("nx")
    ex = chunked(existing).alias("ex")
    near = (
        nx.join(
            ex,
            (F.col("nx.chunk_idx") == F.col("ex.chunk_idx"))
            & (F.col("nx.chunk_val") == F.col("ex.chunk_val")),
        )
        .select(
            F.col("nx._id").alias("_id"),
            F.col("ex._id").alias("_ex_id"),
            hamming64(F.col("nx.simhash"), F.col("ex.simhash")).alias("_hamming"),
        )
        .filter(F.col("_hamming") <= max_distance)
        .groupBy("_id")
        .agg(
            F.countDistinct("_ex_id").alias("n_near"),
            F.min("_hamming").cast("int").alias("min_hamming"),
        )
    )
    base = new_batch.select(F.col(id_col).alias("_id"))
    out = (
        base.join(exact_hits, "_id", "left")
        .join(near, "_id", "left")
        .select(
            "_id",
            F.coalesce("_is_exact", F.lit(False)).alias("is_exact"),
            F.coalesce("n_near", F.lit(0).cast("long")).alias("n_near"),
            F.coalesce("min_hamming", F.lit(-1).cast("int")).alias("min_hamming"),
        )
    )
    return out.withColumn(
        "verdict",
        F.when(F.col("is_exact"), F.lit("exact_dup"))
        .when(F.col("n_near") > 0, F.lit("near_dup"))
        .otherwise(F.lit("novel")),
    )


def snapshot_diff(
    prev: DataFrame,
    curr: DataFrame,
    id_col: str,
    text_col: str,
    hash_fn=None,
) -> DataFrame:
    """Digest-based diff of two corpus snapshots: which documents were
    ADDED, REMOVED, or CHANGED between a previous and a current crawl — the
    bookkeeping op a recurring 100 TB ingestion runs between snapshots (the
    batch complement of ``incremental_dedup``'s per-doc verdicts: diff says
    WHAT moved, incremental dedup says what the mover duplicates).

    Shape: each side computes a 64-bit content digest in its own map stage,
    then ONE full-outer equi-join on the id — the shuffle carries
    (id, digest) = 16 bytes per row, never document text, so the exchange
    volume is O(row count), not O(corpus bytes).  Status precedence:
    missing-left => 'added', missing-right => 'removed', digest mismatch =>
    'changed'; unchanged rows are dropped before they reach the caller (at
    snapshot cadence the diff is a small fraction of the corpus, so the
    output is the cheap side).  NULL text == empty text (repo-wide rule);
    absent-side digests surface as -1 sentinels, matching
    ``incremental_dedup``'s NULL-free output convention.

    ``hash_fn`` (Column -> Column) defaults to xxhash64 (production: one
    hash pass); pass ``md5_hash60`` for the portable oracle-checkable twin
    (MD5_HASH60_SQL) — the diff algebra is hash-agnostic.
    """
    if hash_fn is None:
        hash_fn = F.xxhash64

    def digests(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            hash_fn(F.coalesce(F.col(text_col), F.lit(""))).alias(out),
        )

    j = digests(prev, "_prev_digest").join(
        digests(curr, "_curr_digest"), "_id", "full_outer"
    )
    status = (
        F.when(F.col("_prev_digest").isNull(), F.lit("added"))
        .when(F.col("_curr_digest").isNull(), F.lit("removed"))
        .when(F.col("_prev_digest") != F.col("_curr_digest"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            "_id",
            "status",
            F.coalesce("_prev_digest", F.lit(-1).cast("long")).alias("prev_digest"),
            F.coalesce("_curr_digest", F.lit(-1).cast("long")).alias("curr_digest"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    w: int = 4,
    hash_fn=None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS sketch): hash every token ``n``-gram, slide a
    window of ``w`` consecutive gram hashes over the document, and in each
    window select the MINIMUM hash, rightmost position on ties.  The
    distinct selected (position, hash) pairs are the document's
    fingerprints.

    Unlike MinHash/SimHash (global, position-blind), winnowing is LOCAL:
    it guarantees that any substring match of at least ``w + n - 1``
    tokens between two documents shares at least one selected
    fingerprint, while keeping expected density ~2/(w+1) of positions.
    That makes it the standard sketch for partial-overlap detection
    (plagiarism / license-text / quotation reuse) where whole-document
    sketches dilute away a shared passage.

    Plan shape (100 TB): tokenize + gram + digest all happen in ONE map
    stage; the window-membership fan-out is a constant ``w`` explode over
    (id, pos, 8-byte digest) rows — no text in any exchange; window
    argmin is a map-side-combinable struct-min groupBy on (id,
    window_start).  Selection via lexicographic min over struct(hash,
    -pos) == "min hash, rightmost on ties" exactly (equal digests from
    repeated grams inside one window are REAL, not just md5 collisions).
    Short docs (< w grams, incl. the whole-doc fallback gram of
    ``ngram_grams``) get one window covering every gram — every doc
    yields >= 1 fingerprint, so downstream reports need no zero spine.

    Returns one row per fingerprint: (_id, n_grams, n_windows, p, h).
    ``hash_fn`` defaults to the portable ``md5_hash60`` twin
    (MD5_HASH60_SQL) so the whole chain is oracle-checkable; pass
    ``F.xxhash64`` composed over the gram for the one-pass production
    hash — the selection algebra is hash-agnostic.
    """
    if hash_fn is None:
        hash_fn = md5_hash60
    grams = (
        df.select(
            F.col(id_col).alias("_id"),
            ngram_grams(F.col(text_col), n).alias("_gs"),
        )
        .select(
            "_id",
            F.size("_gs").cast("long").alias("n_grams"),
            F.posexplode("_gs").alias("p", "gram"),
        )
        .select(
            "_id",
            "n_grams",
            F.col("p").cast("long").alias("p"),
            hash_fn(F.col("gram")).alias("h"),
        )
    )
    # window membership: gram at p belongs to windows starting at
    # s = p - o for o in [0, w); valid starts are [0, max(n_grams - w, 0)]
    wins = (
        grams.select(
            "_id",
            "n_grams",
            "p",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(w - 1))).alias("o"),
        )
        .withColumn("s", F.col("p") - F.col("o"))
        .filter(
            (F.col("s") >= 0)
            & (F.col("s") <= F.greatest(F.col("n_grams") - w, F.lit(0)))
        )
    )
    sel = wins.groupBy("_id", "s").agg(
        F.min(
            F.struct(F.col("h").alias("h"), (-F.col("p")).alias("negp"))
        ).alias("sel"),
        F.first("n_grams").alias("n_grams"),
    )
    return (
        sel.select(
            "_id",
            "n_grams",
            F.col("sel.h").alias("h"),
            (-F.col("sel.negp")).cast("long").alias("p"),
        )
        .distinct()
        .withColumn(
            "n_windows",
            F.greatest(F.col("n_grams") - F.lit(w - 1), F.lit(1)).cast("long"),
        )
    )
