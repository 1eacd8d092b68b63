"""Round-4 breadth queries: incremental dedup, shard manifest, BPE merge
candidates, TF-IDF top terms.  Oracle parity is the driver's job
(verify_local green at sf0.01 + sf0.001); these pin operator SEMANTICS on
crafted inputs, the query invariants on the test corpus, and the
scale-critical PLAN SHAPES (shuffle counts) that a refactor could silently
regress."""

from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.operators import dedup
from hdx_metadata_crawler_spark.sources.bucketing import join_exchanges
from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------------
# plan shapes (shuffle-count regression net)
# ---------------------------------------------------------------------------

def test_plan_shapes_shuffle_counts(spark):
    """Pin the number of shuffle Exchanges in the final adaptive plan for
    the shapes the docstrings promise: bpe_merge_candidates is one
    map-side-combined count + top-k (2 shuffles incl. the global sort),
    duplicate_passages and doc_repetition_score are the two-shuffle
    explode->combine->re-aggregate shape (+1 for the passage top-k sort),
    and the decontamination dictionary must ride a BROADCAST join (no
    shuffle on the corpus-side index beyond the per-doc aggregate)."""
    from hdx_metadata_crawler_spark.plans.queries_curation import (
        bpe_merge_candidates,
    )
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        benchmark_decontamination,
        duplicate_passages,
    )

    # bpe: pair count agg + top-k sort; passages: (passage,doc) agg +
    # per-passage agg + top-k sort; decontam: per-doc agg + the tiny
    # eval-side distinct (the corpus side joins the dictionary via
    # BroadcastExchange, which must NOT count as a shuffle)
    assert join_exchanges(bpe_merge_candidates(spark, SF_SMALL)) <= 2
    # round 5: digest-first added the survivor text join-back (one tiny
    # groupBy over rows surviving the broadcast digest filter — bounded by
    # the top-k, not the corpus).  Corpus-scale shuffles remain the two
    # digest-keyed count aggregates; the rest are top-k-sized.
    assert join_exchanges(duplicate_passages(spark, SF_SMALL)) <= 4
    assert join_exchanges(benchmark_decontamination(spark, SF_SMALL)) <= 2


# ---------------------------------------------------------------------------
# partition-count invariance (the bug class that bit sequence_packing:
# results must not depend on the shuffle width)
# ---------------------------------------------------------------------------

def test_new_queries_partition_invariant(spark):
    from hdx_metadata_crawler_spark.plans import registry

    names = ["incremental_dedup", "source_length_percentiles", "duplicate_passages"]
    qs = registry.queries()

    def snap(name):
        return sorted(map(str, qs[name](spark, SF_SMALL).collect()))

    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    wide = {n: snap(n) for n in names}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for n in names:
            assert snap(n) == wide[n], f"{n} varies with shuffle width"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)


# ---------------------------------------------------------------------------
# incremental_dedup (operator semantics on crafted corpus)
# ---------------------------------------------------------------------------

def test_incremental_dedup_tiers(spark):
    existing = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different text about spark shuffles"),
            (3, None),  # NULL text == empty text
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            # near dup of 1: different text (extra repeated token) but the
            # SAME distinct-token set -> hamming 0, digest mismatch
            (11, "the the quick brown fox jumps over the lazy dog"),
            (12, "entirely novel content with unique words qqq zzz"),
            (13, ""),  # exact dup of the NULL-text doc (NULL == empty rule)
        ],
        ["doc_id", "text"],
    )
    out = {
        r["_id"]: r
        for r in dedup.incremental_dedup(
            new, existing, "doc_id", "text", max_distance=3
        ).collect()
    }
    assert set(out) == {10, 11, 12, 13}
    assert out[10]["verdict"] == "exact_dup" and out[10]["is_exact"]
    # the exact twin is also hamming-0 near, so the near tier sees it too
    assert out[10]["min_hamming"] == 0
    assert out[11]["verdict"] == "near_dup" and not out[11]["is_exact"]
    assert out[11]["min_hamming"] == 0 and out[11]["n_near"] >= 1
    assert out[12]["verdict"] == "novel"
    assert out[12]["n_near"] == 0 and out[12]["min_hamming"] == -1
    assert out[13]["verdict"] == "exact_dup"


def test_incremental_dedup_query_verdict_consistency(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        INC_SPLIT_MOD,
        incremental_dedup,
        inc_split_col,
    )

    rows = incremental_dedup(spark, SF_SMALL).collect()
    n_new = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .filter(inc_split_col())
        .count()
    )
    # every new-batch doc classified exactly once
    assert len(rows) == n_new > 0
    for r in rows:
        if r["verdict"] == "exact_dup":
            assert r["is_exact"]
        elif r["verdict"] == "near_dup":
            assert not r["is_exact"] and r["n_near"] > 0
        else:
            assert r["verdict"] == "novel"
            assert r["n_near"] == 0 and r["min_hamming"] == -1
        if r["n_near"] > 0:
            assert 0 <= r["min_hamming"] <= 3
    # the 1-in-MOD split actually produced both sides
    total = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert 0 < n_new < total
    assert INC_SPLIT_MOD > 1


def test_incremental_dedup_empty_existing_side(spark):
    """First-ever snapshot: everything is novel, nothing crashes on the
    empty build sides."""
    new = spark.createDataFrame([(1, "some words here"), (2, None)], ["doc_id", "text"])
    old = spark.createDataFrame([], "doc_id long, text string")
    out = {r["_id"]: r for r in dedup.incremental_dedup(new, old, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["verdict"] == "novel"
        assert not r["is_exact"] and r["n_near"] == 0 and r["min_hamming"] == -1


def test_incremental_dedup_all_identical_mega_cluster(spark):
    """Hot-bucket stress: every doc identical — the chunk join degenerates
    to one bucket and the per-doc aggregate must still be correct."""
    text = "same text in every single document of this corpus"
    new = spark.createDataFrame([(i, text) for i in range(5)], ["doc_id", "text"])
    old = spark.createDataFrame([(100 + i, text) for i in range(20)], ["doc_id", "text"])
    out = dedup.incremental_dedup(new, old, "doc_id", "text").collect()
    assert len(out) == 5
    for r in out:
        assert r["verdict"] == "exact_dup"
        assert r["n_near"] == 20 and r["min_hamming"] == 0


# ---------------------------------------------------------------------------
# shard_manifest
# ---------------------------------------------------------------------------

def test_shard_manifest_partitions_corpus(spark):
    from hdx_metadata_crawler_spark.plans.queries_curation import (
        N_SHARDS,
        shard_manifest,
    )

    rows = shard_manifest(spark, SF_SMALL).collect()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(0 <= r["shard_id"] < N_SHARDS for r in rows)
    assert len({r["shard_id"] for r in rows}) == len(rows)
    # byte totals partition the corpus too (coalesced NULL text == '')
    total_bytes = docs.select(
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("b")
    ).collect()[0]["b"]
    assert sum(r["n_bytes"] for r in rows) == total_bytes
    assert all(r["min_doc_id"] <= r["max_doc_id"] for r in rows)


# ---------------------------------------------------------------------------
# bpe_merge_candidates
# ---------------------------------------------------------------------------

def test_bpe_merge_candidates_total_order_and_shape(spark):
    from hdx_metadata_crawler_spark.plans.queries_curation import (
        TOP_MERGES,
        bpe_merge_candidates,
    )

    rows = bpe_merge_candidates(spark, SF_SMALL).collect()
    assert len(rows) == TOP_MERGES
    assert all(len(r["pair"]) == 2 for r in rows)
    # total order: count desc, pair asc on ties
    for a, b in zip(rows, rows[1:]):
        assert a["cnt"] > b["cnt"] or (
            a["cnt"] == b["cnt"] and a["pair"] < b["pair"]
        )


def test_bpe_pairs_from_known_word(spark, monkeypatch):
    import hdx_metadata_crawler_spark.plans.queries_curation as qc

    df = spark.createDataFrame([(1, "abab")], ["doc_id", "text"])
    monkeypatch.setattr(qc, "load_table", lambda *a, **k: df)
    rows = {
        r["pair"]: r["cnt"] for r in qc.bpe_merge_candidates(spark, SF_SMALL).collect()
    }
    # 'abab' -> adjacent pairs ab, ba, ab
    assert rows == {"ab": 2, "ba": 1}


# ---------------------------------------------------------------------------
# neardup_consensus
# ---------------------------------------------------------------------------

def test_consensus_refines_simhash_components(spark):
    """The consensus closure is over a SUPERSET of the simhash pairs, so
    (a) every simhash-component pair of docs stays together under
    consensus, and (b) consensus clusters can only be equal or coarser
    (more members, never fewer canonical splits of an existing group)."""
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        neardup_components,
        neardup_consensus,
    )

    sim = {r["doc_id"]: r["component_id"] for r in neardup_components(spark, SF_SMALL).collect()}
    con = {r["doc_id"]: r["component_id"] for r in neardup_consensus(spark, SF_SMALL).collect()}
    # every doc the simhash tier clusters is present in the consensus
    assert set(sim) <= set(con)
    # same simhash component -> same consensus component (refinement)
    by_sim = {}
    for d, c in sim.items():
        by_sim.setdefault(c, []).append(d)
    for members in by_sim.values():
        assert len({con[d] for d in members}) == 1


# ---------------------------------------------------------------------------
# duplicate_passages
# ---------------------------------------------------------------------------

def test_duplicate_passages_finds_shared_paragraph(spark, monkeypatch):
    import hdx_metadata_crawler_spark.plans.queries_dedup as qd

    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [
            (1, f"intro words here then {shared} and a tail"),
            (2, f"{shared} completely different continuation text follows on"),
            (3, "short doc"),  # < 8 tokens -> no grams at all
            (4, "unrelated content with no overlap whatsoever in this document"),
        ],
        ["doc_id", "text"],
    )
    monkeypatch.setattr(qd, "load_table", lambda *a, **k: df)
    rows = {r["passage"]: r for r in qd.duplicate_passages(spark, "unused").collect()}
    assert shared in rows
    assert rows[shared]["n_docs"] == 2 and rows[shared]["n_occurrences"] == 2
    # every reported passage is shared by >= 2 docs and has 8 words
    for r in rows.values():
        assert r["n_docs"] >= 2
        assert len(r["passage"].split(" ")) == qd.PASSAGE_N


# ---------------------------------------------------------------------------
# source_length_percentiles
# ---------------------------------------------------------------------------

def test_source_length_percentiles_exact_on_crafted(spark, monkeypatch):
    import hdx_metadata_crawler_spark.plans.queries_text as qt

    # source A: token counts 1..10 -> p50 = value at rank 5 = 5 tokens,
    # p90 = value at rank 9 = 9 tokens; source B: single doc
    rows = [(i, "t " * i if i else None, "A") for i in range(1, 11)]
    rows.append((100, "x y z", "B"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    monkeypatch.setattr(qt, "load_table", lambda *a, **k: df)
    out = {
        r["source"]: r
        for r in qt.source_length_percentiles(spark, "unused").collect()
    }
    a = out["A"]
    assert (a["n_docs"], a["p50_tokens"], a["p90_tokens"]) == (10, 5, 9)
    assert (a["min_tokens"], a["max_tokens"]) == (1, 10)
    assert a["mean_tokens"] == round(sum(range(1, 11)) / 10, 4)
    b = out["B"]
    assert (b["n_docs"], b["p50_tokens"], b["p90_tokens"]) == (1, 3, 3)


def test_source_length_percentiles_rank_bounds(spark):
    from hdx_metadata_crawler_spark.plans.queries_text import (
        source_length_percentiles,
    )

    for r in source_length_percentiles(spark, SF_SMALL).collect():
        assert r["p50_tokens"] is not None and r["p90_tokens"] is not None
        assert (
            r["min_tokens"] <= r["p50_tokens"] <= r["p90_tokens"] <= r["max_tokens"]
        )
        assert r["min_tokens"] <= r["mean_tokens"] <= r["max_tokens"]


# ---------------------------------------------------------------------------
# embedding_norm_stats
# ---------------------------------------------------------------------------

def test_embedding_norm_stats_crafted(spark, monkeypatch):
    import math

    import hdx_metadata_crawler_spark.plans.queries_similarity as qs

    df = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),
            (2, [0.0, 0.0]),
            (3, [float("nan"), 1.0, float("inf")]),
        ],
        "vec_id long, embedding array<float>",
    )
    monkeypatch.setattr(qs, "load_table", lambda *a, **k: df)
    out = {r["vec_id"]: r for r in qs.embedding_norm_stats(spark, "unused").collect()}
    assert (out[1]["n_dims"], out[1]["l2_norm"], out[1]["is_zero"]) == (2, 5.0, False)
    assert out[1]["n_nonfinite"] == 0
    assert out[2]["is_zero"] and out[2]["l2_norm"] == 0.0
    assert out[3]["n_nonfinite"] == 2 and not out[3]["is_zero"]
    assert math.isnan(out[3]["l2_norm"]) or math.isinf(out[3]["l2_norm"])


# ---------------------------------------------------------------------------
# quality_keep_rates
# ---------------------------------------------------------------------------

def test_quality_keep_rates_consistent_with_gopher_filter(spark):
    from hdx_metadata_crawler_spark.plans.queries_curation import (
        gopher_quality_filter,
        quality_keep_rates,
    )

    rates = {r["source"]: r for r in quality_keep_rates(spark, SF_SMALL).collect()}
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    per_doc = gopher_quality_filter(spark, SF_SMALL).select("doc_id", "keep")
    joined = docs.select(
        F.coalesce(F.col("source"), F.lit("")).alias("source"), "doc_id"
    ).join(per_doc, "doc_id")
    expect = {
        r["source"]: (r["n"], r["k"])
        for r in joined.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum(F.col("keep").cast("long")).alias("k"))
        .collect()
    }
    assert set(rates) == set(expect)
    for s, (n, k) in expect.items():
        assert (rates[s]["n_docs"], rates[s]["n_keep"]) == (n, k)
        assert rates[s]["keep_bp"] == (k * 10000) // n


# ---------------------------------------------------------------------------
# lang_confusion_matrix
# ---------------------------------------------------------------------------

def test_lang_confusion_matrix_partitions_and_fracs(spark):
    from hdx_metadata_crawler_spark.plans.queries_text import (
        lang_confusion_matrix,
    )

    rows = lang_confusion_matrix(spark, SF_SMALL).collect()
    total = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == total
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
        assert r["lang_guess"] in ("en", "other")
    for lang, rs in per_lang.items():
        assert abs(sum(r["frac_of_lang"] for r in rs) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# incremental_dedup vs brute force (property)
# ---------------------------------------------------------------------------

def test_incremental_dedup_matches_bruteforce_random(spark):
    """Random corpus: the chunked near tier must agree with brute-force
    hamming <= k over the same fingerprints (pigeonhole recall is a
    guarantee, not probabilistic), and the exact tier with digest
    equality."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        n = rng.randint(3, 12)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant exact + near dups
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1] + " " + docs[1][1].split()[0]))
    new_ids = {i for i, _ in docs if i % 3 == 0}
    new = spark.createDataFrame([d for d in docs if d[0] in new_ids], ["doc_id", "text"])
    old = spark.createDataFrame([d for d in docs if d[0] not in new_ids], ["doc_id", "text"])

    got = {
        r["_id"]: r
        for r in dedup.incremental_dedup(new, old, "doc_id", "text", max_distance=3).collect()
    }

    fps = {
        r["_id"]: r["simhash"]
        for r in dedup.simhash64(
            spark.createDataFrame(docs, ["doc_id", "text"]), "doc_id", "text"
        ).collect()
    }

    def ham(a, b):
        # mask to 64 bits: xxhash64 fingerprints are SIGNED longs and
        # Python's infinite-precision XOR of negatives would miscount
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    texts = dict(docs)
    for i in sorted(new_ids):
        exact = any(texts[j] == texts[i] for j, _ in docs if j not in new_ids)
        near = {j for j, _ in docs if j not in new_ids and ham(fps[i], fps[j]) <= 3}
        assert got[i]["is_exact"] == exact, i
        assert got[i]["n_near"] == len(near), i
        if near:
            assert got[i]["min_hamming"] == min(ham(fps[i], fps[j]) for j in near), i
        else:
            assert got[i]["min_hamming"] == -1, i


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------

def test_tfidf_top_terms_rank_invariants(spark):
    from hdx_metadata_crawler_spark.plans.queries_text import (
        TFIDF_TOP_K,
        tfidf_top_terms,
    )

    rows = tfidf_top_terms(spark, SF_SMALL).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in per_doc.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TFIDF_TOP_K
        # scores non-increasing down the ranks; ties broken by term asc
        for a, b in zip(rs, rs[1:]):
            assert a["score"] > b["score"] or (
                a["score"] == b["score"] and a["term"] < b["term"]
            )
        for r in rs:
            assert r["tf"] >= 1 and r["df"] >= 1


def test_tfidf_scores_clear_rounding_boundaries(spark):
    """The documented ulp risk (queries_text.tfidf_top_terms docstring): a
    Spark/DuckDB parity flip needs a RAW score within ~1 ulp of a .00005
    rounding boundary.  Pin that on BOTH graded fixtures every raw score
    keeps a >= 1e-9 margin from its nearest boundary — six orders of
    magnitude above the worst-case library disagreement — so the accepted
    risk cannot fire on driver data."""
    import math

    from tests.conftest import SF_MEDIUM, SF_SMALL

    for sf in (SF_SMALL, SF_MEDIUM):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        n_total = docs.count()
        toks = docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda t: t != "",
                )
            ).alias("token"),
        )
        tf = toks.groupBy("doc_id", "token").count().withColumnRenamed("count", "tf")
        df_counts = tf.groupBy("token").count().withColumnRenamed("count", "df")
        pairs = [
            (r["tf"], r["df"])
            for r in tf.join(df_counts, "token").select("tf", "df").distinct().collect()
        ]
        worst = 1.0
        for tf_v, df_v in pairs:
            raw = tf_v * math.log((n_total + 1.0) / (df_v + 1.0))
            frac = abs(raw) * 10000.0
            dist = abs(frac - math.floor(frac) - 0.5)
            worst = min(worst, dist)
        # dist is in rounded-score half-units: 0.5 == mid-cell, 0 == exactly
        # on a .00005 boundary.  1e-5 half-units == 1e-9 in score units.
        assert worst > 1e-5, f"score within {worst * 1e-4} of a boundary at {sf}"
