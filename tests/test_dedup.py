"""Dedup operator semantics: MinHash-LSH recall vs the exact n-gram Jaccard
join, SimHash structure, shingle construction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.operators import dedup
from tests.conftest import SF_MEDIUM


def _docs(spark, sf=SF_MEDIUM):
    return spark.read.parquet(f"{sf}/documents.parquet")


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "only two")], ["id", "text"])
    out = df.select(dedup.shingles(F.col("text"), 3).alias("sh")).collect()[0]["sh"]
    assert out == ["only two"]


def test_shingles_count(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["id", "text"])
    out = df.select(dedup.shingles(F.col("text"), 3).alias("sh")).collect()[0]["sh"]
    assert sorted(out) == ["a b c", "b c d", "c d e"]


def test_minhash_estimates_close_to_exact(spark):
    """For pairs the LSH surfaces, the 32-hash MinHash estimate should be
    within 0.35 of exact Jaccard (coarse bound for 32 hashes)."""
    d = _docs(spark)
    exact = dedup.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.0)
    sig = dedup.minhash_signatures(d, "doc_id", "text", num_hashes=32).cache()
    cands = dedup.minhash_lsh_candidates(sig)
    est = dedup.minhash_jaccard_estimate(sig, cands)
    joined = est.join(exact, ["id_a", "id_b"], "left").select(
        "id_a", "id_b", "est_jaccard", F.coalesce("jaccard", F.lit(0.0)).alias("jaccard")
    )
    rows = joined.collect()
    assert rows, "LSH should surface at least one candidate pair on sf0.01"
    for r in rows:
        assert abs(r["est_jaccard"] - r["jaccard"]) <= 0.35, r


def test_lsh_recall_on_high_jaccard_pairs(spark):
    """Every pair with exact Jaccard >= 0.5 must be caught by 8x4 LSH
    (probability of missing at J=0.5: (1-0.5^4)^8 ≈ 0.60 per pair — so only
    assert on very-high-J pairs where miss probability is negligible)."""
    d = _docs(spark)
    exact = dedup.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.8)
    sig = dedup.minhash_signatures(d, "doc_id", "text", num_hashes=32).cache()
    cands = dedup.minhash_lsh_candidates(sig)
    missed = exact.join(cands, ["id_a", "id_b"], "left_anti").count()
    assert missed == 0


def test_simhash_deterministic_and_near_for_near_texts(spark):
    df = spark.createDataFrame(
        [
            (1, "spark query engine with columnar execution and hash join"),
            (2, "spark query engine with columnar execution and hash joins"),
            (3, "completely different words entirely unrelated content here now"),
        ],
        ["doc_id", "text"],
    )
    out = {r["_id"]: r["simhash"] for r in dedup.simhash64(df, "doc_id", "text").collect()}
    out2 = {r["_id"]: r["simhash"] for r in dedup.simhash64(df, "doc_id", "text").collect()}
    assert out == out2  # deterministic
    h12 = bin((out[1] ^ out[2]) & (2**64 - 1)).count("1")
    h13 = bin((out[1] ^ out[3]) & (2**64 - 1)).count("1")
    assert h12 < h13  # near texts closer than unrelated texts


def test_exact_dedup_first_seen(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (2, "x", 10), (3, "y", 20)], ["id", "k1", "k2"]
    )
    out = {
        (r["k1"], r["k2"]): (r["keep_id"], r["n_dups"])
        for r in dedup.exact_dedup(df, ["k1", "k2"], "id").collect()
    }
    assert out == {("x", 10): (1, 2), ("y", 20): (3, 1)}


def test_simhash_hamming_pairs_exact_recall(spark):
    """Pigeonhole chunk bucketing is a GUARANTEE, not probabilistic: the
    bucketed pair query must equal brute-force all-pairs hamming <= 3
    exactly — no pair lost (completeness) and none invented (the in-bucket
    exact verify)."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_MEDIUM

    base = spark.read.parquet(f"{SF_MEDIUM}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    # guarantee near-dup pairs: exact copies (distance 0) and one-token
    # perturbations (small distance) of the first docs
    copies = base.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    perturbed = base.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = base.unionByName(copies).unionByName(perturbed)

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_hamming_pairs(corpus, "doc_id", "text", 3).collect()
    }

    fps = {
        r["_id"]: r["simhash"]
        for r in dedup.simhash64(corpus, "doc_id", "text").collect()
    }
    import itertools

    expected = {}
    for a, b in itertools.combinations(sorted(fps), 2):
        h = bin((fps[a] ^ fps[b]) & (2**64 - 1)).count("1")
        if h <= 3:
            expected[(a, b)] = h
    assert len(expected) >= 30  # the copies alone give 30 distance-0 pairs
    assert got == expected


def test_stop_shingle_cap_bounds_join_keeps_neardups(spark):
    """max_doc_freq drops corpus-wide hot shingles from the join side: the
    candidate join shrinks by orders of magnitude while near-identical pairs
    (sharing rare shingles) still surface above threshold."""
    from pyspark.sql import functions as F

    hot = "the quick brown"  # one shingle shared by EVERY doc
    rows = [(i, f"{hot} unique{i} a b c d") for i in range(60)]
    # two near-identical docs sharing many rare shingles
    rows += [(100, f"{hot} same text body here now"),
             (101, f"{hot} same text body here soon")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.2, max_doc_freq=10
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert (100, 101) in pairs, "near-dup pair must survive the cap"
    # without the shared-by-all shingle, unrelated docs share nothing
    assert all(p == (100, 101) for p in pairs), pairs

    # uncapped control: the hot shingle alone creates ~60^2/2 candidate
    # intersections (all below threshold, but all PAID in the join)
    idx = dedup.shingle_index(df, "doc_id", "text", 3)
    a, b = idx.alias("a"), idx.alias("b")
    n_uncapped = a.join(
        b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id"))
    ).count()
    assert n_uncapped > 1800  # 62*61/2 from the hot shingle alone


def _uf_components(n_ids, pairs):
    """Pure-Python union-find reference: {id: min id in its component}."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def test_keep_list_partitions_corpus(spark):
    """keep list + dropped docs == the whole corpus, with EXACTLY one
    survivor per component (the min id)."""
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        dedup_keep_list,
        neardup_components,
    )

    sf = "/root/testdata/sf0.001"
    comps = neardup_components(spark, sf).collect()
    kept = {r["doc_id"] for r in dedup_keep_list(spark, sf).collect()}
    all_docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").select("doc_id").collect()
    }
    by_comp = {}
    for r in comps:
        by_comp.setdefault(r["component_id"], []).append(r)
    for cid, members in by_comp.items():
        survivors = [m["doc_id"] for m in members if m["doc_id"] in kept]
        assert survivors == [min(m["doc_id"] for m in members)] == [cid]
    clustered = {r["doc_id"] for r in comps}
    assert kept | (clustered - kept) == (all_docs - clustered) | clustered
    assert all_docs - clustered <= kept  # unclustered docs all survive


def test_connected_components_chain_transitivity(spark):
    """a~b, b~c, c~d is ONE group rooted at the min id, even though a and d
    never share a pair."""
    pairs = spark.createDataFrame(
        [(2, 4), (4, 1), (1, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_random_graph_matches_union_find(spark):
    """Property check: random sparse graphs agree with a pure-Python
    union-find, including star/chain/cycle shapes the generator produces."""
    import random

    rng = random.Random(20260818)
    for trial in range(3):
        n = 120
        ids = list(range(1000, 1000 + n))
        edges = [
            tuple(rng.sample(ids, 2)) for _ in range(rng.randint(40, 160))
        ]
        expect = _uf_components(
            sorted({x for e in edges for x in e}), edges
        )
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r["id"]: r["comp"]
            for r in dedup.connected_components(pairs).collect()
        }
        assert got == expect, f"trial {trial} diverged from union-find"


def test_connected_components_star_premature(spark):
    """Star with the HUB as the max id: round 1's neighbor step relabels only
    the hub (leaves keep their own smaller ids) and the pointer jump is the
    identity, so a convergence check that compares post-jump vs pre-jump
    labels WITHIN the round (instead of vs the previous round) terminates
    one round early with the leaves still in singleton components."""
    pairs = spark.createDataFrame([(10, 3), (10, 2)], ["id_a", "id_b"])
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {2: 2, 3: 2, 10: 2}


def test_connected_components_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(pairs).count() == 0


def test_repetition_scores_counts(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "a b c a b c a b c"),  # 7 grams, 3 distinct, top 3
            ("d2", "x y z w v u"),        # 4 grams, all distinct
            ("d3", None),                 # NULL text -> single '' gram
            ("d4", "q r"),                # short doc -> single joined gram
        ],
        ["doc_id", "text"],
    )
    got = {
        r["_id"]: (r["n_grams"], r["n_distinct_grams"], r["rep_bp"], r["top_gram_count"])
        for r in dedup.repetition_scores(docs, "doc_id", "text", n=3).collect()
    }
    assert got == {
        "d1": (7, 3, (7 - 3) * 10000 // 7, 3),
        "d2": (4, 4, 0, 1),
        "d3": (1, 1, 0, 1),
        "d4": (1, 1, 0, 1),
    }


def test_ngram_decontaminate_overlap_and_zero_rows(spark):
    corpus = spark.createDataFrame(
        [
            ("c1", "a b c d e f"),   # shares 'a b c' with eval
            ("c2", "u v w x y z"),   # no overlap — must still appear
            ("c3", None),            # NULL text -> '' shingle, no eval match
        ],
        ["doc_id", "text"],
    )
    eval_set = spark.createDataFrame(
        [("e1", "a b c q q q"), ("e2", "m n o"), ("e3", None)],
        ["doc_id", "text"],
    )  # e3's NULL text must NOT put '' in the dictionary (or c3 would
    # read as 100% contaminated)
    got = {
        r["_id"]: (r["n_shingles"], r["n_overlap"], r["contam_bp"], r["contaminated"])
        for r in dedup.ngram_decontaminate(
            corpus, eval_set, "doc_id", "text", n=3
        ).collect()
    }
    # c1 shingles: 'a b c','b c d','c d e','d e f'; eval has 'a b c'
    assert got == {
        "c1": (4, 1, 10000 // 4, True),
        "c2": (4, 0, 0, False),
        "c3": (1, 0, 0, False),
    }


def test_exact_dedup_digest_text_path(spark):
    """digest_text=True must group identically to the plain path (same
    keep_id / n_dups per group) while keying on the 8-byte portable digest."""
    df = spark.createDataFrame(
        [(1, "same body"), (2, "same body"), (3, "other body"), (4, None)],
        ["id", "text"],
    )
    out = {
        r["keep_id"]: r["n_dups"]
        for r in dedup.exact_dedup(df, ["text"], "id", digest_text=True).collect()
    }
    assert out == {1: 2, 3: 1, 4: 1}
    # NULL text pins to '' — a second NULL row joins doc 4's group
    df2 = df.union(spark.createDataFrame([(5, None)], "id long, text string"))
    out2 = {
        r["keep_id"]: r["n_dups"]
        for r in dedup.exact_dedup(df2, ["text"], "id", digest_text=True).collect()
    }
    assert out2 == {1: 2, 3: 1, 4: 2}


def test_exact_dedup_digest_multicol_boundary_safe(spark):
    """Multi-column digest keys must not merge distinct key tuples whose
    values contain the join separator: ('x\\x1fy','z') and ('x','y\\x1fz')
    concat to the same raw bytes, so each column is digested first and the
    join runs over decimal digest strings."""
    df = spark.createDataFrame(
        [(1, "x\x1fy", "z"), (2, "x", "y\x1fz"), (3, "x\x1fy", "z")],
        ["id", "a", "b"],
    )
    out = {
        r["keep_id"]: r["n_dups"]
        for r in dedup.exact_dedup(df, ["a", "b"], "id", digest_text=True).collect()
    }
    assert out == {1: 2, 2: 1}, "separator bytes leaked across column boundary"
    # and must still agree with the plain (non-digest) grouping
    plain = {
        r["keep_id"]: r["n_dups"]
        for r in dedup.exact_dedup(df, ["a", "b"], "id").collect()
    }
    assert out == plain


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def _agg_key_lines(final: str) -> list[str]:
    import re

    return re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", final)


def test_repetition_scores_digest_first_plan(spark):
    """Digest-first contract (round 5): neither count exchange may key on or
    carry gram TEXT — every hash-aggregate key set and every exchange
    partitioning is over (_id, gram_h) only.  At 100 TB the (doc, gram)
    shuffle is ~10x corpus text if grams shuffle raw; the 8-byte digest is
    the whole point."""
    import re

    docs = spark.createDataFrame(
        [("d1", "a b c a b c a b c"), ("d2", "x y z w v u")], ["doc_id", "text"]
    )
    final = _final_plan(dedup.repetition_scores(docs, "doc_id", "text", n=3))
    keys = _agg_key_lines(final)
    assert keys, f"expected hash aggregates in plan:\n{final}"
    for k in keys:
        assert not re.search(r"\bgram#\d+", k), f"text gram in agg keys: {k}"
    for ln in final.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert not re.search(r"\bgram#\d+", ln), f"text gram in exchange: {ln}"


def test_duplicate_passages_digest_first_plan(spark):
    """The two big count shuffles of duplicate_passages key on the passage
    DIGEST; passage text appears only in the broadcast-filtered survivor
    join-back (min(passage) over <= top-k digests), never as an exchange
    partitioning or a count-aggregate key."""
    import re

    from tests.conftest import SF_SMALL
    from hdx_metadata_crawler_spark.plans.queries_dedup import duplicate_passages

    final = _final_plan(duplicate_passages(spark, SF_SMALL))
    for ln in final.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert not re.search(r"\bpassage#\d+", ln), (
                f"passage text used as shuffle key: {ln}"
            )
    for k in _agg_key_lines(final):
        assert not re.search(r"\bpassage#\d+", k), (
            f"passage text used as aggregate key: {k}"
        )


def test_exact_text_dedup_digest_first_plan(spark):
    """exact_dedup's wide-key path: the single hash shuffle keys on the
    60-bit digest, not the document text."""
    import re

    from tests.conftest import SF_SMALL
    from hdx_metadata_crawler_spark.plans.queries_dedup import exact_text_dedup

    final = _final_plan(exact_text_dedup(spark, SF_SMALL))
    assert "key_digest" in final or "text_digest" in final
    for ln in final.splitlines():
        if "Exchange hashpartitioning" in ln or "HashAggregate(keys=" in ln:
            assert not re.search(r"\btext#\d+", ln), f"raw text in {ln}"


def test_cc_loop_does_not_narrow_caller_session(spark):
    """Round 5: connected_components narrows spark.sql.shuffle.partitions on
    a CHILD session only — the caller's session conf must read its original
    value at every instant while the loop is live (concurrent queries used
    to plan at the narrowed width)."""
    import threading

    base = spark.conf.get("spark.sql.shuffle.partitions")
    # long chain -> several propagation+jump rounds -> a real observation
    # window while the loop runs in the worker thread
    chain = [(i, i + 1) for i in range(400)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")

    result: dict = {}
    observed: list[str] = []
    done = threading.Event()

    def run():
        try:
            result["labels"] = {
                r["id"]: r["comp"]
                for r in dedup.connected_components(pairs).collect()
            }
        finally:
            done.set()

    t = threading.Thread(target=run)
    t.start()
    while not done.is_set():
        observed.append(spark.conf.get("spark.sql.shuffle.partitions"))
    t.join()
    assert observed, "poller must sample during the loop"
    assert set(observed) == {base}, (
        f"caller session width changed during CC loop: {set(observed)}"
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == base
    assert result["labels"] == {i: 0 for i in range(401)}, "chain is one component"


def test_cc_share_memo_is_session_and_sf_scoped(spark, tmp_path):
    """The CC-family memo must (a) serve repeat calls from the same session
    the SAME frame, (b) rebuild rather than serve an entry owned by another
    session, (c) key by sf_dir, and (d) key by the source freshness stamp
    so a rewritten corpus under the same path is never served stale frames.
    The memo key is (kind, sf_dir, _source_stamp(sf_dir))."""
    from hdx_metadata_crawler_spark.plans import queries_dedup as qd

    calls = []

    def build(tag):
        def _b():
            calls.append(tag)
            return spark.range(1)

        return _b

    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(dir_a)
    os.makedirs(dir_b)
    with open(os.path.join(dir_a, "documents.parquet"), "w") as f:
        f.write("v1")

    def _purge():
        with qd._CC_SHARE_LOCK:
            for k in [k for k in qd._CC_SHARE if k[1] in (dir_a, dir_b)]:
                del qd._CC_SHARE[k]

    _purge()
    try:
        a1 = qd._cc_share(spark, dir_a, "t", build("a"))
        a2 = qd._cc_share(spark, dir_a, "t", build("a"))
        assert a1 is a2 and calls == ["a"]
        # different sf_dir -> its own entry
        qd._cc_share(spark, dir_b, "t", build("b"))
        assert calls == ["a", "b"]
        # entry owned by a foreign session object -> rebuilt, not served
        key_a = ("t", dir_a, qd._source_stamp(dir_a))
        with qd._CC_SHARE_LOCK:
            assert key_a in qd._CC_SHARE
            qd._CC_SHARE[key_a] = (object(), a1)
        qd._cc_share(spark, dir_a, "t", build("a"))
        assert calls == ["a", "b", "a"]
        # rewritten source under the same path -> stamp changes, rebuilt,
        # and the stale same-path entry is evicted (one live entry per
        # (kind, sf_dir))
        with open(os.path.join(dir_a, "documents.parquet"), "w") as f:
            f.write("v2-longer")
        assert qd._source_stamp(dir_a) != key_a[2]
        qd._cc_share(spark, dir_a, "t", build("a"))
        assert calls == ["a", "b", "a", "a"]
        with qd._CC_SHARE_LOCK:
            live = [k for k in qd._CC_SHARE if k[:2] == ("t", dir_a)]
            assert len(live) == 1 and live[0][2] != key_a[2]
    finally:
        _purge()


def test_jaccard_join_digest_first_plan(spark):
    """The inverted-index self-join and the hot-shingle frequency aggregate
    must key on the 60-bit shingle digest, never shingle text."""
    import re

    docs = spark.createDataFrame(
        [("d1", "a b c d e f"), ("d2", "a b c d x y")], ["doc_id", "text"]
    )
    final = _final_plan(
        dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.0,
                                  max_doc_freq=50)
    )
    for ln in final.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert not re.search(r"\bshingle#\d+", ln), (
                f"shingle text as shuffle key: {ln}"
            )
    for k in _agg_key_lines(final):
        assert not re.search(r"\bshingle#\d+", k), (
            f"shingle text as aggregate key: {k}"
        )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS sketch)
# ---------------------------------------------------------------------------


def _py_winnow(text: str, n: int = 3, w: int = 4):
    """Pure-Python winnowing twin (same tokenize / gram fallback / md5-60
    digest / min-hash-rightmost rule) — the independent arbiter for the
    distributed operator."""
    import hashlib
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
    if len(toks) >= n:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    else:
        grams = [" ".join(toks)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    n_g = len(hs)
    fps = set()
    for s in range(0, max(n_g - w, 0) + 1):
        hi = min(s + w, n_g)
        m = min(hs[s:hi])
        p = max(i for i in range(s, hi) if hs[i] == m)
        fps.add((p, hs[p]))
    return n_g, fps


def test_winnow_matches_pure_python_on_corpus(spark):
    """Exact (pos, hash) fingerprint-set equality vs the pure-Python twin
    over real corpus docs — incl. repeated grams (tie-break is REAL here:
    the fixture text has immediate token repeats)."""
    rows = (
        _docs(spark, "/root/testdata/sf0.001")
        .select("doc_id", "text")
        .limit(60)
        .collect()
    )
    df = spark.createDataFrame([(r["doc_id"], r["text"]) for r in rows], ["doc_id", "text"])
    got = dedup.winnow_fingerprints(df, "doc_id", "text", n=3, w=4).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["_id"], set()).add((r["p"], r["h"]))
        assert r["n_windows"] == max(r["n_grams"] - 4, 0) + 1
    for r in rows:
        n_g, fps = _py_winnow(r["text"])
        assert by_doc.get(r["doc_id"], set()) == fps, r["doc_id"]


def test_winnow_theorem_shared_run_guarantees_shared_fingerprint(spark):
    """The winnowing GUARANTEE: two docs sharing a run of >= w + n - 1
    tokens share at least one fingerprint digest, however much unrelated
    text surrounds the run (20 randomized planted pairs, seeded)."""
    import random

    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(500)]
    rows = []
    for pair in range(20):
        run = " ".join(rng.choice(vocab) for _ in range(6))  # w + n - 1 = 6
        for side in (0, 1):
            pre = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            post = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            rows.append((pair * 2 + side, f"{pre} {run} {post}".strip()))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = dedup.winnow_fingerprints(df, "doc_id", "text", n=3, w=4)
    hs = fp.select("_id", "h").collect()
    by_doc: dict = {}
    for r in hs:
        by_doc.setdefault(r["_id"], set()).add(r["h"])
    for pair in range(20):
        a, b = by_doc[pair * 2], by_doc[pair * 2 + 1]
        assert a & b, f"pair {pair} shares no fingerprint"


def test_winnow_density_and_window_cover(spark):
    """Every window start in [0, max(n_grams - w, 0)] selects exactly one
    position, so n_fingerprints <= n_windows; and the whole-doc fallback
    (short / empty docs) still yields exactly one fingerprint."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, None), (4, "")],
        ["doc_id", "text"],
    )
    fp = dedup.winnow_fingerprints(df, "doc_id", "text", n=3, w=4)
    rows = fp.collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["_id"], []).append(r)
    assert len(per_doc[1]) <= per_doc[1][0]["n_windows"]
    for short_id in (2, 3, 4):
        assert len(per_doc[short_id]) == 1
        assert per_doc[short_id][0]["n_windows"] == 1
    # doc 3 (NULL) and doc 4 ('') must agree (NULL text == empty text rule)
    assert per_doc[3][0]["h"] == per_doc[4][0]["h"]
