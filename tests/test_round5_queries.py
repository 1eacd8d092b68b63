"""Round-5 breadth queries: leakage-safe component split, cross-snapshot
diff, token-budget mixture planner.  Oracle parity is the driver's job
(verify_local green at sf0.01 + sf0.001); these pin the SEMANTIC properties
each op exists to provide — the leakage guarantee, the diff status algebra,
the floor-allocation arithmetic — on crafted inputs and the test corpus."""

from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.operators import dedup
from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------------
# leakage_safe_split: THE property — no near-dup pair straddles the split
# ---------------------------------------------------------------------------

def test_leakage_safe_split_no_pair_straddles(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        leakage_safe_split,
        simhash_hamming_pairs,
    )

    split = leakage_safe_split(spark, SF_SMALL).select("doc_id", "split")
    pairs = simhash_hamming_pairs(spark, SF_SMALL).select("id_a", "id_b")
    a = split.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa")
    b = split.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb")
    straddlers = (
        pairs.join(a, "id_a").join(b, "id_b").filter(F.col("sa") != F.col("sb"))
    )
    assert straddlers.count() == 0
    # and the pair tier is non-trivial on this corpus, or the test is vacuous
    assert pairs.count() > 0


def test_leakage_safe_split_covers_every_doc_once(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import leakage_safe_split
    from hdx_metadata_crawler_spark.sources.tables import load_table

    out = leakage_safe_split(spark, SF_SMALL)
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    # both sides populated (SPLIT_EVAL_BP = 10% of components)
    sides = {r["split"] for r in out.select("split").distinct().collect()}
    assert sides == {"train", "eval"}


def test_leakage_safe_split_component_consistent(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import leakage_safe_split

    out = leakage_safe_split(spark, SF_SMALL)
    multi = (
        out.groupBy("component_id")
        .agg(F.countDistinct("split").alias("n_splits"), F.count("*").alias("n"))
        .filter(F.col("n_splits") > 1)
    )
    assert multi.count() == 0


# ---------------------------------------------------------------------------
# snapshot_diff: operator status algebra on crafted frames
# ---------------------------------------------------------------------------

def test_snapshot_diff_operator_statuses(spark):
    prev = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, None)],
        ["doc_id", "text"],
    )
    curr = spark.createDataFrame(
        [(2, "beta"), (3, "gamma REVISED"), (4, ""), (5, "delta")],
        ["doc_id", "text"],
    )
    out = {
        r["_id"]: r["status"]
        for r in dedup.snapshot_diff(prev, curr, "doc_id", "text").collect()
    }
    # 1 dropped, 3 revised, 5 new; 2 unchanged (absent); 4: NULL == '' rule
    assert out == {1: "removed", 3: "changed", 5: "added"}


def test_snapshot_diff_digest_sentinels(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import snapshot_diff

    rows = snapshot_diff(spark, SF_SMALL).collect()
    assert rows, "diff must be non-empty on the test corpus"
    statuses = set()
    for r in rows:
        statuses.add(r["status"])
        if r["status"] == "added":
            assert r["prev_digest"] == -1 and r["curr_digest"] != -1
        elif r["status"] == "removed":
            assert r["curr_digest"] == -1 and r["prev_digest"] != -1
        else:
            assert r["status"] == "changed"
            assert r["prev_digest"] != -1 and r["curr_digest"] != -1
            assert r["prev_digest"] != r["curr_digest"]
    assert statuses == {"added", "removed", "changed"}


def test_snapshot_diff_identical_snapshots_empty(spark):
    d = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    assert dedup.snapshot_diff(d, d, "doc_id", "text").count() == 0


# ---------------------------------------------------------------------------
# mix_epochs_plan: floor-allocation arithmetic and flag consistency
# ---------------------------------------------------------------------------

def test_mix_epochs_plan_allocation_arithmetic(spark):
    from hdx_metadata_crawler_spark.plans.queries_curation import (
        TOKEN_BUDGET,
        mix_epochs_plan,
    )

    rows = mix_epochs_plan(spark, SF_SMALL).collect()
    assert rows
    total_w = sum(r["weight_bp"] for r in rows)
    total_alloc = 0
    for r in rows:
        expected = (r["weight_bp"] * TOKEN_BUDGET) // total_w
        assert r["alloc_tokens"] == expected
        if r["avail_tokens"] > 0:
            assert abs(r["epochs"] - round(r["alloc_tokens"] / r["avail_tokens"], 4)) < 1e-9
        else:
            assert r["epochs"] == 0.0
        assert r["oversampled"] == (r["epochs"] > 1.0)
        total_alloc += r["alloc_tokens"]
    # floor division: the plan never over-commits the budget, and the
    # rounding slack is bounded by one token per source
    assert TOKEN_BUDGET - len(rows) < total_alloc <= TOKEN_BUDGET


# ---------------------------------------------------------------------------
# cross_source_neardup_matrix: normalization + conservation of pair mass
# ---------------------------------------------------------------------------

def test_cross_source_matrix_conserves_pairs(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        cross_source_neardup_matrix,
        simhash_hamming_pairs,
    )

    rows = cross_source_neardup_matrix(spark, SF_SMALL).collect()
    assert rows
    # (source_a, source_b) is normalized unordered and unique per row
    keys = [(r["source_a"], r["source_b"]) for r in rows]
    assert all(a <= b for a, b in keys)
    assert len(keys) == len(set(keys))
    # every simhash pair lands in exactly one cell
    n_pairs = simhash_hamming_pairs(spark, SF_SMALL).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs


# ---------------------------------------------------------------------------
# minhash_accuracy_report: bin bounds + integer error algebra
# ---------------------------------------------------------------------------

def test_minhash_accuracy_report_bounds(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        MH_ACC_BP,
        minhash_accuracy_report,
    )

    rows = minhash_accuracy_report(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # a band collision guarantees >= 4 equal slots; 32 is the signature
        assert 4 <= r["est_slots"] <= 32
        assert r["n_pairs"] >= 1
        assert 0 <= r["max_err_bp"] <= MH_ACC_BP
        assert r["max_err_bp"] <= r["sum_err_bp"] <= r["n_pairs"] * MH_ACC_BP


def test_minhash_accuracy_identical_docs_zero_error(spark):
    """Two identical documents: all 32 slots equal (k=32, est 10000 bp) and
    exact Jaccard 1.0 (10000 bp) — the k=32 bin must report zero error."""
    from hdx_metadata_crawler_spark.operators import dedup
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    sig = dedup.minhash_signatures(
        d, "doc_id", "text", n=3, num_hashes=32, base_hash_fn=dedup.md5_base28
    )
    pairs = dedup.minhash_lsh_candidates(
        sig, bands=8, rows_per_band=4, num_hashes=32,
        bucket_hash_fn=dedup.md5_hash60,
    )
    assert pairs.count() == 1
    est = dedup.minhash_jaccard_estimate(sig, pairs).collect()[0]
    assert est["est_jaccard"] == 1.0
    sets = d.select(
        F.array_distinct(
            F.transform(dedup.shingles(F.col("text"), 3), dedup.md5_hash60)
        ).alias("shs")
    ).collect()
    assert sorted(sets[0]["shs"]) == sorted(sets[1]["shs"])


# ---------------------------------------------------------------------------
# snapshot_diff: digest-only exchanges (plan shape)
# ---------------------------------------------------------------------------

def test_snapshot_diff_digest_only_exchanges(spark):
    """The full-outer join's exchanges carry (id, digest) — document text
    must never appear in an Exchange partitioning or as a join key: the
    16-bytes/row shuffle claim is the operator's whole scale story."""
    import re

    from pyspark.sql import functions as F
    from hdx_metadata_crawler_spark.operators import dedup

    prev = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    curr = spark.createDataFrame([(2, "beta!"), (3, "gamma")], ["doc_id", "text"])
    df = dedup.snapshot_diff(prev, curr, "doc_id", "text")
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    for ln in final.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert not re.search(r"\btext#\d+", ln), (
                f"document text in a snapshot_diff exchange: {ln}"
            )


# ---------------------------------------------------------------------------
# ivf_cell_stats: quantizer agreement with semantic_dedup + exact bp math
# ---------------------------------------------------------------------------

def test_ivf_cell_stats_matches_semantic_dedup_cells(spark):
    from hdx_metadata_crawler_spark.plans.queries_similarity import (
        ivf_cell_stats,
        semantic_dedup,
    )

    stats = {r["cell"]: r for r in ivf_cell_stats(spark, SF_SMALL).collect()}
    # same deterministic quantizer -> per-cell counts must agree exactly
    sd = (
        semantic_dedup(spark, SF_SMALL)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {r["cell"]: r["n"] for r in sd} == {
        c: r["n_vecs"] for c, r in stats.items()
    }
    t = sum(r["n_vecs"] for r in stats.values())
    for r in stats.values():
        assert r["share_bp"] == (r["n_vecs"] * 10000) // t
        assert r["load_bp"] == (r["n_vecs"] * 16 * 10000) // t
    # floor rounding: shares sum to within one bp per cell of 10000
    s = sum(r["share_bp"] for r in stats.values())
    assert 10000 - len(stats) < s <= 10000


# ---------------------------------------------------------------------------
# neardup_cluster_histogram: mass conservation vs the component frames
# ---------------------------------------------------------------------------

def test_cluster_histogram_conserves_corpus_mass(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        neardup_cluster_histogram,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = neardup_cluster_histogram(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["doc_share_bp"] == (r["n_docs"] * 10000) // n_docs
    # the corpus has near-dups (simhash tier is non-trivial), so both a
    # singleton bucket and at least one >=2 bucket must exist
    sizes = {r["cluster_size"] for r in rows}
    assert 1 in sizes and max(sizes) >= 2


def test_cluster_histogram_agrees_with_components(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        neardup_cluster_histogram,
        neardup_components,
    )

    hist = {
        r["cluster_size"]: r["n_clusters"]
        for r in neardup_cluster_histogram(spark, SF_SMALL).collect()
        if r["cluster_size"] >= 2
    }
    comp = (
        neardup_components(spark, SF_SMALL)
        .select("component_id", "n_members")
        .distinct()
        .groupBy("n_members")
        .agg(F.count("*").alias("n_clusters"))
        .collect()
    )
    assert {r["n_members"]: r["n_clusters"] for r in comp} == hist


# ---------------------------------------------------------------------------
# packing_fragmentation: fragment/sequence mass conservation vs the packer
# ---------------------------------------------------------------------------

def test_packing_fragmentation_conserves_fragments_and_seqs(spark):
    from hdx_metadata_crawler_spark.plans.queries_text import (
        _PACK_SEQ_LEN,
        packing_fragmentation,
        sequence_packing,
    )

    hist = packing_fragmentation(spark, SF_SMALL).collect()
    packed = sequence_packing(spark, SF_SMALL).agg(
        F.sum("n_seqs").alias("frags"),
        F.sum("n_tokens").alias("toks"),
        F.max(F.col("seq_end")).alias("last_seq"),
    ).collect()[0]
    # every (doc, sequence) incidence lands in exactly one histogram bucket
    assert sum(r["n_fragments"] * r["n_seqs"] for r in hist) == packed["frags"]
    # every occupied sequence id is counted exactly once
    n_seqs = sum(r["n_seqs"] for r in hist)
    assert n_seqs == packed["last_seq"] + 1
    assert n_seqs == -(-packed["toks"] // _PACK_SEQ_LEN)  # ceil
    assert all(r["n_fragments"] >= 1 for r in hist)
    t = n_seqs
    for r in hist:
        assert r["seq_share_bp"] == (r["n_seqs"] * 10000) // t


# ---------------------------------------------------------------------------
# char_class_profile: pure-Python recomputation on the test corpus
# ---------------------------------------------------------------------------

def test_char_class_profile_matches_python_recount(spark):
    from collections import defaultdict

    from hdx_metadata_crawler_spark.plans.queries_text import (
        char_class_profile,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    got = {r["source"]: r for r in char_class_profile(spark, SF_SMALL).collect()}
    docs = load_table(spark, SF_SMALL, "documents").select(
        "source", "text"
    ).collect()
    want = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, chars, alpha, digit, space
    for r in docs:
        src = r["source"] or ""
        t = r["text"] or ""
        w = want[src]
        w[0] += 1
        w[1] += len(t)
        w[2] += sum(c.isascii() and c.isalpha() for c in t)
        w[3] += sum(c.isdigit() and c.isascii() for c in t)
        w[4] += sum(c in " \t\n\r" for c in t)
    assert set(got) == set(want)
    for src, (nd, nc, na, ng, ns) in want.items():
        r = got[src]
        assert (r["n_docs"], r["n_chars"]) == (nd, nc)
        assert (r["n_alpha"], r["n_digit"], r["n_space"]) == (na, ng, ns)
        assert r["n_other"] == nc - na - ng - ns
        d = max(nc, 1)
        assert r["alpha_bp"] == (na * 10000) // d
        assert r["digit_bp"] == (ng * 10000) // d
        assert r["space_bp"] == (ns * 10000) // d


# ---------------------------------------------------------------------------
# dup_quality_interaction: both input verdicts are reused, not re-derived
# ---------------------------------------------------------------------------

def test_dup_quality_interaction_conserves_both_verdicts(spark):
    from hdx_metadata_crawler_spark.plans.queries_curation import (
        gopher_quality_filter,
    )
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        dup_quality_interaction,
        simhash_hamming_pairs,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = dup_quality_interaction(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # total keeps equal the standalone Gopher filter's keeps
    n_keep = gopher_quality_filter(spark, SF_SMALL).filter(F.col("keep")).count()
    assert sum(r["n_keep"] for r in rows) == n_keep
    # duplicated mass equals the distinct membership of the pair tier
    pairs = simhash_hamming_pairs(spark, SF_SMALL)
    members = (
        pairs.select(F.col("id_a").alias("i"))
        .union(pairs.select(F.col("id_b").alias("i")))
        .distinct()
        .count()
    )
    assert sum(r["n_docs"] for r in rows if r["is_neardup"]) == members
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert r["keep_bp"] == (r["n_keep"] * 10000) // r["n_docs"]


# ---------------------------------------------------------------------------
# recrawl_priority: flag algebra conserves and agrees with snapshot_diff
# ---------------------------------------------------------------------------

def test_recrawl_priority_agrees_with_snapshot_diff(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        recrawl_priority,
        snapshot_diff,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = recrawl_priority(spark, SF_SMALL).collect()
    for r in rows:
        assert r["n_added"] + r["n_common"] == r["n_curr"]
        assert r["n_removed"] + r["n_common"] == r["n_prev"]
        assert r["n_changed"] <= r["n_common"]
    # per-source added/removed/changed match the digest-based diff exactly
    src = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.coalesce(F.col("source"), F.lit("")).alias("source")
    )
    diff = (
        snapshot_diff(spark, SF_SMALL)
        .join(src, "doc_id")
        .groupBy("source", "status")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want = {(r["source"], r["status"]): r["n"] for r in diff}
    for r in rows:
        for status, col in (
            ("added", "n_added"), ("removed", "n_removed"), ("changed", "n_changed"),
        ):
            assert want.get((r["source"], status), 0) == r[col]
    # priority is a total order 1..n_sources ranked by churn
    prios = sorted(r["priority"] for r in rows)
    assert prios == list(range(1, len(rows) + 1))
    by_p = sorted(rows, key=lambda r: r["priority"])
    assert all(
        a["churn_bp"] >= b["churn_bp"] for a, b in zip(by_p, by_p[1:])
    )


# ---------------------------------------------------------------------------
# rare_token_score: pure-Python recount of df and the per-doc rare fraction
# ---------------------------------------------------------------------------

def test_rare_token_score_matches_python_recount(spark):
    import re
    from collections import Counter

    from hdx_metadata_crawler_spark.plans.queries_text import (
        RARE_DF_MAX,
        rare_token_score,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    got = {r["doc_id"]: r for r in rare_token_score(spark, SF_SMALL).collect()}
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    toks = {
        r["doc_id"]: [
            t for t in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()) if t
        ]
        for r in docs
    }
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    assert set(got) == set(toks)
    for did, ts in toks.items():
        r = got[did]
        c = Counter(ts)
        rare = {t for t in c if df[t] <= RARE_DF_MAX}
        n_rare = sum(c[t] for t in rare)
        assert r["n_instances"] == len(ts)
        assert r["n_distinct"] == len(c)
        assert r["n_rare_instances"] == n_rare
        assert r["n_rare_distinct"] == len(rare)
        assert r["rare_bp"] == (n_rare * 10000) // max(len(ts), 1)


# ---------------------------------------------------------------------------
# lsh_bucket_stats: the audit must describe the join's actual candidates
# ---------------------------------------------------------------------------

def test_lsh_bucket_stats_bounds_the_candidate_join(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        lsh_bucket_stats,
        minhash_lsh_dedup,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = lsh_bucket_stats(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert {r["band"] for r in rows} == set(range(8))
    for r in rows:
        # every doc lands in exactly one bucket per band
        assert r["singleton_buckets"] <= r["n_buckets"]
        assert r["max_bucket_size"] >= 1
        assert r["est_pairs"] >= 0
    # sum over buckets of s equals the corpus per band — implied by
    # n_buckets/singletons/max consistency on at least the trivial bound
    assert all(r["n_buckets"] <= n_docs for r in rows)
    # the DISTINCT candidate set is bounded by the per-band pair mass and
    # reaches at least the largest single band's non-duplicated floor
    n_cand = minhash_lsh_dedup(spark, SF_SMALL).select("id_a", "id_b").count()
    total_pairs = sum(r["est_pairs"] for r in rows)
    assert n_cand <= total_pairs
    # a distinct pair collides in at most 8 bands, so the mass the audit
    # reports can overstate the join by at most that factor
    assert n_cand * 8 >= total_pairs


# ---------------------------------------------------------------------------
# pii_hit_report: strata sums must equal pii_redaction's per-doc counts
# ---------------------------------------------------------------------------

def test_pii_hit_report_conserves_redaction_counts(spark):
    from hdx_metadata_crawler_spark.operators.curation import PII_BANK
    from hdx_metadata_crawler_spark.plans.queries_curation import (
        pii_hit_report,
        pii_redaction,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = pii_hit_report(spark, SF_SMALL).collect()
    kinds = [k for k, _, _ in PII_BANK]
    # every (source, kind) stratum is present, zeros included
    n_sources = (
        load_table(spark, SF_SMALL, "documents")
        .select(F.coalesce(F.col("source"), F.lit("")))
        .distinct()
        .count()
    )
    assert len(rows) == n_sources * len(kinds)
    # totals equal the per-doc counts pii_redaction reports
    red = pii_redaction(spark, SF_SMALL).agg(
        *[F.sum(f"n_{k}").alias(k) for k in kinds]
    ).collect()[0]
    for k in kinds:
        tot = sum(r["n_matches"] for r in rows if r["kind"] == k)
        assert tot == red[k]
        assert tot > 0  # injection guarantees live hits, not a vacuous zero
    for r in rows:
        assert r["n_docs_hit"] <= r["n_matches"] or r["n_matches"] == 0


# ---------------------------------------------------------------------------
# hot_shingle_report: pure-Python recount of the shingle document frequency
# ---------------------------------------------------------------------------

def test_hot_shingle_report_matches_python_recount(spark):
    import re
    from collections import Counter

    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        HOT_SHINGLE_CAP,
        HOT_SHINGLE_TOP,
        hot_shingle_report,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = hot_shingle_report(spark, SF_SMALL).collect()
    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    df = Counter()
    for r in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()) if t]
        if len(toks) >= 3:
            sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        else:
            sh = {" ".join(toks)}
        df.update(sh)
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
    assert len(rows) == HOT_SHINGLE_TOP
    got = {r["shingle"]: r for r in rows}
    # reported dfs are exact, and the reported SET is a valid top-25 under
    # the (df desc, digest asc) order: every reported df >= the 26th df
    for sh, r in got.items():
        assert df[sh] == r["df"]
        assert r["est_join_rows"] == r["df"] * (r["df"] - 1) // 2
        assert r["would_cap"] == (r["df"] > HOT_SHINGLE_CAP)
    floor = want[HOT_SHINGLE_TOP][1] if len(want) > HOT_SHINGLE_TOP else 0
    assert all(r["df"] >= floor for r in rows)
    ranks = sorted(r["rnk"] for r in rows)
    assert ranks == list(range(1, HOT_SHINGLE_TOP + 1))


# ---------------------------------------------------------------------------
# plan shapes for the continuation perf fixes (lock the wins in)
# ---------------------------------------------------------------------------

def _doc_text_scan_count(df) -> int:
    """Number of parquet scans of the documents table that read the text
    column — the thing the df-window rewrites exist to keep at ONE."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = 0
    for ln in plan.splitlines():
        if "Scan parquet" in ln or "FileScan parquet" in ln:
            if "documents" in ln and "text" in ln:
                n += 1
    return n


def test_rare_token_score_single_text_scan(spark):
    from hdx_metadata_crawler_spark.plans.queries_text import rare_token_score

    df = rare_token_score(spark, SF_SMALL)
    df.write.mode("overwrite").format("noop").save()
    assert _doc_text_scan_count(df) == 1


def test_tfidf_single_text_scan(spark):
    from hdx_metadata_crawler_spark.plans.queries_text import tfidf_top_terms

    df = tfidf_top_terms(spark, SF_SMALL)
    df.write.mode("overwrite").format("noop").save()
    assert _doc_text_scan_count(df) == 1


def test_mix_epochs_plan_single_text_scan(spark):
    from hdx_metadata_crawler_spark.plans.queries_curation import mix_epochs_plan

    df = mix_epochs_plan(spark, SF_SMALL)
    df.write.mode("overwrite").format("noop").save()
    assert _doc_text_scan_count(df) == 1


def test_hot_shingle_wide_aggregate_is_digest_only(spark):
    """The vocabulary-sized df aggregate must shuffle shingle DIGESTS, not
    shingle text.  Exactly ONE exchange may carry the `shingle` string —
    the survivor-side distinct AFTER the broadcast semi-join on the 25
    checkpointed digests, whose map-side partial dedup bounds it at <= 25
    rows per input partition."""
    import re

    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        HOT_SHINGLE_TOP,
        hot_shingle_report,
    )

    df = hot_shingle_report(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    text_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and re.search(r"\bshingle#\d+", ln)
    ]
    assert len(text_exchanges) == 1, text_exchanges
    # and that one is the survivor distinct: keyed on (digest, shingle),
    # downstream of the broadcast filter (the broadcast join must exist).
    # The wide df aggregate itself never appears here — ranked is an eager
    # localCheckpoint, so the final plan reads the 25-row checkpoint and
    # the only text-carrying shuffle left is the survivor-bounded distinct
    # (<= HOT_SHINGLE_TOP rows per input partition after map-side dedup).
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "Scan ExistingRDD" in plan  # the checkpointed 25-row frame
    assert HOT_SHINGLE_TOP == 25


# ---------------------------------------------------------------------------
# eval_leak_report: pure-Python recount + duality with decontamination
# ---------------------------------------------------------------------------

def test_eval_leak_report_matches_python_recount(spark):
    """Independent pure-Python recomputation of the whole report at
    sf0.001: md5 1-in-20 eval split, distinct 5-grams, leaked shingles /
    corpus docs per eval doc, floor-bp arithmetic."""
    import hashlib
    import re

    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        EVAL_SPLIT_MOD,
        eval_leak_report,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()

    def shingles(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
        if len(toks) >= 5:
            return {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}
        return {" ".join(toks)}

    def is_eval(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16)
        return h % EVAL_SPLIT_MOD == 0

    ev = {r["doc_id"]: shingles(r["text"]) - {""} for r in rows if is_eval(r["doc_id"])}
    corpus = {r["doc_id"]: shingles(r["text"]) for r in rows if not is_eval(r["doc_id"])}
    got = {r["eval_id"]: r for r in eval_leak_report(spark, SF_SMALL).collect()}
    assert set(got) == set(ev)
    for eid, shs in ev.items():
        leaked = {s for s in shs if any(s in c for c in corpus.values())}
        ndocs = len({cid for cid, c in corpus.items() if c & shs})
        r = got[eid]
        assert r["n_shingles"] == len(shs)
        assert r["n_leaked_shingles"] == len(leaked)
        assert r["n_corpus_docs"] == ndocs
        assert r["leak_bp"] == len(leaked) * 10000 // max(len(shs), 1)
        assert r["compromised"] == (len(leaked) > 0)


def test_eval_leak_duality_with_decontamination(spark):
    """The two directions of the same shingle match: SOME eval doc is
    compromised iff SOME corpus doc is contaminated (shared dictionary,
    shared split)."""
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        benchmark_decontamination,
        eval_leak_report,
    )

    n_compromised = (
        eval_leak_report(spark, SF_SMALL).filter(F.col("compromised")).count()
    )
    n_contaminated = (
        benchmark_decontamination(spark, SF_SMALL)
        .filter(F.col("contaminated"))
        .count()
    )
    assert (n_compromised > 0) == (n_contaminated > 0)
    # non-vacuous on this corpus
    assert n_compromised > 0


# ---------------------------------------------------------------------------
# neardup_threshold_sweep: monotone curve + agreement with the 0.40 tier
# ---------------------------------------------------------------------------

def test_threshold_sweep_monotone_and_agrees_with_exact(spark):
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        cosine_neardup_exact,
        neardup_threshold_sweep,
    )

    sweep = {
        r["threshold_bp"]: r
        for r in neardup_threshold_sweep(spark, SF_SMALL).collect()
    }
    bps = sorted(sweep)
    for lo, hi in zip(bps, bps[1:]):
        assert sweep[hi]["n_pairs"] <= sweep[lo]["n_pairs"]
        assert sweep[hi]["n_docs"] <= sweep[lo]["n_docs"]
    exact = cosine_neardup_exact(spark, SF_SMALL).collect()
    # cosine_neardup_exact keeps cos >= 0.40 on the ROUNDED 4-dp cosine —
    # identical to cos_bp >= 4000 (bp = round(cos*10000) of the same value)
    ids = {r["id_a"] for r in exact} | {r["id_b"] for r in exact}
    assert sweep[4000]["n_pairs"] == len(exact)
    assert sweep[4000]["n_docs"] == len(ids)
    assert sweep[min(bps)]["n_pairs"] > 0  # non-vacuous corpus


def test_winnowing_exchanges_are_digest_only(spark):
    """No winnowing exchange may carry gram text: the digest is computed
    in the map stage, so every hash-partitioned shuffle moves (id, pos,
    8-byte digest) rows only — and the raw operator chain reads the
    documents text column exactly once.  (Checked on the RAW operator:
    the registered queries consume the memoized localCheckpoint frame,
    which would hide the upstream plan.)"""
    import re

    from hdx_metadata_crawler_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents")
    df = dedup.winnow_fingerprints(d, "doc_id", "text", n=3, w=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    text_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and re.search(r"\bgram#\d+", ln)
    ]
    assert text_exchanges == [], text_exchanges
    assert _doc_text_scan_count(df) == 1


# ---------------------------------------------------------------------------
# dedup_stage_attribution: partition of the corpus, tier agreement
# ---------------------------------------------------------------------------

def test_stage_attribution_partitions_corpus(spark):
    """The stages partition every source: per-source doc mass is conserved
    and floor-bp shares sum to within the rounding slack of 10000."""
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        dedup_stage_attribution,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = dedup_stage_attribution(spark, SF_SMALL).collect()
    n_corpus = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_corpus
    per_src: dict = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    for src, rs in per_src.items():
        bp = sum(r["share_bp"] for r in rs)
        assert 10000 - len(rs) < bp <= 10000, (src, bp)


def test_stage_attribution_agrees_with_consensus_and_exact_tier(spark):
    """'kept' mass == consensus-canonical docs; the 'exact' stage count ==
    the number of non-first-seen exact text dups (identical text implies a
    hamming-0 simhash edge, so every exact dup is necessarily dropped)."""
    from hdx_metadata_crawler_spark.operators import dedup as dd
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        dedup_stage_attribution,
        neardup_consensus,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = dedup_stage_attribution(spark, SF_SMALL).collect()
    kept = sum(r["n_docs"] for r in rows if r["stage"] == "kept")
    cons = neardup_consensus(spark, SF_SMALL)
    n_total = load_table(spark, SF_SMALL, "documents").count()
    n_dropped = cons.filter(~F.col("is_canonical")).count()
    assert kept == n_total - n_dropped

    d = load_table(spark, SF_SMALL, "documents")
    dig = d.select(
        "doc_id", dd.md5_hash60(F.coalesce("text", F.lit(""))).alias("dg")
    )
    keepers = dig.groupBy("dg").agg(F.min("doc_id").alias("k"))
    n_exact = (
        dig.join(keepers, "dg").filter(F.col("doc_id") != F.col("k")).count()
    )
    exact_attr = sum(r["n_docs"] for r in rows if r["stage"] == "exact")
    assert exact_attr == n_exact
    # the synthetic corpus has no full-text exact dups (n_exact == 0 here);
    # the planted-duplicate test below keeps the 'exact' stage non-vacuous


def test_stage_attribution_planted_duplicates(spark, tmp_path):
    """Planted corpus, one doc per source: an exact duplicate pair is
    attributed (keeper 'kept', copy 'exact') and unrelated docs stay
    'kept' — end-to-end through the registered query reading a tmp
    sf_dir."""
    from hdx_metadata_crawler_spark.plans.queries_dedup import (
        dedup_stage_attribution,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    other = "completely different text about spark shuffles and parquet scans"
    rows = [
        (1, base, "en", "src_keep", len(base)),
        (2, base, "en", "src_copy", len(base)),
        (3, other, "en", "src_solo", len(other)),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["source"], r["stage"]): r
        for r in dedup_stage_attribution(spark, sf_dir).collect()
    }
    assert got[("src_keep", "kept")]["n_docs"] == 1  # component min survives
    assert got[("src_copy", "exact")]["n_docs"] == 1  # identical text copy
    assert got[("src_solo", "kept")]["n_docs"] == 1
    assert all(r["share_bp"] == 10000 for r in got.values())
    assert len(got) == 3


# ---------------------------------------------------------------------------
# vocab_coverage: pure-Python recount of the whole report
# ---------------------------------------------------------------------------

def test_vocab_coverage_matches_python_recount(spark):
    import re
    from collections import Counter

    from hdx_metadata_crawler_spark.plans.queries_text import (
        VOCAB_K,
        vocab_coverage,
    )
    from hdx_metadata_crawler_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMALL, "documents").select("source", "text").collect()
    per_src: dict = {}
    glob: Counter = Counter()
    for r in rows:
        toks = [t for t in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()) if t]
        c = per_src.setdefault(r["source"] or "", Counter())
        c.update(toks)
        glob.update(toks)
    vocab = {
        t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
    }
    got = {r["source"]: r for r in vocab_coverage(spark, SF_SMALL).collect()}
    assert set(got) == set(per_src)
    for src, cnt in per_src.items():
        n_tok = sum(cnt.values())
        n_cov = sum(v for t, v in cnt.items() if t in vocab)
        nd = len(cnt)
        ndc = sum(1 for t in cnt if t in vocab)
        r = got[src]
        assert r["n_tokens"] == n_tok and r["n_covered"] == n_cov
        assert r["coverage_bp"] == n_cov * 10000 // max(n_tok, 1)
        assert r["n_distinct"] == nd and r["n_distinct_covered"] == ndc
        assert r["distinct_coverage_bp"] == ndc * 10000 // max(nd, 1)
        # K < vocab size on this corpus -> coverage must be non-trivial
        assert 0 < r["coverage_bp"] < 10000
