"""Deterministic hash-ticket sampling: reproducibility, weight monotonicity,
full-keep / zero-keep strata, salt independence."""

from __future__ import annotations

from hdx_metadata_crawler_spark.operators import sampling


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _kept_ids(spark, **kw):
    out = sampling.hash_stratified_sample(_docs(spark), "source", "doc_id", **kw)
    return {r["doc_id"] for r in out.select("doc_id").collect()}


def test_sample_deterministic(spark):
    assert _kept_ids(spark) == _kept_ids(spark)


def test_sample_monotone_in_weights(spark):
    """Raising every rate only ADDS documents (ticket < rate is monotone),
    so ablation mixes are supersets of each other."""
    base = _kept_ids(spark)
    raised = {
        k: min(sampling.TICKET_MOD, v + 2000)
        for k, v in sampling.MIX_WEIGHTS_BP.items()
    }
    bigger = _kept_ids(
        spark, weights_bp=raised, default_bp=sampling.DEFAULT_MIX_BP + 2000
    )
    assert base <= bigger
    assert len(bigger) > len(base)


def test_sample_full_and_zero_strata(spark):
    d = _docs(spark)
    n_src0 = d.filter(d.source == "src0").count()
    kept = sampling.hash_stratified_sample(
        d, "source", "doc_id", weights_bp={"src0": sampling.TICKET_MOD}, default_bp=0
    )
    rows = kept.select("source").collect()
    assert len(rows) == n_src0  # rate 10000 keeps every src0 doc
    assert {r["source"] for r in rows} == {"src0"}  # rate 0 keeps nothing


def test_sample_salt_gives_independent_draws(spark):
    a = _kept_ids(spark, salt="mixA")
    b = _kept_ids(spark, salt="mixB")
    assert a != b  # different salts -> different tickets -> different mixes
