"""Per-branch unit fixtures for the NB10 tier-cascade merge (10…ipynb:679
_merge_tiers; SURVEY §7.4 risk 5 calls this 'easy to get subtly wrong').
Each case pins one branch of the merge rules:
  T1 always in / T2 adds-or-boosts / T3 boosts-only-with-document-fallback."""

from __future__ import annotations

from hdx_metadata_crawler_spark.plans.queries_extractors import tier_merge_frame


def _doc(doc_id: int, t1: str = "", t2: str = "", t3: str = "") -> tuple:
    # tier fields are byte ranges: title=[1,80], resources=[81,160], notes=rest
    assert len(t1) <= 80 and len(t2) <= 80
    return (doc_id, f"{t1:<80}{t2:<80}{t3}")


CASES = [
    # (doc, expected rows {(category, confidence, tier_source, corroborated)})
    (_doc(1, t1="table"), {("infrastructure", 1.0, "tier1", False)}),
    # corroboration boost capped at 1.0 (T1 + T2)
    (_doc(2, t1="table", t2="table"), {("infrastructure", 1.0, "tier1", True)}),
    # T2 introduces a new category at 0.85
    (_doc(3, t2="stream"), {("population", 0.85, "tier2", False)}),
    # T3 corroborates a T2 category: 0.85 + 0.05
    (_doc(4, t2="stream", t3="stream"), {("population", 0.9, "tier2", True)}),
    # T3 fallback: tiers 1+2 found nothing document-wide -> T3 may introduce
    (_doc(5, t3="join"), {("roads", 0.6, "tier3", False)}),
    # T3 may NOT introduce when ANY category came from tiers 1+2:
    # 'roads' appears only in notes and is discarded; 'table' in notes does
    # not corroborate infrastructure? it DOES (t3 hit for the same category).
    (_doc(6, t1="table", t3="join"), {("infrastructure", 1.0, "tier1", False)}),
    # T3 corroborating the same T1 category
    (_doc(7, t1="table", t3="table"), {("infrastructure", 1.0, "tier1", True)}),
    # multi-category: T1 infra + T2 roads + T3-only energy (discarded)
    (
        _doc(8, t1="table", t2="join", t3="window"),
        {
            ("infrastructure", 1.0, "tier1", False),
            ("roads", 0.85, "tier2", False),
        },
    ),
    # no signal anywhere -> no rows
    (_doc(9), set()),
]


def test_tier_merge_branches(spark):
    df = spark.createDataFrame([c[0] for c in CASES], ["doc_id", "text"])
    out = tier_merge_frame(df).collect()
    by_doc: dict[int, set] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(
            (r["category"], r["confidence"], r["tier_source"], r["corroborated"])
        )
    for (doc_id, _), expected in [((c[0][0], None), c[1]) for c in CASES]:
        assert by_doc.get(doc_id, set()) == expected, f"doc {doc_id}"


def test_tier_merge_oracle_tier3_branch_parity(spark, tmp_path):
    """The driver's sf corpora contain ZERO tier3-introduce documents
    (measured at sf0.01: no doc has a tier-3 hit while tiers 1+2 find
    nothing document-wide), so the oracle SQL's tier3 branch is dead in
    every CORRECTNESS gate run.  This fixture corpus fires EVERY branch —
    tier3-introduce included — and compares the registered oracle SQL
    against the registered Spark query row-for-row."""
    import duckdb
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    docs = [
        _doc(1, t3="join"),                      # tier3-INTRODUCE (the dead branch)
        _doc(2, t3="join window"),               # tier3 introduces two categories
        _doc(3, t1="table"),                     # tier1 plain
        _doc(4, t1="table", t3="table"),         # tier3 corroborates tier1
        _doc(5, t2="stream", t3="stream"),       # tier3 corroborates tier2
        _doc(6, t1="table", t3="join"),          # tier3 discarded (any12 true)
        _doc(7),                                 # no hits at all
    ]
    spark.createDataFrame(docs, ["doc_id", "text"]).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )

    out = entry.queries()["tier_merge"](spark, str(tmp_path))
    cols = sorted(out.columns)

    def norm(rows):
        normed = []
        for r in rows:
            vals = []
            for c in cols:
                v = r[c]
                vals.append(round(v, 4) if isinstance(v, float) else v)
            normed.append(tuple(vals))
        return sorted(normed)

    spark_rows = norm([row.asDict() for row in out.collect()])

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    orc = con.sql(entry.oracle_sql()["tier_merge"])
    oracle_rows = norm([dict(zip(orc.columns, row)) for row in orc.fetchall()])

    # the dead branch actually fired: doc 1 must introduce via tier3
    introduced = [r for r in spark_rows if r[cols.index("doc_id")] == 1]
    assert introduced, "fixture failed to fire the tier3-introduce branch"
    assert spark_rows == oracle_rows
