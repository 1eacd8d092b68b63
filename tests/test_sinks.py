"""Sink semantics: fixed-header CSV, id lists, JSONL append, atomic JSON
write, cleanup modes, tiered distribution (SURVEY S5-S8, S12, T4)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from hdx_metadata_crawler_spark.sources import sinks
from tests.conftest import SF_SMALL


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)


def test_csv_report_fixed_header(spark, docs, tmp_path):
    out = str(tmp_path / "report")
    sinks.write_report_csv(docs, out, ["doc_id", "lang", "n_chars"])
    back = spark.read.option("header", True).csv(out)
    assert back.columns == ["doc_id", "lang", "n_chars"]
    assert back.count() == 50


def test_ids_txt_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "ids")
    sinks.write_ids_txt(docs, "doc_id", out)
    back = sinks.read_ids_txt(spark, out)
    assert {int(r["id"]) for r in back.collect()} == {
        r["doc_id"] for r in docs.collect()
    }


def test_jsonl_append_accumulates(spark, docs, tmp_path):
    out = str(tmp_path / "log")
    sinks.append_jsonl(docs.select("doc_id"), out)
    sinks.append_jsonl(docs.select("doc_id"), out)
    assert spark.read.json(out).count() == 100


def test_atomic_write_replaces(spark, docs, tmp_path):
    out = str(tmp_path / "atomic")
    sinks.atomic_write_json(docs.select("doc_id"), out)
    first = spark.read.json(out).count()
    sinks.atomic_write_json(docs.limit(10).select("doc_id"), out)
    assert first == 50 and spark.read.json(out).count() == 10
    assert not glob.glob(f"{out}.tmp-*"), "no tmp dirs may survive the commit"


def test_cleanup_modes(spark, docs, tmp_path):
    out = str(tmp_path / "modes")
    sinks.write_ids_txt(docs, "doc_id", out, mode="replace")
    # skip: existing output preserved
    sinks.write_ids_txt(docs.limit(1), "doc_id", out, mode="skip")
    assert sinks.read_ids_txt(spark, out).count() == 50
    # abort: refuses to overwrite
    with pytest.raises(Exception):
        sinks.write_ids_txt(docs, "doc_id", out, mode="abort")


def test_tiered_write_partitions_and_order(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "high").otherwise("low").alias("tier"),
        (F.col("id") % 17).cast("double").alias("score"),
    )
    out = str(tmp_path / "tiered")
    sinks.write_tiered(df, out, "tier", "score")
    assert {"tier=high", "tier=low"} <= set(os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == 100
    # per-tier folders exist and in-file order is score-descending
    for tier in ("high", "low"):
        files = glob.glob(f"{out}/tier={tier}/*.parquet")
        assert files
        for f in files:
            scores = [r["score"] for r in spark.read.parquet(f).collect()]
            assert scores == sorted(scores, reverse=True)


def test_atomic_write_recovers_from_crash_window(spark, tmp_path):
    """A crash between the two swap renames leaves only path.old; the next
    call must recover it instead of deleting the only surviving copy."""
    import os
    import shutil

    from hdx_metadata_crawler_spark.sources import sinks

    path = str(tmp_path / "out")
    df1 = spark.createDataFrame([(1, "first")], ["id", "v"])
    sinks.atomic_write_json(df1, path)
    assert {r["v"] for r in spark.read.json(path).collect()} == {"first"}

    # simulate the crash window: committed output moved aside, path absent
    shutil.move(path, path + ".old")
    assert not os.path.exists(path)

    df2 = spark.createDataFrame([(2, "second")], ["id", "v"])
    sinks.atomic_write_json(df2, path)
    assert {r["v"] for r in spark.read.json(path).collect()} == {"second"}
    assert not os.path.exists(path + ".old")


def test_bundle_zip_packages_records_index_reports(tmp_path):
    """S10 (07…ipynb cell-15): records/ + index/rdls_index.jsonl + reports/
    packaged deflated, deterministic member order, atomic write."""
    import zipfile

    from hdx_metadata_crawler_spark.sources import sinks

    records = tmp_path / "records"
    (records / "sub").mkdir(parents=True)
    (records / "b.json").write_text('{"id": "b"}')
    (records / "a.json").write_text('{"id": "a"}')
    (records / "sub" / "c.json").write_text('{"id": "c"}')
    index = tmp_path / "rdls_index.jsonl"
    index.write_text('{"id": "a"}\n{"id": "b"}\n')
    reports = tmp_path / "reports"
    reports.mkdir()
    (reports / "validation.csv").write_text("id,ok\na,true\n")

    out = str(tmp_path / "rdls_metadata_bundle.zip")
    report = sinks.bundle_zip(
        out, records_dir=str(records), index_file=str(index),
        reports_dir=str(reports),
    )
    assert report["records"] == 3
    assert report["index"] == 1
    assert report["reports"] == 1
    assert report["size_bytes"] > 0

    with zipfile.ZipFile(out) as z:
        names = z.namelist()
        # deterministic sorted-by-relpath order within each section
        assert names == [
            "records/a.json", "records/b.json", "records/sub/c.json",
            "index/rdls_index.jsonl", "reports/validation.csv",
        ]
        assert z.getinfo("records/a.json").compress_type == zipfile.ZIP_DEFLATED
        assert z.read("records/sub/c.json") == b'{"id": "c"}'
    # no tmp debris
    import glob as _glob
    assert not _glob.glob(out + ".tmp-*")


def test_bundle_zip_missing_sections_tolerated(tmp_path):
    from hdx_metadata_crawler_spark.sources import sinks

    out = str(tmp_path / "bundle.zip")
    report = sinks.bundle_zip(out, records_dir=str(tmp_path / "nope"))
    assert report == {"records": 0, "index": 0, "reports": 0,
                      "size_bytes": report["size_bytes"]}
    import zipfile
    with zipfile.ZipFile(out) as z:
        assert z.namelist() == []


def test_nb06_to_nb07_bundle_flow(spark, tmp_path):
    """End-to-end NB06 -> NB07 packaging: translate_records writes per-record
    JSON files, rdls_index writes index/rdls_index.jsonl, a validation CSV
    goes to reports/, and bundle_zip packages all three exactly as the
    reference's deliverable (records/ + index/ + reports/ in one deflated
    zip).  Ties S10 to the real dataflow rather than synthetic files."""
    import json
    import sys
    import zipfile

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    from hdx_metadata_crawler_spark.sources import sinks

    sf = "/root/testdata/sf0.001"
    recs = entry.queries()["translate_records"](spark, sf).limit(20).collect()
    idx = entry.queries()["rdls_index"](spark, sf).limit(20).collect()

    records_dir = tmp_path / "records"
    records_dir.mkdir()
    for r in recs:
        (records_dir / f"{r['rdls_id']}.json").write_text(r["record_json"])
    index_file = tmp_path / "rdls_index.jsonl"
    with index_file.open("w") as f:
        for r in idx:
            f.write(json.dumps(r.asDict()) + "\n")
    reports = tmp_path / "reports"
    reports.mkdir()
    (reports / "rdls_validation_summary.md").write_text("# summary\n")

    out = str(tmp_path / "rdls_metadata_bundle.zip")
    rep = sinks.bundle_zip(
        out, records_dir=str(records_dir), index_file=str(index_file),
        reports_dir=str(reports),
    )
    assert rep["records"] == len({r["rdls_id"] for r in recs})
    assert rep["index"] == 1 and rep["reports"] == 1

    with zipfile.ZipFile(out) as z:
        names = z.namelist()
        assert "index/rdls_index.jsonl" in names
        assert "reports/rdls_validation_summary.md" in names
        # every packaged record parses back and its id matches its filename
        for n in names:
            if n.startswith("records/"):
                rec = json.loads(z.read(n))
                assert n == f"records/{rec['id']}.json"
