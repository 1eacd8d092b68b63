"""Iceberg availability probe (judge round-2 item 7 / SURVEY §1.3).

SURVEY's design point is Iceberg ACID tables (MERGE INTO idempotent upsert,
snapshot checkpoints).  The sandbox substitute is parquet snapshots + atomic
``_COMMIT`` markers (streaming/frontier.py), which delivers the same resume
semantics and is crash/resume-tested.  This probe documents WHY the real
catalog is not exercised here: it attempts, in order,

1. locating an iceberg-spark-runtime jar on the image (pyspark jars dir +
   filesystem sweep already done at build time: none shipped);
2. starting a SparkSession configured with a local Hadoop-type Iceberg
   catalog and creating a table USING iceberg;
3. a MERGE INTO upsert against it.

Run: ``python tools/probe_iceberg.py`` — prints one JSON line; the outcome
is recorded in BASELINE.md.  (No network: spark.jars.packages cannot fetch
the runtime, so a missing jar is terminal in this environment.)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import pyspark

    result: dict = {"probe": "iceberg"}
    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    found = glob.glob(os.path.join(jars_dir, "*iceberg*"))
    result["pyspark_jars_dir"] = jars_dir
    result["iceberg_jars_found"] = found

    wh = tempfile.mkdtemp(prefix="iceberg_probe_")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-probe")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.probe", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.probe.type", "hadoop")
        .config("spark.sql.catalog.probe.warehouse", wh)
        .getOrCreate()
    )
    try:
        spark.sql("CREATE TABLE probe.db.t (id BIGINT, v STRING) USING iceberg")
        spark.sql("INSERT INTO probe.db.t VALUES (1, 'a')")
        spark.sql(
            "MERGE INTO probe.db.t USING (SELECT 1 AS id, 'b' AS v) s "
            "ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        rows = spark.sql("SELECT * FROM probe.db.t").collect()
        result["outcome"] = "iceberg_available"
        result["merge_result"] = [tuple(r) for r in rows]
    except Exception as exc:  # noqa: BLE001 — the failure IS the result
        full = str(getattr(exc, "java_exception", None) or exc)
        key_lines = [
            ln for ln in full.splitlines()
            if "ClassNotFound" in ln or "Cannot find catalog" in ln
            or "cannot be found" in ln or "Error" in ln
        ]
        msg = (key_lines[0] if key_lines else full.splitlines()[0])[:300]
        result["outcome"] = "unavailable"
        result["error"] = msg
        if "ClassNotFound" in msg or "cannot be found" in msg or "Cannot find catalog" in msg:
            result["diagnosis"] = (
                "iceberg-spark-runtime jar not on the image and no network "
                "to fetch it; parquet snapshots + atomic _COMMIT markers "
                "remain the documented substitute (same resume semantics, "
                "crash/resume-tested)"
            )
    finally:
        spark.stop()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
