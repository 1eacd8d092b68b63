"""Sinks: the reference's output formats re-expressed as DataFrame writes.

| SURVEY | reference | here |
|---|---|---|
| S5 atomic JSON write (01…ipynb:557 tmp+os.replace) | per-file atomicity | write to tmp dir + atomic dir rename (the engine's checkpoint protocol, frontier._write_state, uses the same pattern with a _COMMIT marker) |
| S6 JSONL append (01…ipynb:586 append_jsonl) | append one line per event | append-mode JSON-lines write |
| S7 CSV report with fixed header (02…ipynb cell-4-1 write_report_csv) | DictWriter fixed cols | select(fixed_cols).write.csv(header) |
| S8 TXT id list (03…ipynb cell-2-1) | one id per line | single-column text write / read |
| S10 ZIP bundle (07…ipynb cell-15 add_folder_to_zip) | records/ + index + reports/ deflated zip | driver-side deterministic packaging of the distributed outputs |
| S12 cleanup modes (01…ipynb cell-1-4 clean_previous_outputs) | replace/skip/abort | write-mode mapping overwrite/ignore/errorifexists |
| T4 tiered manifest writes (13…ipynb:1338 distribute_tiered_records) | per-tier folders sorted by score | partitionBy(tier) + per-partition sort |

At cluster scale these writes are the Iceberg-table appends described in
SURVEY §2.1; the parquet/CSV/text forms here are the sandbox-runnable
equivalents with the same atomicity contract (tmp + rename commit point).
"""

from __future__ import annotations

import os
import shutil
import uuid
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CLEANUP_MODES = {"replace": "overwrite", "skip": "ignore", "abort": "errorifexists"}


def write_report_csv(df: DataFrame, path: str, columns: list[str], mode: str = "replace") -> None:
    """Fixed-header CSV report (S7): exactly ``columns``, in order."""
    df.select(*columns).write.mode(CLEANUP_MODES[mode]).option("header", True).csv(path)


def write_ids_txt(df: DataFrame, id_col: str, path: str, mode: str = "replace") -> None:
    """One id per line (S8)."""
    df.select(F.col(id_col).cast("string").alias("value")).write.mode(
        CLEANUP_MODES[mode]
    ).text(path)


def read_ids_txt(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path).select(F.col("value").alias("id"))


def append_jsonl(df: DataFrame, path: str) -> None:
    """Append-only JSON-lines log (S6, manifest/errors semantics)."""
    df.write.mode("append").json(path)


def atomic_write_json(df: DataFrame, path: str) -> None:
    """Crash-safe directory write (S5): materialize to a tmp sibling, then
    swap via rename (path -> path.old, tmp -> path, delete path.old).

    Guarantees: committed data is never destroyed before its replacement is
    in place — after a crash at ANY point, the last committed output exists
    at ``path`` or at ``path.old``, and the next call RECOVERS path.old back
    to path before writing (so stale debris is never deleted while it is
    the only surviving copy).  Non-guarantee, stated honestly: a CONCURRENT
    reader can hit the instant between the two renames and see path absent —
    single-writer/serial-reader is the contract here; the frontier
    checkpoint's _COMMIT-marker protocol (frontier._write_state) is the
    no-gap variant readers key off, and is what the engine itself uses."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    old = f"{path}.old"
    if not os.path.exists(path) and os.path.exists(old):
        # crash landed between the two renames: path.old IS the last commit
        os.replace(old, path)
    df.write.mode("overwrite").json(tmp)
    if os.path.exists(old):  # superseded backup from a completed swap
        shutil.rmtree(old)
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def _add_folder_to_zip(z: zipfile.ZipFile, folder: str, arc_prefix: str) -> int:
    """All files under ``folder``, sorted by relative path (the reference's
    sorted(folder.rglob('*')) — deterministic member order), added under
    ``arc_prefix/``.  Returns the file count (07…ipynb cell-15)."""
    count = 0
    paths = []
    for root, _dirs, files in os.walk(folder):
        for name in files:
            full = os.path.join(root, name)
            paths.append((os.path.relpath(full, folder), full))
    for rel, full in sorted(paths):
        z.write(full, arcname=os.path.join(arc_prefix, rel))
        count += 1
    return count


def bundle_zip(
    out_zip: str,
    records_dir: str | None = None,
    index_file: str | None = None,
    reports_dir: str | None = None,
) -> dict:
    """Distributable ZIP bundle (S10; 07…ipynb cell-15): records/*.json +
    index/rdls_index.jsonl + reports/* packaged with ZIP_DEFLATED.

    Driver-side by design — packaging a deliverable is a single-machine
    post-step over already-written outputs, not a distributed transform; at
    cluster scale the inputs are the tiered/parquet sinks above, and this
    runs once on the driver (or a CI step) against their committed output.
    Written atomically (tmp + os.replace) so a crash never leaves a partial
    bundle at ``out_zip``.  Returns the reference's packaging report counts.
    """
    tmp = f"{out_zip}.tmp-{uuid.uuid4().hex[:8]}"
    records_count = reports_count = index_count = 0
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_DEFLATED) as z:
        if records_dir and os.path.isdir(records_dir):
            records_count = _add_folder_to_zip(z, records_dir, "records")
        if index_file and os.path.isfile(index_file):
            z.write(index_file, arcname="index/" + os.path.basename(index_file))
            index_count = 1
        if reports_dir and os.path.isdir(reports_dir):
            reports_count = _add_folder_to_zip(z, reports_dir, "reports")
    os.replace(tmp, out_zip)
    return {
        "records": records_count,
        "index": index_count,
        "reports": reports_count,
        "size_bytes": os.path.getsize(out_zip),
    }


def write_tiered(df: DataFrame, path: str, tier_col: str, order_col: str) -> None:
    """Tiered distribution (T4): one folder per tier, rows within each tier
    files sorted by score descending (13…ipynb:1338).  partitionBy gives the
    per-tier folders; sortWithinPartitions gives the in-file order without a
    global sort."""
    # Sort key leads with the partition column: the dynamic-partition writer
    # requires rows clustered by partition col and would otherwise inject its
    # own sort, destroying the score order.  (tier, score desc) satisfies the
    # writer's required ordering, so our order survives into the files.
    (
        df.repartition(F.col(tier_col))
        .sortWithinPartitions(F.col(tier_col), F.desc(order_col))
        .write.mode("overwrite")
        .partitionBy(tier_col)
        .parquet(path)
    )
