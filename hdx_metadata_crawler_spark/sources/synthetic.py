"""Deterministic synthetic crawl universe — no network, no external data.

Mirrors the reference's crawl inputs (FIXTURES.md F2/F3): a CKAN-like catalog
of dataset records behind URLs, with the reference's observed failure
behavior (≈0.2% permanent errors like errors_datasets.jsonl's 60/26,246;
retryable 429/5xx a la ``01…ipynb:403-470``), plus host skew (≥70% of URLs on
one hot host — the hdx.humdata.org hotspot the north rule calls out).

Everything is a pure function of the url/id — the Spark fetch stage (pandas
UDF) and the pure-Python NB01 simulator call the SAME resolver, so parity
tests compare two *executions*, not two copies of the data.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

HOT_HOST = "hdx.humdata.org"
MIRROR_HOSTS = ("mirror-a.example.org", "mirror-b.example.org", "cdn.example.net")

# Failure model (deterministic in url): ~0.2% permanent, ~2% transient
# (succeed on retry attempt >= needed_attempts).
PERMANENT_FAIL_MOD = 499  # h % 499 == 0  → ~0.2%
# discovered-URL id namespace: far above any seed count so discovered ids
# can never collide with seeds (see fetch())
DISCOVERED_BASE = 10**9
TRANSIENT_FAIL_MOD = 47  # h % 47 == 0   → ~2%, succeeds at attempt 2

_VOCAB = (
    "flood hazard earthquake exposure vulnerability loss population building "
    "infrastructure risk assessment return period rainfall cyclone drought "
    "landslide tsunami admin boundary census survey damage"
).split()


def _h(s: str) -> int:
    """Stable 64-bit integer hash (shared by simulator and Spark UDF)."""
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def dataset_id_for(seq: int) -> str:
    """Deterministic uuid-ish dataset id, sorted order == seq order."""
    return f"{seq:08d}-{_h(str(seq)) % 10**12:012d}"


def seed_url(seq: int) -> str:
    """Seed URL for dataset #seq; ≥70% on the hot host (skew by design)."""
    ds = dataset_id_for(seq)
    if seq % 10 < 7:
        return f"https://{HOT_HOST}/dataset/{ds}/download_metadata?format=json"
    host = MIRROR_HOSTS[seq % len(MIRROR_HOSTS)]
    return f"https://{host}/hdx/{ds}/metadata.json"


def seed_urls(n: int) -> list[str]:
    return [seed_url(i) for i in range(n)]


@dataclass
class FetchResult:
    status: str  # 'ok' | 'retry' | 'error'
    dataset_id: str
    title: str
    notes: str
    tags: list[str]
    resources: list[tuple[str, str]]  # (name, download_url)
    discovered: list[str]  # new frontier URLs


def metadata_body(ds: str, scale: int | None = None) -> str:
    """Deterministic CKAN-style JSON metadata body for dataset ``ds`` — the
    synthetic stand-in for the HTTP response of
    ``…/download_metadata?format=json``.  Real HDX metadata JSONs run
    10-200 KB (`hdx_dataset_metadata_dump/`: 5 GB / 26,246 records ≈ 190 KB
    average, docs/ARCHITECTURE.md:456); ``scale`` multiplies the filler
    sections (~7 KB at scale=1, ~50 KB at scale=8).  Tests default to
    scale=1 for speed; the benchmark sets SPARK_GRAFT_BODY_SCALE for a
    representative parse cost.  The fields the crawler extracts
    (title/notes/tags/resources) do NOT depend on scale."""
    if scale is None:
        scale = int(os.environ.get("SPARK_GRAFT_BODY_SCALE", "1"))
    r = _h(ds)
    title = " ".join(_VOCAB[(r >> (4 * i)) % len(_VOCAB)] for i in range(4))
    notes = " ".join(_VOCAB[(r >> (3 * i)) % len(_VOCAB)] for i in range(12))
    tags = sorted({_VOCAB[(r >> (5 * i)) % len(_VOCAB)] for i in range(3)})
    n_res = 1 + r % 3
    filler = " ".join(_VOCAB[(r >> (2 * i)) % len(_VOCAB)] for i in range(64))
    long_desc = " ".join(
        _VOCAB[(r >> ((i % 29) + (i // 29))) % len(_VOCAB)]
        for i in range(320 * scale)
    )
    doc = {
        "id": ds,
        "name": f"ds-{ds[:8]}",
        "title": title,
        "notes": notes,
        "dataset_source": "synthetic",
        "license_title": "Creative Commons Attribution",
        "license_id": "cc-by",
        "dataset_date": "[2020-01-01T00:00:00 TO 2024-12-31T23:59:59]",
        "metadata_created": "2024-01-01T00:00:00",
        "metadata_modified": "2024-06-01T00:00:00",
        "data_update_frequency": "365",
        "methodology": "Other",
        "methodology_other": filler,
        "caveats": filler[:120],
        "organization": {
            "id": ds[::-1],
            "title": f"Org {ds[:6]}",
            "description": long_desc[:400],
        },
        "groups": [{"name": _VOCAB[(r >> i) % len(_VOCAB)]} for i in range(4)],
        "tags": [{"name": t, "vocabulary_id": None} for t in tags],
        "resources": [
            {
                "id": f"{ds}-{i}",
                "name": f"resource_{i}",
                "format": "CSV",
                "url": f"https://{HOT_HOST}/dataset/{ds}/resource/{i}/download/data_{i}.csv",
                "description": long_desc[:300],
                "created": "2024-01-01T00:00:00",
                "last_modified": "2024-06-01T00:00:00",
                "size": r % 10**9,
                "mimetype": "text/csv",
                "hash": ds,
                "position": i,
                "state": "active",
            }
            for i in range(n_res)
        ],
        "extras": [
            {"key": f"field_{i}", "value": long_desc[i * 12 : (i + 1) * 12]}
            for i in range(24 * scale)
        ],
        "description_long": long_desc,
    }
    return json.dumps(doc)


def fetch(url: str, attempt: int) -> FetchResult:
    """Deterministic synthetic fetch — the stand-in for
    ``HDXClient.get_json`` + ``download_dataset_metadata``
    (01…ipynb:355-470, :673-736).  status='retry' models 429/5xx (succeeds
    once attempt reaches 2); status='error' models the permanent 0.2%.
    A successful fetch pays the realistic per-document cost: synthesize the
    ~10 KB JSON body, ``json.loads`` it (= response decode), and extract
    the crawler's fields from the parsed document."""
    h = _h(url)
    ds = url.split("/dataset/")[-1].split("/")[0] if "/dataset/" in url else \
        url.split("/hdx/")[-1].split("/")[0]
    # A URL outside the synthetic universe (callers may seed arbitrary
    # lists) must come back as a normal permanent error, not a ValueError
    # that kills the whole fetch task mid-crawl.
    try:
        seq = int(ds.split("-")[0])
    except ValueError:
        return FetchResult("error", ds, "", "", [], [], [])
    empty = FetchResult("error", ds, "", "", [], [], [])
    if h % PERMANENT_FAIL_MOD == 0:
        return empty
    if h % TRANSIENT_FAIL_MOD == 0 and attempt < 2:
        return FetchResult("retry", ds, "", "", [], [], [])
    doc = json.loads(metadata_body(ds))
    title = doc["title"]
    notes = doc["notes"]
    tags = [t["name"] for t in doc["tags"]]
    resources = [(res["name"], res["url"]) for res in doc["resources"]]
    # Frontier expansion: every 10th SEED dataset links 2 related datasets.
    # Discovered ids live at DISCOVERED_BASE + 2*seq and do not re-expand,
    # so the frontier is bounded: n_seeds * 1.2.  The base sits far above
    # any realistic seed count — round 3 moved it from 100000, where a
    # >=100k-seed run made discovered ids BYTE-IDENTICAL to later seeds
    # (frontier dedup then silently dropped one copy and the bounded-
    # frontier invariant went quietly wrong).
    discovered = []
    if seq % 10 == 0 and seq < DISCOVERED_BASE:
        discovered = [
            seed_url(DISCOVERED_BASE + seq * 2),
            seed_url(DISCOVERED_BASE + seq * 2 + 1),
        ]
    return FetchResult("ok", ds, title, notes, tags, resources, discovered)


def spans_for(res: FetchResult) -> list[tuple[str, str, str, int]]:
    """Interleaved text+media span sequence for a fetched record — the
    per-row invariant vs the reference (BASELINE.json input_hint): spans
    ordered title, tags, then per resource (name text-span, media span),
    then notes.  Returns (kind, text, media_ref, offset)."""
    spans: list[tuple[str, str, str, int]] = []
    off = 0

    def add(kind: str, text: str, media: str):
        nonlocal off
        spans.append((kind, text, media, off))
        off += 1

    add("text", res.title, "")
    for t in res.tags:
        add("text", t, "")
    for name, url in res.resources:
        add("text", name, "")
        add("media", "", url)
    add("text", res.notes, "")
    return spans
