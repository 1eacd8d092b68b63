"""Pure-Python reference simulator of the NB01 crawl semantics.

This is the ORACLE for the Spark frontier engine (SURVEY §5 'crawl-semantics
parity'): it re-states the reference's behavior — deterministic id-asc page
order (``01…ipynb:635 sort="id asc"``, 500 rows/page ``:110``), skip-existing
seen set (``:786``), retry budget with max_retries (``:403-470``), per-host
politeness slots at requests_per_second (``:390``) — as a few dozen lines of
obviously-correct single-threaded Python.  The Spark engine must reproduce
its crawl ordering, final seen set, manifest, and error list EXACTLY.

Crawl-order contract (SURVEY §7.4 risk 1): within a round, fetched-ok docs
are ordered by (priority, canon_url); rounds concatenate.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

from ..sources import synthetic
from . import robots


def _dataset_id_of(url: str) -> str:
    return (
        url.split("/dataset/")[-1].split("/")[0]
        if "/dataset/" in url
        else url.split("/hdx/")[-1].split("/")[0]
    )


def canon(url: str) -> str:
    """Canonical form for seen-set identity (synthetic URLs are already
    canonical; kept as a hook so both sides share one definition)."""
    return url.strip()


def politeness_slots(
    page: list[tuple[int, str]],
    rps: float,
    n_salts: int,
    host_rps: dict[str, float] | None = None,
) -> dict[str, int]:
    """canon_url → time_slot, the salted two-phase schedule (the exact
    definition of ``frontier.politeness_slots``): per (host, crc32(url) %
    n_salts) sub-queue local rank, interleaved ``local*n_salts + salt``,
    slot = floor(global_seq / rps_host).  zlib.crc32 == Spark's crc32;
    host_rps carries robots Crawl-delay overrides."""
    by_queue: dict[tuple[str, int], list[tuple[int, str]]] = {}
    for prio, cu in page:
        host = cu.split("/")[2]
        salt = zlib.crc32(cu.encode("utf-8")) % n_salts
        by_queue.setdefault((host, salt), []).append((prio, cu))
    slots: dict[str, int] = {}
    for (host, salt), entries in by_queue.items():
        r = (host_rps or {}).get(host, rps)
        for local, (_prio, cu) in enumerate(sorted(entries)):
            slots[cu] = int((local * n_salts + salt) // r)
    return slots


@dataclass
class SimState:
    manifest: list[dict] = field(default_factory=list)  # crawl order, ok docs
    errors: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    spans: dict[str, list[tuple]] = field(default_factory=dict)
    rounds: int = 0


def run_crawl(
    seeds: list[str],
    page_size: int = 500,
    rps: float = 2.0,
    max_retries: int = 6,
    max_rounds: int = 100,
    politeness_salts: int = 8,
    respect_robots: bool = True,
) -> SimState:
    st = SimState()
    # frontier: canon_url -> (priority, depth, attempt)
    frontier: dict[str, tuple[int, int, int]] = {
        canon(u): (0, 0, 0) for u in seeds
    }
    for rnd in range(max_rounds):
        candidates = sorted(
            ((prio, cu) for cu, (prio, _d, _a) in frontier.items() if cu not in st.seen)
        )
        if not candidates:
            break
        st.rounds += 1
        page = candidates[:page_size]
        # robots budgeting: Disallow → errors + seen (never fetched);
        # Crawl-delay → per-host rps override (same policy module as Spark)
        host_rps: dict[str, float] | None = None
        allowed = page
        if respect_robots:
            hosts = sorted({cu.split("/")[2] for _p, cu in page})
            policy = robots.policy_for_hosts(hosts, rps)
            host_rps = {h: r for h, (_pf, r) in policy.items()}
            allowed = []
            for prio, cu in page:
                prefixes = policy[cu.split("/")[2]][0]
                if robots.is_disallowed(cu, prefixes):
                    frontier.pop(cu)
                    st.seen.add(cu)
                    st.errors.append(
                        {"round": rnd, "canon_url": cu,
                         "dataset_id": _dataset_id_of(cu),
                         "error": "robots_disallowed"}
                    )
                else:
                    allowed.append((prio, cu))
        # politeness bookkeeping: salted per-host sub-queues → time slot
        slots = politeness_slots(allowed, rps, politeness_salts, host_rps)
        for prio, cu in allowed:
            _prio, depth, attempt = frontier.pop(cu)
            host = cu.split("/")[2]
            slot = slots[cu]
            res = synthetic.fetch(cu, attempt)
            if res.status == "ok":
                st.seen.add(cu)
                st.manifest.append(
                    {
                        "round": rnd,
                        "canon_url": cu,
                        "dataset_id": res.dataset_id,
                        "title": res.title,
                        "host": host,
                        "time_slot": slot,
                        "attempt": attempt,
                    }
                )
                st.spans[res.dataset_id] = synthetic.spans_for(res)
                for d in res.discovered:
                    dc = canon(d)
                    if dc not in st.seen and dc not in frontier:
                        frontier[dc] = (depth + 1, depth + 1, 0)
            elif res.status == "retry":
                if attempt + 1 > max_retries:
                    st.seen.add(cu)
                    st.errors.append(
                        {"round": rnd, "canon_url": cu, "dataset_id": res.dataset_id,
                         "error": "max_retries_exceeded"}
                    )
                else:
                    frontier[cu] = (prio, depth, attempt + 1)
            else:  # permanent error
                st.seen.add(cu)
                st.errors.append(
                    {"round": rnd, "canon_url": cu, "dataset_id": res.dataset_id,
                     "error": "permanent_fetch_error"}
                )
    return st
