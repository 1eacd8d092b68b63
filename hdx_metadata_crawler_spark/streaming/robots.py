"""robots.txt-aware fetch budgeting (north rule).

The synthetic crawl universe serves a deterministic robots.txt per host
(no network, pure function of the host name, like sources/synthetic.py);
BOTH the Spark engine and the pure-Python oracle simulator parse it with the
same ``parse_robots`` below, so parity tests compare two executions of one
policy, not two policies:

- ``Disallow`` prefixes: matching URLs are never fetched — they route to
  crawl_errors('robots_disallowed') and into the seen set so they cannot
  requeue (the engine-level analogue of HDXClient refusing bot-blocked
  pages, 01…ipynb:385,450).
- ``Crawl-delay``: overrides the per-host request rate in the politeness
  schedule (rps_host = 1 / delay), replacing the global
  ``requests_per_second`` config (01…ipynb:111) for that host.

Spark-side the policy is a broadcast of two tiny structures: host ->
[disallow prefixes] (checked with ``exists(prefixes, p -> startswith)``
after a broadcast join on host — zero shuffle) and host -> rps (a literal
map in the slot expression).
"""

from __future__ import annotations

from ..sources.synthetic import HOT_HOST, MIRROR_HOSTS


def robots_txt(host: str) -> str:
    """Deterministic synthetic robots.txt body for a host."""
    if host == HOT_HOST:
        # The hot host throttles harder and fences off a prefix range.
        return (
            "User-agent: *\n"
            "Disallow: /dataset/0000001\n"
            "Crawl-delay: 0.5\n"
        )
    if host in MIRROR_HOSTS[:2]:
        return "User-agent: *\nCrawl-delay: 1\n"
    return "User-agent: *\nCrawl-delay: 0.25\n"


def parse_robots(text: str) -> tuple[list[str], float | None]:
    """Minimal robots parser: ('User-agent: *' section) -> (disallow
    prefixes, crawl delay seconds)."""
    prefixes: list[str] = []
    delay: float | None = None
    active = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = (s.strip() for s in line.split(":", 1))
        field = field.lower()
        if field == "user-agent":
            active = value == "*"
        elif active and field == "disallow" and value:
            prefixes.append(value)
        elif active and field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return prefixes, delay


def policy_for_hosts(hosts: list[str], default_rps: float) -> dict[str, tuple[list[str], float]]:
    """host -> (disallow prefixes, effective rps)."""
    out: dict[str, tuple[list[str], float]] = {}
    for h in hosts:
        prefixes, delay = parse_robots(robots_txt(h))
        rps = 1.0 / delay if delay and delay > 0 else default_rps
        out[h] = (prefixes, rps)
    return out


def policy_table(default_rps: float) -> tuple[
    list[tuple[str, list[str], float]], tuple[list[str], float]
]:
    """The robots policy as a DIM TABLE: explicit rows for the hosts whose
    robots.txt differs from the default, plus the default policy applied to
    any host absent from the table.

    This is what the crawl round loop broadcast-joins against (host equi-key,
    zero shuffle of the page side) — replacing the round-2 per-round
    ``page.select('host').distinct().collect()``, the last driver-side
    data-derived collect in the loop.  At 10^10-URL scale the table is the
    materialized robots cache (one row per crawled host, refreshed out of
    band); here it is derived from the same ``robots_txt`` function the
    pure-Python oracle simulator parses, so parity still compares two
    executions of ONE policy.
    """
    known = sorted({HOT_HOST, *MIRROR_HOSTS})
    rows = []
    for h in known:
        prefixes, delay = parse_robots(robots_txt(h))
        rps = 1.0 / delay if delay and delay > 0 else default_rps
        rows.append((h, prefixes, rps))
    d_prefixes, d_delay = parse_robots(robots_txt("__unlisted-host__"))
    d_rps = 1.0 / d_delay if d_delay and d_delay > 0 else default_rps
    return rows, (d_prefixes, d_rps)


def url_path(url: str) -> str:
    """Path component of an http(s) URL (no query/fragment)."""
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    path = rest[slash:] if slash >= 0 else "/"
    for sep in ("?", "#"):
        cut = path.find(sep)
        if cut >= 0:
            path = path[:cut]
    return path


def is_disallowed(url: str, prefixes: list[str]) -> bool:
    p = url_path(url)
    return any(p.startswith(pref) for pref in prefixes)
