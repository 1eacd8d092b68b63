#!/usr/bin/env python
"""Opportunistic scaling-trial hunter for the shared-VM north-rule gate.

The host's concurrency ceiling (pure-CPU sha256 N vs 4N efficiency) drifts
between ~0.68 and ~0.91 on 30-60 min timescales; a job cannot out-scale
it.  This loop probes the ceiling every few minutes and, when a quiet
window appears, measures one BACK-TO-BACK pair (4N-core trial immediately
followed by an N-core trial) so both sides see the same window — pairing
controls the drift that makes independently-batched trials incomparable.
All probes and trials are appended to the JSONL log; nothing is discarded.

Usage: python tools/scaling_hunter.py [--min-ceiling 0.84] [--max-pairs 2]
         [--deadline-min 90] [--n 8] [--n-urls 800000] [--body-scale 64]
         [--log /tmp/scaling_pairs.jsonl]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import cpu_ceiling, run_level  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-ceiling", type=float, default=0.84)
    ap.add_argument("--max-pairs", type=int, default=2)
    ap.add_argument("--deadline-min", type=float, default=90)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n-urls", type=int, default=800_000)
    ap.add_argument("--body-scale", type=int, default=64)
    ap.add_argument("--probe-sleep", type=float, default=180)
    ap.add_argument("--log", default="/tmp/scaling_pairs.jsonl")
    args = ap.parse_args()

    def emit(rec: dict) -> None:
        rec["t"] = round(time.time(), 1)
        with open(args.log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    deadline = time.time() + args.deadline_min * 60
    pairs = 0
    while pairs < args.max_pairs and time.time() < deadline:
        c = cpu_ceiling(args.n)
        emit({"kind": "probe", "ceiling": c})
        if c["efficiency"] < args.min_ceiling:
            time.sleep(args.probe_sleep)
            continue
        large = run_level(args.n * 4, args.n_urls, args.body_scale)
        small = run_level(args.n, args.n_urls, args.body_scale)
        c2 = cpu_ceiling(args.n)
        eff = round(small["wall_sec"] / large["wall_sec"] / 4, 3)
        pairs += 1
        emit({
            "kind": "pair", "large": large, "small": small,
            "ceiling_before": c, "ceiling_after": c2,
            "speedup": round(small["wall_sec"] / large["wall_sec"], 3),
            "efficiency": eff,
        })
    emit({"kind": "done", "pairs": pairs})
    return 0


if __name__ == "__main__":
    sys.exit(main())
