#!/usr/bin/env python
"""Compute the next driver-window rotation from the CORRECTNESS_r*.json
evidence files — the per-round staging step the registry comments
prescribe ("recompute exactly from CORRECTNESS_r*.json as always"),
institutionalized like tools/touched_oracle.py so no round re-derives
it ad hoc.

Prints: latest-evidence distribution per round, the oldest staleness
tail (the ids the next window must draw from, oldest round first),
never-sampled registered ids (which MUST be staged), and how many new
operators the non-strict oldest-tail ratchet leaves room for. Pass
``--staged-for N`` to preview the tail as of a future round (folds
evidence with round < N only, mirroring tests/test_registry_window.py).

Usage:
    python tools/next_window.py [--staged-for N]
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WINDOW = 50


def latest_evidence(staged_for: int | None) -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        if staged_for is not None and rnd >= staged_for:
            continue
        for qid in json.loads(f.read_text()):
            latest[qid] = max(latest.get(qid, 0), rnd)
    return latest


def main(argv: list[str]) -> int:
    if "--help" in argv or "-h" in argv:
        print(__doc__)
        return 0
    staged_for = None
    if "--staged-for" in argv:
        staged_for = int(argv[argv.index("--staged-for") + 1])

    from cdc_sync_poc_spark.registry import (
        DRIVER_WINDOW,
        QUERIES,
        WINDOW_STAGED_FOR,
        load_all_queries,
    )

    load_all_queries()
    latest = latest_evidence(staged_for)

    by_round: dict[int, list[str]] = {}
    for q, r in latest.items():
        by_round.setdefault(r, []).append(q)
    print(f"registered queries: {len(QUERIES)}")
    print(f"current WINDOW_STAGED_FOR: {WINDOW_STAGED_FOR}")
    for r in sorted(by_round):
        print(f"  r{r:>2}: {len(by_round[r])} ids")

    never = sorted(q for q in QUERIES if q not in latest)
    if never:
        print(f"never-sampled (MUST be staged): {never}")

    # oldest tail, oldest round first, name-sorted within a round —
    # the candidate pool for the next window; the non-strict ratchet
    # (max(in) <= min(out)) allows splitting the newest round IN the
    # tail, so when the pool OVERFLOWS the window (the id just past the
    # cut shares the cut's newest round) new operators may displace
    # that round's ids; with no overflow, displacement would evict a
    # strictly-older must-stay id and fail tests/test_registry_window.py
    pool = sorted(latest, key=lambda q: (latest[q], q))
    cut = pool[:WINDOW]
    overflows = len(pool) > WINDOW and latest[pool[WINDOW]] == latest[cut[-1]]
    if overflows:
        newest = latest[cut[-1]]
        strictly_older = [q for q in cut if latest[q] < newest]
        headroom = WINDOW - len(strictly_older) - len(never)
        print(
            f"tail cut round r{newest} is splittable: "
            f"{len(strictly_older)} strictly-older ids must stay, "
            f"headroom for new ops this round: up to {headroom} "
            f"(each displaces one r{newest} id to the next tail)"
        )
    else:
        print(
            "no splittable overflow: headroom "
            f"{max(0, WINDOW - len(cut) - len(never))} without "
            "displacing anything"
        )
    print(f"oldest-{WINDOW} tail (round, id):")
    for q in cut:
        mark = " *in-current-window" if q in DRIVER_WINDOW else ""
        print(f"  r{latest[q]:>2} {q}{mark}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
