"""Compute the next driver window under the standing rotation rule.

STANDING ROTATION RULE (VERDICT r10 item 5, in force from round 13):
once the stale burn-down completes (no witness predates r4 after the
round-12 window), witness debt must not silently re-form.  The rule:

    the next round's 50-slot window is the 50 registered queries whose
    LATEST green driver witness is OLDEST, computed from the
    CORRECTNESS_r*.json ledger; ties (same latest-witness round) break
    by registry name, ascending.

This tool materializes the rule: it reads every CORRECTNESS_r*.json at
the repo root, computes each registered query's latest witness round,
and prints the next ``_PRIORITY`` tuple (the 50-name window, then the
remaining stale tail oldest-first up to a readability cap) ready to
paste into ``osm_changesets_to_parquet_spark/queries/__init__.py``.
``tests/test_registry.py`` pins that the head of the committed
_PRIORITY equals this tool's choice, so the committed window can never
drift from the rule.

Usage:  python tools/next_window.py [--window 50] [--tail 14] [--check]

``--check`` exits nonzero if the committed _PRIORITY head differs from
the rule's choice (used by the test).

During the burn-down (rounds 11-12) the reserved windows coincide with
the rule's output by construction — the reserve was laid out
oldest-witnessed-first — so the tool is valid from round 11 onward.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def witness_history() -> dict[str, int]:
    """name -> latest round with a fully-green driver row (0 = never)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and row.get("err") is None
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    from osm_changesets_to_parquet_spark import queries as q

    q.load_all_modules()
    return list(q.REGISTRY)


def committed_priority() -> list[str]:
    src = open(
        os.path.join(
            REPO, "osm_changesets_to_parquet_spark", "queries", "__init__.py"
        )
    ).read()
    m = re.search(r"_PRIORITY: tuple\[str, \.\.\.\] = \((.*?)\n\)", src, re.S)
    return re.findall(r'"([^"]+)"', m.group(1))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--tail", type=int, default=14)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    latest = witness_history()
    names = registry_names()
    # oldest latest-witness first; never-witnessed (0) sorts oldest of
    # all (the debt rule should keep this empty, but the rule still
    # orders it correctly if debt re-forms); ties break by name.
    ordered = sorted(names, key=lambda n: (latest.get(n, 0), n))
    window = ordered[: args.window]
    tail = ordered[args.window : args.window + args.tail]

    if args.check:
        committed = committed_priority()[: args.window]
        if committed != window:
            print("MISMATCH: committed _PRIORITY head != rotation-rule window")
            for i, (a, b) in enumerate(zip(committed, window)):
                if a != b:
                    print(f"  [{i}] committed={a!r} rule={b!r}")
            return 1
        print(f"OK: committed window matches the rotation rule ({args.window} names)")
        return 0

    print("_PRIORITY: tuple[str, ...] = (")
    print(f"    # ---- window ({args.window}): oldest-witnessed-first ----")
    for n in window:
        print(f'    "{n}",')
    if tail:
        print(f"    # ---- next-oldest tail ({len(tail)}) ----")
        for n in tail:
            print(f'    "{n}",')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
