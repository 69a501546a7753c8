"""Compute the next driver window under the standing rotation rule.

STANDING ROTATION RULE (VERDICT r10 item 5, in force from round 13):
once the stale burn-down completes (no witness predates r4 after the
round-12 window), witness debt must not silently re-form.  The rule:

    the next round's 50-slot window is the 50 registered queries whose
    LATEST green driver witness is OLDEST, computed from the
    CORRECTNESS_r*.json ledger; ties (same latest-witness round) break
    by registry name, ascending.

This tool materializes the rule: it reads the CORRECTNESS_r*.json
ledger at the repo root, computes each registered query's latest
witness round, and prints the next ``_PRIORITY`` tuple (the 50-name
window, then the remaining stale tail oldest-first up to a
readability cap) ready to paste into
``osm_changesets_to_parquet_spark/queries/__init__.py``.
``tests/test_registry_integrity.py::test_window_follows_rotation_rule``
pins that the head of the committed _PRIORITY equals this tool's
choice, so the committed window can never drift from the rule.

HERMETICITY (VERDICT r11 item 1): the driver drops each round's
CORRECTNESS_r{N}.json *after* the builder's final commit, so an
untracked, newer-than-HEAD ledger is routinely present on disk.  If
the rule read every file blindly, the committed window would go stale
the moment the new ledger landed and the suite would turn red at
every round boundary by construction.  Therefore:

  * the rule's PRIMARY ledger is the set of git-TRACKED
    CORRECTNESS_r*.json files (what the window's author could see at
    commit time);
  * ``--check`` accepts the committed head if it matches the window
    computed from EITHER the tracked ledger OR the full on-disk
    ledger — i.e. the invariant is "committed window = rule at commit
    time OR rule at judge time".  Regenerating _PRIORITY when a new
    ledger is committed restores the two to coincidence.

Usage:  python tools/next_window.py [--window 50] [--tail 14]
                                    [--check] [--all-ledgers]

``--check`` exits nonzero if the committed _PRIORITY head matches
neither acceptable window (used by the test).  ``--all-ledgers``
prints the window from the full on-disk ledger instead of the
tracked one (what the NEXT commit's _PRIORITY should hold once the
new round's ledger is tracked).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_of(path: str) -> int | None:
    m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
    return int(m.group(1)) if m else None


def ledger_paths(tracked_only: bool) -> list[str]:
    """CORRECTNESS_r*.json paths — git-tracked by default, else all
    on disk (also the fallback when git is unavailable)."""
    if tracked_only:
        try:
            out = subprocess.run(
                ["git", "-C", REPO, "ls-files", "--", "CORRECTNESS_r*.json"],
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            paths = [
                os.path.join(REPO, line.strip())
                for line in out.splitlines()
                if line.strip()
            ]
            if paths:
                return sorted(paths)
        except (OSError, subprocess.CalledProcessError):
            pass  # no git — fall through to the on-disk ledger
    return sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))


def witness_history(paths: list[str]) -> dict[str, int]:
    """name -> latest round with a fully-green driver row (0 = never)."""
    latest: dict[str, int] = {}
    for path in paths:
        rnd = _round_of(path)
        if rnd is None:
            continue
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


def rule_window(names: list[str], paths: list[str], size: int) -> list[str]:
    latest = witness_history(paths)
    # oldest latest-witness first; never-witnessed (0) sorts oldest of
    # all (the debt rule should keep this empty, but the rule still
    # orders it correctly if debt re-forms); ties break by name.
    ordered = sorted(names, key=lambda n: (latest.get(n, 0), n))
    return ordered[:size]


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
    ap.add_argument("--all-ledgers", action="store_true")
    args = ap.parse_args()

    names = registry_names()

    if args.check:
        committed = committed_priority()[: args.window]
        tracked = rule_window(names, ledger_paths(tracked_only=True), args.window)
        ondisk = rule_window(names, ledger_paths(tracked_only=False), args.window)
        if committed == tracked or committed == ondisk:
            which = "tracked-ledger" if committed == tracked else "on-disk-ledger"
            print(
                f"OK: committed window matches the rotation rule "
                f"({args.window} names, {which})"
            )
            return 0
        print("MISMATCH: committed _PRIORITY head matches neither ledger window")
        for i, (a, b) in enumerate(zip(committed, tracked)):
            if a != b:
                print(f"  [{i}] committed={a!r} tracked-rule={b!r}")
        return 1

    paths = ledger_paths(tracked_only=not args.all_ledgers)
    latest = witness_history(paths)
    ordered = sorted(names, key=lambda n: (latest.get(n, 0), n))
    window = ordered[: args.window]
    tail = ordered[args.window : args.window + args.tail]

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
