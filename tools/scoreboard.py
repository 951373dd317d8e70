#!/usr/bin/env python
"""Single source of truth for the scoreboard counts (VERDICT r6 nit #4).

README.md / COVERAGE.md quote a registered-query count; round 6 shipped
with 231 in prose while the registry held 232.  This tool rewrites every
`N registered queries` occurrence from `len(queries_registry.QUERIES)`,
and tests/test_registry_contract.py asserts the quoted number matches —
so the count can drift in exactly zero directions.

Usage: python tools/scoreboard.py        # rewrite in place, print counts
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = ["README.md", "COVERAGE.md"]


def counts() -> dict[str, int]:
    from eventstreamd_spark import queries_registry as qr

    return {
        "queries": len(qr.QUERIES),
        "oracles": len(qr.ORACLES),
        "benched": len(qr.QUERIES) - 1,  # registry_digest excluded by design
    }


def sidecar_sync() -> list[str]:
    """Round-close checklist (round-8, VERDICT ask #3): the evidence a
    judge relies on must be IN HISTORY, not the working tree — round 7
    closed with BENCH_r07/CORRECTNESS_r07 untracked and two sidecars
    dirty despite a commit titled 'Sync the sidecar'.  Returns the
    evidence files git still sees as untracked/modified."""
    import subprocess

    out = subprocess.run(
        ["git", "status", "--porcelain"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout
    evidence = re.compile(
        r"(BENCH(_DETAIL)?_r\d+\.json|CORRECTNESS_r\d+\.json|"
        r"LEAKCHECK\.json|COPYCHECK\.json|BENCH_DETAIL\.json|"
        r"tools/(BENCH_FRESH|SCALE_PROBE|SF1_PASS|SF10_PROBE)\.json)$"
    )
    dirty = []
    for line in out.splitlines():
        path = line[3:].strip()
        if evidence.search(path):
            dirty.append(f"{line[:2].strip() or '??'} {path}")
    return dirty


def main() -> None:
    c = counts()
    # CURRENT-count phrasings only — a blanket `\d+ registered queries`
    # rewrite corrupted three HISTORICAL statements in round 7 (the
    # round-3/4 delta endpoints and the "first 50" driver window); the
    # patterns must anchor on words that only current-state sentences use
    pats = [
        (re.compile(r"all \d+ registered queries pass"),
         f"all {c['queries']} registered queries pass"),
        (re.compile(r"\*\*\d+ registered queries\*\*"),
         f"**{c['queries']} registered queries**"),
        (re.compile(r"\(\d+ queries, ALL"), f"({c['queries']} queries, ALL"),
    ]
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        text = open(path).read()
        new = text
        for pat, repl in pats:
            new = pat.sub(repl, new)
        if new != text:
            open(path, "w").write(new)
            print(f"updated {doc}")
    print(c)
    dirty = sidecar_sync()
    if dirty:
        print("UNSYNCED EVIDENCE SIDECARS (commit these before round close):")
        for d in dirty:
            print(f"  {d}")
        sys.exit(1)
    print("evidence sidecars: all committed")


if __name__ == "__main__":
    main()
