"""External-evidence ledger (VERDICT r11 #8): derive, from the
CORRECTNESS_r*.json driver records themselves, when each registry entry
was last externally hash-verified — so window-rotation claims in
queries.py / test_entry_contract.py are COMPUTED, not hand-maintained
(the r10 stale-claim bug class).

The driver checks the first 50 registry entries each round and writes
one CORRECTNESS_r{N}.json with per-entry rows/schema/hash verdicts.
This tool folds those files into {entry: latest GREEN round} and prints
the current registry sorted stalest-first.

Usage:
    python tools/evidence_ledger.py            # table, stalest first
    python tools/evidence_ledger.py --json     # machine-readable
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_evidence(repo: str = REPO) -> dict[str, int | None]:
    """{entry: latest round whose driver record was green for it} over
    the CURRENT registry (entries never externally checked map to
    None). Green = hash_match when an oracle comparison ran, else the
    rows-only check (the driver records hash_match=None there)."""
    sys.path.insert(0, repo)
    import __spark_entry__ as e  # noqa: PLC0415

    current = list(e.queries())
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        with open(path) as f:
            rec = json.load(f)
        for name, row in rec.items():
            if not isinstance(row, dict):
                continue
            # Positive evidence required (ADVICE r12): an empty or
            # truncated per-entry dict (driver crash mid-write) must NOT
            # count as a green external check. hash_match=None is the
            # driver's documented rows-only mode, so it stays admissible
            # only when rows+schema affirmatively matched.
            green = (
                row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") in (True, None)
            )
            if green:
                seen[name] = max(seen.get(name, 0), rnd)
    return {name: seen.get(name) for name in current}


def main() -> None:
    led = latest_evidence()
    rows = sorted(led.items(), key=lambda kv: (kv[1] or 0, kv[0]))
    if "--json" in sys.argv:
        print(json.dumps(led))
        return
    for name, rnd in rows:
        print(f"{'NEVER' if rnd is None else f'r{rnd:02d}':>6}  {name}")
    ages = [r for r in led.values() if r is not None]
    print(
        f"-- {len(led)} entries; never-checked: "
        f"{sum(1 for r in led.values() if r is None)}; "
        f"oldest evidence: r{min(ages) if ages else 0}"
    )


if __name__ == "__main__":
    main()
