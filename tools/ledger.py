"""Cumulative driver-correctness ledger — makes the rotation program's
"every registry entry has a driver-green row" claim machine-checkable.

Reads every committed CORRECTNESS_r{N}.json, canonicalizes the priority
aliases (a{NN}_name -> name), and reports, per current registry entry,
the latest round with a fully-green row (rows+schema+hash matched, no
error).  Exit is nonzero if any CURRENT registry entry has no green row
and is not in the current priority window (i.e. debt the next window
does not already cover).

Usage: python tools/ledger.py [--json PATH]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for key, row in data.items():
            name = re.sub(r"^a\d{2}_", "", key)
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if ok and rnd > latest.get(name, 0):
                latest[name] = rnd
    return latest


def main() -> None:
    from __spark_entry__ import PRIORITY
    from sensql_presto_spark.queries import all_specs

    latest = green_rounds()
    registry = sorted(all_specs())
    window = set(PRIORITY)

    never = [n for n in registry if n not in latest]
    uncovered_debt = [n for n in never if n not in window]
    by_round: dict[int, int] = {}
    for n in registry:
        by_round[latest.get(n, 0)] = by_round.get(latest.get(n, 0), 0) + 1

    print(f"registry entries: {len(registry)}")
    print(f"driver-green ever: {len(registry) - len(never)}")
    print("latest-green-round histogram (0 = never):")
    for rnd in sorted(by_round):
        print(f"  r{rnd}: {by_round[rnd]}")
    if never:
        print(f"never-green ({len(never)}): {' '.join(never)}")
        covered = [n for n in never if n in window]
        if covered:
            print(f"  of which in the current priority window: {len(covered)}")
    if uncovered_debt:
        print(f"UNCOVERED DEBT ({len(uncovered_debt)}): {' '.join(uncovered_debt)}")

    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            json.dump(
                {
                    "registry_size": len(registry),
                    "green_ever": len(registry) - len(never),
                    "latest_green_round": {n: latest.get(n, 0) for n in registry},
                    "never_green": never,
                    "uncovered_debt": uncovered_debt,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {path}")
    sys.exit(1 if uncovered_debt else 0)


if __name__ == "__main__":
    main()
