"""Cumulative driver-correctness ledger — makes the rotation program's
"every registry entry has a driver-green row" claim machine-checkable.

Reads every committed CORRECTNESS_r{N}.json, canonicalizes the priority
aliases (a{NN}_name -> name), and reports, per current registry entry,
the latest round with a fully-green row (rows+schema+hash matched, no
error).  Exit is nonzero if any CURRENT registry entry has no green row
and is not in the current priority window (i.e. debt the next window
does not already cover), OR — the staleness gate, r8 VERDICT ask #7 —
if any entry's latest green row is older than STALE_ROUNDS rounds
behind the newest committed CORRECTNESS round and the entry is not in
the current window (i.e. the rotation discipline has lapsed on it).

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

# An entry whose latest green row trails the newest CORRECTNESS round by
# more than this many rounds is stale debt unless the current window
# already covers it.  6 = the spread the rotation program tolerated
# historically (r1-era rows flagged in the r8 verdict were 7 behind).
STALE_ROUNDS = 6


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
    newest_round = max(latest.values(), default=0)
    stale_debt = [
        n
        for n in registry
        if n in latest
        and latest[n] < newest_round - STALE_ROUNDS
        and n not in window
    ]
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
    if stale_debt:
        print(
            f"STALE DEBT (latest green < r{newest_round - STALE_ROUNDS}, "
            f"not in window; {len(stale_debt)}): {' '.join(stale_debt)}"
        )

    if "--json" in sys.argv:
        i = sys.argv.index("--json")
        if i + 1 >= len(sys.argv):
            sys.exit("--json requires a file path argument")
        path = sys.argv[i + 1]
        with open(path, "w") as f:
            json.dump(
                {
                    "registry_size": len(registry),
                    "green_ever": len(registry) - len(never),
                    "latest_green_round": {n: latest.get(n, 0) for n in registry},
                    "never_green": never,
                    "uncovered_debt": uncovered_debt,
                    "stale_debt": stale_debt,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {path}")
    sys.exit(1 if (uncovered_debt or stale_debt) else 0)


if __name__ == "__main__":
    main()
