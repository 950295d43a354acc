"""Certification ledger: when was each registry query last certified by
the DRIVER's correctness window (CORRECTNESS_r*.json)? Prints the
stalest-first ledger and a ready-to-paste rotation ordering for
__spark_entry__._ordered() — the tool behind the per-round rotation
policy (VERDICT r5 item 1).

    python tools/cert_ledger.py            # ledger + staleness summary
    python tools/cert_ledger.py --front N  # print the N-query front
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    last_round: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name, res in json.load(open(path)).items():
            # hash_match ONLY: every registry entry is oracled (r8), so the
            # old rows-only fallback just masked hash failures as
            # certifications (VERDICT r8 What's-wrong #3).
            ok = bool(res.get("hash_match"))
            if ok:
                last_round[name] = max(last_round.get(name, 0), rnd)
    latest = max(rounds) if rounds else 0

    import __spark_entry__ as entry

    registry = list(entry.queries())
    ledger = sorted(
        ((last_round.get(n, 0), n) for n in registry),
        key=lambda t: (t[0], t[1]),
    )
    never = [n for r, n in ledger if r == 0]
    stale = [n for r, n in ledger if 0 < r <= latest - 2]
    print(f"registry: {len(registry)} queries; driver rounds seen: {rounds}")
    print(f"never driver-certified: {len(never)}")
    for n in never:
        print(f"  r-  {n}")
    print(f"stale (≥2 rounds old): {len(stale)}")
    for r, n in ledger:
        if 0 < r <= latest - 2:
            print(f"  r{r}  {n}")
    if "--front" in sys.argv:
        k = int(sys.argv[sys.argv.index("--front") + 1])
        front = [n for _, n in ledger][:k]
        print(f"\n# stalest-first front ({k}):")
        for n in front:
            print(f'    "{n}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
