"""One-shot verification loop: the full oracle gate at ALL THREE scale
factors (the r9 tri-SF protocol — sf0.01-only passing is not predictive
for float-emitting queries), the test suite, the plan-audit lint, and
the rounding-protocol lint — everything the round's green-ness rests
on, with a single JSON summary line at the end.

    python tools/verify_all.py            # full loop (~45-60 min)
    python tools/verify_all.py --fast     # sf0.01 gate + lints only
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(name: str, cmd: list[str]) -> dict:
    t0 = time.time()
    p = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True, timeout=3600
    )
    tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
    ok = p.returncode == 0
    print(f"[{'PASS' if ok else 'FAIL'}] {name} ({time.time()-t0:.0f}s)")
    if not ok:
        print("\n".join(tail))
    return {"ok": ok, "seconds": round(time.time() - t0, 1), "tail": tail}


def main() -> int:
    fast = "--fast" in sys.argv
    results = {}
    results["gate_sf0.01"] = _run(
        "oracle gate sf0.01",
        [sys.executable, "tools/check_correctness.py", "/root/testdata/sf0.01"],
    )
    if not fast:
        results["gate_sf0.001"] = _run(
            "oracle gate sf0.001",
            [
                sys.executable,
                "tools/check_correctness.py",
                "/root/testdata/sf0.001",
            ],
        )
        results["gate_sf0.1"] = _run(
            "oracle gate sf0.1",
            [
                sys.executable,
                "tools/check_correctness.py",
                "/root/testdata/sf0.1",
            ],
        )
        results["pytest"] = _run(
            "pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]
        )
    results["plan_audit"] = _run(
        "plan audit", [sys.executable, "tools/plan_audit.py"]
    )
    results["round_lint"] = _run(
        "rounding-protocol lint", [sys.executable, "tools/round_lint.py"]
    )
    ok = all(r["ok"] for r in results.values())
    print(
        json.dumps(
            {
                "verified": ok,
                "steps": {k: v["ok"] for k, v in results.items()},
                "total_s": round(sum(v["seconds"] for v in results.values()), 1),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
