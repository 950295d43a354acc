"""Per-micro-batch attribution for the streaming drains (VERDICT r14 #3).

Runs each streaming registry drain once at $SPARK_GRAFT_SF_DIR and dumps
every micro-batch's ``StreamingQueryProgress.durationMs`` breakdown
(addBatch / getBatch / latestOffset / queryPlanning / walCommit /
commitOffsets / triggerExecution) plus stateOperators commit times, so
the drain wall decomposes into state-store commit vs planning vs task
launch vs sink. The registry builders stop their own query handles, so
progress is captured by hooking ``StreamingQuery.stop`` — profiling
only, never on a product path. Prints one JSON object to stdout.

Usage: python tools/profile_streaming.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ranger_spark.queries import load_all  # noqa: E402
from ranger_spark.session import get_spark  # noqa: E402

DRAINS = [
    "stream_windowed_daily",
    "stream_session_windows",
    "stream_dedup_keys",
    "stream_stream_join",
    "stream_stateful_user_stats",
    "stream_corpus_gate",
    "stream_tws_session_flush",
]

_CAPTURED: dict[tuple, dict] = {}
_HANDLES: list = []


def _install_progress_hook() -> None:
    """Record every started query handle; progress is harvested AFTER the
    builder returns (an availableNow drain terminates on its own, so the
    builders' ``if q.isActive: q.stop()`` never fires a stop-time hook —
    the r15 first cut patched stop and captured nothing)."""
    import pyspark.sql.streaming.readwriter as rw

    orig_start = rw.DataStreamWriter.start

    def start(self, *a, **kw):  # noqa: ANN001
        q = orig_start(self, *a, **kw)
        _HANDLES.append(q)
        return q

    rw.DataStreamWriter.start = start


def _harvest() -> None:
    for q in _HANDLES:
        try:
            for p in q.recentProgress:
                j = p.json() if callable(p.json) else p.json
                d = json.loads(j)
                _CAPTURED[(d.get("id"), d.get("batchId"))] = d
        except Exception as e:  # noqa: BLE001
            print(f"harvest error: {e}", file=sys.stderr)
    _HANDLES.clear()


def _progress_summary(progresses: list[dict]) -> dict:
    keys = (
        "addBatch",
        "getBatch",
        "latestOffset",
        "queryPlanning",
        "walCommit",
        "commitOffsets",
        "triggerExecution",
    )
    total: dict[str, int] = {k: 0 for k in keys}
    state: dict[str, int] = {}
    rows = 0
    for p in progresses:
        d = p.get("durationMs", {})
        for k in keys:
            total[k] += int(d.get(k, 0))
        rows += int(p.get("numInputRows", 0))
        for so in p.get("stateOperators", []):
            for sk in (
                "allUpdatesTimeMs",
                "allRemovalsTimeMs",
                "commitTimeMs",
                "timeTakenToLoadCheckpointFiles",
                "numRowsTotal",
                "numRowsUpdated",
                "numShufflePartitions",
            ):
                if sk in so:
                    state[sk] = state.get(sk, 0) + int(so.get(sk, 0))
    per_batch = [
        {
            "batchId": p.get("batchId"),
            "rows": p.get("numInputRows"),
            "triggerMs": p.get("durationMs", {}).get("triggerExecution"),
            "addBatchMs": p.get("durationMs", {}).get("addBatch"),
        }
        for p in sorted(progresses, key=lambda x: x.get("batchId", 0))
    ]
    return {
        "n_batches": len(progresses),
        "input_rows": rows,
        "durationMs_sum": total,
        "stateOperators_sum": state,
        "per_batch": per_batch,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("ranger_stream_profile")
    _install_progress_hook()
    names = sys.argv[1:] or DRAINS
    out: dict = {"sf_dir": sf_dir, "cpus": os.environ.get("SPARK_GRAFT_CPUS")}
    for name in names:
        if name not in registry:
            continue
        _CAPTURED.clear()
        t0 = time.time()
        df = registry[name].builder(spark, sf_dir)
        n = df.count()
        wall = round(time.time() - t0, 3)
        _harvest()
        out[name] = {
            "wall_s": wall,
            "result_rows": n,
            "progress": _progress_summary(list(_CAPTURED.values())),
        }
        print(f"[{name}] wall={wall}s", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
