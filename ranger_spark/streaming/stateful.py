"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the escape hatch for streaming semantics Spark's built-in operators can't
express (the reference has no streaming at all; SURVEY §2.6).

``running_user_stats`` keeps one small state row per key (count, sum,
last-seen timestamp) and emits the updated aggregate every micro-batch —
the canonical shape for incremental per-entity counters/profiles. State is
O(distinct keys); Arrow batches keep the Python hop amortized; keys are
hash-partitioned so a 1000-executor cluster shards state horizontally.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("total", DoubleType()),
        StructField("last_ts", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cnt", LongType()),
        StructField("total", DoubleType()),
        StructField("last_ts", LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        cnt, total, last_ts = state.get
    else:
        cnt, total, last_ts = 0, 0.0, 0
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_ts = max(last_ts, int(pdf["ts_ns"].max()))
    state.update((cnt, total, last_ts))
    yield pd.DataFrame(
        [{"user_id": key[0], "cnt": cnt, "total": total, "last_ts": last_ts}]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum, last-seen) — expects columns
    user_id, value, ts_ns on a streaming DataFrame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 stateful-processor API)
# ---------------------------------------------------------------------------


def _tws_available() -> bool:
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        return True
    except ImportError:
        return False


def topk_per_key(events: DataFrame, k: int = 3) -> DataFrame:
    """Streaming per-key running top-k values via Spark 4's
    ``transformWithStateInPandas`` — typed ListState instead of the
    single-row tuple state of ``applyInPandasWithState``, the operator
    shape for per-entity leaderboards / best-k retrieval caches. Emits
    the updated top-k rows (key, rank, value) every micro-batch. State
    is O(keys × k); keys hash-shard across executors.

    Expects columns ``user_id`` (long) and ``value`` (double). Raises a
    clear capability error on runtimes without the API.

    Environment note: the API's driver worker imports
    ``google.protobuf`` (StateMessage proto); on runtimes without
    protobuf (this offline container — same block as Spark Connect) the
    query fails at initialization and the test asserts THAT documented
    gate instead of results. ``applyInPandasWithState``
    (``running_user_stats``) is the dependency-free stateful path.
    """
    if not _tws_available():  # pragma: no cover - gated by runtime
        raise NotImplementedError(
            "transformWithStateInPandas requires pyspark >= 4.0"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("rank", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("value", DoubleType())])

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("top", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            vals = [float(r) for (r,) in self._top.get()]
            for pdf in rows:
                vals.extend(float(v) for v in pdf["value"])
            vals = sorted(vals, reverse=True)[:k]
            self._top.put([(v,) for v in vals])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(vals),
                    "rank": list(range(1, len(vals) + 1)),
                    "value": vals,
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TopK(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
