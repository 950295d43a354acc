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
