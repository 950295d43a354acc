"""ULID generation (utils/ulid.go parity, public spec): format,
time-ordering, same-ms monotonicity, thread safety, parse round-trip."""

from __future__ import annotations

import threading
import time

import pytest

from ranger_spark.functions.ulid import (
    generate_ulid,
    parse_ulid,
    table_file_name,
)


def test_format_and_parse_roundtrip():
    u = generate_ulid()
    assert len(u) == 26
    ts, rand = parse_ulid(u)
    assert abs(ts - time.time() * 1000) < 60_000
    assert 0 <= rand < 1 << 80
    with pytest.raises(ValueError):
        parse_ulid("short")
    with pytest.raises(ValueError):
        parse_ulid("I" * 26)  # I not in Crockford alphabet


def test_lexicographic_equals_creation_order():
    us = [generate_ulid() for _ in range(1000)]
    assert us == sorted(us)  # monotonic even within one millisecond
    assert len(set(us)) == 1000


def test_thread_safety_unique():
    out: list[str] = []
    lock = threading.Lock()

    def gen():
        local = [generate_ulid() for _ in range(200)]
        with lock:
            out.extend(local)

    ts = [threading.Thread(target=gen) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(set(out)) == len(out) == 1600


def test_table_file_name_shape():
    n = table_file_name("users")
    assert n.startswith("users_data_") and n.endswith(".parquet")
    assert len(n.split("_")[-1]) == 26 + len(".parquet")
