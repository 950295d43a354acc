"""ULID generation — the reference's file-id scheme
(utils/ulid.go GenerateULID with a global entropy lock;
storage.go:307-309 names data files ``{table}_data_{date}_{ulid}.parquet``
so listings sort by creation). Implemented from the public ULID spec
(48-bit big-endian millisecond timestamp + 80 bits of randomness,
Crockford base32, 26 chars): lexicographic order == creation order,
monotonic within one millisecond via the spec's increment rule,
thread-safe like the reference's mutex."""

from __future__ import annotations

import os
import threading
import time

_ALPHABET = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"  # Crockford, no I L O U
_DECODE = {c: i for i, c in enumerate(_ALPHABET)}
_lock = threading.Lock()
_last: tuple[int, int] = (0, 0)  # (ms, randomness) for monotonicity


def generate_ulid() -> str:
    """26-char ULID; strictly increasing within a process (same-ms calls
    increment the 80-bit randomness, per the spec's monotonicity
    extension — the property that makes file listings time-sorted)."""
    global _last
    with _lock:
        ms = time.time_ns() // 1_000_000
        if ms == _last[0]:
            rand = _last[1] + 1
            if rand >= 1 << 80:  # theoretical same-ms overflow
                ms += 1
                rand = int.from_bytes(os.urandom(10), "big")
        else:
            rand = int.from_bytes(os.urandom(10), "big")
        _last = (ms, rand)
    value = (ms << 80) | rand
    out = []
    for _ in range(26):
        out.append(_ALPHABET[value & 0x1F])
        value >>= 5
    return "".join(reversed(out))


def parse_ulid(s: str) -> tuple[int, int]:
    """(timestamp_ms, randomness) from a ULID string; raises ValueError
    on bad length/alphabet (utils/ulid.go ParseULID shape)."""
    if len(s) != 26:
        raise ValueError(f"ULID must be 26 chars, got {len(s)}")
    value = 0
    for ch in s.upper():
        if ch not in _DECODE:
            raise ValueError(f"invalid ULID character {ch!r}")
        value = (value << 5) | _DECODE[ch]
    return value >> 80, value & ((1 << 80) - 1)


def table_file_name(table: str, ulid: str | None = None) -> str:
    """storage.go generateTableFileName:
    ``{table}_data_{YYYYMMDD}_{ulid}.parquet``."""
    date = time.strftime("%Y%m%d")
    return f"{table}_data_{date}_{ulid or generate_ulid()}.parquet"
