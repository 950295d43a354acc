"""The reference's scalar-function surface as named Spark builders.

The reference parses exactly these function names (reference
server/query/parser/parser.go:5284-5755 + value generators :93-97) and
rejects everything else at the expression grammar. This table is the
authoritative mapping used for documentation/tests; SELECT execution goes
through Spark SQL, which accepts a strict superset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# name → (arity, builder). POSITION(a IN b) is 1-based, 0 when absent —
# matching both the reference's DuckDB executor and Spark's instr.
SCALAR_FUNCTIONS: dict[str, tuple[int, Callable[..., Column]]] = {
    "UPPER": (1, lambda c: F.upper(c)),
    "LOWER": (1, lambda c: F.lower(c)),
    "LENGTH": (1, lambda c: F.length(c)),
    "REVERSE": (1, lambda c: F.reverse(c)),
    "TRIM": (1, lambda c: F.trim(c)),
    "ROUND": (2, lambda c, n: F.round(c, n)),
    "COALESCE": (-1, lambda *cs: F.coalesce(*cs)),
    "CONCAT": (-1, lambda *cs: F.concat(*cs)),
    "REPLACE": (3, lambda c, a, b: F.replace(c, a, b)),
    "SUBSTRING": (3, lambda c, start, ln: F.substring(c, start, ln)),
    "POSITION": (2, lambda needle, hay: F.instr(hay, needle)),
    "CAST": (2, lambda c, t: c.cast(t)),
}

# Value generators legal in INSERT literals (parser.go:3047-3060); the
# engine materializes them driver-side per statement (ranger_spark.engine).
VALUE_GENERATORS: dict[str, Callable[[], Column]] = {
    "SYS_DATE": lambda: F.current_date(),
    "SYS_TIME": lambda: (
        F.hour(F.current_timestamp()) * 3600
        + F.minute(F.current_timestamp()) * 60
        + F.second(F.current_timestamp())
    ).cast("long")
    * 1_000_000,  # micros-since-midnight convention (types.py)
    "SYS_TIMESTAMP": lambda: F.current_timestamp(),
    "GENERATE_UUID": lambda: F.expr("uuid()"),
}
