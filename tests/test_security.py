"""Security validation layer — the reference's validateQuery /
checkInjectionPatterns (duckdb/engine.go:613-706), replicated exactly
including its substring-containment quirks, opt-in like the
reference's EnableQueryValidation=false default."""

from __future__ import annotations

import pytest

from ranger_spark.errors import RangerError
from ranger_spark.security import (
    DEFAULT_BLOCKED_KEYWORDS,
    validate_query,
)


def test_allowed_statement_whitelist():
    validate_query("SELECT 1;")
    validate_query("  with c as (select 1) select * from c;")
    with pytest.raises(RangerError) as ei:
        validate_query("GRANT ALL ON t TO bob;")
    assert ei.value.context["reason"] == "disallowed_statement"
    with pytest.raises(RangerError) as ei:
        validate_query("   ")
    assert ei.value.context["reason"] == "empty_query"


def test_blocked_keywords_substring_parity():
    with pytest.raises(RangerError) as ei:
        validate_query("SELECT copy_col FROM t;")  # substring 'COPY'
    assert ei.value.context["reason"] == "blocked_keyword"
    # the reference's documented quirk: UPDATE ... SET trips 'SET'
    # (strings.Contains, engine.go:644-652) — exact parity
    with pytest.raises(RangerError) as ei:
        validate_query("UPDATE t SET v = 1 WHERE id = 2;")
    assert "SET" in str(ei.value)
    # a deployment can fix the quirk by passing its own lists
    validate_query(
        "UPDATE t SET v = 1 WHERE id = 2;",
        blocked_keywords=tuple(
            k for k in DEFAULT_BLOCKED_KEYWORDS if k != "SET"
        ),
        check_injection=True,
    )


def test_injection_patterns():
    cases = {
        "SELECT 1 -- sneaky": "sql_comment_injection",
        "SELECT 1 /* hide */": "sql_comment_injection",
        "SELECT 1; DROP TABLE t": "drop_injection",
        "SELECT a FROM t WHERE x = 1 OR 1=1": "boolean_injection",
        "SELECT a FROM t UNION SELECT b FROM u": "union_injection",
        "SELECT CHAR (65)": "char_injection",
    }
    for sql, reason in cases.items():
        with pytest.raises(RangerError) as ei:
            validate_query(sql)
        assert ei.value.context["reason"] == reason, sql
    validate_query("SELECT a, b FROM t WHERE x = 3 AND y < 4;")


def test_engine_opt_in_validation(spark):
    from ranger_spark.engine import Engine

    guarded = Engine(spark, query_validation=True)
    with pytest.raises(RangerError) as ei:
        guarded.execute("SELECT 1; DROP TABLE x;")
    assert ei.value.code == "security.validation_failed"
    r = guarded.execute("SELECT 5 AS five;")
    assert r.rows == [(5,)]
    # default engine stays permissive (reference ships validation off)
    open_engine = Engine(spark)
    assert open_engine.execute("SELECT 1 AS one; ").rows == [(1,)]
