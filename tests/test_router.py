from __future__ import annotations

import pytest

from ranger_spark.errors import RangerError
from ranger_spark.router import StmtKind, route


def test_semicolon_required():
    with pytest.raises(RangerError) as ei:
        route("SELECT 1")
    assert ei.value.code == "parser.missing_semicolon"


def test_empty():
    with pytest.raises(RangerError):
        route("   ")


@pytest.mark.parametrize(
    "sql,kind",
    [
        ("SELECT * FROM t;", StmtKind.SELECT),
        ("WITH x AS (SELECT 1) SELECT * FROM x;", StmtKind.WITH_SELECT),
        ("INSERT INTO t (a) VALUES (1);", StmtKind.INSERT),
        ("UPDATE t SET a = 1 WHERE b = 2;", StmtKind.UPDATE),
        ("DELETE FROM t WHERE a = 1;", StmtKind.DELETE),
        ("EXPLAIN SELECT 1;", StmtKind.EXPLAIN),
        ("CREATE TABLE t (a int32);", StmtKind.CREATE_TABLE),
        ("CREATE DATABASE d;", StmtKind.CREATE_DATABASE),
        ("DROP TABLE IF EXISTS t;", StmtKind.DROP_TABLE),
        ("DROP DATABASE d;", StmtKind.DROP_DATABASE),
        ("USE mydb;", StmtKind.USE),
        ("SHOW DATABASES;", StmtKind.SHOW_DATABASES),
        ("SHOW TABLES FROM d;", StmtKind.SHOW_TABLES),
        ("SHOW COLUMNS FROM t;", StmtKind.SHOW_COLUMNS),
        ("SHOW CREATE TABLE t;", StmtKind.SHOW_CREATE_TABLE),
        ("DESCRIBE t;", StmtKind.DESCRIBE),
        ("BEGIN;", StmtKind.TXN_NOOP),
        ("COMMIT;", StmtKind.TXN_NOOP),
        ("ROLLBACK;", StmtKind.TXN_NOOP),
        ("ALTER TABLE t DROP COLUMN a;", StmtKind.ALTER),
        ("GRANT SELECT ON t TO u;", StmtKind.PARSE_ONLY),
        ("CREATE INDEX i ON t (a);", StmtKind.PARSE_ONLY),
    ],
)
def test_classification(sql, kind):
    assert route(sql).kind == kind


def test_strict_gate_rejects_with():
    # reference: WITH is whitelisted for DuckDB but the parser gate has no
    # WITH case → rejected (SURVEY §2.3 CTE finding)
    with pytest.raises(RangerError):
        route("WITH x AS (SELECT 1) SELECT * FROM x;", strict=True)


def test_unknown_statement():
    with pytest.raises(RangerError) as ei:
        route("VACUUM t;")
    assert ei.value.code == "engine.unsupported_statement_type"
