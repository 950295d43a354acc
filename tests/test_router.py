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
        (
            "MERGE INTO t USING s ON t.id = s.id "
            "WHEN MATCHED THEN DELETE;",
            StmtKind.MERGE,
        ),
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


def test_cte_dml_rejected():
    """WITH ... INSERT/UPDATE/DELETE/MERGE must not route to the plain
    spark.sql() read path — it would write around the snapshot-commit
    chain and around WITH-prefix permission checks (ADVICE r6)."""
    for dml in (
        "WITH x AS (SELECT 1 AS id) INSERT INTO t SELECT id FROM x;",
        "WITH x AS (SELECT 1) DELETE FROM t WHERE id IN (SELECT * FROM x);",
        "WITH x AS (SELECT 1 AS id) UPDATE t SET v = 0;",
        "WITH s AS (SELECT 1 AS id) MERGE INTO t USING s ON t.id = s.id "
        "WHEN MATCHED THEN DELETE;",
    ):
        with pytest.raises(RangerError) as ei:
            route(dml)
        assert "CTE-DML" in str(ei.value)
    # DML keywords inside string literals don't trip the gate
    r = route("WITH x AS (SELECT ') INSERT' AS s) SELECT s FROM x;")
    assert r.kind == StmtKind.WITH_SELECT


def test_unknown_statement():
    with pytest.raises(RangerError) as ei:
        route("FLUSH x;")
    assert ei.value.code == "engine.unsupported_statement_type"


# --------------------------------------------------------------- positions
# ≈ reference parser position tests (server/query/parser/position_test.go,
# parse_error_test.go): every gate violation reports a 1-based
# (line, column) anchored at the offending statement.

_BAD_STATEMENTS = [
    # (VACUUM left out since round 5: implemented as orphan-file
    # removal — exceeds the reference; strict mode still rejects it)
    # (TRUNCATE left out since round 6: implemented as the snapshot
    # delete-all rewrite — exceeds the reference; strict mode rejects it)
    "FLUSH x",
    "REPLACE INTO t VALUES (1)",
    "CALL proc()",
    "SET x = 1",
    "CLUSTER t BY idx",  # COPY left this corpus in r7 — now executable
    "ATTACH DATABASE 'x' AS y",
    "DETACH DATABASE y",
    "PRAGMA table_info(t)",
    "ANALYZE t",
    # (OPTIMIZE left out: round 4 implements it as the compaction
    # statement — exceeds the reference; strict mode still rejects it)
    "REFRESH TABLE t",
    "RESET ALL",
    "LOAD 'ext'",
    "INSTALL 'ext'",
    "EXPORT DATABASE 'd'",
    "IMPORT DATABASE 'd'",
    # (KILL left out since round 6: implemented as the SQL face of
    # ExecutionManager.cancel — exceeds; strict mode still rejects it)
    "CHECKPOINT",
    "HANDSHAKE now",
    "UPSERT INTO t VALUES (1)",
]


def test_error_positions_corpus():
    from ranger_spark.router import validate_script

    # one bad statement per line, each with its own indentation — the
    # reported (line, column) must point at the leading keyword
    script = ""
    expected = []
    for i, stmt in enumerate(_BAD_STATEMENTS):
        indent = i % 7
        expected.append((i + 1, indent + 1))
        script += " " * indent + stmt + ";\n"
    errs = validate_script(script)
    assert len(errs) == len(_BAD_STATEMENTS)
    for err, stmt, (line, col) in zip(errs, _BAD_STATEMENTS, expected):
        assert err.statement == stmt
        assert (err.line, err.column) == (line, col), stmt
        assert "unsupported statement" in err.message
        # offset round-trips: the script really has the statement there
        assert script[err.offset : err.offset + len(stmt)] == stmt


def test_error_position_missing_semicolon_anchors_at_end():
    from ranger_spark.router import validate_script

    errs = validate_script("SELECT 1;\n  SELECT 2")
    assert len(errs) == 1
    err = errs[0]
    assert "semicolon" in err.message
    # line 2, after "  SELECT 2" (statement starts col 3, len 8 → col 11)
    assert (err.line, err.column) == (2, 11)


def test_error_positions_multiline_and_strings():
    from ranger_spark.router import validate_script

    # a ';' inside a string literal must not split/shift positions, and a
    # statement spanning lines anchors at its first keyword
    script = "SELECT 'a;b' AS s;\n\n   FLUSHQ\n  t;\nSELECT 2;"
    errs = validate_script(script)
    assert len(errs) == 1
    assert (errs[0].line, errs[0].column) == (3, 4)


def test_strict_mode_with_position():
    from ranger_spark.router import validate_script

    errs = validate_script("SELECT 1;\nWITH c AS (SELECT 1) SELECT * FROM c;",
                           strict=True)
    assert len(errs) == 1
    assert (errs[0].line, errs[0].column) == (2, 1)
    assert "WITH" in errs[0].message


def test_position_tracker_reference_semantics():
    # the exact offsets from reference position_test.go:26-49
    from ranger_spark.router import PositionTracker

    tracker = PositionTracker("SELECT * FROM table;")
    for offset, line, col in [
        (0, 1, 1), (6, 1, 7), (8, 1, 9), (14, 1, 15), (19, 1, 20),
    ]:
        assert tracker.line_column(offset) == (line, col)
    multi = PositionTracker("SELECT *\nFROM t\nWHERE x;")
    assert multi.line_column(0) == (1, 1)
    assert multi.line_column(9) == (2, 1)   # F of FROM
    assert multi.line_column(16) == (3, 1)  # W of WHERE
    assert multi.line_column(999) == (3, 9)  # clamps to end


def test_multi_error_alter_settings_list():
    """One bad ALTER reports EVERY invalid SETTINGS item with its own
    position (reference messages, alter_table_test.go:34-51; collector
    resync, error_recovery_test.go)."""
    from ranger_spark.router import validate_script

    errs = validate_script(
        "ALTER TABLE t SETTINGS cache_enabled, batch_size=, =true;"
    )
    assert len(errs) == 3
    msgs = [e.message for e in errs]
    assert "expected = after setting key 'cache_enabled'" in msgs[0]
    assert "expected value after =" in msgs[1]
    assert "expected identifier after SETTINGS" in msgs[2]
    # anchors are ordered and distinct
    offs = [e.offset for e in errs]
    assert offs == sorted(offs) and len(set(offs)) == 3
    # a clean SETTINGS list reports nothing
    assert validate_script("ALTER TABLE t SETTINGS a=1, b=true;") == []


def test_multi_error_alter_add_column_types():
    from ranger_spark.router import validate_script

    errs = validate_script(
        "ALTER TABLE t ADD COLUMN a varchar(9), ADD COLUMN b datetime;"
    )
    assert len(errs) == 2
    assert "varchar" in errs[0].message and "datetime" in errs[1].message
    assert errs[0].offset < errs[1].offset
    assert validate_script("ALTER TABLE t ADD COLUMN a int32;") == []
    errs = validate_script("ALTER TABLE ;")
    assert len(errs) == 1 and "expected table name" in errs[0].message


def test_multi_error_show_describe_args():
    """One bad SHOW reports the wrong linking keyword AND the malformed
    table name, each anchored (collector resyncs past the first)."""
    from ranger_spark.router import validate_script

    errs = validate_script("SHOW COLUMNS OF 9tbl;")
    assert len(errs) == 2
    assert "expected FROM or IN after SHOW COLUMNS" in errs[0].message
    assert "invalid table name '9tbl'" in errs[1].message
    assert errs[0].offset < errs[1].offset

    errs = validate_script("SHOW CREATE TABLE 1bad extra;")
    assert len(errs) == 2
    assert "invalid table name '1bad'" in errs[0].message
    assert "unexpected token 'extra'" in errs[1].message

    errs = validate_script("DESCRIBE 7x;")
    assert len(errs) == 1 and "invalid table name '7x'" in errs[0].message

    errs = validate_script("SHOW TABLES FROM 5db;")
    assert len(errs) == 1 and "invalid table name '5db'" in errs[0].message

    # clean statements stay clean
    assert validate_script("SHOW COLUMNS FROM db.t;") == []
    assert validate_script("SHOW CREATE TABLE t;") == []
    assert validate_script("DESCRIBE db.t;") == []
    assert validate_script("SHOW TABLES;") == []


def test_multi_error_within_one_statement():
    """The reference's error collector reports EVERY invalid column type
    in one CREATE TABLE with its own (line, column), resynchronizing at
    the next column (parser.go:1188-1307, parse_error_test.go shapes)."""
    from ranger_spark.router import validate_script

    script = (
        "CREATE TABLE t (a varchar(10), b int32,\n"
        "                c datetime, d string);"
    )
    errs = validate_script(script)
    assert len(errs) == 2
    assert [(e.line, e.column) for e in errs] == [(1, 19), (2, 19)]
    assert "varchar" in errs[0].message and "Iceberg type" in errs[0].message
    assert "datetime" in errs[1].message


def test_multi_error_across_and_within_statements():
    from ranger_spark.router import validate_script

    errs = validate_script(
        "FROBNICATE x;\nCREATE TABLE u (x text, y bigint);"
    )
    assert len(errs) == 3
    assert "unsupported statement type" in errs[0].message
    assert (errs[0].line, errs[0].column) == (1, 1)
    # two positioned type errors from the single CREATE TABLE
    assert [(e.line, e.column) for e in errs[1:]] == [(2, 19), (2, 27)]


def test_valid_create_table_yields_no_errors():
    from ranger_spark.router import validate_script

    assert validate_script(
        "CREATE TABLE ok (a int32, b list<string>, c decimal(10,2));"
    ) == []


def test_multi_error_insert_values_rows_and_cells():
    from ranger_spark.router import validate_script

    # one bad INSERT → THREE positioned errors: row-0 arity, row-1 bad
    # literal, row-2 arity (reference DetailedValidationError shapes,
    # parquet/schema.go:33-106; collector resyncs at each row)
    script = (
        "INSERT INTO db.t (a, b) VALUES\n"
        "  (1),\n"
        "  (2, now()),\n"
        "  (3, 4, 5);"
    )
    errs = validate_script(script)
    msgs = [e.message for e in errs]
    assert len(errs) == 3, msgs
    assert "row 0: expected 2 columns but got 1" in msgs[0]
    assert "row 1" in msgs[1] and "unsupported value literal" in msgs[1]
    assert "now()" in msgs[1]
    assert "row 2: expected 2 columns but got 3" in msgs[2]
    # positions: row errors anchor at the row '(', cell error at its token
    assert (errs[0].line, errs[0].column) == (2, 3)
    assert (errs[1].line, errs[1].column) == (3, 7)
    assert (errs[2].line, errs[2].column) == (4, 3)


def test_multi_error_insert_missing_column_list():
    from ranger_spark.router import validate_script

    errs = validate_script("INSERT INTO t VALUES (1, 'x');")
    assert len(errs) == 1
    assert "explicit column list" in errs[0].message


def test_multi_error_select_lexical():
    from ranger_spark.router import validate_script

    # one bad SELECT → TWO positioned errors: unmatched ')' and an
    # unclosed '(' (parse_error_test.go recovery shapes)
    errs = validate_script("SELECT (a + b)) FROM t WHERE (x > 1;")
    assert len(errs) == 2
    assert errs[0].message == "unmatched ')'"
    assert (errs[0].line, errs[0].column) == (1, 15)
    assert errs[1].message == "unclosed '('"
    assert (errs[1].line, errs[1].column) == (1, 30)
    # unterminated string is positioned at its opening quote
    errs2 = validate_script("SELECT 'abc FROM t;")
    assert any(
        e.message == "unterminated string literal"
        and (e.line, e.column) == (1, 8)
        for e in errs2
    )
    # empty select list
    errs3 = validate_script("SELECT FROM t;")
    assert any("empty select list" in e.message for e in errs3)
    # a clean SELECT stays clean ('' escapes, nested parens)
    assert validate_script(
        "SELECT (a + (b * 2)) AS x, 'it''s fine' FROM t;"
    ) == []


def test_insert_batch_reject_detailed_context(engine):
    import pytest as _pytest

    from ranger_spark.errors import RangerError

    engine.execute("CREATE DATABASE IF NOT EXISTS mer;")
    engine.execute(
        "CREATE TABLE mer.t (a int32 NOT NULL, b string);"
    )
    with _pytest.raises(RangerError) as ei:
        engine.execute(
            "INSERT INTO mer.t (a, b) VALUES "
            "(NULL, 'x'), ('oops', 'y'), (1, 2);"
        )
    e = ei.value
    v = e.context["violations"]
    # every violation reported (reference batch-reject: commit nothing)
    assert len(v) == 3 and e.context["total"] == 3
    assert v[0]["row_index"] == 0 and v[0]["column_name"] == "a"
    assert "cannot be null" in v[0]["message"]
    assert v[1]["row_index"] == 1 and v[1]["column_index"] == 0
    assert "expected int" in v[1]["message"]
    assert v[2]["row_index"] == 2 and v[2]["column_name"] == "b"
    # nothing committed
    assert engine.execute("SELECT count(*) AS c FROM mer.t;").rows[0][0] == 0
    engine.execute("DROP DATABASE mer CASCADE;")


def test_multi_error_update_delete_lexical():
    from ranger_spark.router import validate_script

    errs = validate_script("UPDATE t SET v = 'abc WHERE id = 1;")
    assert any("unterminated string" in e.message for e in errs)
    errs2 = validate_script("DELETE FROM t WHERE (id = 1;")
    assert any(e.message == "unclosed '('" for e in errs2)
    assert validate_script("UPDATE t SET v = 'ok' WHERE id = 1;") == []
