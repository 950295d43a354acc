"""MERGE INTO — CoW upsert (exceeds the reference: its parser has no
MERGE keyword at all, server/query/parser/parser.go:34-55; CDC upserts
there require client-side read-modify-write). Semantics follow SQL:2003 /
Iceberg MERGE: first-match-wins clause resolution, cardinality check on
multiple source matches, INSERT * maps source columns by name."""

from __future__ import annotations

import pytest

from ranger_spark.errors import RangerError


@pytest.fixture(scope="module", autouse=True)
def db(engine):
    engine.execute("CREATE DATABASE IF NOT EXISTS mtest;")
    engine.execute("USE mtest;")
    yield
    engine.spark.sql("DROP DATABASE IF EXISTS mtest CASCADE")


@pytest.fixture()
def accounts(engine):
    engine.execute("DROP TABLE IF EXISTS acct;")
    engine.execute("DROP TABLE IF EXISTS changes;")
    engine.execute("CREATE TABLE acct (id int32, name string, bal float64);")
    engine.execute(
        "INSERT INTO acct (id, name, bal) VALUES "
        "(1, 'alice', 10.0), (2, 'bob', 20.0), (3, 'carol', 30.0);"
    )
    engine.execute("CREATE TABLE changes (id int32, name string, bal float64);")
    engine.execute(
        "INSERT INTO changes (id, name, bal) VALUES "
        "(2, 'bob', 25.0), (3, 'carol', -1.0), (4, 'dave', 40.0);"
    )
    return "acct"


def _rows(engine, sql):
    return engine.execute(sql).rows


def test_merge_update_delete_insert(engine, accounts):
    r = engine.execute(
        "MERGE INTO acct t USING changes s ON t.id = s.id "
        "WHEN MATCHED AND s.bal < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET bal = s.bal "
        "WHEN NOT MATCHED THEN INSERT (id, name, bal) "
        "VALUES (s.id, s.name, s.bal);"
    )
    assert r.row_count == 3
    assert "1 updated, 1 deleted, 1 inserted" in r.message
    rows = _rows(engine, "SELECT id, name, bal FROM acct ORDER BY id;")
    assert rows == [
        (1, "alice", 10.0),  # untouched (no source match)
        (2, "bob", 25.0),  # updated
        (4, "dave", 40.0),  # inserted; carol deleted
    ]


def test_merge_insert_star_and_subquery_source(engine, accounts):
    r = engine.execute(
        "MERGE INTO acct t USING "
        "(SELECT id, name, bal FROM changes WHERE bal > 30) s "
        "ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT *;"
    )
    assert "1 inserted" in r.message
    rows = _rows(engine, "SELECT id, name FROM acct WHERE id = 4;")
    assert rows == [(4, "dave")]
    # matched rows without a matched clause are kept unchanged
    assert _rows(engine, "SELECT count(*) AS n FROM acct;") == [(4,)]


def test_merge_update_expression_and_fallthrough(engine, accounts):
    engine.execute(
        "MERGE INTO acct t USING changes s ON t.id = s.id "
        "WHEN MATCHED AND s.bal > 0 THEN UPDATE SET bal = t.bal + s.bal;"
    )
    rows = _rows(engine, "SELECT id, bal FROM acct ORDER BY id;")
    # id=2 updated (20+25); id=3 matched but s.bal<0 → fallthrough keep;
    # id=4 not matched, no insert clause → not inserted
    assert rows == [(1, 10.0), (2, 45.0), (3, 30.0)]


def test_merge_cardinality_violation_leaves_target_untouched(engine, accounts):
    engine.execute("INSERT INTO changes (id, name, bal) VALUES (2, 'dup', 1.0);")
    with pytest.raises(RangerError) as ei:
        engine.execute(
            "MERGE INTO acct t USING changes s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET bal = s.bal;"
        )
    assert "matched multiple source rows" in str(ei.value)
    # target unchanged after the aborted merge
    rows = _rows(engine, "SELECT id, bal FROM acct ORDER BY id;")
    assert rows == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_merge_unknown_set_column_rejected(engine, accounts):
    with pytest.raises(RangerError) as ei:
        engine.execute(
            "MERGE INTO acct t USING changes s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET nope = 1;"
        )
    assert ei.value.code == "storage.validation_failed"


def test_merge_strict_gate_rejects(spark, accounts):
    from ranger_spark.engine import Engine

    strict = Engine(spark, strict_gate=True)
    with pytest.raises(RangerError) as ei:
        strict.execute("MERGE INTO acct t USING changes s ON t.id = s.id "
                       "WHEN MATCHED THEN DELETE;")
    assert "MERGE" in str(ei.value)
