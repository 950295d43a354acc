"""Materialized views over the versioned store: full-refresh correctness,
the O(delta) incremental path for append-only algebraic aggregates, the
rewrite → full fallback, and the statement-surface error shapes."""

from __future__ import annotations

import uuid

import pytest


@pytest.fixture()
def mvdb(engine):
    db = "mvt_" + uuid.uuid4().hex[:6]
    engine.execute(f"CREATE DATABASE {db};")
    engine.execute(f"USE {db};")
    yield db
    engine.spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def _setup(engine):
    engine.execute("CREATE TABLE t (k string, v int32, w float64);")
    engine.execute(
        "INSERT INTO t (k,v,w) VALUES ('a',1,1.5),('a',2,2.5),('b',3,0.5);"
    )


def test_mv_create_and_incremental_refresh(engine, mvdb):
    _setup(engine)
    r = engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS sv, "
        "COUNT(*) AS c, MIN(w) AS mn, MAX(w) AS mx FROM t GROUP BY k;"
    )
    assert "incremental-capable" in r.message
    assert sorted(engine.execute("SELECT * FROM mv;").rows) == [
        ("a", 3, 2, 1.5, 2.5),
        ("b", 3, 1, 0.5, 0.5),
    ]
    assert "already fresh" in engine.execute(
        "REFRESH MATERIALIZED VIEW mv;"
    ).message
    # two appends, one refresh: both deltas fold in, new group appears
    engine.execute("INSERT INTO t (k,v,w) VALUES ('a',10,9.0);")
    engine.execute("INSERT INTO t (k,v,w) VALUES ('c',7,3.0),('b',1,0.1);")
    r = engine.execute("REFRESH MATERIALIZED VIEW mv;")
    assert "incrementally" in r.message
    assert sorted(engine.execute("SELECT * FROM mv;").rows) == [
        ("a", 13, 3, 1.5, 9.0),
        ("b", 4, 2, 0.1, 0.5),
        ("c", 7, 1, 3.0, 3.0),
    ]


def test_mv_incremental_matches_recompute_with_where(engine, mvdb):
    _setup(engine)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS sv FROM t "
        "WHERE v >= 2 GROUP BY k;"
    )
    engine.execute("INSERT INTO t (k,v,w) VALUES ('a',1,0.0),('a',5,0.0);")
    r = engine.execute("REFRESH MATERIALIZED VIEW mv;")
    assert "incrementally" in r.message  # WHERE rides the delta aggregate
    want = sorted(
        engine.execute("SELECT k, SUM(v) AS sv FROM t WHERE v >= 2 GROUP BY k;").rows
    )
    assert sorted(engine.execute("SELECT * FROM mv;").rows) == want


def test_mv_rewrite_history_falls_back_to_full(engine, mvdb):
    _setup(engine)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS sv FROM t GROUP BY k;"
    )
    engine.execute("DELETE FROM t WHERE k = 'b';")
    r = engine.execute("REFRESH MATERIALIZED VIEW mv;")
    assert "(full)" in r.message
    assert sorted(engine.execute("SELECT * FROM mv;").rows) == [("a", 3)]


def test_mv_non_aggregate_body_is_full_refresh(engine, mvdb):
    _setup(engine)
    r = engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, v FROM t WHERE v > 1;"
    )
    assert "full-refresh" in r.message
    engine.execute("INSERT INTO t (k,v,w) VALUES ('z',9,0.0);")
    assert "(full)" in engine.execute("REFRESH MATERIALIZED VIEW mv;").message
    assert ("z", 9) in engine.execute("SELECT * FROM mv;").rows


def test_mv_avg_body_not_incremental(engine, mvdb):
    _setup(engine)
    r = engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, AVG(v) AS av FROM t GROUP BY k;"
    )
    assert "full-refresh" in r.message  # AVG is not algebraic-mergeable here


def test_mv_error_shapes(engine, mvdb):
    from ranger_spark.errors import RangerError

    _setup(engine)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS sv FROM t GROUP BY k;"
    )
    with pytest.raises(RangerError):  # duplicate
        engine.execute("CREATE MATERIALIZED VIEW mv AS SELECT 1 AS x;")
    with pytest.raises(RangerError):  # unknown refresh target
        engine.execute("REFRESH MATERIALIZED VIEW nope;")
    with pytest.raises(RangerError):  # unknown drop target
        engine.execute("DROP MATERIALIZED VIEW nope;")
    assert "nothing to drop" in engine.execute(
        "DROP MATERIALIZED VIEW IF EXISTS nope;"
    ).message
    engine.execute("DROP MATERIALIZED VIEW mv;")
    assert f"{mvdb}.mv" not in engine._manifest.get("mviews", {})
    with pytest.raises(Exception):  # backing table gone too
        engine.execute("SELECT * FROM mv;")


def test_mv_strict_gate_rejects():
    from ranger_spark.errors import RangerError
    from ranger_spark.router import route

    for s in (
        "CREATE MATERIALIZED VIEW m AS SELECT 1;",
        "REFRESH MATERIALIZED VIEW m;",
        "DROP MATERIALIZED VIEW m;",
    ):
        with pytest.raises(RangerError):
            route(s, strict=True)


def test_mv_astha_auto_maintenance(engine, mvdb):
    """A source-table commit seen by the CDC bus refreshes the MV with no
    manual REFRESH — the Astha component model applied to MV upkeep."""
    from ranger_spark.streaming.astha import (
        Astha,
        Config,
        register_mview_maintenance,
    )

    _setup(engine)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS sv FROM t GROUP BY k;"
    )
    a = Astha(engine, Config(poll_interval_s=0.05))
    a.consumer.start_from_now()
    register_mview_maintenance(a, engine)
    engine.execute("INSERT INTO t (k,v,w) VALUES ('c',7,3.0);")
    assert a.pump() >= 1
    assert ("c", 7) in engine.execute("SELECT * FROM mv;").rows


def test_system_mviews_view(engine, mvdb):
    _setup(engine)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS sv FROM t GROUP BY k;"
    )
    rows = engine.execute("SELECT * FROM system.mviews;").rows
    mine = [r for r in rows if r[0] == f"{mvdb}.mv"]
    assert mine and mine[0][1] == f"{mvdb}.t" and mine[0][3] is True


def test_show_materialized_views_statement(engine, mvdb):
    _setup(engine)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS sv FROM t GROUP BY k;"
    )
    r = engine.execute("SHOW MATERIALIZED VIEWS;")
    assert any(row[0] == f"{mvdb}.mv" for row in r.rows)


def test_mv_non_mergeable_shapes_fall_back(engine, mvdb):
    """Subqueries and DISTINCT aggregates must NOT take the incremental
    path (a delta re-aggregate would be wrong for both)."""
    _setup(engine)
    r = engine.execute(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT k, SUM(v) AS sv FROM t "
        "WHERE v IN (SELECT v FROM t WHERE v > 1) GROUP BY k;"
    )
    assert "full-refresh" in r.message
    r = engine.execute(
        "CREATE MATERIALIZED VIEW mv2 AS SELECT k, COUNT(DISTINCT v) AS c "
        "FROM t GROUP BY k;"
    )
    assert "full-refresh" in r.message
    # and their full refresh stays correct
    engine.execute("INSERT INTO t (k,v,w) VALUES ('a',2,0.0);")
    engine.execute("REFRESH MATERIALIZED VIEW mv2;")
    assert sorted(engine.execute("SELECT * FROM mv2;").rows) == sorted(
        engine.execute("SELECT k, COUNT(DISTINCT v) AS c FROM t GROUP BY k;").rows
    )


def test_mv_cascade_over_mv(engine, mvdb):
    """MV-over-MV: a source commit cascades through two refresh hops on
    the Astha bus (the refresh commit is itself an event)."""
    from ranger_spark.streaming.astha import (
        Astha,
        Config,
        register_mview_maintenance,
    )

    _setup(engine)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv1 AS SELECT k, SUM(v) AS sv FROM t GROUP BY k;"
    )
    engine.execute(
        "CREATE MATERIALIZED VIEW mv2 AS SELECT k, SUM(sv) AS s2 FROM mv1 GROUP BY k;"
    )
    a = Astha(engine, Config(poll_interval_s=0.05))
    a.consumer.start_from_now()
    register_mview_maintenance(a, engine)
    engine.execute("INSERT INTO t (k,v,w) VALUES ('c',7,3.0);")
    a.pump()  # refreshes mv1 (commit -> new event)
    a.pump()  # cascades into mv2
    assert ("c", 7) in engine.execute("SELECT * FROM mv2;").rows


def test_stream_ingest_commits_snapshots_and_feeds_mv(engine, mvdb, tmp_path):
    """Streaming micro-batches through the engine-commit path are REAL
    snapshot commits: the CDC bus sees them and the MV auto-refreshes —
    stream → snapshot commit → Astha → O(delta) MV, end to end."""
    import json as _json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ranger_spark.streaming.astha import (
        Astha,
        Config,
        register_mview_maintenance,
    )
    from ranger_spark.streaming.ingest import stream_ingest

    engine.execute("CREATE TABLE s (k string, v int64);")
    engine.execute("INSERT INTO s (k,v) VALUES ('seed',1);")
    engine.execute(
        "CREATE MATERIALIZED VIEW smv AS SELECT k, SUM(v) AS sv FROM s GROUP BY k;"
    )
    a = Astha(engine, Config(poll_interval_s=0.05))
    a.consumer.start_from_now()
    register_mview_maintenance(a, engine)

    src = tmp_path / "in"
    src.mkdir()
    (src / "f1.json").write_text(
        "\n".join(_json.dumps(r) for r in [{"k": "x", "v": 5}, {"k": "x", "v": 2}])
    )
    schema = StructType(
        [StructField("k", StringType()), StructField("v", LongType())]
    )
    db = engine.spark.catalog.currentDatabase()
    vt = engine._versioned_for(f"{db}.s")
    before = vt.current_version()
    q = stream_ingest(
        engine.spark,
        str(src),
        schema,
        f"{db}.s",
        str(tmp_path / "ckpt"),
        engine=engine,
    )
    q.awaitTermination(120)
    assert vt.current_version() > before  # micro-batch = snapshot commit
    assert a.pump() >= 1
    assert ("x", 7) in engine.execute("SELECT * FROM smv;").rows


def test_drop_database_purges_mv_metadata(engine, mvdb):
    _setup(engine)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS sv FROM t GROUP BY k;"
    )
    engine.execute(f"USE default;") if engine._db_exists("default") else None
    engine.execute(f"DROP DATABASE {mvdb} CASCADE;")
    assert not any(
        k.startswith(mvdb + ".")
        for k in engine._manifest.get("mviews", {})
    )
    engine.execute(f"CREATE DATABASE {mvdb};")  # fixture teardown target
