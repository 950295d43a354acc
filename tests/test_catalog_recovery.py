"""Durable catalog: tables re-register after catalog loss (the reference
keeps a persistent SQLite registry; we persist a warehouse manifest and
recreate external tables from it)."""

from __future__ import annotations

import pytest


def test_recover_after_catalog_loss(spark, engine):
    engine.execute("CREATE DATABASE IF NOT EXISTS rectest;")
    engine.execute("DROP TABLE IF EXISTS rectest.t;")
    engine.execute(
        "CREATE TABLE rectest.t (id int32 NOT NULL, region string, v float64) "
        "PARTITION BY (region);"
    )
    engine.execute(
        "INSERT INTO rectest.t (id, region, v) VALUES "
        "(1, 'eu', 1.5), (2, 'us', 2.5), (3, 'eu', 3.5);"
    )
    # simulate a fresh session losing the in-memory catalog entry
    # (external table → files survive the DROP)
    spark.sql("DROP TABLE rectest.t")
    assert not spark.catalog.tableExists("rectest.t")

    n = engine.recover()
    assert n == 1
    r = engine.execute("SELECT id, region, v FROM rectest.t ORDER BY id;")
    assert r.rows == [(1, "eu", 1.5), (2, "us", 2.5), (3, "eu", 3.5)]
    # declared Iceberg schema survives recovery too
    cols = engine.execute("SHOW COLUMNS FROM rectest.t;")
    assert ("id", "int32", False, 1) in cols.rows


def test_engine_drop_cleans_storage(spark, engine):
    import os

    engine.execute("CREATE DATABASE IF NOT EXISTS rectest;")
    engine.execute("DROP TABLE IF EXISTS rectest.gone;")
    engine.execute("CREATE TABLE rectest.gone (a int32);")
    loc = engine.table_location("rectest.gone")
    engine.execute("INSERT INTO rectest.gone (a) VALUES (1);")
    assert os.path.isdir(loc)
    engine.execute("DROP TABLE rectest.gone;")
    assert not os.path.isdir(loc)
    # recover() must not resurrect a dropped table; the read path surfaces
    # the executor's own not-found error (as the reference surfaces DuckDB's)
    assert engine.recover() == 0
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        engine.execute("SELECT * FROM rectest.gone;")
    spark.sql("DROP DATABASE rectest CASCADE")


def test_two_engines_do_not_lose_each_others_tables(spark, engine):
    """Read-modify-write race: a second engine instance (≈ second session
    sharing the warehouse) that loaded the manifest EARLIER must not wipe
    tables the first engine registered in the meantime."""
    from ranger_spark.engine import Engine

    engine.execute("CREATE DATABASE IF NOT EXISTS conc;")
    engine.execute("DROP TABLE IF EXISTS conc.a;")
    engine.execute("DROP TABLE IF EXISTS conc.b;")
    e2 = Engine(spark)  # snapshots the manifest now
    engine.execute("CREATE TABLE conc.a (x int32);")
    e2.execute("CREATE TABLE conc.b (y int32);")  # stale in-memory view
    import json

    with open(engine._manifest_file()) as f:
        tables = json.load(f)["tables"]
    assert "conc.a" in tables and "conc.b" in tables
    # and a drop through one engine doesn't resurrect the other's state
    engine.execute("DROP TABLE conc.a;")
    with open(engine._manifest_file()) as f:
        tables = json.load(f)["tables"]
    assert "conc.a" not in tables and "conc.b" in tables


def test_concurrent_create_storm_keeps_all_entries(spark, engine):
    """N threads × separate Engine instances creating distinct tables
    concurrently: every entry must survive (flock serializes the
    read-modify-write; the reference gets this from SQLite)."""
    import json
    from concurrent.futures import ThreadPoolExecutor

    from ranger_spark.engine import Engine

    engine.execute("CREATE DATABASE IF NOT EXISTS storm;")
    for i in range(6):
        engine.execute(f"DROP TABLE IF EXISTS storm.t{i};")

    def mk(i: int) -> None:
        Engine(spark).execute(f"CREATE TABLE storm.t{i} (v int32);")

    with ThreadPoolExecutor(max_workers=6) as ex:
        list(ex.map(mk, range(6)))
    with open(engine._manifest_file()) as f:
        tables = json.load(f)["tables"]
    for i in range(6):
        assert f"storm.t{i}" in tables
    for i in range(6):
        engine.execute(f"DROP TABLE storm.t{i};")
