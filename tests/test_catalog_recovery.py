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
