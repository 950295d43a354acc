"""Bucketed joins must plan shuffle-free (the 100 TB co-location story)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ranger_spark.plans.inspect import num_exchanges
from ranger_spark.sources.bucketing import colocated_join, write_bucketed
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, engine):
    engine.execute("CREATE DATABASE IF NOT EXISTS btest;")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_bucketed(li, "btest.li_b", "l_orderkey", 8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "btest.o_b", "l_orderkey", 8
    )
    joined = colocated_join(spark, "btest.li_b", "btest.o_b", "l_orderkey")
    agg = joined.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    # join itself: zero exchanges (bucket-aligned scan on both sides);
    # the groupBy on the bucket key is also exchange-free
    assert num_exchanges(agg) == 0, agg.explain(True)
    # and it computes the right thing
    plain = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey")
        .count()
        .count()
    )
    assert agg.count() == plain
    spark.sql("DROP DATABASE btest CASCADE")


def test_engine_clustered_by_settings(engine, spark):
    """CLUSTERED BY as engine DDL (SETTINGS clustered_by/buckets): inserts
    land bucket-hashed files, a join of two co-clustered tables plans
    exchange-free, and rewrite statements fail fast (a rewrite would break
    the bucket-file naming the metastore spec promises)."""
    import pytest as _pytest

    from ranger_spark.errors import RangerError

    engine.execute("CREATE DATABASE IF NOT EXISTS bset;")
    engine.execute(
        "CREATE TABLE bset.li (k int64, qty float64) "
        "SETTINGS clustered_by = 'k', buckets = 4;"
    )
    engine.execute(
        "CREATE TABLE bset.orders (k int64, price float64) "
        "SETTINGS clustered_by = 'k', buckets = 4;"
    )
    engine.execute(
        "INSERT INTO bset.li (k, qty) VALUES "
        + ", ".join(f"({i % 7}, {i}.5)" for i in range(40))
        + ";"
    )
    engine.execute(
        "INSERT INTO bset.orders (k, price) VALUES "
        + ", ".join(f"({i}, {i}.0)" for i in range(7))
        + ";"
    )
    j = spark.table("bset.li").join(spark.table("bset.orders"), "k")
    assert num_exchanges(j) == 0
    assert j.count() == 40
    # groupBy on the bucket key is exchange-free too
    g = spark.table("bset.li").groupBy("k").count()
    assert num_exchanges(g) == 0
    # rewrites are append-only-gated
    with _pytest.raises(RangerError, match="bucketed layout"):
        engine.execute("UPDATE bset.li SET qty = 0 WHERE k = 1;")
    with _pytest.raises(RangerError, match="bucketed layout"):
        engine.execute("DELETE FROM bset.li WHERE k = 1;")
    # validation: buckets without clustered_by, bad bucket count
    with _pytest.raises(RangerError, match="clustered_by"):
        engine.execute("CREATE TABLE bset.bad (a int32) SETTINGS buckets = 4;")
    with _pytest.raises(RangerError, match="not in the schema"):
        engine.execute(
            "CREATE TABLE bset.bad2 (a int32) SETTINGS clustered_by = 'zz';"
        )
    engine.spark.sql("DROP DATABASE bset CASCADE")


def test_engine_clustered_survives_recovery(engine, spark):
    """recover() must re-declare the bucket spec, or the recovered table's
    bucket-id-named files read as unbucketed and co-location is lost."""
    from ranger_spark.engine import Engine

    engine.execute("CREATE DATABASE IF NOT EXISTS brec;")
    engine.execute(
        "CREATE TABLE brec.t (k int64, v string) "
        "SETTINGS clustered_by = 'k', buckets = 4;"
    )
    engine.execute(
        "INSERT INTO brec.t (k, v) VALUES (1, 'a'), (2, 'b'), (1, 'c');"
    )
    spark.sql("DROP TABLE brec.t")  # simulate metastore loss
    e2 = Engine(spark)
    assert e2.recover() >= 1
    g = spark.table("brec.t").groupBy("k").count()
    assert num_exchanges(g) == 0
    assert spark.table("brec.t").count() == 3
    engine.spark.sql("DROP DATABASE brec CASCADE")


def test_bucketed_layout_star_join_queries(spark):
    """q18 through the opt-in bucketed layout: identical rows, zero
    Exchange in the whole fact pipeline (agg + semi-join + fact join)."""
    import tempfile

    from ranger_spark.queries import load_all
    from ranger_spark.sources.bucketing import ensure_bucketed_layout

    reg = load_all()
    lay = tempfile.mkdtemp(prefix="blayout_")
    ensure_bucketed_layout(spark, SF_DIR, "bkt_q", buckets=8, layout_dir=lay)
    plain = reg["q18_large_orders"].builder(spark, SF_DIR).collect()
    spark.conf.set("spark.ranger.bucketed.db", "bkt_q")
    try:
        bdf = reg["q18_large_orders"].builder(spark, SF_DIR)
        assert num_exchanges(bdf) == 0
        assert sorted(map(tuple, bdf.collect())) == sorted(map(tuple, plain))
    finally:
        spark.conf.set("spark.ranger.bucketed.db", "")
    spark.sql("DROP DATABASE bkt_q CASCADE")


def test_engine_sql_path_bucketed_fact_join(spark):
    """VERDICT r5 item 4: the bucketed layout exercised END-TO-END
    through the engine statement path — CREATE TABLE ... SETTINGS
    clustered_by/buckets, INSERT ... SELECT, then the fact⋈fact join
    over the engine-created tables plans with ZERO Exchange and the
    registered query matches the plain-layout rows."""
    from pyspark.sql import functions as F

    from ranger_spark.queries import load_all
    from ranger_spark.queries.tpch_like import ensure_engine_bucketed_db

    db = ensure_engine_bucketed_db(spark, SF_DIR)
    j = spark.table(f"{db}.orders").join(
        spark.table(f"{db}.lineitem"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert num_exchanges(j) == 0
    reg = load_all()
    rows = sorted(
        map(tuple, reg["bucketed_star_join_sql"].builder(spark, SF_DIR).collect())
    )
    # identical to the same rollup over the plain parquet
    from ranger_spark.tables import load as load_t

    plain = (
        load_t(spark, SF_DIR, "orders")
        .filter(F.col("o_orderstatus") != "X")
        .join(
            load_t(spark, SF_DIR, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_items"))
        .collect()
    )
    assert {(r.priority, r.n_items) for r in plain} == {
        (r[0], r[1]) for r in rows
    }


def test_stats_db_feeds_cbo(spark):
    """ANALYZE-fed CBO plumbing (bench `cbo` section): external tables
    over the same parquet get row-count + key-column stats (timestamp
    columns excluded — Spark's FilterEstimation MatchErrors on
    TimestampNTZType stats), cbo_session redirects load() to them, and
    the stats are visible to Catalyst."""
    from ranger_spark.sources.stats import cbo_session, ensure_stats_db
    from ranger_spark.tables import load

    db = ensure_stats_db(
        spark, "/root/testdata/sf0.001", "stats_t", tables=("orders", "customer")
    )
    # idempotent re-run: no re-analyze (existence short-circuit)
    assert ensure_stats_db(
        spark, "/root/testdata/sf0.001", "stats_t", tables=("orders",)
    ) == db
    desc = spark.sql(f"DESCRIBE EXTENDED {db}.orders").collect()
    stats_row = [r for r in desc if r["col_name"] == "Statistics"]
    assert stats_row and "rows" in stats_row[0]["data_type"]
    with cbo_session(spark, db):
        assert spark.conf.get("spark.sql.cbo.enabled") == "true"
        df = load(spark, "/root/testdata/sf0.001", "orders")
        # served from the metastore copy: the plan carries catalog identity
        assert f"{db}.orders" in df._jdf.queryExecution().analyzed().toString()
        # a filtered join plan must optimize without the TimestampNTZ
        # MatchError (the bug the ntz exclusion works around)
        from pyspark.sql import functions as F

        j = df.filter(
            F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
        ).join(
            load(spark, "/root/testdata/sf0.001", "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        assert j.count() > 0
    assert spark.conf.get("spark.sql.cbo.enabled") == "false"
    spark.sql("DROP DATABASE stats_t CASCADE")
