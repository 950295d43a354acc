from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark):
    from ranger_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(5)], ["k", "v"]
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], ["k", "name"])
    expected = sorted(
        (r.k, r.v, r.name) for r in left.join(right, "k").collect()
    )
    got = sorted(
        (r.k, r.v, r.name) for r in salted_join(left, right, "k", salt=4).collect()
    )
    assert got == expected


def test_salted_agg_matches_plain_agg(spark):
    from ranger_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1000)] + [("b", 1.0)], ["k", "v"]
    )
    plain = {
        r.k: (r.cnt, r.s)
        for r in df.groupBy("k")
        .agg(F.count("v").alias("cnt"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r.k: (r.count_v, r.sum_v)
        for r in salted_agg(df, ["k"], {"v": "count"}, salt=4)
        .join(salted_agg(df, ["k"], {"v": "sum"}, salt=4), "k")
        .collect()
    }
    assert salted == plain


def test_incremental_rollup(spark, engine):
    from ranger_spark.operators.rollup import refresh_rollup

    engine.execute("CREATE DATABASE IF NOT EXISTS rtest;")
    spark.sql("DROP TABLE IF EXISTS rtest.ev_rollup")
    rows1 = [(i, "a" if i % 2 else "b", float(i), 100 + i) for i in range(50)]
    src1 = spark.createDataFrame(rows1, ["event_id", "event_type", "value", "ts_sec"])
    n = refresh_rollup(
        spark, src1, "rtest.ev_rollup", "ts_sec", ["event_type"], "value", 60
    )
    assert n >= 1
    total1 = spark.table("rtest.ev_rollup").agg(F.sum("cnt")).collect()[0][0]
    assert total1 == 50

    # second batch extends the open bucket and adds a new one
    rows2 = [(100 + i, "a", 1.0, 160 + i * 60) for i in range(3)]
    src2 = spark.createDataFrame(rows2, ["event_id", "event_type", "value", "ts_sec"])
    both = src1.unionByName(src2)
    n2 = refresh_rollup(
        spark, both, "rtest.ev_rollup", "ts_sec", ["event_type"], "value", 60
    )
    assert n2 >= 1
    final = spark.table("rtest.ev_rollup").agg(F.sum("cnt")).collect()[0][0]
    assert final == 53
    # rollup equals full recompute
    from ranger_spark.operators.rollup import compute_rollup

    full = compute_rollup(both, "ts_sec", ["event_type"], "value", 60)
    assert sorted(
        (r.bucket, r.event_type, r.cnt, r.sum_v)
        for r in spark.table("rtest.ev_rollup").collect()
    ) == sorted((r.bucket, r.event_type, r.cnt, r.sum_v) for r in full.collect())
    spark.sql("DROP DATABASE rtest CASCADE")


def test_execute_script(engine):
    rs = engine.execute_script(
        "CREATE DATABASE IF NOT EXISTS sctest; USE sctest;"
        "DROP TABLE IF EXISTS t1;"
        "CREATE TABLE t1 (id int32, s string);"
        "INSERT INTO t1 (id, s) VALUES (1, 'a;b''c'), (2, 'x');"
        "SELECT id, s FROM t1"
    )
    assert rs[-1].row_count == 2
    assert sorted(rs[-1].rows) == [(1, "a;b'c"), (2, "x")]
    engine.spark.sql("DROP DATABASE sctest CASCADE")


def test_positional_salt_spreads_duplicate_rows(spark):
    # VERDICT r1 nit: content-hash salting sends byte-identical rows to one
    # salt; positional salting must spread them
    from ranger_spark.operators.skew import _salt_col

    dup = spark.createDataFrame([("k", 1)] * 64, ["key", "v"]).repartition(4)
    content = dup.select(_salt_col(dup, 8).alias("s")).distinct().count()
    positional = (
        dup.select(_salt_col(dup, 8, positional=True).alias("s"))
        .distinct()
        .count()
    )
    assert content == 1  # the degenerate case the fallback exists for
    assert positional > 1


def test_salted_agg_positional_matches_plain(spark):
    from ranger_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("k", 1)] * 50 + [("j", 2)] * 3, ["key", "v"]
    )
    got = {
        (r["key"], r["sum_v"])
        for r in salted_agg(
            df, ["key"], {"v": "sum"}, salt=4, positional=True
        ).collect()
    }
    assert got == {("k", 50), ("j", 6)}
