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
