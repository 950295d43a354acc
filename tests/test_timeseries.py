"""Unit tests for the time-series join operators (the oracle queries cover
the happy path; these cover tolerance, no-match nulls, and boundaries)."""

from __future__ import annotations

from ranger_spark.operators.timeseries import asof_join, range_join_buckets


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 50, "p0"), (2, 10, "p2")], ["k", "ts", "tag"]
    )
    right = spark.createDataFrame(
        [(1, 60, "v1"), (1, 90, "v2"), (2, 20, "v3")], ["k", "ts", "val"]
    )
    out = {
        r.tag: (r.asof_ts, r.asof_val)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["val"]
        ).collect()
    }
    assert out["p1"] == (90, "v2")  # latest at-or-before 100
    assert out["p0"] == (None, None)  # nothing at-or-before 50... (60 > 50)
    assert out["p2"] == (None, None)  # right ts 20 > left ts 10


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, 60, "p")], ["k", "ts", "tag"])
    right = spark.createDataFrame([(1, 60, "v")], ["k", "ts", "val"])
    (row,) = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["val"]
    ).collect()
    assert row.asof_val == "v"  # right_ts <= left_ts is inclusive


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, 100, "p")], ["k", "ts", "tag"])
    right = spark.createDataFrame([(1, 10, "old")], ["k", "ts", "val"])
    no_tol = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["val"]
    ).collect()[0]
    assert no_tol.asof_val == "old"
    with_tol = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_cols=["val"], tolerance=50,
    ).collect()[0]
    assert with_tol.asof_val is None  # 100-10 > 50 → dropped


def test_range_join_boundaries(spark):
    left = spark.createDataFrame([(1, 100, "L")], ["k", "ts_l", "tag"])
    right = spark.createDataFrame(
        [(1, 40, "in_lo"), (1, 160, "in_hi"), (1, 161, "out"), (1, 39, "out2")],
        ["k", "ts_r", "val"],
    )
    got = sorted(
        r.val
        for r in range_join_buckets(
            left, right, on="k", left_ts="ts_l", right_ts="ts_r", max_distance=60
        ).collect()
    )
    assert got == ["in_hi", "in_lo"]  # |Δ| <= 60 inclusive, both directions
