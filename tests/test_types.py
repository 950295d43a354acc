"""Iceberg type-system tests (≈ reference create_table_test.go coverage:
Iceberg types accepted, legacy names rejected with targeted messages,
decimal bounds, nested complex types)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as st

from ranger_spark.errors import RangerError
from ranger_spark.types import parse_type, split_top_level, to_spark_schema


@pytest.mark.parametrize(
    "text,expected",
    [
        ("boolean", st.BooleanType()),
        ("int32", st.IntegerType()),
        ("int64", st.LongType()),
        ("float32", st.FloatType()),
        ("float64", st.DoubleType()),
        ("string", st.StringType()),
        ("binary", st.BinaryType()),
        ("date", st.DateType()),
        ("time", st.LongType()),
        ("timestamp", st.TimestampNTZType()),
        ("timestamptz", st.TimestampType()),
        ("uuid", st.StringType()),
        ("decimal(10,2)", st.DecimalType(10, 2)),
        ("DECIMAL(5, 0)", st.DecimalType(5, 0)),
    ],
)
def test_primitives(text, expected):
    assert parse_type(text).spark == expected


@pytest.mark.parametrize(
    "legacy,suggested",
    [
        ("VARCHAR", "string"),
        ("varchar(255)", "string"),
        ("TEXT", "string"),
        ("INT", "int32"),
        ("INTEGER", "int32"),
        ("BIGINT", "int64"),
        ("FLOAT", "float32"),
        ("DOUBLE", "float64"),
        ("BLOB", "binary"),
        ("DATETIME", "timestamp"),
    ],
)
def test_legacy_rejected_with_suggestion(legacy, suggested):
    with pytest.raises(RangerError) as ei:
        parse_type(legacy, column="c1")
    assert ei.value.code == "types.unsupported_sql_type"
    assert f"Use Iceberg type '{suggested}' instead" in str(ei.value)


def test_unknown_type():
    with pytest.raises(RangerError) as ei:
        parse_type("frobnicate")
    assert ei.value.code == "types.invalid_iceberg_type"


@pytest.mark.parametrize("bad", ["decimal(0,0)", "decimal(5,6)", "decimal(5,-1)", "decimal(a,b)"])
def test_decimal_bounds(bad):
    with pytest.raises(RangerError):
        parse_type(bad)


def test_nested_complex():
    t = parse_type("map<string,list<struct<a:int32,b:decimal(4,1)>>>")
    assert t.spark == st.MapType(
        st.StringType(),
        st.ArrayType(
            st.StructType(
                [
                    st.StructField("a", st.IntegerType()),
                    st.StructField("b", st.DecimalType(4, 1)),
                ]
            )
        ),
    )


def test_struct_list():
    t = parse_type("struct<x:int64,y:list<string>>")
    assert isinstance(t.spark, st.StructType)
    assert t.spark.fields[1].dataType == st.ArrayType(st.StringType())


def test_split_top_level():
    assert split_top_level("a,b<c,d>,e(f,g)") == ["a", "b<c,d>", "e(f,g)"]
    with pytest.raises(RangerError):
        split_top_level("a<b")


def test_to_spark_schema_nullability():
    schema = to_spark_schema([("id", "int32", False), ("name", "string", True)])
    assert schema.fields[0].nullable is False
    assert schema.fields[1].nullable is True
