from __future__ import annotations

import tempfile
from pathlib import Path

import pytest

from ranger_spark.errors import RangerError
from ranger_spark.sources.files import avro_available, ingest_file, read_file
from tests.conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def fdb(engine):
    engine.execute("CREATE DATABASE IF NOT EXISTS ftest;")
    yield
    engine.spark.sql("DROP DATABASE IF EXISTS ftest CASCADE")


def test_read_parquet(spark):
    df = read_file(spark, f"{SF_DIR}/region.parquet", "parquet")
    assert df.count() == 5


def test_ingest_csv_roundtrip(spark):
    tmp = Path(tempfile.mkdtemp(prefix="src_csv_"))
    (tmp / "data.csv").write_text("id,name\n1,a\n2,b\n")
    n = ingest_file(spark, str(tmp / "data.csv"), "csv", "ftest.from_csv", create=True)
    assert n == 2
    assert sorted(r.name for r in spark.table("ftest.from_csv").collect()) == ["a", "b"]
    # append a second time
    n = ingest_file(spark, str(tmp / "data.csv"), "csv", "ftest.from_csv")
    assert spark.table("ftest.from_csv").count() == 4


def test_ingest_json(spark):
    tmp = Path(tempfile.mkdtemp(prefix="src_json_"))
    (tmp / "d.json").write_text('{"id": 1, "v": 2.5}\n{"id": 2, "v": 3.5}\n')
    ingest_file(spark, str(tmp / "d.json"), "json", "ftest.from_json", create=True)
    assert spark.table("ftest.from_json").count() == 2


def test_unknown_format(spark):
    with pytest.raises(RangerError):
        read_file(spark, "/tmp/x", "hdf5")


def test_read_xml(spark):
    tmp = Path(tempfile.mkdtemp(prefix="src_xml_"))
    (tmp / "d.xml").write_text(
        "<rows><row><id>1</id><name>a</name></row>"
        "<row><id>2</id><name>b</name></row></rows>"
    )
    df = read_file(spark, str(tmp / "d.xml"), "xml")
    assert sorted((r.id, r.name) for r in df.collect()) == [(1, "a"), (2, "b")]


def test_read_binaryfile_feeds_multimodal_decode(spark):
    from pyspark.sql import functions as F

    from ranger_spark.operators.multimodal import decode_image_headers

    tmp = Path(tempfile.mkdtemp(prefix="src_bin_"))
    # minimal real BMP (2x1, 24bpp) — same synthesis as the decode tests
    import struct

    px = b"\x01\x02\x03\x04\x05\x06\x00\x00"  # one padded row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(px), 0, 0, 0, 0)
    (tmp / "img.bmp").write_bytes(header + dib + px)
    (tmp / "junk.bin").write_bytes(b"\x00\x01\x02")
    raw = read_file(spark, str(tmp), "binaryfile")
    assert {"path", "length", "content"} <= set(raw.columns)
    # length doubles as a numeric id here (bmp=62 bytes, junk=3);
    # unrecognized payloads are dropped by the decoder
    decoded = decode_image_headers(
        raw.select(F.col("length").alias("fid"), F.col("content").alias("payload")),
        id_col="fid",
        payload_col="payload",
    )
    rows = {r.doc_id: (r.format, r.width, r.height) for r in decoded.collect()}
    assert rows == {62: ("bmp", 2, 1)}


def test_avro_roundtrip_or_gated(spark):
    if not avro_available(spark):
        with pytest.raises(RangerError) as ei:
            read_file(spark, "/tmp/x.avro", "avro")
        assert "spark-avro" in str(ei.value)
        return
    tmp = tempfile.mkdtemp(prefix="src_avro_")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"]).write.format(
        "org.apache.spark.sql.avro.AvroFileFormat"
    ).mode("overwrite").save(tmp)
    df = read_file(spark, tmp, "avro")
    assert sorted(r.name for r in df.collect()) == ["a", "b"]


def test_write_parquet_column_codecs_footer_verified(spark):
    import pyarrow.parquet as pq

    from ranger_spark.sources.arrow_write import write_parquet_column_codecs

    df = spark.range(0, 1000).selectExpr(
        "id", "CAST(id AS STRING) AS s", "id * 1.5 AS v"
    )
    out = str(Path(tempfile.mkdtemp(prefix="colcodec_")) / "t")
    files = write_parquet_column_codecs(
        df.repartition(3), out, {"s": "zstd", "v": "gzip"}, default="snappy"
    )
    assert len(files) == 3
    # footers: each column chunk carries ITS codec
    for f in files:
        rg = pq.ParquetFile(f).metadata.row_group(0)
        codec_by_col = {
            rg.column(i).path_in_schema: rg.column(i).compression
            for i in range(rg.num_columns)
        }
        assert codec_by_col == {"id": "SNAPPY", "s": "ZSTD", "v": "GZIP"}
    # data round-trips through Spark
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.selectExpr("sum(id) AS t").collect()[0].t == 499500
    # validation: unknown column / codec fail fast
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_parquet_column_codecs(df, out, {"nope": "zstd"})
    with _pytest.raises(ValueError):
        write_parquet_column_codecs(df, out, {"s": "xz"})
