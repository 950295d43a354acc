from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_resize_stub(spark):
    from ranger_spark.operators.multimodal import resize_stub

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    out = resize_stub(d, "doc_id", "text", target=224).collect()
    assert len(out) == 10
    for r in out:
        assert max(r.width, r.height) == 224 or max(r.width, r.height) == 223
        assert r.resized_bytes == r.width * r.height * 3


def test_frame_sample_fanout(spark):
    from ranger_spark.operators.multimodal import frame_sample_stub

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    frames = frame_sample_stub(d, "doc_id", "text", every_nth=2)
    rows = frames.collect()
    # 1→N fan-out: every doc yields ≥1 frame, idx stride 2, stable checksums
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert set(per_doc) == {r.doc_id for r in d.select("doc_id").collect()}
    for idxs in per_doc.values():
        assert sorted(idxs) == list(range(0, 2 * len(idxs), 2))
    assert all(len(r.frame_checksum) == 32 for r in rows)


def test_scalar_function_table(spark):
    from ranger_spark.functions.scalar import SCALAR_FUNCTIONS

    df = spark.createDataFrame([("Hello World",)], ["s"])
    _, upper = SCALAR_FUNCTIONS["UPPER"]
    _, pos = SCALAR_FUNCTIONS["POSITION"]
    row = df.select(
        upper(F.col("s")).alias("u"), pos(F.lit("World"), F.col("s")).alias("p")
    ).first()
    assert row.u == "HELLO WORLD" and row.p == 7


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\x0dIHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )


def test_parse_image_header_formats():
    from ranger_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png(640, 480)) == {
        "format": "png", "width": 640, "height": 480,
    }
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert parse_image_header(gif) == {
        "format": "gif", "width": 320, "height": 200,
    }
    bmp = (
        b"BM" + b"\x00" * 16
        + (800).to_bytes(4, "little")
        + (-600).to_bytes(4, "little", signed=True)  # top-down row order
    )
    assert parse_image_header(bmp) == {
        "format": "bmp", "width": 800, "height": 600,
    }
    # JPEG: SOI, APP0 segment, then SOF0 with height=120 width=160
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (120).to_bytes(2, "big") + (160).to_bytes(2, "big") + b"\x03"
    )
    assert parse_image_header(jpeg) == {
        "format": "jpeg", "width": 160, "height": 120,
    }
    assert parse_image_header(b"not an image at all") is None
    assert parse_image_header(b"") is None


def test_decode_image_headers_real(spark):
    from ranger_spark.operators.multimodal import decode_image_headers

    rows = [(1, _png(10, 20)), (2, _png(300, 77)), (3, b"garbage")]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    got = {
        (r.doc_id, r.width, r.height, r.format)
        for r in decode_image_headers(df, "doc_id", "payload").collect()
    }
    # unrecognized payloads are dropped; real ones parsed exactly
    assert got == {(1, 10, 20, "png"), (2, 300, 77, "png")}
