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
