"""MP3 frame-walker tests against hand-built ISO 11172-3 headers —
frame lengths and durations are closed-form."""

from __future__ import annotations

from ranger_spark.operators.mpeg_audio import parse_mp3_stream


def _frame(bitrate_idx=9, sr_idx=0, padding=0, mode=0) -> bytes:
    """One MPEG1 Layer III frame: 0xFFFB header + computed body."""
    b1 = 0xFF
    b2 = 0xE0 | (3 << 3) | (1 << 1)  # MPEG1, Layer III
    b3 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b4 = mode << 6
    bitrate = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320][bitrate_idx]
    rate = [44100, 48000, 32000][sr_idx]
    length = 144 * bitrate * 1000 // rate + padding
    body = bytes([b1, b2, b3, b4]) + b"\xAA" * (length - 4)
    return body


def test_mp3_frame_walk_counts_and_duration():
    # 10 frames at 128 kbps / 44100 Hz stereo
    stream = b"".join(_frame() for _ in range(10))
    got = parse_mp3_stream(stream)
    assert got is not None
    assert got["frames"] == 10 and got["sample_rate"] == 44100
    assert got["mode"] == "stereo"
    assert got["n_samples"] == 11520
    assert abs(got["duration_s"] - 11520 / 44100) < 1e-12
    assert got["mean_kbps"] == 128.0


def test_mp3_id3v2_skip_and_mixed_bitrate():
    # ID3v2 tag (syncsafe size 100) + frames at two bitrates + padding
    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
    stream = id3 + _frame(9) + _frame(11, padding=1) + _frame(9)
    got = parse_mp3_stream(stream)
    assert got is not None and got["frames"] == 3
    assert abs(got["mean_kbps"] - (128 + 192 + 128) / 3) < 1e-9


def test_mp3_rejects_false_sync_and_garbage():
    assert parse_mp3_stream(b"\xff\xfb\x90") is None  # truncated
    assert parse_mp3_stream(b"not audio at all" * 10) is None
    # a single valid frame amid noise: below the 2-frame chain guard
    assert parse_mp3_stream(b"\x00" * 7 + _frame()[:40]) is None


def test_mp3_operator_over_spark(spark):
    rows = [
        (i, bytearray(b"".join(_frame() for _ in range(i + 2))))
        for i in range(3)
    ]
    rows.append((99, bytearray(b"junk bytes")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    from ranger_spark.operators.mpeg_audio import decode_mp3_meta

    out = decode_mp3_meta(df, "doc_id", "payload").toPandas()
    assert len(out) == 3
    assert dict(zip(out.doc_id, out.frames)) == {0: 2, 1: 3, 2: 4}
