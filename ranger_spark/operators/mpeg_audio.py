"""MPEG audio (MP3) frame-structure decode — no media library.

The lossy-audio analog of operators/h264.py: full sample
reconstruction (the polyphase filterbank + huffman spectral data)
stays gated, but the stream structure a data pipeline needs is real
byte work: ID3v2 tag skip, frame-sync walk with header validation
(MPEG version / layer / bitrate / sample-rate indices), per-frame
length arithmetic, and the derived stream facts — frame count, total
samples, duration, mean bitrate, channel mode (ISO/IEC 11172-3 §2.4,
public). Together with WAV (PCM), FLAC (lossless compressed) and the
JPEG/PNG/BMP/GIF/MP4/H.264 decoders this completes structure-level
coverage of every major media family.

100-TB note: ``parse_mp3_stream`` is the native-codec seam — swap for
a native demuxer returning the same dict inside the same
``mapInPandas``; see operators/multimodal.py module docstring.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ISO 11172-3 / 13818-3 tables, Layer III
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                   256, 320, None]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                   160, None]
_RATES = {3: [44100, 48000, 32000, None],   # MPEG1
          2: [22050, 24000, 16000, None],   # MPEG2
          0: [11025, 12000, 8000, None]}    # MPEG2.5
_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _parse_frame_header(b: bytes) -> dict | None:
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    version = (b[1] >> 3) & 3   # 0=2.5, 2=2, 3=1 (1 reserved)
    layer = (b[1] >> 1) & 3     # 1 = Layer III
    if version == 1 or layer != 1:
        return None  # only Layer III here
    br_idx = b[2] >> 4
    sr_idx = (b[2] >> 2) & 3
    padding = (b[2] >> 1) & 1
    mode = (b[3] >> 6) & 3
    table = _BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3
    bitrate = table[br_idx]
    rate = _RATES[version][sr_idx]
    if not bitrate or not rate:
        return None  # free-format / invalid
    spf = 1152 if version == 3 else 576  # samples per frame, Layer III
    length = (spf // 8) * bitrate * 1000 // rate + padding
    return {
        "version": version,
        "bitrate": bitrate,
        "rate": rate,
        "mode": _MODES[mode],
        "samples": spf,
        "length": length,
    }


def parse_mp3_stream(payload: bytes) -> dict | None:
    """Walk the whole stream frame-by-frame. Returns None unless at
    least two consecutive valid Layer-III frames chain (the standard
    false-sync guard)."""
    pos = 0
    # ID3v2: "ID3" + version(2) + flags + syncsafe length
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    frames = 0
    samples = 0
    kbps_sum = 0
    rate = None
    mode = None
    while pos + 4 <= len(payload):
        h = _parse_frame_header(payload[pos : pos + 4])
        if h is None:
            if frames:
                break  # trailing garbage / tag after last frame
            pos += 1
            continue
        if rate is None:
            rate, mode = h["rate"], h["mode"]
        frames += 1
        samples += h["samples"]
        kbps_sum += h["bitrate"]
        pos += h["length"]
    if frames < 2 or rate is None:
        return None
    return {
        "frames": frames,
        "sample_rate": rate,
        "mode": mode,
        "n_samples": samples,
        "duration_s": samples / rate,
        "mean_kbps": kbps_sum / frames,
    }


MP3_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("mode", StringType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_s", StringType()),  # formatted 4dp
        StructField("mean_kbps", StringType()),   # formatted 2dp
    ]
)


def decode_mp3_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Arrow-batched MP3 frame-structure decode; undecodable payloads
    are dropped."""
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                s = parse_mp3_stream(bytes(p))
                if s is not None:
                    rows.append(
                        (
                            int(i),
                            s["frames"],
                            s["sample_rate"],
                            s["mode"],
                            s["n_samples"],
                            f"{s['duration_s']:.4f}",
                            f"{s['mean_kbps']:.2f}",
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[c.name for c in MP3_META_SCHEMA.fields]
            )

    return src.mapInPandas(run, MP3_META_SCHEMA)
