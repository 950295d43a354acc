"""REAL H.264/AVC elementary-stream structure decode — no media library.

The video half of the multimodal surface: full pixel reconstruction
(inter prediction + CABAC) stays genuinely gated, but everything a
training-data pipeline needs BEFORE pixels is byte/bit work done here
for real: Annex-B start-code scan, NAL unit typing, RBSP emulation-
prevention unescape, Exp-Golomb SPS parsing (profile/level, frame
dimensions incl. cropping for 4:2:0, frame_mbs_only), and access-unit
/ keyframe indexing (IDR offsets — the seek table a frame-sampling
pipeline builds first). ITU-T H.264 §7.3 / Annex B syntax, public.

Reference parity note: the reference stores video as opaque blobs;
this exceeds it the same way the MP4 box walk does.

100-TB note: ``h264_stream_meta`` and the NAL walk inside
``sample_h264_keyframes`` are the native-codec seam — swap for a
PyAV/ffmpeg demuxer returning the same shapes inside the same
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

NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9


def find_annexb_nals(payload: bytes) -> list[tuple[int, int, int]]:
    """(offset, nal_type, size) for every Annex-B NAL unit (3- or 4-byte
    start codes). Offsets point at the NAL header byte."""
    out = []
    i = 0
    n = len(payload)
    starts = []
    while i + 3 <= n:
        if payload[i] == 0 and payload[i + 1] == 0:
            if payload[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i + 4 <= n and payload[i + 2] == 0 and payload[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    for k, s in enumerate(starts):
        # payload end = next start code (minus its prefix) or stream end
        if k + 1 < len(starts):
            e = starts[k + 1]
            e -= 4 if payload[e - 4 : e] == b"\x00\x00\x00\x01" else 3
        else:
            e = n
        if s < n and (payload[s] & 0x80) == 0:  # forbidden_zero_bit
            out.append((s, payload[s] & 0x1F, e - s))
    return out


def _unescape_rbsp(data: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    i = 0
    while i < len(data):
        if (
            i + 2 < len(data)
            and data[i] == 0
            and data[i + 1] == 0
            and data[i + 2] == 3
        ):
            out += b"\x00\x00"
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


class _EgReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad exp-golomb")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def parse_sps(nal_payload: bytes) -> dict | None:
    """Parse seq_parameter_set_rbsp (H.264 §7.3.2.1.1) far enough to
    recover profile/level and the true frame dimensions (macroblock
    grid minus the 4:2:0 cropping window)."""
    try:
        r = _EgReader(_unescape_rbsp(nal_payload))
        profile_idc = r.u(8)
        r.u(8)  # constraint flags + reserved
        level_idc = r.u(8)
        r.ue()  # sps_id
        chroma_format_idc = 1
        if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
            chroma_format_idc = r.ue()
            if chroma_format_idc == 3:
                r.u(1)  # separate_colour_plane
            r.ue()  # bit_depth_luma_minus8
            r.ue()  # bit_depth_chroma_minus8
            r.u(1)  # qpprime_y_zero_transform_bypass
            if r.u(1):  # seq_scaling_matrix_present
                return None  # scaling lists: gated (rare in practice)
        r.ue()  # log2_max_frame_num_minus4
        poc_type = r.ue()
        if poc_type == 0:
            r.ue()  # log2_max_pic_order_cnt_lsb_minus4
        elif poc_type == 1:
            r.u(1)
            r.se()
            r.se()
            for _ in range(r.ue()):
                r.se()
        r.ue()  # max_num_ref_frames
        r.u(1)  # gaps_in_frame_num_value_allowed
        pw = r.ue() + 1  # pic_width_in_mbs
        ph = r.ue() + 1  # pic_height_in_map_units
        frame_mbs_only = r.u(1)
        if not frame_mbs_only:
            r.u(1)  # mb_adaptive_frame_field
        r.u(1)  # direct_8x8_inference
        crop = (0, 0, 0, 0)
        if r.u(1):  # frame_cropping_flag
            crop = (r.ue(), r.ue(), r.ue(), r.ue())
        width = pw * 16
        height = ph * 16 * (2 - frame_mbs_only)
        if chroma_format_idc == 1:  # 4:2:0 crop units
            cx, cy = 2, 2 * (2 - frame_mbs_only)
        elif chroma_format_idc == 2:
            cx, cy = 2, 1 * (2 - frame_mbs_only)
        else:
            cx, cy = 1, 1 * (2 - frame_mbs_only)
        width -= (crop[0] + crop[1]) * cx
        height -= (crop[2] + crop[3]) * cy
        return {
            "profile_idc": profile_idc,
            "level_idc": level_idc,
            "width": width,
            "height": height,
            "frame_mbs_only": frame_mbs_only,
        }
    except (IndexError, ValueError):
        return None


def _first_mb_in_slice(payload: bytes, off: int, size: int) -> int | None:
    """first_mb_in_slice — the FIRST ue(v) of every slice header
    (H.264 §7.3.3). ==0 means this slice STARTS a new picture; >0 means
    it continues the previous one. Only a few header bytes are needed,
    so unescape a small prefix. None when unparseable."""
    try:
        r = _EgReader(_unescape_rbsp(payload[off + 1 : off + min(size, 16)]))
        return r.ue()
    except (IndexError, ValueError):
        return None


def h264_stream_meta(payload: bytes) -> dict | None:
    """Stream-structure metadata: NAL counts by class, the IDR
    (keyframe) index — byte offsets a frame sampler seeks to — and the
    SPS-derived dimensions. None when no valid NAL units exist.

    n_frames / n_keyframes count PICTURES (access units), not slice NAL
    units: slice NALs are grouped into pictures via first_mb_in_slice
    (the first ue(v) of the slice header; ==0 starts a new picture), so
    a frame coded as multiple slices counts once. keyframe_offsets
    point at the FIRST slice of each IDR picture. An unparseable slice
    header conservatively starts a new picture."""
    nals = find_annexb_nals(payload)
    if not nals:
        return None
    sps = None
    n_idr = n_slice = n_sps = n_pps = n_sei = 0
    idr_offsets = []
    for off, t, size in nals:
        if t == NAL_SPS:
            n_sps += 1
            if sps is None:
                sps = parse_sps(payload[off + 1 : off + size])
        elif t == NAL_PPS:
            n_pps += 1
        elif t in (NAL_IDR, NAL_SLICE):
            fmb = _first_mb_in_slice(payload, off, size)
            new_pic = fmb is None or fmb == 0
            if t == NAL_IDR:
                if new_pic:
                    n_idr += 1
                    idr_offsets.append(off)
            elif new_pic:
                n_slice += 1
        elif t == NAL_SEI:
            n_sei += 1
    if sps is None and n_idr == 0 and n_slice == 0:
        return None
    return {
        "n_nals": len(nals),
        "n_sps": n_sps,
        "n_pps": n_pps,
        "n_sei": n_sei,
        "n_keyframes": n_idr,
        "n_frames": n_idr + n_slice,
        "keyframe_offsets": idr_offsets,
        "width": sps["width"] if sps else None,
        "height": sps["height"] if sps else None,
        "profile_idc": sps["profile_idc"] if sps else None,
        "level_idc": sps["level_idc"] if sps else None,
    }


H264_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("profile_idc", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_keyframes", IntegerType()),
        StructField("keyframe_index", StringType()),  # csv offsets
    ]
)


def decode_h264_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Arrow-batched H.264 structure decode → dimensions + frame/
    keyframe counts + the keyframe byte index. Undecodable payloads are
    dropped."""
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                s = h264_stream_meta(bytes(p))
                if s is not None:
                    rows.append(
                        (
                            int(i),
                            s["width"],
                            s["height"],
                            s["profile_idc"],
                            s["n_frames"],
                            s["n_keyframes"],
                            ",".join(map(str, s["keyframe_offsets"])),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[c.name for c in H264_META_SCHEMA.fields]
            )

    return src.mapInPandas(run, H264_META_SCHEMA)


H264_FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("byte_offset", IntegerType()),
        StructField("nal_bytes", IntegerType()),
        StructField("nal_md5", StringType()),
    ]
)


def sample_h264_keyframes(
    df: DataFrame, id_col: str, payload_col: str, every_nth: int = 1
) -> DataFrame:
    """REAL frame sampling over stream structure: one payload row fans
    out to one row per (every_nth-th) IDR keyframe PICTURE, carrying
    the byte offset/length of its first slice NAL and a content digest
    — the 1→N extraction shape of a video pipeline, with the
    decode-to-pixels stage (the only genuinely gated step) swappable in
    front of the digest. Multi-slice IDR pictures (continuation slices
    have first_mb_in_slice > 0) count once, anchored at the first
    slice. Non-streams produce no rows."""
    import hashlib

    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(p)
                idrs = [
                    (off, size)
                    for off, t, size in find_annexb_nals(data)
                    if t == NAL_IDR
                    and (_first_mb_in_slice(data, off, size) or 0) == 0
                ]
                for fi, (off, size) in enumerate(idrs):
                    if fi % every_nth:
                        continue
                    nal = data[off : off + size]
                    rows.append(
                        (
                            int(i),
                            fi,
                            off,
                            size,
                            hashlib.md5(nal).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[c.name for c in H264_FRAMES_SCHEMA.fields]
            )

    return src.mapInPandas(run, H264_FRAMES_SCHEMA)
