"""H.264 Annex-B structure decoder vs a test-side SPS/NAL builder —
the SPS fields are written bit-for-bit per H.264 §7.3.2.1.1, so the
expected dimensions are closed-form."""

from __future__ import annotations

from ranger_spark.operators.h264 import (
    find_annexb_nals,
    h264_stream_meta,
    parse_sps,
)


class _EgWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int):
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes(self) -> bytes:
        bits = list(self.bits)
        bits.append(1)  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            out.append(int("".join(map(str, bits[i : i + 8])), 2))
        return bytes(out)


def _escape_rbsp(data: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _build_sps(width_mbs: int, height_mbs: int, crop=(0, 0, 0, 0),
               profile=66) -> bytes:
    w = _EgWriter()
    w.u(profile, 8)  # profile_idc (66 = baseline)
    w.u(0, 8)  # constraint flags
    w.u(30, 8)  # level 3.0
    w.ue(0)  # sps_id
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2 (no extra fields)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps allowed
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui absent
    return bytes([0x67]) + _escape_rbsp(w.bytes())  # nal_ref_idc=3, type 7


def _annexb(*nals: bytes) -> bytes:
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)


def test_sps_dimensions_and_cropping():
    # 1280x720 = 80x45 MBs, no crop
    sps = parse_sps(_build_sps(80, 45)[1:])
    assert sps is not None and (sps["width"], sps["height"]) == (1280, 720)
    assert sps["profile_idc"] == 66
    # 1920x1080 = 120x68 MBs with bottom crop of 8 luma rows (4 units of 2)
    sps2 = parse_sps(_build_sps(120, 68, crop=(0, 0, 0, 4))[1:])
    assert sps2 is not None and (sps2["width"], sps2["height"]) == (1920, 1080)


# slice-header prefixes: first ue(v) is first_mb_in_slice.
# 0x88 = 1000 1000 -> ue = 0 (starts a new picture);
# 0x50 = 0101 0000 -> ue = 1 (continuation slice of the same picture)
_NEW_PIC = bytes([0x88])
_CONT = bytes([0x50])


def test_stream_meta_counts_and_keyframe_index():
    sps = _build_sps(8, 6)  # 128x96
    pps = bytes([0x68, 0xCE, 0x38, 0x80])
    idr = bytes([0x65]) + _NEW_PIC + b"\x11\x22\x33"
    p1 = bytes([0x41]) + _NEW_PIC + b"\x44\x55"
    p2 = bytes([0x41]) + _NEW_PIC + b"\x66"
    stream = _annexb(sps, pps, idr, p1, p2, idr)
    meta = h264_stream_meta(stream)
    assert meta is not None
    assert (meta["width"], meta["height"]) == (128, 96)
    assert meta["n_keyframes"] == 2 and meta["n_frames"] == 4
    assert meta["n_sps"] == 1 and meta["n_pps"] == 1
    # the keyframe index points at the IDR NAL header bytes
    for off in meta["keyframe_offsets"]:
        assert stream[off] == 0x65


def test_multi_slice_pictures_count_once():
    """A picture coded as multiple slice NALs (continuation slices have
    first_mb_in_slice > 0) is ONE frame / ONE keyframe."""
    sps = _build_sps(8, 6)
    idr_a = bytes([0x65]) + _NEW_PIC + b"\x01"
    idr_a2 = bytes([0x65]) + _CONT + b"\x02"  # same IDR picture
    p_b = bytes([0x41]) + _NEW_PIC + b"\x03"
    p_b2 = bytes([0x41]) + _CONT + b"\x04"  # same P picture
    stream = _annexb(sps, idr_a, idr_a2, p_b, p_b2)
    meta = h264_stream_meta(stream)
    assert meta["n_keyframes"] == 1 and meta["n_frames"] == 2
    assert len(meta["keyframe_offsets"]) == 1
    assert stream[meta["keyframe_offsets"][0] + 1] == _NEW_PIC[0]


def test_nal_scan_handles_3byte_start_codes_and_emulation():
    sps = _build_sps(4, 4)
    idr = bytes([0x65, 0x00, 0x00, 0x03, 0x01])  # emulation inside payload
    stream = b"\x00\x00\x01" + sps + b"\x00\x00\x01" + idr
    nals = find_annexb_nals(stream)
    assert [t for _, t, _ in nals] == [7, 5]
    meta = h264_stream_meta(stream)
    assert meta["n_keyframes"] == 1 and meta["width"] == 64


def test_rejects_non_streams():
    assert h264_stream_meta(b"") is None
    assert h264_stream_meta(b"\xff\xd8\xff\xd9") is None
    assert h264_stream_meta(b"\x00\x00\x00\x01\xff") is None  # forbidden bit


def test_h264_operator_over_spark(spark):
    sps = _build_sps(8, 6)
    pps = bytes([0x68, 0xCE])
    rows = []
    for i in range(4):
        idrs = [bytes([0x65]) + _NEW_PIC + bytes([i] * 3)] * (i + 1)
        rows.append((i, bytearray(_annexb(sps, pps, *idrs))))
    rows.append((99, bytearray(b"junk")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    from ranger_spark.operators.h264 import decode_h264_meta

    out = decode_h264_meta(df, "doc_id", "payload").toPandas()
    assert len(out) == 4
    got = dict(zip(out.doc_id, out.n_keyframes))
    assert got == {0: 1, 1: 2, 2: 3, 3: 4}
    assert (out.width == 128).all()


def test_h264_keyframe_sampling_fanout(spark):
    """Real 1→N frame extraction: each payload fans out to its sampled
    IDR keyframes with byte offsets + digests (the stub's shape, now
    over real stream structure)."""
    import hashlib

    sps = _build_sps(4, 4)
    idrs = [bytes([0x65]) + _NEW_PIC + bytes([k] * 4) for k in range(5)]
    stream = _annexb(sps, *idrs)
    df = spark.createDataFrame(
        [(1, bytearray(stream))], "doc_id long, payload binary"
    )
    from ranger_spark.operators.h264 import sample_h264_keyframes

    out = sample_h264_keyframes(df, "doc_id", "payload", every_nth=2)
    pdf = out.toPandas().sort_values("frame_index")
    assert list(pdf.frame_index) == [0, 2, 4]
    for _, row in pdf.iterrows():
        nal = stream[row.byte_offset : row.byte_offset + row.nal_bytes]
        assert nal[0] == 0x65
        assert hashlib.md5(nal).hexdigest() == row.nal_md5
