"""FLAC decoder round-trip tests against an independent test-side
encoder — FLAC is lossless, so every decode must reproduce the
encoder's input samples EXACTLY (asserted through peak/rms/count
equality with directly computed values)."""

from __future__ import annotations

import numpy as np
import pytest

from ranger_spark.operators.flac import parse_flac_stream


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            out.append(int("".join(map(str, self.bits[i : i + 8])), 2))
        return bytes(out)


def _signed(w: _BitWriter, v: int, n: int):
    w.write(v & ((1 << n) - 1), n)


def _rice(w: _BitWriter, residuals: list[int], p: int):
    for e in residuals:
        u = (2 * e) if e >= 0 else (-2 * e - 1)  # zigzag
        w.write_unary(u >> p)
        if p:
            w.write(u & ((1 << p) - 1), p)


def _residual_block(w: _BitWriter, residuals: list[int]):
    # method 0 (4-bit rice), partition order 0, param sized to data
    w.write(0, 2)
    w.write(0, 4)
    mx = max((2 * abs(e) + 1 for e in residuals), default=1)
    p = min(14, max(0, mx.bit_length() - 1))
    w.write(p, 4)
    _rice(w, residuals, p)


def _subframe_verbatim(w: _BitWriter, s: list[int], bits: int):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)  # no wasted bits
    for v in s:
        _signed(w, v, bits)


def _subframe_constant(w: _BitWriter, v: int, bits: int, wasted: int = 0):
    w.write(0, 1)
    w.write(0, 6)
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)  # unary count = wasted - 1 zeros then 1
        _signed(w, v >> wasted, bits - wasted)
    else:
        w.write(0, 1)
        _signed(w, v, bits)


def _subframe_fixed2(w: _BitWriter, s: list[int], bits: int):
    w.write(0, 1)
    w.write(8 + 2, 6)  # FIXED order 2
    w.write(0, 1)
    _signed(w, s[0], bits)
    _signed(w, s[1], bits)
    res = [s[i] - (2 * s[i - 1] - s[i - 2]) for i in range(2, len(s))]
    _residual_block(w, res)


def _subframe_lpc2(w: _BitWriter, s: list[int], bits: int,
                   coefs=(3, -1), shift=1, prec=4):
    w.write(0, 1)
    w.write(32 | (2 - 1), 6)  # LPC order 2
    w.write(0, 1)
    _signed(w, s[0], bits)
    _signed(w, s[1], bits)
    w.write(prec - 1, 4)
    _signed(w, shift, 5)
    for c in coefs:
        _signed(w, c, prec)
    res = [
        s[i] - ((coefs[0] * s[i - 1] + coefs[1] * s[i - 2]) >> shift)
        for i in range(2, len(s))
    ]
    _residual_block(w, res)


def _encode_flac(chans: list[list[int]], rate=44100, bits=16,
                 subframe="verbatim", stereo=None, wasted=0,
                 total_samples=None) -> bytes:
    n = len(chans[0])
    nch = len(chans)
    # STREAMINFO
    si = _BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n if total_samples is None else total_samples, 36)
    si.align()
    body = si.bytes() + b"\x00" * 16
    meta = bytes([0x80]) + len(body).to_bytes(3, "big") + body

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)  # blocksize: 16-bit n-1 follows
    w.write(0, 4)  # sample rate from STREAMINFO
    ch_code = 10 if stereo == "mid_side" else nch - 1
    w.write(ch_code, 4)
    w.write(4, 3)  # 16-bit sample size code
    w.write(0, 1)
    w.write(0, 8)  # utf8 frame number 0
    w.write(n - 1, 16)
    w.write(0, 8)  # CRC-8 (decoder skips)

    def emit(sub, samples, b):
        if sub == "verbatim":
            _subframe_verbatim(w, samples, b)
        elif sub == "constant":
            _subframe_constant(w, samples[0], b, wasted)
        elif sub == "fixed2":
            _subframe_fixed2(w, samples, b)
        elif sub == "lpc2":
            _subframe_lpc2(w, samples, b)

    if stereo == "mid_side":
        l, r = chans
        mid = [(a + b) >> 1 for a, b in zip(l, r)]
        side = [a - b for a, b in zip(l, r)]
        emit(subframe, mid, bits)
        emit(subframe, side, bits + 1)
    else:
        for c in chans:
            emit(subframe, c, bits)
    w.align()
    w.write(0, 16)  # CRC-16 (decoder skips)
    return b"fLaC" + meta + w.bytes()


def _expect(chans):
    flat = [v for c in chans for v in c]
    peak = max(abs(v) for v in flat)
    rms = (sum(v * v for v in flat) / len(flat)) ** 0.5
    return peak, rms


def test_flac_verbatim_roundtrip_exact():
    rng = np.random.default_rng(5)
    chans = [
        [int(v) for v in rng.integers(-32768, 32768, 300)]
        for _ in range(2)
    ]
    got = parse_flac_stream(_encode_flac(chans))
    assert got is not None
    assert (got["channels"], got["sample_rate"], got["bits"]) == (2, 44100, 16)
    assert got["n_samples"] == 300
    peak, rms = _expect(chans)
    assert got["peak"] == peak and abs(got["rms"] - rms) < 1e-9


def test_flac_fixed_predictor_rice_roundtrip():
    # smooth signal: fixed order-2 prediction leaves small residuals
    t = np.arange(400)
    sig = [int(v) for v in np.round(3000 * np.sin(t / 25) + 40 * (t % 7))]
    got = parse_flac_stream(_encode_flac([sig], subframe="fixed2"))
    assert got is not None and got["channels"] == 1
    peak, rms = _expect([sig])
    assert got["peak"] == peak and abs(got["rms"] - rms) < 1e-9


def test_flac_lpc_subframe_roundtrip():
    rng = np.random.default_rng(9)
    sig = [0, 5]
    for _ in range(250):
        sig.append(
            max(-30000, min(30000, sig[-1] * 2 - sig[-2]
                            + int(rng.integers(-40, 41))))
        )
    got = parse_flac_stream(_encode_flac([sig], subframe="lpc2"))
    assert got is not None
    peak, rms = _expect([sig])
    assert got["peak"] == peak and abs(got["rms"] - rms) < 1e-9


def test_flac_mid_side_stereo_roundtrip():
    rng = np.random.default_rng(13)
    left = [int(v) for v in rng.integers(-20000, 20000, 256)]
    right = [int(v) for v in rng.integers(-20000, 20000, 256)]
    got = parse_flac_stream(
        _encode_flac([left, right], subframe="verbatim", stereo="mid_side")
    )
    assert got is not None and got["channels"] == 2
    peak, rms = _expect([left, right])
    assert got["peak"] == peak and abs(got["rms"] - rms) < 1e-9


def test_flac_constant_with_wasted_bits():
    # all samples = -1024 = (-256) << 2: encoded at 14 bits + 2 wasted
    chans = [[-1024] * 128]
    got = parse_flac_stream(
        _encode_flac(chans, subframe="constant", wasted=2)
    )
    assert got is not None
    assert got["peak"] == 1024 and abs(got["rms"] - 1024.0) < 1e-9


def test_flac_rejects_garbage():
    assert parse_flac_stream(b"\x00\x01\x02") is None
    assert parse_flac_stream(b"fLaC") is None
    assert parse_flac_stream(b"RIFF....WAVE") is None


def test_flac_unknown_total_with_trailing_garbage():
    """STREAMINFO total_samples=0 means 'unknown' — trailing non-frame
    bytes (an ID3v1-style tag, or a partial byte) after the last frame
    must end the walk, not discard the decoded frames."""
    chans = [[100, -200, 300, -400] * 25]
    peak, rms = _expect(chans)
    base = _encode_flac(chans, total_samples=0)
    for tail in (b"TAG" + b"x" * 125, b"\x00", b"\x7f\xff"):
        got = parse_flac_stream(base + tail)
        assert got is not None, tail
        assert got["n_samples"] == 100
        assert got["peak"] == peak and abs(got["rms"] - rms) < 1e-9
    # but a first-frame sync failure is still a hard reject
    # (fLaC magic 4 + block header 4 + STREAMINFO body 34 = 42 bytes)
    assert parse_flac_stream(base[:42] + b"TAGjunk") is None


def test_flac_operator_over_spark(spark):
    rng = np.random.default_rng(21)
    rows = []
    for i in range(6):
        chans = [[int(v) for v in rng.integers(-32768, 32768, 64)]]
        rows.append((i, bytearray(_encode_flac(chans))))
    rows.append((99, bytearray(b"not flac")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    from ranger_spark.operators.flac import decode_flac_stats

    out = decode_flac_stats(df, "doc_id", "payload").toPandas()
    assert len(out) == 6  # the junk payload is dropped
    assert set(out.doc_id) == set(range(6))
    assert (out.n_samples == 64).all()
