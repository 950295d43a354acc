"""Pure-Python zstd (RFC 8878) frame codec tests.

Round-trip properties cover every encoder shape; hand-built frames
cover the decoder-only paths a real zstd ENCODER would produce but
ours never emits (RLE sequence modes, repeat-offset codes incl. the
literals-length-0 shift, treeless literals, FSE-compressed Huffman
weights, single-segment frames, alternate FCS widths). The binding
probe at the bottom fails loudly with promotion instructions the
moment a real zstd library appears in the environment.
"""

from __future__ import annotations

import os
import random

import pytest

import ranger_spark.sources.zstd_frame as Z
from ranger_spark.sources.zstd_frame import compress, decompress, xxh64


# ------------------------------------------------------------- xxhash64
def test_xxh64_published_vectors():
    # XXH64 of empty input with seed 0 — published reference constant
    assert xxh64(b"") == 0xEF46DB3751D8E999
    # structural: seed changes the digest, length > 32 exercises lanes
    assert xxh64(b"x" * 100) != xxh64(b"x" * 100, seed=1)
    assert xxh64(b"x" * 100) != xxh64(b"x" * 99)


# ------------------------------------------------------------ round trip
CASES = [
    b"",
    b"a",
    b"ab",
    b"\x00" * 500,                       # RLE block
    b"hello world " * 400,               # sequences + huffman literals
    bytes(range(256)) * 3,               # high bytes -> raw literals
    b"The quick brown fox. " * 13000,    # multi-block (>256 KiB)
]


@pytest.mark.parametrize("data", CASES, ids=[f"case{i}" for i in range(len(CASES))])
def test_round_trip(data):
    z = compress(data)
    assert decompress(z, max_out=max(len(data), 1)) == data


def test_round_trip_real_text_compresses():
    data = open(os.path.join(os.path.dirname(__file__), "..", "NOTES.md"), "rb").read()
    z = compress(data)
    assert decompress(z, max_out=len(data)) == data
    assert len(z) < 0.75 * len(data)  # genuinely compressing, not storing


def test_incompressible_falls_back_to_raw():
    data = os.urandom(50000)
    z = compress(data)
    assert len(z) <= len(data) + 64  # raw blocks + frame overhead only
    assert decompress(z, max_out=len(data)) == data


def test_structured_fuzz_round_trip():
    rng = random.Random(11)
    for t in range(150):
        n = rng.randrange(0, 4000)
        pool = rng.choice(
            [b"abcd", b"the quick fox ", bytes([rng.randrange(256)]),
             os.urandom(17)]
        )
        parts = []
        while sum(map(len, parts)) < n:
            if rng.random() < 0.5:
                parts.append(pool * rng.randrange(1, 30))
            else:
                parts.append(os.urandom(rng.randrange(1, 50)))
        data = b"".join(parts)[:n]
        z = compress(data)
        assert decompress(z, max_out=max(n, 1)) == data, t


# ------------------------------------------------------------ bomb / cap
def test_cap_enforced_during_decode():
    data = b"A" * 1_000_000  # RLE: tiny frame, huge content
    z = compress(data)
    assert len(z) < 200
    with pytest.raises(ValueError):
        decompress(z, max_out=1000)
    # declared FCS already over the cap is rejected before any block
    assert decompress(z, max_out=1_000_000) == data


def test_checksum_and_truncation_rejected():
    data = b"hello world " * 100
    z = bytearray(compress(data))
    z[-1] ^= 0xFF  # corrupt the xxh64 low-32 checksum
    with pytest.raises(ValueError):
        decompress(bytes(z), max_out=len(data))
    with pytest.raises(ValueError):
        decompress(compress(data)[:20], max_out=len(data))
    with pytest.raises(ValueError):
        decompress(b"\x00\x01\x02\x03", max_out=10)  # bad magic


# ------------------------------------- hand-built decoder-only vectors
def _frame(blocks: bytes, content: bytes, checksum=False, single=False,
           fcs_flag=2) -> bytes:
    out = bytearray()
    out += (0xFD2FB528).to_bytes(4, "little")
    fhd = (fcs_flag << 6) | ((1 if single else 0) << 5) | ((1 if checksum else 0) << 2)
    out.append(fhd)
    if not single:
        out.append(0x38)  # 128 KiB window
    n = len(content)
    if fcs_flag == 0:
        if single:
            out.append(n)
    elif fcs_flag == 1:
        out += (n - 256).to_bytes(2, "little")
    elif fcs_flag == 2:
        out += n.to_bytes(4, "little")
    else:
        out += n.to_bytes(8, "little")
    out += blocks
    if checksum:
        out += (xxh64(content) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def _raw_lit(lits: bytes) -> bytes:
    h = 0 | (1 << 2) | (len(lits) << 4)  # Raw literals, 12-bit size
    return h.to_bytes(2, "little") + lits


def _block(payload: bytes, btype=2, last=1, size=None) -> bytes:
    size = len(payload) if size is None else size
    return (last | (btype << 1) | (size << 3)).to_bytes(3, "little") + payload


def test_rle_sequence_modes_and_initial_repeat_offset():
    # one sequence, all three tables in RLE mode:
    # ll=2, OF symbol 0 -> offset_value 1 -> Repeated_Offset1 (initial 1),
    # ML symbol 1 -> match length 4
    seq = bytes([1, 0x54, 2, 0, 1]) + b"\x01"  # nseq, modes, LL/OF/ML syms, empty bitstream
    payload = _raw_lit(b"abcabc") + seq
    content = b"ab" + b"b" * 4 + b"cabc"
    got = decompress(_frame(_block(payload), content), max_out=100)
    assert got == content


def test_repeat_offset_shift_with_zero_literals():
    # block 1: OF RLE symbol 2 -> ofv = 4 + 2 bits; bits=01 -> ofv 5 ->
    # real offset 2; reps become [2, 1, 4]
    b1_seq = bytes([1, 0x54, 4, 2, 1])  # ll=4, of_sym=2, ml sym 1 (ml=4)
    # bitstream: decoder reads OF extra (2 bits) -> write value 1 in 2 bits
    w = Z._BitWriter()
    w.add(1, 2)
    b1 = _raw_lit(b"abcd") + b1_seq + w.close()
    # block 2: ll=0 and ofv=1 -> idx = 0+1 -> offset = reps[1] == 1
    b2_seq = bytes([1, 0x54, 0, 0, 2]) + b"\x01"  # ll=0, of_sym=0, ml=5
    b2 = _raw_lit(b"") + b2_seq
    blocks = _block(b1, last=0) + _block(b2, last=1)
    # exec block1: lits abcd, then match ml=4 offset 2 -> abcd + cdcd
    # exec block2: ll=0, offset reps[1]=1 -> repeat last byte 5x
    content = b"abcd" + b"cdcd" + b"d" * 5
    got = decompress(_frame(blocks, content), max_out=100)
    assert got == content


def test_treeless_literals_reuse_previous_table():
    lits1 = (b"ananas banana bandana " * 40)[:800]
    sec1 = Z._huf_encode_literals(lits1)
    assert sec1 is not None and sec1[0] & 3 == 2
    # rebuild the same codes to write a TREELESS (type 3) section
    freq = {}
    for b in lits1:
        freq[b] = freq.get(b, 0) + 1
    weights = Z._huf_build(freq)
    table, max_bits = Z._huf_weights_to_table(list(weights))
    codes, idx, seen = {}, 0, set()
    while idx < len(table):
        sym, nb = table[idx]
        if sym not in seen:
            seen.add(sym)
            codes[sym] = (idx >> (max_bits - nb), nb)
        idx += 1 << (max_bits - nb)
    lits2 = lits1[:100]
    w = Z._BitWriter()
    for b in reversed(lits2):
        c, nb = codes[b]
        w.add(c, nb)
    body = w.close()
    h = 3 | (0 << 2) | (len(lits2) << 4) | (len(body) << 14)
    sec2 = h.to_bytes(3, "little") + body
    blocks = _block(sec1 + b"\x00", last=0) + _block(sec2 + b"\x00", last=1)
    content = lits1 + lits2
    assert decompress(_frame(blocks, content), max_out=2000) == content


def test_single_segment_and_fcs_widths():
    data = b"q" * 300  # RLE block
    rle = _block(b"q", btype=1, size=300)
    # single-segment, 1-byte FCS impossible (>255): use fcs_flag 1 (2 bytes)
    assert decompress(_frame(rle, data, single=True, fcs_flag=1), 400) == data
    assert decompress(_frame(rle, data, fcs_flag=3), 400) == data
    small = b"hi"
    blk = _block(small, btype=0)
    assert decompress(_frame(blk, small, single=True, fcs_flag=0), 10) == small
    # content-size mismatch is rejected
    with pytest.raises(ValueError):
        decompress(_frame(rle, data[:-1], fcs_flag=2), 400)


# ---------------------- FSE-compressed Huffman weights (decoder-only path)
def _write_ncount(norm, acc) -> bytes:
    """Test-side FSE table-description writer (inverse of _fse_read_norm)."""
    bits = []  # (value, nbits) LSB-first

    def put(v, n):
        bits.append((v, n))

    put(acc - 5, 4)
    remaining = (1 << acc) + 1
    threshold = 1 << acc
    nbits = acc + 1
    i = 0
    while remaining > 1 and i < len(norm):
        c = norm[i]
        maxv = (2 * threshold - 1) - remaining
        stored = c + 1
        if stored < maxv:
            put(stored, nbits - 1)
        else:
            v = stored if stored < threshold else stored + maxv
            put(v & ((1 << nbits) - 1), nbits)
        remaining -= -c if c < 0 else c
        i += 1
        if c == 0:
            # repeat-zero flags for any further zeros
            run = 0
            while i < len(norm) and norm[i] == 0:
                run += 1
                i += 1
            while run >= 3:
                put(3, 2)
                run -= 3
            put(run, 2)
        while remaining < threshold and remaining > 1:
            nbits -= 1
            threshold >>= 1
    out = 0
    pos = 0
    for v, n in bits:
        out |= v << pos
        pos += n
    return out.to_bytes((pos + 7) // 8, "little")


def _fse_weight_stream(weights, norm, acc) -> bytes:
    """Two-interleaved-state FSE weight encoder (mirror of the decode
    loop in _huf_read_tree)."""
    st, tt = Z._fse_encode_table(norm, acc)
    chains = [weights[0::2], weights[1::2]]
    toks = [[], []]  # per-chain reversed transition bit tokens
    states = []
    for c in (0, 1):
        syms = chains[c]
        cs = Z._CState(st, tt, acc, syms[-1])
        for s in reversed(syms[:-1]):
            w = Z._BitWriter()
            cs.encode(w, s)
            # extract the bits just written (value, nbits)
            toks[c].append((w.c, w.pos))
        states.append(cs.value & ((1 << acc) - 1))
    # chronological decode reads: s1init, s2init, t0(c0), t1(c1), t2(c0)...
    # of N-2 transitions total (the last transition is the overflow)
    n = len(weights)
    order = []  # chain index of transition j (sets state for weight j+2)
    for j in range(n - 2):
        order.append(j % 2)
    w = Z._BitWriter()
    ptr = [0, 0]
    for j in reversed(range(n - 2)):
        c = order[j]
        v, nb = toks[c][ptr[c]]
        ptr[c] += 1
        w.add(v, nb)
    w.add(states[1], acc)
    w.add(states[0], acc)
    return w.close()


def test_fse_compressed_huffman_weights_decode():
    # weights for 20 symbols (symbol values are the weights themselves
    # here): a stream with weights in {1, 2}; the 21st weight is implied
    weights = [1, 2, 1, 1, 2, 1, 2, 2, 1, 1, 1, 2, 1, 1, 2, 1, 1, 2, 1, 2]
    # norm over the weight ALPHABET {0,1,2}: symbols 1 and 2 both appear
    norm = [0, 20, 12]  # sums to 32 = 1<<5
    acc = 5
    desc = _write_ncount(norm, acc)
    stream = _fse_weight_stream(weights, norm, acc)
    comp = desc + stream
    tree_desc = bytes([len(comp)]) + comp  # hbyte < 128 -> FSE weights
    table, max_bits, used = Z._huf_read_tree(tree_desc, 0)
    assert used == 1 + len(comp)
    # independently compute the expected table from the direct-path code
    total = sum(1 << (w - 1) for w in weights)
    rest = (1 << total.bit_length()) - total
    expected_weights = weights + [rest.bit_length()]
    exp_table, exp_bits = Z._huf_weights_to_table(list(expected_weights))
    assert (table, max_bits) == (exp_table, exp_bits)


# ----------------------------------------------------- predefined tables
def test_predefined_distributions_sum_to_table_size():
    for (norm, acc) in (Z._LL_DEFAULT, Z._ML_DEFAULT, Z._OF_DEFAULT):
        cells = sum(1 if c == -1 else c for c in norm)
        assert cells == 1 << acc
        Z._fse_decode_table(norm, acc)  # spread must terminate at pos 0


def test_code_tables_are_contiguous():
    # each (baseline, extra) range must end where the next begins
    prev_end = 16
    for base, extra in Z._LL_EXTRA:
        assert base == prev_end
        prev_end = base + (1 << extra)
    prev_end = 35
    for base, extra in Z._ML_EXTRA:
        assert base == prev_end
        prev_end = base + (1 << extra)


def test_corruption_fuzz_never_escapes_valueerror():
    """The server decodes CLIENT-SUPPLIED bytes: every mutation of a
    valid frame (and pure garbage) must raise ValueError — never
    IndexError/KeyError — and never allocate past the cap."""
    rng = random.Random(99)
    base = compress(b"the quick brown fox " * 300)
    for t in range(400):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            if len(b) <= 5:
                break
            op = rng.random()
            if op < 0.4:
                b[rng.randrange(4, len(b))] ^= 1 << rng.randrange(8)
            elif op < 0.7:
                del b[rng.randrange(4, len(b)) :]
            else:
                b[rng.randrange(4, len(b)) :] = os.urandom(rng.randrange(1, 30))
        try:
            out = decompress(bytes(b), max_out=20000)
            assert len(out) <= 20000
        except ValueError:
            pass  # the only acceptable failure mode
    for t in range(100):
        junk = b"\x28\xb5\x2f\xfd" + os.urandom(rng.randrange(0, 200))
        try:
            out = decompress(junk, max_out=20000)
            assert len(out) <= 20000
        except ValueError:
            pass


# --------------------------- libzstd interop (ALWAYS ON — via pyarrow)
def _libzstd():
    import pyarrow as pa

    return pa.Codec("zstd")


def _interop_corpus():
    here = os.path.dirname(__file__)
    cases = [
        b"", b"a", b"\x00" * 500, b"hello world " * 400,
        bytes(range(256)) * 3,
        open(os.path.join(here, "..", "NOTES.md"), "rb").read(),
        os.urandom(60000),
        b"The quick brown fox. " * 13000,
    ]
    rng = random.Random(3)
    for _ in range(60):
        n = rng.randrange(0, 6000)
        pool = rng.choice([b"abcd", b"json json ", os.urandom(13)])
        parts = []
        while sum(map(len, parts)) < n:
            parts.append(
                pool * rng.randrange(1, 30)
                if rng.random() < 0.5
                else os.urandom(rng.randrange(1, 50))
            )
        cases.append(b"".join(parts)[:n])
    return cases


def test_libzstd_decodes_our_frames():
    """Real libzstd (pyarrow ships it for parquet) must accept every
    frame our encoder produces — the compliance gate that caught the
    xxh64 tail-masking bug and would catch any bitstream drift."""
    c = _libzstd()
    for i, d in enumerate(_interop_corpus()):
        z = compress(d)
        got = bytes(c.decompress(z, decompressed_size=len(d)))
        assert got == d, (i, len(d))


def test_we_decode_libzstd_frames():
    """Our decoder must accept everything a REAL zstd encoder emits —
    real FSE tables, Huffman trees, 4-stream literals, repeat offsets;
    this is the gate that caught the wrong ML predefined distribution."""
    c = _libzstd()
    for i, d in enumerate(_interop_corpus()):
        z = bytes(c.compress(d))
        assert decompress(z, max_out=max(len(d), 1)) == d, (i, len(d))


# state->symbol layouts probed OUT OF libzstd with crafted
# single-sequence frames (two tables in RLE mode pinning the third) —
# ground truth for the predefined distributions, frozen here
_ML_LAYOUT_LIBZSTD = [
    0, 1, 2, 3, 5, 6, 8, 10, 13, 16, 19, 22, 25, 28, 31, 33, 35, 37,
    39, 41, 43, 45, 1, 2, 3, 4, 6, 7, 9, 12, 15, 18, 21, 24, 27, 30,
    32, 34, 36, 38, 40, 42, 44, 1, 1, 2, 4, 5, 7, 8, 11, 14, 17, 20,
    23, 26, 29, 52, 51, 50, 49, 48, 47, 46,
]
_LL_LAYOUT_LIBZSTD = [
    0, 0, 1, 3, 4, 6, 7, 9, 10, 12, 14, 16, 18, 19, 21, 22, 24, 25,
    26, 27, 29, 31, 0, 1, 2, 4, 5, 7, 8, 10, 11, 13, 16, 17, 19, 20,
    22, 23, 25, 25, 26, 28, 30, 0, 1, 2, 3, 5, 6, 8, 9, 11, 12, 15,
    17, 18, 20, 21, 23, 24, 35, 34, 33, 32,
]


def test_predefined_tables_match_libzstd_probed_layouts():
    ml = [Z._fse_decode_table(*Z._ML_DEFAULT)[s][0] for s in range(64)]
    assert ml == _ML_LAYOUT_LIBZSTD
    ll = [Z._fse_decode_table(*Z._LL_DEFAULT)[s][0] for s in range(64)]
    assert ll == _LL_LAYOUT_LIBZSTD


def test_dedicated_binding_probe():
    """compression.zstd (3.14+) / zstandard stay probed: if one
    appears it outranks pyarrow in the wire chain — validate it then."""
    try:
        from compression import zstd as binding  # noqa: F401
    except ImportError:
        try:
            import zstandard as binding  # noqa: F401
        except ImportError:
            pytest.skip("no dedicated zstd binding (pyarrow interop "
                        "already gates compliance)")
    data = b"promotion check " * 200
    ours = compress(data)
    dec = binding.ZstdDecompressor()
    try:
        out = dec.decompress(ours, max_output_size=len(data))
    except TypeError:
        out = dec.decompress(ours)
    assert out == data, "PROMOTION: binding rejected our frame — fix now"
