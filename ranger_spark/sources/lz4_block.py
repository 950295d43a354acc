"""Pure-Python LZ4 *block* codec (stdlib-only) for the native wire
protocol's LZ4/LZ4HC enums.

Implements the public LZ4 block format (lz4/doc/lz4_Block_format.md):
a sequence stream of [token][literals][2-byte LE offset][matchlen
continuation], matches copied byte-wise from the already-produced
output (overlap allowed, offset 1..65535), minimum match 4, and the
end-of-block rules (last sequence is literals-only; a match never
covers the last 5 bytes; no match starts within 12 bytes of the end).
Output produced here decompresses with any conforming LZ4 decoder and
vice versa.

Encoder: greedy hash-table matcher (the reference "fast" shape); the
HC variant walks a short hash *chain* and picks the longest candidate —
format-identical, better ratio, slower. Both bound memory: the
decompressor takes an explicit output cap and raises the moment the
stream tries to exceed it (wire bomb guard — enforced DURING
decompression, mirroring the deflate path in native_server.py:132-161).

Reference surface: pkg/sdk/client.go:51-58 declares LZ4=1/LZ4HC=2;
the reference delegates to the lz4 C library, unavailable offline —
this module closes that capability gate with the public format.
"""

from __future__ import annotations

_MIN_MATCH = 4
_MFLIMIT = 12  # no match may start within 12 bytes of block end
_LAST_LITERALS = 5  # final 5 bytes are always literals
_MAX_OFFSET = 0xFFFF


def _write_length(base: int, extra: int) -> bytes:
    """LZ4 length continuation: value-15 emitted as 255-run + remainder."""
    out = bytearray()
    n = extra
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)
    return bytes(out)


def compress_block(data: bytes, hc: bool = False) -> bytes:
    """Greedy LZ4 block encoder; ``hc`` walks an 8-deep hash chain for
    longer matches (same bitstream format)."""
    n = len(data)
    if n == 0:
        return b"\x00"  # token 0: zero literals, end of block
    if n < _MFLIMIT + 1:
        return _emit_literal_tail(data, 0)
    out = bytearray()
    # hash table: 4-byte prefix -> positions (chain for hc, last for fast)
    table: dict[int, list[int]] = {}
    chain_depth = 8 if hc else 1
    i = 0
    anchor = 0
    limit = n - _MFLIMIT  # last position where a match may start
    while i <= limit:
        key = int.from_bytes(data[i : i + 4], "little")
        cands = table.get(key)
        best_len = 0
        best_pos = -1
        if cands:
            for pos in reversed(cands[-chain_depth:]):
                if i - pos > _MAX_OFFSET:
                    break
                if data[pos : pos + 4] != data[i : i + 4]:
                    continue
                # extend; matches must stop 5 bytes before block end
                m = 4
                max_m = n - _LAST_LITERALS - i
                while m < max_m and data[pos + m] == data[i + m]:
                    m += 1
                if m > best_len:
                    best_len, best_pos = m, pos
                    if not hc:
                        break
        bucket = table.setdefault(key, [])
        bucket.append(i)
        if len(bucket) > chain_depth:
            del bucket[: len(bucket) - chain_depth]
        if best_len >= _MIN_MATCH:
            lit = data[anchor:i]
            _emit_sequence(out, lit, i - best_pos, best_len)
            i += best_len
            anchor = i
        else:
            i += 1
    out += _emit_literal_tail(data[anchor:], 0)
    return bytes(out)


def _emit_sequence(
    out: bytearray, literals: bytes, offset: int, mlen: int
) -> None:
    lit_len = len(literals)
    ml = mlen - _MIN_MATCH
    token = (min(lit_len, 15) << 4) | min(ml, 15)
    out.append(token)
    if lit_len >= 15:
        out += _write_length(15, lit_len - 15)
    out += literals
    out += offset.to_bytes(2, "little")
    if ml >= 15:
        out += _write_length(15, ml - 15)


def _emit_literal_tail(literals: bytes, _pad: int) -> bytes:
    lit_len = len(literals)
    out = bytearray()
    out.append(min(lit_len, 15) << 4)
    if lit_len >= 15:
        out += _write_length(15, lit_len - 15)
    out += literals
    return bytes(out)


def decompress_block(data: bytes, max_out: int) -> bytes:
    """Decode an LZ4 block, raising ValueError on malformed input or the
    moment output would exceed ``max_out`` (bomb guard DURING decode)."""
    out = bytearray()
    i = 0
    n = len(data)
    if n == 0:
        raise ValueError("empty lz4 block")
    while i < n:
        token = data[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise ValueError("truncated lz4 literal length")
                b = data[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise ValueError("truncated lz4 literals")
        if len(out) + lit_len > max_out:
            raise ValueError("lz4 output exceeds declared length")
        out += data[i : i + lit_len]
        i += lit_len
        if i == n:
            break  # last sequence: literals only
        if i + 2 > n:
            raise ValueError("truncated lz4 offset")
        offset = int.from_bytes(data[i : i + 2], "little")
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError("invalid lz4 match offset")
        mlen = (token & 0x0F) + _MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                if i >= n:
                    raise ValueError("truncated lz4 match length")
                b = data[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        if len(out) + mlen > max_out:
            raise ValueError("lz4 output exceeds declared length")
        # slice copy; an overlapping match (offset < mlen) is by
        # definition a periodic repetition of the last `offset` bytes
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            chunk = bytes(out[start:])
            reps = mlen // offset + 1
            out += (chunk * reps)[:mlen]
    return bytes(out)
