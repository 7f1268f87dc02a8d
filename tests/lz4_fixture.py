"""Test-only LZ4 frame WRITER (naive greedy compressor + frame
builder) so ``ml/lz4lite`` can be exercised without the lz4 package.
The block encoder honors the spec's end-of-block rules (last sequence
is literals-only; no match starts within the last 12 bytes), so a
conforming reference decoder would accept its output too."""

from __future__ import annotations

from prometheus_anomaly_detection_lstm_spark.ml.lz4lite import xxh32


def compress_block_naive(src: bytes) -> bytes:
    """Greedy LZ4 block encoder: hash 4-byte prefixes, extend matches,
    emit (token, literals, offset, matchlen) sequences."""
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    # spec: matches must not start within the last 12 bytes, and the
    # last 5 bytes are always literals
    limit = max(0, n - 12)

    def emit(lit_start: int, lit_end: int, offset: int | None, mlen: int):
        lit = lit_end - lit_start
        tok_lit = 15 if lit >= 15 else lit
        tok_m = 0
        if offset is not None:
            m = mlen - 4
            tok_m = 15 if m >= 15 else m
        out.append((tok_lit << 4) | tok_m)
        rem = lit - 15
        while tok_lit == 15 and rem >= 0:
            out.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
        out.extend(src[lit_start:lit_end])
        if offset is not None:
            out.extend(offset.to_bytes(2, "little"))
            rem = (mlen - 4) - 15
            while tok_m == 15 and rem >= 0:
                out.append(min(rem, 255))
                if rem < 255:
                    break
                rem -= 255

    while i < limit:
        key = src[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and src[cand : cand + 4] == key:
            mlen = 4
            while (
                i + mlen < n - 5 and src[cand + mlen] == src[i + mlen]
            ):
                mlen += 1
            emit(anchor, i, i - cand, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n, None, 0)  # trailing literals-only sequence
    return bytes(out)


def write_lz4_frame(
    content: bytes,
    block_size: int = 1 << 16,
    stored: bool = False,
    block_checksums: bool = False,
    content_checksum: bool = True,
    content_size: bool = False,
    block_independent: bool = True,
) -> bytes:
    """Build a spec-conformant LZ4 frame around ``content``."""
    flg = (0b01 << 6) | (0x20 if block_independent else 0)
    if block_checksums:
        flg |= 0x10
    if content_size:
        flg |= 0x08
    if content_checksum:
        flg |= 0x04
    bd = 4 << 4  # block maxsize code 4 = 64 KB
    desc = bytes([flg, bd])
    if content_size:
        desc += len(content).to_bytes(8, "little")
    out = bytearray(b"\x04\x22\x4d\x18")
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for off in range(0, len(content), block_size) or [0]:
        chunk = content[off : off + block_size]
        if not chunk and len(content) > 0:
            break
        comp = None if stored else compress_block_naive(chunk)
        if stored or comp is None or len(comp) >= len(chunk):
            out += (len(chunk) | 0x80000000).to_bytes(4, "little")
            payload = chunk
        else:
            out += len(comp).to_bytes(4, "little")
            payload = comp
        out += payload
        if block_checksums:
            out += xxh32(payload).to_bytes(4, "little")
        if not content:
            break
    out += (0).to_bytes(4, "little")  # EndMark
    if content_checksum:
        out += xxh32(content).to_bytes(4, "little")
    return bytes(out)
