"""From-scratch LZ4 FRAME reader (+ xxHash32) — no lz4 package.

Closes the last joblib-container gap (``ml/joblib_lite``): a
``joblib.dump(obj, path, compress='lz4')`` artifact is one LZ4 frame
wrapping the standard pickle-with-inline-payload layout.  Both formats
are public specifications:

* block format — a sequence of (token, literals, offset, matchlen)
  records; the match copies from the already-decoded output, byte by
  byte, so offset < matchlen is legal RLE (lz4_Block_format.md);
* frame format — magic ``04 22 4D 18``, FLG/BD descriptor (version 01,
  flags for block independence / block checksums / content size /
  content checksum / dict id), header-checksum byte
  ``(xxh32(descriptor) >> 8) & 0xFF``, then data blocks (4-byte LE
  length; high bit set = stored/uncompressed), an ``00000000`` end
  mark, and an optional xxh32 content checksum
  (lz4_Frame_format.md);
* xxHash32 — the 5-prime rotate/multiply lane hash used by the frame's
  checksums (xxhash spec); implemented here because the stdlib has no
  xxh32 and checksummed frames should actually be VERIFIED.

Block-linked frames (B.Indep = 0) decode naturally because every block
decompresses into one contiguous output buffer — back-references may
reach across block boundaries up to the format's 64 KB window.

This is an artifact-scale reader (scalers/models, KBs-MBs, fully in
memory) — not a dataset codec.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFF
_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)

LZ4_FRAME_MAGIC = b"\x04\x22\x4d\x18"


class LZ4Error(ValueError):
    """Malformed or unsupported LZ4 stream."""


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 per the public spec (stripes of 4 lanes, then 4-byte
    lanes, then bytes, then avalanche)."""
    n = len(data)
    i = 0
    if n >= 16:
        a1 = (seed + _P1 + _P2) & _MASK
        a2 = (seed + _P2) & _MASK
        a3 = seed & _MASK
        a4 = (seed - _P1) & _MASK
        while i + 16 <= n:
            for j, acc in enumerate((a1, a2, a3, a4)):
                lane = int.from_bytes(data[i + 4 * j : i + 4 * j + 4], "little")
                acc = (acc + lane * _P2) & _MASK
                acc = (_rotl(acc, 13) * _P1) & _MASK
                if j == 0:
                    a1 = acc
                elif j == 1:
                    a2 = acc
                elif j == 2:
                    a3 = acc
                else:
                    a4 = acc
            i += 16
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl((h + lane * _P3) & _MASK, 17) * _P4) & _MASK
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _MASK, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _MASK
    h ^= h >> 13
    h = (h * _P3) & _MASK
    h ^= h >> 16
    return h


def decompress_block(src: bytes, out: bytearray) -> None:
    """Decode one LZ4 block APPENDING into ``out`` (the shared output
    buffer — block-linked matches may reach back into earlier blocks).

    Spec walk: token high nibble = literal count (15 chains 255-bytes),
    literals, then — unless the block ends — 2-byte LE match offset and
    low nibble + 4 = match length (15 chains).  Matches copy from the
    already-written output one byte at a time (overlap = RLE is legal).
    """
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise LZ4Error("truncated literal-length chain")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise LZ4Error("literal run past end of block")
        out += src[i : i + lit]
        i += lit
        if i == n:
            return  # last sequence: literals only
        if i + 2 > n:
            raise LZ4Error("truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise LZ4Error("zero match offset")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if i >= n:
                    raise LZ4Error("truncated match-length chain")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise LZ4Error("match offset reaches before output start")
        for j in range(mlen):  # byte-wise: overlapping copies are RLE
            out.append(out[start + j])


def decompress_frame(data: bytes, verify_checksums: bool = True) -> bytes:
    """Decode one LZ4 frame (magic through EndMark); returns content.

    Verifies the header-checksum byte and — when the frame carries
    them — per-block and content xxh32 checksums."""
    if not data.startswith(LZ4_FRAME_MAGIC):
        raise LZ4Error("missing LZ4 frame magic")
    i = 4
    if i + 2 > len(data):
        raise LZ4Error("truncated frame descriptor")
    flg, bd = data[i], data[i + 1]
    if (flg >> 6) != 0b01:
        raise LZ4Error(f"unsupported frame version {flg >> 6}")
    has_b_checksum = bool(flg & 0x10)
    has_c_size = bool(flg & 0x08)
    has_c_checksum = bool(flg & 0x04)
    has_dict_id = bool(flg & 0x01)
    if has_dict_id:
        # a dict-compressed frame decoded without its dictionary either
        # fails confusingly mid-block or yields silently-wrong bytes
        # into the unpickler — refuse up front (r7 ADVICE).
        raise LZ4Error("dictionary-linked frames unsupported")
    if (bd >> 4) & 0x07 not in (4, 5, 6, 7):
        raise LZ4Error("invalid block-maxsize code")
    desc_end = i + 2 + (8 if has_c_size else 0) + (4 if has_dict_id else 0)
    if desc_end + 1 > len(data):
        raise LZ4Error("truncated frame descriptor")
    content_size = (
        int.from_bytes(data[i + 2 : i + 10], "little") if has_c_size else None
    )
    hc = data[desc_end]
    if verify_checksums and hc != (xxh32(data[i:desc_end]) >> 8) & 0xFF:
        raise LZ4Error("frame header checksum mismatch")
    i = desc_end + 1

    out = bytearray()
    while True:
        if i + 4 > len(data):
            raise LZ4Error("truncated block length")
        word = int.from_bytes(data[i : i + 4], "little")
        i += 4
        if word == 0:  # EndMark
            break
        stored = bool(word & 0x80000000)
        size = word & 0x7FFFFFFF
        if i + size > len(data):
            raise LZ4Error("truncated block payload")
        block = data[i : i + size]
        i += size
        if has_b_checksum:
            if i + 4 > len(data):
                raise LZ4Error("truncated block checksum")
            bcs = int.from_bytes(data[i : i + 4], "little")
            i += 4
            if verify_checksums and bcs != xxh32(block):
                raise LZ4Error("block checksum mismatch")
        if stored:
            out += block
        else:
            decompress_block(block, out)
    if has_c_checksum:
        if i + 4 > len(data):
            raise LZ4Error("truncated content checksum")
        ccs = int.from_bytes(data[i : i + 4], "little")
        i += 4
        if verify_checksums and ccs != xxh32(bytes(out)):
            raise LZ4Error("content checksum mismatch")
    if content_size is not None and content_size != len(out):
        raise LZ4Error(
            f"content size mismatch: header {content_size}, got {len(out)}"
        )
    return bytes(out)
