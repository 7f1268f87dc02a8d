"""From-scratch LZ4 reader: xxh32 spec vectors, hand-built block
sequences (overlap-RLE, extended lengths), frame roundtrips through
the naive encoder, checksum enforcement, and the joblib-lz4 container
end-to-end."""

from __future__ import annotations

import io
import pickle

import numpy as np
import pytest

from prometheus_anomaly_detection_lstm_spark.ml.lz4lite import (
    LZ4Error,
    decompress_block,
    decompress_frame,
    xxh32,
)

from .lz4_fixture import compress_block_naive, write_lz4_frame


def test_xxh32_spec_vectors():
    # public vectors from the xxHash reference test suite
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF


def _block(*parts: bytes) -> bytes:
    return b"".join(parts)


def test_block_hand_built_sequences():
    # literals "abcd", match offset 4 len 8 (RLE doubling), then
    # trailing literals "XY": decodes to abcd + abcdabcd + XY
    blk = _block(
        bytes([(4 << 4) | (8 - 4)]), b"abcd", (4).to_bytes(2, "little"),
        bytes([(2 << 4)]), b"XY",
    )
    out = bytearray()
    decompress_block(blk, out)
    assert bytes(out) == b"abcd" + b"abcdabcd" + b"XY"

    # overlap RLE: one literal 'z', match offset 1 len 19 -> 20 z's
    blk = _block(
        bytes([(1 << 4) | 15]), b"z", (1).to_bytes(2, "little"),
        bytes([0]),  # match-length extension: 15 + 0 + 4 = 19
        bytes([(1 << 4)]), b"!",
    )
    out = bytearray()
    decompress_block(blk, out)
    assert bytes(out) == b"z" * 20 + b"!"

    # extended literal length: 270 literals needs 15 + 255 + 0 chain
    lits = bytes(range(256)) + b"quux-tail-pad!"  # 270 bytes
    blk = _block(bytes([(15 << 4)]), bytes([255, 0]), lits)
    out = bytearray()
    decompress_block(blk, out)
    assert bytes(out) == lits


def test_block_error_paths():
    out = bytearray()
    with pytest.raises(LZ4Error, match="offset"):
        decompress_block(
            _block(bytes([0 << 4]), (9).to_bytes(2, "little"), b"\x00"),
            out,
        )
    with pytest.raises(LZ4Error, match="literal run"):
        decompress_block(bytes([(5 << 4)]) + b"ab", bytearray())
    with pytest.raises(LZ4Error, match="zero match offset"):
        decompress_block(
            _block(bytes([(1 << 4) | 0]), b"a", (0).to_bytes(2, "little")),
            bytearray(),
        )


@pytest.mark.parametrize("stored", [True, False])
@pytest.mark.parametrize("block_checksums", [True, False])
def test_frame_roundtrip(stored, block_checksums):
    rng = np.random.default_rng(5)
    payloads = [
        b"",
        b"short",
        b"the quick brown fox " * 400,          # compressible
        bytes(rng.integers(0, 256, 70_000, dtype=np.uint8)),  # incompressible, 2 blocks
        (b"ABCD" * 8192) + bytes(rng.integers(0, 256, 100, dtype=np.uint8)),
    ]
    for p in payloads:
        frame = write_lz4_frame(
            p,
            stored=stored,
            block_checksums=block_checksums,
            content_size=True,
        )
        assert decompress_frame(frame) == p


def test_naive_compressor_actually_compresses():
    p = b"spark catalyst tungsten " * 1000
    comp = compress_block_naive(p)
    assert len(comp) < len(p) // 4
    out = bytearray()
    decompress_block(comp, out)
    assert bytes(out) == p


def test_frame_checksums_enforced():
    p = b"payload under test " * 100
    frame = bytearray(write_lz4_frame(p, block_checksums=True))
    # flip one payload byte: block checksum catches it
    frame[20] ^= 0xFF
    with pytest.raises(LZ4Error, match="checksum"):
        decompress_frame(bytes(frame))
    # header checksum byte itself
    frame2 = bytearray(write_lz4_frame(p))
    frame2[6] ^= 0xFF  # HC byte (magic 4 + FLG/BD 2)
    with pytest.raises(LZ4Error, match="header checksum"):
        decompress_frame(bytes(frame2))


def test_frame_rejects_garbage():
    with pytest.raises(LZ4Error, match="magic"):
        decompress_frame(b"not a frame")
    with pytest.raises(LZ4Error, match="version"):
        decompress_frame(b"\x04\x22\x4d\x18" + bytes([0b10 << 6, 4 << 4, 0]))


def test_joblib_lz4_container_end_to_end(tmp_path):
    """joblib compress='lz4' layout: an LZ4 frame wrapping the standard
    pickle-with-inline-payload stream — read back through
    joblib_lite.read_joblib with the from-scratch decoder."""
    from prometheus_anomaly_detection_lstm_spark.ml.joblib_lite import (
        read_joblib,
        scaler_params_from_joblib,
    )

    from .joblib_fixture import dump_joblib_like, fitted_minmax

    plain = tmp_path / "scaler.joblib"
    dump_joblib_like(fitted_minmax([0.0, 5.0], [2.0, 9.0]), str(plain))
    framed = tmp_path / "scaler.lz4.joblib"
    framed.write_bytes(write_lz4_frame(plain.read_bytes()))

    obj = read_joblib(str(framed))
    assert type(obj).__name__ == "MinMaxScaler"
    rows = scaler_params_from_joblib(str(framed), ["a", "b"])
    assert [r["min"] for r in rows] == [0.0, 5.0]
    assert [r["max"] for r in rows] == [2.0, 9.0]


def test_dictionary_linked_frames_are_refused():
    # r7 ADVICE: a dict-compressed frame decoded without its dictionary
    # either fails confusingly mid-block or yields silently-wrong bytes
    # — the reader must refuse at the descriptor, before any decode.
    frame = bytearray(write_lz4_frame(b"hello world" * 10))
    frame[4] |= 0x01  # FLG DictID bit
    with pytest.raises(LZ4Error, match="dictionary"):
        decompress_frame(bytes(frame))
