"""Real PNG decode through the distributed multimodal path."""

from __future__ import annotations

import numpy as np
import pytest

from prometheus_anomaly_detection_lstm_spark.operators.multimodal import (
    decode_png_batch,
)
from prometheus_anomaly_detection_lstm_spark.plans import png as P


def _raster(rng, w, h):
    return [
        [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
        for _ in range(h)
    ]


def test_decoder_roundtrip_all_filters():
    """encode -> decode is identity; filtered PNGs (Sub/Up/Avg/Paeth)
    from a reference encoder decode too (hand-built filtered IDAT)."""
    rng = np.random.default_rng(3)
    raster = _raster(rng, 9, 5)
    data = P.encode_png(raster)
    w, h, rgb = P.decode_rgb(data)
    assert (w, h) == (9, 5)
    flat = bytes(c for row in raster for px in row for c in px)
    assert rgb == flat

    # re-encode the same raster with each nontrivial filter type and
    # check the unfilter logic reproduces identical pixels
    import struct
    import zlib

    stride = 3 * w

    def refilter(ftype: int) -> bytes:
        prev = bytearray(stride)
        out = b""
        for y in range(h):
            line = bytearray(flat[y * stride : (y + 1) * stride])
            enc = bytearray(line)
            for i in reversed(range(stride)):
                left = line[i - 3] if i >= 3 else 0
                upleft = prev[i - 3] if i >= 3 else 0
                if ftype == 1:
                    enc[i] = (line[i] - left) & 0xFF
                elif ftype == 2:
                    enc[i] = (line[i] - prev[i]) & 0xFF
                elif ftype == 3:
                    enc[i] = (line[i] - (left + prev[i]) // 2) & 0xFF
                elif ftype == 4:
                    enc[i] = (line[i] - P._paeth(left, prev[i], upleft)) & 0xFF
            out += bytes([ftype]) + bytes(enc)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(out))
            + P._chunk(b"IEND", b"")
        )

    for ftype in (1, 2, 3, 4):
        w2, h2, rgb2 = P.decode_rgb(refilter(ftype))
        assert (w2, h2, rgb2) == (w, h, flat), f"filter {ftype}"


def test_distributed_png_decode(spark):
    rng = np.random.default_rng(7)
    payloads = []
    expected = {}
    for i in range(12):
        wd, ht = int(rng.integers(4, 20)), int(rng.integers(4, 16))
        raster = _raster(rng, wd, ht)
        data = P.encode_png(raster)
        payloads.append((i, bytearray(data), "image/png"))
        flat = np.array(
            [c for row in raster for px in row for c in px], dtype=np.uint8
        )
        expected[i] = (wd, ht, float(flat.mean()))
    payloads.append((99, bytearray(b"not a png"), "image/png"))
    media = spark.createDataFrame(
        payloads, ["media_id", "payload", "media_type"]
    )
    out = {r.media_id: r for r in decode_png_batch(media).collect()}
    assert len(out) == 13
    for i, (wd, ht, mean) in expected.items():
        r = out[i]
        assert (r.width, r.height) == (wd, ht)
        assert r.n_pixels == wd * ht
        assert r.mean_intensity == pytest.approx(mean)
        assert r.err is None
    # corrupt record isolated, not fatal
    assert out[99].width is None and "PNG" in out[99].err


# ------------------------------------------------- perceptual-hash dedup

def test_phash_banded_join_equals_brute_force(spark):
    """Pigeonhole completeness: the banded candidate join must yield
    EXACTLY the brute-force Hamming<=7 pair set."""
    import numpy as np

    from prometheus_anomaly_detection_lstm_spark.operators import multimodal as M

    docs = M._docs(spark, "/root/testdata/sf0.001")
    media = M.as_binary_table(docs)
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in M.phash_near_dup_pairs(media).collect()
    }
    codes = {
        r["media_id"]: int(np.int64(r["phash"]).astype(np.uint64))
        for r in M.phash_codes(media).collect()
    }
    ids = sorted(codes)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(codes[a] ^ codes[b]).count("1")
            if h <= M.PHASH_MAX_HAMMING:
                want.add((a, b, h))
    assert got == want
    assert got  # binds on the corpus
    # and stays selective: near-dup, not all-pairs
    assert len(got) < len(ids) * (len(ids) - 1) / 2 / 4


def test_phash_identical_payloads_collide_at_zero(spark):
    from prometheus_anomaly_detection_lstm_spark.operators import multimodal as M

    media = spark.createDataFrame(
        [(1, b"the same bytes exactly", "image/fake"),
         (2, b"the same bytes exactly", "image/fake"),
         (3, b"completely different payload here with other text", "image/fake")],
        "media_id long, payload binary, media_type string",
    )
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in M.phash_near_dup_pairs(media).collect()}
    assert pairs.get((1, 2)) == 0
