"""Audio feature pins: RMS/ZCR closed forms on synthesized PCM16
(sine, silence, square), short/empty/NULL payload edges, framing
math, and the registry plumbing query."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.operators import multimodal as M

from .conftest import SF_SMALL


def _pcm(x: np.ndarray) -> bytes:
    return (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(rows)],
        "media_id long, payload binary",
    )


def test_sine_and_silence_closed_forms(spark):
    sr = 8000
    t = np.arange(sr) / sr
    sine = np.sin(2 * np.pi * 440 * t) * 0.5        # 440 Hz, amp 0.5
    silence = np.zeros(sr)
    got = {
        r.media_id: r
        for r in M.audio_features(
            _media(spark, [_pcm(sine), _pcm(silence)])
        ).collect()
    }
    # RMS of a sine = amp / sqrt(2); quantization error << 1e-3
    assert got[0].mean_rms == pytest.approx(0.5 / np.sqrt(2), abs=1e-3)
    assert got[0].max_rms == pytest.approx(0.5 / np.sqrt(2), abs=1e-3)
    # ZCR of a sine ~ 2 f / sr crossings per sample
    assert got[0].mean_zcr == pytest.approx(2 * 440 / sr, rel=0.05)
    assert got[1].mean_rms == 0.0
    assert got[1].mean_zcr == 0.0
    assert got[0].n_samples == sr
    assert got[0].n_frames == 1 + (sr - M.AUDIO_FRAME) // M.AUDIO_HOP


def test_square_wave_zcr_scales_with_frequency(spark):
    sr = 8000
    t = np.arange(sr)
    rows = [_pcm(np.sign(np.sin(2 * np.pi * f * t / sr)) * 0.9) for f in (100, 400)]
    got = {r.media_id: r for r in M.audio_features(_media(spark, rows)).collect()}
    assert got[1].mean_zcr == pytest.approx(4 * got[0].mean_zcr, rel=0.1)
    assert got[0].mean_rms == pytest.approx(0.9, abs=1e-2)


def test_edge_payloads(spark):
    short = _pcm(np.array([0.25] * 10))   # shorter than one frame
    got = {
        r.media_id: r
        for r in M.audio_features(
            _media(spark, [short, b"", b"\x01"])
        ).collect()
    }
    assert got[0].n_samples == 10 and got[0].n_frames == 1
    assert got[0].mean_rms == pytest.approx(0.25, abs=1e-3)
    assert got[1].n_frames == 0 and got[1].mean_rms is None
    assert got[2].n_frames == 0  # single byte: no full sample


def test_registry_plumbing_query(spark):
    df = M.q_audio_features(spark, SF_SMALL)
    rows = df.collect()
    n_docs = M._docs(spark, SF_SMALL).count()
    assert len(rows) == n_docs
    assert all(r.n_frames >= 1 for r in rows)  # every doc has >= 2 bytes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow path only
