"""Real stdlib WAV codec: round-trip, known-signal features, Spark path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.ext import wav_codec as W


def _sine(n=8000, rate=8000, freq=440, amp=16000):
    return [int(amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]


def test_roundtrip():
    samples = _sine(n=1000)
    data = W.encode_wav(samples, sample_rate=8000)
    rate, nch, got = W.decode_wav(data)
    assert (rate, nch) == (8000, 1)
    assert got == samples


def test_known_signal_features():
    # 1 second of 440 Hz sine at 8 kHz: duration 1 s, rms = amp/sqrt(2),
    # zero-crossing rate ~ 2*freq/rate
    samples = _sine()
    feats = W.wav_features(W.encode_wav(samples))
    duration, rms, zc, peak = feats
    assert duration == 1.0
    assert abs(rms - 16000 / math.sqrt(2)) / (16000 / math.sqrt(2)) < 0.01
    assert abs(zc - 2 * 440 / 8000) / (2 * 440 / 8000) < 0.02
    assert 0.48 < peak < 0.5  # 16000/32768


def test_silence_and_clipping_flags():
    silent = W.wav_features(W.encode_wav([0] * 4000))
    assert silent[1] == 0.0 and silent[3] == 0.0
    clipped = W.wav_features(W.encode_wav([32767, -32768] * 2000))
    assert clipped[3] > 0.999


def test_audio_features_spark_path(spark):
    rows = [
        (1, bytearray(W.encode_wav(_sine(n=4000)))),
        (2, bytearray(W.encode_wav([0] * 2000))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: (r["duration_s"], r["rms"], r["peak_norm"])
        for r in W.audio_features(media).collect()
    }
    assert out[1][0] == 0.5 and out[1][2] > 0.4
    assert out[2] == (0.25, 0.0, 0.0)


def test_wav_features_stereo_strides_by_channel():
    """Interleaved stereo: left alternates sign every sample (ZCR 1.0),
    right is constant positive (ZCR 0.0) — channel-aware rate is 0.5.
    The round-3 interleaved walk saw L/R sign flips at every step and
    reported ~1.0."""
    left = [1000 if i % 2 == 0 else -1000 for i in range(100)]
    right = [500] * 100
    inter = [s for lr in zip(left, right) for s in lr]
    feats = W.wav_features(W.encode_wav(inter, n_channels=2))
    assert abs(feats[2] - 0.5) < 0.02
    # duration counts frames, not interleaved samples: 100 frames @ 8 kHz
    assert abs(feats[0] - 100 / 8000) < 1e-9


def test_wav_features_peak_norm_respects_sampwidth():
    """8-bit PCM full scale is 128, 32-bit is 2^31 — normalizing by
    32768 regardless (round-3) made an 8-bit full-scale wave report
    peak_norm ~0.004."""
    w8 = W.wav_features(W.encode_wav([127, -128] * 100, sampwidth=1))
    assert abs(w8[3] - 1.0) < 0.01
    full32 = 2**31 - 1
    w32 = W.wav_features(W.encode_wav([full32, -full32] * 10, sampwidth=4))
    assert abs(w32[3] - 1.0) < 0.01
