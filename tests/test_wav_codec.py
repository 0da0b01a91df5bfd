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
