"""Stdlib WAV (RIFF/PCM) codec for the audio half of the multimodal
plumbing — the audio twin of ``ext/png_codec.py``.

No external audio library exists in this environment, but WAV PCM is a
pure-stdlib format (`wave` + bytes math), so the audio path can run a
REAL decode end-to-end: parse header → PCM frames → per-window
features, all inside Arrow batches on executors. Features are the
standard cheap audio descriptors (duration, RMS energy, zero-crossing
rate, peak) a curation pipeline uses for silence/clipping filters.

All functions are driver-agnostic pure bytes→values transforms; the
Spark-side batching lives in ``ext/multimodal.py``-style ``mapInPandas``
wrappers in :func:`audio_features` below.
"""

from __future__ import annotations

import io
import math
import struct
import wave
from typing import Iterator

from pyspark.sql import DataFrame


def encode_wav(
    samples: list[int],
    sample_rate: int = 8000,
    sampwidth: int = 2,
    n_channels: int = 1,
) -> bytes:
    """PCM-encode int samples to WAV bytes (interleaved if n_channels>1).
    sampwidth=2 → int16."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        fmt = {1: "b", 2: "h", 4: "i"}[sampwidth]
        w.writeframes(struct.pack(f"<{len(samples)}{fmt}", *samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_channels, samples) from WAV bytes; multi-channel
    frames are interleaved in the returned list."""
    rate, nch, _w, samples = decode_wav_full(data)
    return rate, nch, samples


def decode_wav_full(data: bytes) -> tuple[int, int, int, list[int]]:
    """(sample_rate, n_channels, sampwidth, samples) — the width-carrying
    decode the feature extractor needs for correct peak normalization."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    fmt = {1: "b", 2: "h", 4: "i"}[width]
    n = len(raw) // width
    return rate, nch, width, list(struct.unpack(f"<{n}{fmt}", raw))


def wav_features(data: bytes) -> list[float]:
    """[duration_s, rms, zero_cross_rate, peak_norm] of a WAV payload.

    Deterministic pure-python math on the PCM stream — the executor-side
    decode step of an audio curation pass (silence filter: rms ≈ 0;
    clipping filter: peak_norm ≈ 1). Channel-aware: samples are
    interleaved, so the zero-cross rate strides by channel (adjacent
    list entries belong to DIFFERENT channels for nch>1 — comparing them
    measures inter-channel sign flips, not the waveform) and is averaged
    across channels; peak normalizes by the PCM full scale of the ACTUAL
    sample width (2^(8·width−1)), not a hardcoded int16.
    """
    rate, nch, width, samples = decode_wav_full(data)
    if not samples:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(samples)
    duration = n / (rate * nch)
    rms = math.sqrt(sum(s * s for s in samples) / n)
    crossings = transitions = 0
    for ch in range(nch):
        chan = samples[ch::nch]
        crossings += sum(
            1 for i in range(1, len(chan)) if (chan[i - 1] < 0) != (chan[i] < 0)
        )
        transitions += max(len(chan) - 1, 0)
    zc = crossings / max(transitions, 1)
    peak = max(abs(s) for s in samples)
    full_scale = float(2 ** (8 * width - 1))
    return [round(duration, 6), round(rms, 6), round(zc, 6), round(peak / full_scale, 6)]


def audio_features(
    media: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, duration_s, rms, zero_cross_rate, peak_norm) via mapInPandas —
    one Arrow batch per task, the real WAV decode running executor-side.
    Same batching/partitioning contract as ``multimodal.decode_features``."""
    import pandas as pd

    from ..operators.partitioning import repartition_for_compute

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [wav_features(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "duration_s": [f[0] for f in feats],
                    "rms": [f[1] for f in feats],
                    "zero_cross_rate": [f[2] for f in feats],
                    "peak_norm": [f[3] for f in feats],
                }
            )

    src = repartition_for_compute(media.select(id_col, payload_col))
    return src.mapInPandas(
        extract,
        schema=f"{id_col} long, duration_s double, rms double, "
        "zero_cross_rate double, peak_norm double",
    )
