"""Stdlib PNG codec + real-codec multimodal plumbing + PNG report sink.

Upgrades VERDICT r1 items 4 (real codec through mapInPandas) and 8 (PNG
report parity without matplotlib).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from big_data_occupancy_detection_spark.ext.png_codec import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    grayscale,
    resize_nn,
    tile_means,
)


def _gradient(w: int, h: int, channels: int) -> bytes:
    return bytes(
        (x * 7 + y * 13 + c * 31) % 256
        for y in range(h)
        for x in range(w)
        for c in range(channels)
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip(channels):
    w, h = 17, 11  # odd sizes catch stride bugs
    pixels = _gradient(w, h, channels)
    out = decode_png(encode_png(pixels, w, h, channels))
    assert out == (w, h, channels, pixels)


def test_decode_all_filter_types():
    """Hand-filter scanlines with types 1-4 and check the decoder inverts
    them (our encoder only emits type 0, so round-trip alone can't)."""
    w, h, ch = 8, 5, 3
    pixels = _gradient(w, h, ch)
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    for y, ftype in zip(range(h), [1, 2, 3, 4, 0]):
        row = pixels[y * stride : (y + 1) * stride]
        prior = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
        raw.append(ftype)
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if ftype == 0:
                raw.append(row[x])
            elif ftype == 1:
                raw.append((row[x] - a) & 0xFF)
            elif ftype == 2:
                raw.append((row[x] - b) & 0xFF)
            elif ftype == 3:
                raw.append((row[x] - ((a + b) >> 1)) & 0xFF)
            else:
                raw.append((row[x] - paeth(a, b, c)) & 0xFF)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert decode_png(png) == (w, h, ch, pixels)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")


def test_grayscale_and_tile_means():
    rgb = bytes([10, 20, 30, 90, 120, 150])  # two pixels
    assert grayscale(rgb, 3) == bytes([20, 120])
    feats = tile_means(bytes([0, 255, 255, 255]), 2)
    assert feats == [pytest.approx(127.5 / 255.0), pytest.approx(1.0)]
    assert tile_means(b"", 4) == [0.0] * 4


def test_resize_nn_2d():
    # 2x2 checkerboard upscaled 4x4: quadrants preserved (not 1-D smearing)
    px = bytes([0, 255, 255, 0])
    up = resize_nn(px, 2, 2, 1, 4, 4)
    assert up == bytes([0, 0, 255, 255] * 2 + [255, 255, 0, 0] * 2)


# ------------------------------------------------- Spark real-codec paths


def _media_df(spark, images: dict[int, bytes]):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in images.items()], "doc_id long, payload binary"
    )


def test_decode_features_real_codec(spark):
    from big_data_occupancy_detection_spark.ext.multimodal import (
        FEATURE_DIM,
        decode_features,
    )

    w, h = 12, 9
    images = {
        1: encode_png(_gradient(w, h, 3), w, h, 3),
        2: encode_png(_gradient(w, h, 1), w, h, 1),
    }
    rows = {
        r["doc_id"]: r
        for r in decode_features(_media_df(spark, images), real_codec=True).collect()
    }
    for doc_id, png in images.items():
        _, _, ch, pixels = decode_png(png)
        expected = tile_means(grayscale(pixels, ch), FEATURE_DIM)
        assert rows[doc_id]["n_bytes"] == len(png)
        assert rows[doc_id]["features"] == [pytest.approx(v, abs=1e-6) for v in expected]


def test_sample_frames_real_codec(spark):
    from big_data_occupancy_detection_spark.ext.multimodal import sample_frames

    frames = [encode_png(_gradient(4, 4, 1, ), 4, 4, 1) for _ in range(6)]
    # make frames distinct
    frames = [
        encode_png(bytes((b + i) % 256 for b in _gradient(4, 4, 1)), 4, 4, 1)
        for i in range(6)
    ]
    video = b"".join(frames)
    out = sample_frames(
        _media_df(spark, {7: video}), every_n=2, real_codec=True
    ).collect()
    assert [r["frame_index"] for r in sorted(out, key=lambda r: r["frame_index"])] == [0, 2, 4]
    for r in out:
        # every sampled frame is a complete, decodable PNG
        assert decode_png(bytes(r["frame_bytes"]))[:2] == (4, 4)
        assert bytes(r["frame_bytes"]) == frames[r["frame_index"]]


def test_resize_media_real_codec(spark):
    from big_data_occupancy_detection_spark.ext.multimodal import resize_media

    w, h = 10, 6
    src = _gradient(w, h, 3)
    images = {3: encode_png(src, w, h, 3)}
    out = resize_media(
        _media_df(spark, images), width=5, height=3, real_codec=True
    ).collect()
    assert len(out) == 1
    rw, rh, ch, pixels = decode_png(bytes(out[0]["resized"]))
    assert (rw, rh, ch) == (5, 3, 3)
    assert pixels == resize_nn(src, w, h, 3, 5, 3)


def test_fake_codec_paths_unchanged(spark):
    """The oracle-backed default (fake codec) must keep its contract."""
    from big_data_occupancy_detection_spark.ext.multimodal import (
        FEATURE_DIM,
        decode_features,
    )

    df = _media_df(spark, {1: b"hello world"})
    row = decode_features(df).collect()[0]
    assert len(row["features"]) == FEATURE_DIM
    assert row["n_bytes"] == 11


# ------------------------------------------------------- PNG report sink


def test_plotting_pngs_decode():
    from big_data_occupancy_detection_spark.ml.plotting import (
        confusion_matrix_png,
        line_chart_png,
    )

    cm = confusion_matrix_png({(0, 0): 90, (0, 1): 10, (1, 0): 5, (1, 1): 95})
    w, h, ch, _ = decode_png(cm)
    assert ch == 3 and w > 100 and h > 100

    roc = line_chart_png([(0.0, 0.0), (0.2, 0.8), (1.0, 1.0)], diagonal=True)
    w, h, ch, pixels = decode_png(roc)
    assert (w, h, ch) == (360, 360, 3)
    # the curve actually drew something non-white
    assert any(pixels[i : i + 3] != b"\xff\xff\xff" for i in range(0, len(pixels), 3))
