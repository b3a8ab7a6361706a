"""Pure-stdlib PNG decoder: round-trip against a handwritten encoder that
exercises every scanline filter (None/Sub/Up/Average/Paeth), the color-type
lattice, and the real (non-fake) featurize path end-to-end in mapInPandas."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from seatunnel_spark.operators.multimodal import (
    FEATURE_DIM,
    PNG_SIGNATURE,
    _paeth,
    decode_png,
    image_features,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, color_type: int, filters=None, plte: bytes | None = None) -> bytes:
    """Minimal encoder for tests: 8-bit, no interlace, one chosen filter
    per scanline (forward-filtered, so the decoder must invert it)."""
    h, w, ch = img.shape
    stride = w * ch
    filters = filters or [0] * h
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        line = bytearray(img[y].tobytes())
        f = filters[y % len(filters)]
        out = bytearray(stride)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                out[i] = line[i]
            elif f == 1:
                out[i] = (line[i] - left) & 0xFF
            elif f == 2:
                out[i] = (line[i] - up) & 0xFF
            elif f == 3:
                out[i] = (line[i] - ((left + up) >> 1)) & 0xFF
            else:
                out[i] = (line[i] - _paeth(left, up, ul)) & 0xFF
        raw.append(f)
        raw.extend(out)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte)
    body += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    body += _chunk(b"IEND", b"")
    return PNG_SIGNATURE + body


def _rand_img(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8).reshape(h, w, ch)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_each_filter_roundtrips(filt):
    img = _rand_img(13, 17, 3, seed=filt)
    got = decode_png(encode_png(img, color_type=2, filters=[filt]))
    assert np.array_equal(got, img)


def test_mixed_filters_and_color_types():
    # every filter in one image, row-cycled
    img = _rand_img(20, 9, 3, seed=99)
    got = decode_png(encode_png(img, color_type=2, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, img)
    # greyscale (1ch), grey+alpha (2ch), RGBA (4ch)
    for ch, ct in [(1, 0), (2, 4), (4, 6)]:
        img = _rand_img(7, 11, ch, seed=ch)
        got = decode_png(encode_png(img, color_type=ct, filters=[4, 1]))
        assert got.shape == (7, 11, ch)
        assert np.array_equal(got, img)


def test_palette_resolves_to_rgb():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8).reshape(2, 2, 1)
    png = encode_png(idx, color_type=3, filters=[0], plte=pal.tobytes())
    got = decode_png(png)
    assert got.shape == (2, 2, 3)
    assert np.array_equal(got, pal[idx[:, :, 0]])


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    img = _rand_img(4, 4, 3, seed=1)
    png = bytearray(encode_png(img, color_type=2))
    # flip depth byte (IHDR data starts at offset 16; depth is byte 24)
    png[24] = 16
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(bytes(png))


def test_image_features_shape_and_signal():
    bright = np.full((8, 8, 3), 250, dtype=np.uint8)
    dark = np.full((8, 8, 3), 5, dtype=np.uint8)
    fb, fd = image_features(bright), image_features(dark)
    assert fb.shape == (FEATURE_DIM,) and fd.shape == (FEATURE_DIM,)
    assert fb[3] > 0.9 > 0.1 > fd[3]  # global mean separates them
    assert fb[15] == 1.0 and fd[15] == 0.0  # bright-pixel fraction


def test_real_png_featurize_in_map_in_pandas(spark):
    """The non-fake branch end-to-end: PNG payloads through extract_features
    (mapInPandas, Arrow batches) produce real image stats; a non-PNG payload
    in the same frame raises the honest codec stub."""
    from seatunnel_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    imgs = {i: _rand_img(6 + i, 5, 3, seed=i) for i in range(3)}
    rows = [
        (i, "image", "image/png", 5, 6 + i, 0,
         bytearray(encode_png(imgs[i], color_type=2, filters=[i + 1])))
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_features(df, fake=False).collect()}
    assert len(out) == 3
    for i in range(3):
        want = image_features(imgs[i])
        got = np.array(out[i]["features"], dtype=np.float32)
        assert np.allclose(got, want, atol=1e-6)
        assert out[i]["n_bytes"] == len(rows[i][6])
    bad = spark.createDataFrame(
        [(9, "audio", "audio/wav", None, None, 1000, bytearray(b"RIFFxxxx"))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="requires PIL/ffmpeg"):
        extract_features(bad, fake=False).collect()
