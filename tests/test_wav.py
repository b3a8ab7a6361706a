"""Real RIFF/WAVE PCM decode (the audio twin of test_png): byte-exact
round-trip through the genuine container layout, channel mixdown, loud
failures on malformed/truncated/compressed input, and the mapInPandas
real-decode seam routing WAV payloads through audio_features."""

import numpy as np
import pytest

from seatunnel_spark.operators.multimodal import (
    FEATURE_DIM,
    audio_features,
    decode_wav,
    extract_features,
    synthesize_wav,
)


def test_wav_roundtrip_16bit_exact():
    data = synthesize_wav(440.0, n_samples=4000, rate=8000, bits=16)
    x, rate = decode_wav(data)
    assert rate == 8000 and len(x) == 4000
    t = np.arange(4000) / 8000.0
    expect = np.round(np.sin(2 * np.pi * 440.0 * t) * 32767) / 32768.0
    assert np.allclose(x, expect.astype(np.float32), atol=1e-6)


def test_wav_roundtrip_8bit_and_stereo_mixdown():
    d8 = synthesize_wav(100.0, n_samples=800, rate=800, bits=8)
    x8, rate = decode_wav(d8)
    assert rate == 800 and len(x8) == 800 and np.abs(x8).max() <= 1.0

    st = synthesize_wav(220.0, n_samples=1000, rate=8000, n_channels=2)
    mono = synthesize_wav(220.0, n_samples=1000, rate=8000, n_channels=1)
    xs, _ = decode_wav(st)
    xm, _ = decode_wav(mono)
    # identical duplicated channels mix down to the mono signal
    assert len(xs) == 1000 and np.allclose(xs, xm, atol=1e-6)


def test_wav_loud_failures():
    good = synthesize_wav(440.0, n_samples=100, rate=8000)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxABCD" + good[12:])          # not WAVE
    with pytest.raises(ValueError):
        decode_wav(good[:40])                             # truncated data
    # non-PCM format code -> honest NotImplementedError, never zeros
    import struct
    bad = bytearray(good)
    off = good.index(b"fmt ") + 8
    struct.pack_into("<H", bad, off, 3)                   # IEEE float fmt
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_audio_features_shape_and_signal():
    x, rate = decode_wav(synthesize_wav(440.0, n_samples=8000, rate=8000))
    f = audio_features(x, rate)
    assert f.shape == (FEATURE_DIM,)
    assert 0.69 < f[1] < 0.72          # sine rms ~ 1/sqrt(2)
    assert f[2] > 0.99                 # peak ~ 1
    silence = audio_features(np.zeros(1000, dtype=np.float32), 8000)
    assert silence[1] == 0.0 and silence[2] == 0.0


def test_extract_features_real_wav_through_mapinpandas(spark):
    from seatunnel_spark.operators.multimodal import MEDIA_SCHEMA

    wav = synthesize_wav(440.0, n_samples=2000, rate=8000)
    rows = [(0, "audio", "audio/wav", 0, 0, 250, bytearray(wav))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert r["kind"] == "audio" and r["n_bytes"] == len(wav)
    assert len(r["features"]) == FEATURE_DIM and r["features"][1] > 0.5
