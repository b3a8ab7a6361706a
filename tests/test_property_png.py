"""Property-based PNG round-trip: for ANY 8-bit image (random dims,
channel layouts, per-row filter choices), encode-with-filter →
decode-with-unfilter is the identity. Pure Python + numpy (no JVM);
the Spark-side mapInPandas path is pinned by tests/test_png.py."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from seatunnel_spark.operators.multimodal import decode_png
from tests.test_png import encode_png

_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type


@st.composite
def images(draw):
    h = draw(st.integers(min_value=1, max_value=24))
    w = draw(st.integers(min_value=1, max_value=24))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    filters = draw(
        st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=6)
    )
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return img, ch, filters


@settings(max_examples=120, deadline=None)
@given(images())
def test_png_roundtrip_any_image_any_filters(case):
    img, ch, filters = case
    png = encode_png(img, color_type=_COLOR_TYPE[ch], filters=filters)
    got = decode_png(png)
    assert got.shape == img.shape
    assert np.array_equal(got, img)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_palette_roundtrip(n_colors, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.randint(0, n_colors, size=(5, 7, 1), dtype=np.uint8)
    png = encode_png(idx, color_type=3, filters=[seed % 5], plte=pal.tobytes())
    got = decode_png(png)
    assert got.shape == (5, 7, 3)
    assert np.array_equal(got, pal[idx[:, :, 0]])
