"""Pure-stdlib PNG codec (functions/png.py) and its m07 operator."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nlp_data_pipeline_spark.functions.png import decode_png, encode_png, is_png


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    channels=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_roundtrip_arbitrary_filters(w, h, channels, seed, data):
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    payload = encode_png(pixels, filters)
    assert is_png(payload)
    w2, h2, c2, back = decode_png(payload)
    assert (w2, h2, c2) == (w, h, channels)
    assert (back == pixels).all()


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_decode_image_dispatch():
    from nlp_data_pipeline_spark.operators.multimodal import decode_image

    png = encode_png(np.zeros((2, 3, 3), dtype=np.uint8))
    meta = decode_image(png)
    assert (meta["width"], meta["height"]) == (3, 2)
    assert meta["format"] == "image/png;ch=3"
    # non-PNG bytes keep the deterministic stub (m02's oracle contract)
    fake = decode_image(b"hello world")
    assert fake["format"] == "fake/raw" and fake["n_bytes"] == 11


def test_m07_fixture_stats_exact(spark):
    from nlp_data_pipeline_spark.operators.multimodal import m07_png_pixel_stats

    rows = {r["filename"]: r for r in m07_png_pixel_stats(spark, "unused").collect()}
    assert rows["gradient_rgb.png"]["pixel_sum"] == 54953
    assert rows["checker_gray.png"]["channels"] == 1
    assert rows["rings_rgba.png"]["ch_last_sum"] == 14610


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_decode_png_never_crashes_on_garbage(blob):
    """Arbitrary bytes must yield ValueError (or decode, for a valid
    PNG) — never an unhandled exception from the codec internals."""
    try:
        decode_png(blob)
    except ValueError:
        pass


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_pdf_fallback_never_crashes_on_garbage(blob):
    """The stdlib PDF extractor must degrade to None on any input,
    including truncated/corrupt streams — the reference's error path."""
    from nlp_data_pipeline_spark.sources.readers import _extract_pdf_bytes

    out = _extract_pdf_bytes(blob)
    assert out is None or isinstance(out, str)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_pdf_fallback_with_magic_prefix_never_crashes(blob):
    from nlp_data_pipeline_spark.sources.readers import _extract_pdf_bytes

    out = _extract_pdf_bytes(b"%PDF-1.4\n" + blob)
    assert out is None or isinstance(out, str)
