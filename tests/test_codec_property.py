"""Property-based round-trip for the stdlib PNG codec: any image the
encoder writes, the independent decoder must read back pixel-exact —
across arbitrary sizes (every scanline-filter branch is exercised once
height >= 5 because filters cycle by row) and pixel contents, plus
corruption must be caught by the CRC walk, never silently decoded."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_with_hdfs_sql_integration_spark.plans.multimodal import png_codec

ENC, DEC = png_codec()


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    data=st.data(),
)
def test_png_roundtrip_pixel_exact(w, h, data):
    pixels = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=w * h,
            max_size=w * h,
        )
    )
    payload = ENC(pixels, w, h)
    assert payload.startswith(b"\x89PNG\r\n\x1a\n")
    dw, dh, got = DEC(payload)
    assert (dw, dh) == (w, h)
    assert got == pixels


@settings(max_examples=30, deadline=None)
@given(
    flip=st.integers(min_value=0, max_value=10_000),
)
def test_png_corruption_detected(flip):
    pixels = [(i * 37) % 256 for i in range(12 * 9)]
    payload = bytearray(ENC(pixels, 12, 9))
    # Flip one bit somewhere after the 8-byte signature: either a CRC
    # check fails, the inflate fails, or a structural assert trips —
    # but a silent wrong-pixel decode is never acceptable. (Flips
    # inside a chunk's own CRC field corrupt the CRC, not the data —
    # still a detected mismatch.)
    idx = 8 + (flip % (len(payload) - 8))
    payload[idx] ^= 1 << (flip % 8)
    try:
        dw, dh, got = DEC(bytes(payload))
    except Exception:
        return  # detected: any loud failure is a pass
    # Undetected decode must at least not silently change the image.
    assert (dw, dh) == (12, 9) and got == pixels, "silent corruption"
