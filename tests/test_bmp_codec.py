"""BMP codec: struct-only 24-bit BI_RGB decode certified against the
encoder round-trip (Hypothesis), top-down/bottom-up row order, row
padding, loud rejection of out-of-scope variants — and cross-format
identity: the same pixels hash identically from PNG and BMP."""

import struct

import pytest

from etl_core_spark.operators.base import get_operator
from etl_core_spark.operators.bmp_codec import (
    BmpFormatError,
    decode_bmp,
    encode_bmp,
)


def _pixels(w, h, seed=0):
    return bytes(
        (7 * x + 13 * y + 31 * c + seed) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_round_trip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=13),
        h=st.integers(min_value=1, max_value=9),
        seed=st.integers(min_value=0, max_value=255),
    )
    def check(w, h, seed):
        px = _pixels(w, h, seed)
        got = decode_bmp(encode_bmp(w, h, px))
        assert got == (w, h, 3, px)

    check()


def test_top_down_negative_height_decodes_identically():
    w, h = 5, 4
    px = _pixels(w, h, 9)
    bottom_up = encode_bmp(w, h, px)
    # flip the height sign and re-order rows: same logical image
    stride = (3 * w + 3) & ~3
    rows = [
        bottom_up[54 + i * stride:54 + (i + 1) * stride]
        for i in range(h)
    ]
    td_body = b"".join(reversed(rows))
    td = (
        bottom_up[:18]
        + struct.pack("<ii", w, -h)
        + bottom_up[26:54]
        + td_body
    )
    assert decode_bmp(td) == (w, h, 3, px)


def test_decode_rejects_out_of_scope():
    with pytest.raises(BmpFormatError, match="signature"):
        decode_bmp(b"PK" + b"\x00" * 60)
    with pytest.raises(BmpFormatError, match="shorter"):
        decode_bmp(b"BM")
    good = encode_bmp(3, 2, _pixels(3, 2))
    with pytest.raises(BmpFormatError, match="bit depth"):
        decode_bmp(good[:28] + struct.pack("<H", 8) + good[30:])
    with pytest.raises(BmpFormatError, match="compression"):
        decode_bmp(good[:30] + struct.pack("<I", 1) + good[34:])
    with pytest.raises(BmpFormatError, match="truncated"):
        decode_bmp(good[:-4])
    with pytest.raises(BmpFormatError, match="pixel buffer"):
        encode_bmp(3, 2, b"\x00" * 5)


def test_phash_format_agnostic_and_png_features_reads_bmp(spark):
    """The SAME pixels must hash identically from PNG and BMP — the
    whole point of perceptual dedup across re-encoded copies."""
    from etl_core_spark.operators.png_codec import encode_png

    w, h = 16, 16
    px = _pixels(w, h, 3)
    df = spark.createDataFrame(
        [(0, encode_png(w, h, px)), (1, encode_bmp(w, h, px))],
        "media_id long, payload binary",
    )
    out = get_operator("image_phash")().apply({"in": df})["out"].collect()
    got = {r["media_id"]: r["phash"] for r in out}
    assert got[0] == got[1] and len(got[0]) == 64
    feats = get_operator("png_features")().apply({"in": df})["out"].collect()
    by_id = {r["media_id"]: r for r in feats}
    for c in ("width", "height", "channels", "sum_c0", "sum_c1", "sum_c2"):
        assert by_id[0][c] == by_id[1][c]
    assert by_id[0]["sum_c0"] == sum(px[0::3])
    # unknown magic: loud by default, recorded in null mode
    junk = spark.createDataFrame(
        [(9, b"RIFF\x00\x00\x00\x00WEBP")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="unrecognized image format"):
        get_operator("image_phash")().apply({"in": junk})["out"].collect()
    rows = get_operator("png_features")(on_error="null").apply(
        {"in": junk}
    )["out"].collect()
    assert "unrecognized" in rows[0]["error"]


def test_decode_rejects_header_overlapping_pixel_offset():
    good = encode_bmp(3, 2, _pixels(3, 2))
    bad = good[:10] + struct.pack("<I", 8) + good[14:]
    with pytest.raises(BmpFormatError, match="overlaps"):
        decode_bmp(bad)
