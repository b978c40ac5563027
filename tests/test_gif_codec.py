"""GIF codec: pure-stdlib LZW decode certified against the encoder
round-trip (Hypothesis), interlace de-pass, extension skipping, loud
rejection of out-of-scope inputs — and three-format identity: the
same pixels hash identically from PNG, BMP and GIF."""

import struct

import pytest

from etl_core_spark.operators.base import get_operator
from etl_core_spark.operators.gif_codec import (
    GifFormatError,
    decode_gif,
    encode_gif,
)


def _paletted_pixels(w, h, ncol, seed=0):
    """<=ncol distinct colors from a closed-form palette."""
    return b"".join(
        bytes((
            ((7 * x + 13 * y + seed) % ncol * 3) % 256,
            ((7 * x + 13 * y + seed) % ncol * 5) % 256,
            ((7 * x + 13 * y + seed) % ncol * 7) % 256,
        ))
        for y in range(h)
        for x in range(w)
    )


def test_round_trip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=18),
        ncol=st.integers(min_value=1, max_value=256),
        seed=st.integers(min_value=0, max_value=999),
    )
    def check(w, h, ncol, seed):
        px = _paletted_pixels(w, h, ncol, seed)
        assert decode_gif(encode_gif(w, h, px)) == (w, h, 3, px)

    check()


def test_lzw_width_growth_and_table_reset_round_trip():
    # enough distinct phrases to push the code width to 12 bits and
    # through the 4096-entry clear-reset path
    w, h = 200, 200
    px = b"".join(
        bytes(((i * 7) % 256, (i * 13) % 256, (i * 29) % 251))
        for i in [(x * y) % 250 for y in range(h) for x in range(w)]
    )
    assert decode_gif(encode_gif(w, h, px)) == (w, h, 3, px)


def test_decode_skips_extensions_and_handles_interlace():
    w, h = 8, 8
    px = _paletted_pixels(w, h, 5)
    raw = encode_gif(w, h, px)
    # splice a graphics-control extension before the image descriptor
    at = raw.index(b"\x2C")
    ext = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    assert decode_gif(raw[:at] + ext + raw[at:]) == (w, h, 3, px)
    # hand-build an INTERLACED frame: rows stored in pass order
    order = [r for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(s, h, t)]
    reordered = b"".join(px[3 * w * r:3 * w * (r + 1)] for r in order)
    il = encode_gif(w, h, reordered)
    at = il.index(b"\x2C")
    iflags = il[at + 9] | 0x40
    il = il[:at + 9] + bytes([iflags]) + il[at + 10:]
    assert decode_gif(il) == (w, h, 3, px)


def test_decode_rejects_out_of_scope():
    with pytest.raises(GifFormatError, match="signature"):
        decode_gif(b"PNG?" + b"\x00" * 20)
    with pytest.raises(GifFormatError, match="shorter"):
        decode_gif(b"GIF89a")
    good = encode_gif(3, 2, _paletted_pixels(3, 2, 3))
    with pytest.raises(GifFormatError, match="truncated"):
        decode_gif(good[:-6])
    # trailer with no frame (3 colors -> 4-entry table = 12 bytes)
    hdr_end = 13 + 3 * 4
    assert good[hdr_end:hdr_end + 1] == b"\x2C"
    with pytest.raises(GifFormatError, match="no image frame"):
        decode_gif(good[:hdr_end] + b"\x3B")
    with pytest.raises(GifFormatError, match="256 distinct"):
        encode_gif(32, 32, bytes(
            v for i in range(1024) for v in (i % 256, i // 4 % 256, 7)
        ))
    with pytest.raises(GifFormatError, match="pixel buffer"):
        encode_gif(4, 4, b"\x00" * 5)


def test_three_format_phash_identity(spark):
    """The SAME pixels must fingerprint identically from PNG, BMP and
    GIF — perceptual dedup across re-encoded containers."""
    from etl_core_spark.operators.bmp_codec import encode_bmp
    from etl_core_spark.operators.png_codec import encode_png

    w = h = 16
    px = _paletted_pixels(w, h, 12, seed=4)
    df = spark.createDataFrame(
        [
            (0, encode_png(w, h, px)),
            (1, encode_bmp(w, h, px)),
            (2, encode_gif(w, h, px)),
        ],
        "media_id long, payload binary",
    )
    out = get_operator("image_phash")().apply({"in": df})["out"].collect()
    got = {r["media_id"]: r["phash"] for r in out}
    assert got[0] == got[1] == got[2] and len(got[0]) == 64
    feats = get_operator("png_features")().apply({"in": df})["out"].collect()
    sums = {(r["sum_c0"], r["sum_c1"], r["sum_c2"]) for r in feats}
    assert len(sums) == 1  # identical channel sums from all three


# ---------------------------------------------------------------------------
# multi-frame animation: decode_gif_frames + gif_frames operator (r13)
# ---------------------------------------------------------------------------

def test_animation_round_trip_and_first_frame_parity():
    from etl_core_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_animation,
    )

    w, h = 14, 9
    frames = [_paletted_pixels(w, h, 5 + f, seed=3 * f) for f in range(5)]
    raw = encode_gif_animation(w, h, frames)
    got = decode_gif_frames(raw)
    assert [(0, 0, w, h, f) for f in frames] == got
    # decode_gif = first frame, byte-for-byte
    assert decode_gif(raw) == (w, h, 3, frames[0])
    # single-frame encode_gif payloads enumerate as exactly one frame
    single = encode_gif(w, h, frames[2])
    assert decode_gif_frames(single) == [(0, 0, w, h, frames[2])]
    with pytest.raises(GifFormatError, match="at least one frame"):
        encode_gif_animation(w, h, [])
    with pytest.raises(GifFormatError, match="frame buffer"):
        encode_gif_animation(w, h, [frames[0][:-3]])


def test_animation_round_trip_through_12bit_reset():
    """A frame with enough distinct LZW phrases to grow the code
    width to 12 bits and through the 4096-entry table reset must
    round-trip inside an animation too (the multi-frame walk resumes
    cleanly after a reset-heavy stream)."""
    from etl_core_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_animation,
    )

    w, h = 200, 200
    noisy = b"".join(
        bytes(((i * 7) % 256, (i * 13) % 256, (i * 29) % 251))
        for i in [(x * y) % 250 for y in range(h) for x in range(w)]
    )
    flat = _paletted_pixels(w, h, 3, seed=1)
    got = decode_gif_frames(encode_gif_animation(w, h, [noisy, flat, noisy]))
    assert [g[4] for g in got] == [noisy, flat, noisy]


def test_gif_frames_operator_sampling_and_errors(spark):
    from etl_core_spark.operators.gif_codec import encode_gif_animation

    w, h = 10, 6

    def frame(i, f):
        return bytes(
            c
            for y in range(h)
            for x in range(w)
            for c in (
                ((x + 2 * y + 5 * f + i) % 13 * 19 + i) % 256,
                ((x + 2 * y + 5 * f + i) % 13 * 7 + 2 * i) % 256,
                ((x + 2 * y + 5 * f + i) % 13 * 23 + 3 * i) % 256,
            )
        )

    rows = [
        (0, encode_gif_animation(w, h, [frame(0, f) for f in range(5)])),
        (1, encode_gif_animation(w, h, [frame(1, 0)])),
        (2, b"not a gif"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = get_operator("gif_frames")(every_n=2, on_error="null").apply(
        {"in": df}
    )["out"]
    got = sorted(
        (r["media_id"], r["frame_idx"], r["sum_r"], r["error"] is not None)
        for r in out.collect()
    )

    def sums(i, f):
        px = frame(i, f)
        return sum(px[0::3])

    assert got == [
        (0, 0, sums(0, 0), False),
        (0, 2, sums(0, 2), False),
        (0, 4, sums(0, 4), False),
        (1, 0, sums(1, 0), False),
        (2, None, None, True),
        (3, None, None, False),
    ]
    # max_frames cap + raise mode
    capped = get_operator("gif_frames")(max_frames=2).apply(
        {"in": spark.createDataFrame(rows[:1], "media_id long, payload binary")}
    )["out"]
    assert [r["frame_idx"] for r in capped.collect()] == [0, 1]
    with pytest.raises(Exception, match="GIF"):
        get_operator("gif_frames")().apply({"in": df})["out"].collect()
    from etl_core_spark.operators.base import OperatorConfigError
    with pytest.raises(OperatorConfigError, match="every_n"):
        get_operator("gif_frames")(every_n=0).validate_config()
    with pytest.raises(OperatorConfigError, match="max_frames"):
        get_operator("gif_frames")(max_frames=0).validate_config()


def test_gif_frames_with_phash_matches_image_phash_and_pairs(spark):
    """Per-frame fingerprinting: gif_frames(with_phash=True) must
    produce EXACTLY image_phash's hash for the same pixels (shared
    kernel), and the derived (media, frame) key feeds
    hamming_near_dup_pairs to pair a re-encoded animation with its
    original frame-by-frame."""
    from pyspark.sql import functions as F

    from etl_core_spark.operators.gif_codec import encode_gif_animation
    from etl_core_spark.operators.png_codec import encode_png

    w = h = 16
    frames = [_paletted_pixels(w, h, 7 + f, seed=11 * f) for f in range(3)]
    # clip 0: the original; clip 1: same pixels re-encoded (palette
    # order differs per frame — bytes differ, pixels identical)
    anim = encode_gif_animation(w, h, frames)
    df = spark.createDataFrame(
        [(0, anim), (1, anim)], "media_id long, payload binary"
    )
    out = get_operator("gif_frames")(with_phash=True).apply({"in": df})[
        "out"
    ]
    rows = out.collect()
    assert {r["frame_idx"] for r in rows} == {0, 1, 2}
    got = {(r["media_id"], r["frame_idx"]): r["phash"] for r in rows}
    # identical to image_phash on the same pixels as single PNGs
    singles = spark.createDataFrame(
        [(f, encode_png(w, h, px)) for f, px in enumerate(frames)],
        "media_id long, payload binary",
    )
    want = {
        r["media_id"]: r["phash"]
        for r in get_operator("image_phash")().apply({"in": singles})[
            "out"
        ].collect()
    }
    for (mid, f), ph in got.items():
        assert ph == want[f] and len(ph) == 64
    # composition: derived key -> hamming pairing finds every
    # cross-clip same-frame pair at distance 0
    keyed = out.select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("fid"),
        "phash",
    )
    pairs = get_operator("hamming_near_dup_pairs")(
        fp_col="phash", id_col="fid", max_hamming=0
    ).apply({"in": keyed})["out"]
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(f, 1000 + f) for f in range(3)} <= got_pairs
    # tiny frames: NULL phash, no crash
    tiny = spark.createDataFrame(
        [(9, encode_gif_animation(4, 4, [_paletted_pixels(4, 4, 3)]))],
        "media_id long, payload binary",
    )
    trow = get_operator("gif_frames")(with_phash=True).apply(
        {"in": tiny}
    )["out"].collect()
    assert trow[0]["phash"] is None and trow[0]["sum_r"] is not None


def test_animation_round_trip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_core_spark.operators.gif_codec import (
        decode_gif_frames,
        encode_gif_animation,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=20),
        h=st.integers(min_value=1, max_value=15),
        nf=st.integers(min_value=1, max_value=4),
        ncols=st.lists(
            st.integers(min_value=1, max_value=256), min_size=4, max_size=4
        ),
        seed=st.integers(min_value=0, max_value=999),
    )
    def check(w, h, nf, ncols, seed):
        frames = [
            _paletted_pixels(w, h, ncols[f], seed + 31 * f)
            for f in range(nf)
        ]
        got = decode_gif_frames(encode_gif_animation(w, h, frames))
        assert [(0, 0, w, h, f) for f in frames] == got

    check()
