"""WAV codec + wav_features operator: pure-stdlib 16-bit PCM
RIFF/WAVE decode certified against the encoder round-trip (Hypothesis
property), chunk-skipping per the RIFF spec, loud rejection of
out-of-scope formats, and Spark-side distributed decode."""

import struct
from array import array

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.wav_codec import (
    WavFormatError,
    decode_wav,
    encode_wav,
)


def test_round_trip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        rate=st.integers(min_value=1, max_value=192_000),
        channels=st.integers(min_value=1, max_value=4),
        frames=st.integers(min_value=0, max_value=200),
        data=st.data(),
    )
    def check(rate, channels, frames, data):
        samples = data.draw(
            st.lists(
                st.integers(min_value=-32768, max_value=32767),
                min_size=frames * channels,
                max_size=frames * channels,
            )
        )
        raw = encode_wav(rate, channels, samples)
        r2, c2, s2 = decode_wav(raw)
        assert (r2, c2, list(s2)) == (rate, channels, samples)

    check()


def test_decode_skips_unknown_chunks_and_pad_bytes():
    base = encode_wav(8000, 1, [1, -2, 3])
    # splice a LIST chunk with an ODD size (pad byte per spec)
    # between fmt and data: decode must skip it and still succeed
    fmt_at = base.index(b"fmt ")
    data_at = base.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = (
        base[:data_at] + extra + base[data_at:]
    )
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    assert fmt_at < data_at
    rate, ch, samples = decode_wav(spliced)
    assert (rate, ch, list(samples)) == (8000, 1, [1, -2, 3])


def test_decode_rejects_out_of_scope_formats():
    with pytest.raises(WavFormatError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    with pytest.raises(WavFormatError, match="shorter"):
        decode_wav(b"RI")
    good = encode_wav(44100, 2, [0, 0, 5, -5])
    # format tag 3 (IEEE float) must be rejected loudly
    fmt_at = good.index(b"fmt ") + 8
    float_fmt = good[:fmt_at] + struct.pack("<H", 3) + good[fmt_at + 2:]
    with pytest.raises(WavFormatError, match="format tag"):
        decode_wav(float_fmt)
    # 8-bit depth rejected
    bits_at = fmt_at + 14
    eight = good[:bits_at] + struct.pack("<H", 8) + good[bits_at + 2:]
    with pytest.raises(WavFormatError, match="bit depth"):
        decode_wav(eight)
    # missing data chunk
    data_at = good.index(b"data")
    with pytest.raises(WavFormatError, match="missing data"):
        decode_wav(good[:4] + struct.pack("<I", data_at - 8) + good[8:data_at])
    # encoder validation
    with pytest.raises(WavFormatError, match="divide"):
        encode_wav(8000, 2, [1, 2, 3])
    with pytest.raises(WavFormatError, match="channel"):
        encode_wav(8000, 0, [])


def test_wav_features_distributed_matches_driver_decode(spark):
    rows = []
    want = {}
    for i in range(12):
        ch = 1 + (i % 3)
        frames = 50 + 17 * i
        samples = [((11 * j + 5 * i) % 65536) - 32768
                   for j in range(frames * ch)]
        rate = 8000 + 1000 * i
        rows.append((i, encode_wav(rate, ch, samples)))
        want[i] = (
            rate, ch, frames, sum(samples),
            sum(v * v for v in samples),
            max(abs(v) for v in samples),
        )
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = get_operator("wav_features")(max_records_per_batch=4).apply(
        {"in": df}
    )["out"]
    got = {
        r["media_id"]: (
            r["sample_rate"], r["channels"], r["n_frames"],
            r["sum_amp"], r["sum_sq"], r["peak"],
        )
        for r in out.collect()
    }
    assert got == want


def test_wav_features_on_error_modes(spark):
    rows = [(0, encode_wav(8000, 1, [7, -7])), (1, b"garbage"), (2, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    with pytest.raises(Exception, match="RIFF"):
        get_operator("wav_features")().apply({"in": df})["out"].collect()
    out = get_operator("wav_features")(on_error="null").apply(
        {"in": df}
    )["out"]
    got = {r["media_id"]: r.asDict() for r in out.collect()}
    assert got[0]["sum_sq"] == 98 and got[0]["error"] is None
    assert got[0]["peak"] == 7 and got[0]["n_frames"] == 2
    assert got[1]["sum_amp"] is None and "RIFF" in got[1]["error"]
    assert got[2]["error"] is None and got[2]["sample_rate"] is None
    with pytest.raises(OperatorConfigError):
        get_operator("wav_features")(on_error="skip").validate_config()


def test_wav_features_empty_and_zero_frame_inputs(spark):
    empty = spark.createDataFrame([], "media_id long, payload binary")
    out = get_operator("wav_features")().apply({"in": empty})["out"]
    assert out.count() == 0
    zero = spark.createDataFrame(
        [(9, encode_wav(8000, 2, []))], "media_id long, payload binary"
    )
    row = get_operator("wav_features")().apply({"in": zero})["out"].collect()
    assert row[0]["n_frames"] == 0 and row[0]["peak"] == 0
    assert row[0]["sum_amp"] == 0 and row[0]["sum_sq"] == 0


# ---------------------------------------------------------------------------
# audio_fingerprint: integer energy-profile fingerprint (r13)
# ---------------------------------------------------------------------------

def _py_afp(samples, bands=64):
    """Reference implementation straight from the definition: window
    of sample j is j*bands//n; bit w = bands*E_w > E_total."""
    n = len(samples)
    if n == 0:
        return "0" * bands
    e = [0] * bands
    for j, v in enumerate(samples):
        e[j * bands // n] += v * v
    total = sum(e)
    return "".join("1" if bands * x > total else "0" for x in e)


def test_audio_fingerprint_matches_python_reference(spark):
    rows, want = [], {}
    for i in range(14):
        ch = 1 + (i % 2)
        frames = 37 + 29 * i  # not divisible by bands: ragged windows
        samples = [
            ((13 * j * j + 7 * j + 3 * i) % 65536) - 32768
            for j in range(frames * ch)
        ]
        rows.append((i, encode_wav(8000, ch, samples)))
        want[i] = _py_afp(samples)
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = get_operator("audio_fingerprint")(max_records_per_batch=4).apply(
        {"in": df}
    )["out"]
    got = {r["media_id"]: r["afp"] for r in out.collect()}
    assert got == want
    assert all(len(v) == 64 for v in got.values())


def test_audio_fingerprint_edge_cases_and_errors(spark):
    rows = [
        (0, encode_wav(8000, 1, [])),          # empty clip
        (1, encode_wav(8000, 1, [0] * 500)),   # silence
        (2, encode_wav(8000, 1, [9] * 10)),    # n < bands: empty windows
        (3, b"not a wav"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = get_operator("audio_fingerprint")(on_error="null").apply(
        {"in": df}
    )["out"]
    got = {r["media_id"]: r.asDict() for r in out.collect()}
    assert got[0]["afp"] == "0" * 64 and got[0]["n_samples"] == 0
    assert got[1]["afp"] == "0" * 64  # silence: total energy 0
    # constant amplitude over 10 samples: ragged windows still sum to
    # the full energy; occupied windows exceed the 1/64 mean
    assert got[2]["afp"] == _py_afp([9] * 10) and got[2]["afp"].count("1") == 10
    assert got[3]["afp"] is None and "RIFF" in got[3]["error"]
    assert got[4]["afp"] is None and got[4]["error"] is None
    with pytest.raises(Exception, match="RIFF"):
        get_operator("audio_fingerprint")().apply({"in": df})["out"].collect()
    with pytest.raises(OperatorConfigError, match="bands"):
        get_operator("audio_fingerprint")(bands=1).validate_config()
    with pytest.raises(OperatorConfigError, match="on_error"):
        get_operator("audio_fingerprint")(on_error="skip").validate_config()


def test_audio_fingerprint_feeds_hamming_pairs(spark):
    """The composition the operator exists for: loud/quiet window
    patterns -> afp bits -> hamming_near_dup_pairs finds the planted
    variant at its exact flip distance."""
    def clip(pattern, m=8):
        samples = []
        for w, bit in enumerate(pattern):
            amp = 1000 if bit else 10
            samples += [amp if j % 2 == 0 else -amp for j in range(m)]
        return encode_wav(8000, 1, samples)

    base = [(3 * w + 1) % 5 < 2 for w in range(64)]
    var = list(base)
    for w in (5, 20, 40):
        var[w] = not var[w]
    far = [not b for b in base]
    df = spark.createDataFrame(
        [(0, clip(base)), (1, clip(var)), (2, clip(far))],
        "media_id long, payload binary",
    )
    fp = get_operator("audio_fingerprint")().apply({"in": df})["out"]
    pairs = get_operator("hamming_near_dup_pairs")(
        fp_col="afp", id_col="media_id", max_hamming=6
    ).apply({"in": fp})["out"]
    assert [tuple(r) for r in pairs.collect()] == [(0, 1, 3)]
