"""PNG codec + png_features operator: pure-stdlib decode certified
against the encoder round-trip (all five filter types, all four
supported color types) and against Spark-side distributed decode."""

import struct
import zlib

import pytest

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.png_codec import (
    PngFormatError,
    decode_png,
    encode_png,
)


def _pixels(w, h, ch, seed=0):
    return bytes(
        (7 * x + 13 * y + 31 * c + seed) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


@pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("fmode", ["none", "cycle"])
def test_round_trip_every_color_type_and_filter(ctype, ch, fmode):
    w, h = 17, 11  # odd sizes catch stride bugs
    px = _pixels(w, h, ch)
    data = encode_png(w, h, px, color_type=ctype, filter_mode=fmode)
    assert decode_png(data) == (w, h, ch, px)


def test_cycle_mode_actually_emits_all_five_filters():
    w, h = 8, 10
    data = encode_png(w, h, _pixels(w, h, 3), filter_mode="cycle")
    # pull the raw scanline stream back out and read the filter bytes
    pos = 8
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    filters = [raw[y * stride] for y in range(h)]
    assert filters == [y % 5 for y in range(h)]


def test_decode_rejects_garbage_and_out_of_scope():
    with pytest.raises(PngFormatError, match="signature"):
        decode_png(b"not a png at all")
    good = encode_png(4, 4, _pixels(4, 4, 3))
    # corrupt one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with pytest.raises(PngFormatError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth is out of scope and must say so
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(PngFormatError, match="bit depth"):
        decode_png(deep)
    with pytest.raises(PngFormatError, match="IEND"):
        decode_png(good[:-12])


def test_png_features_distributed_matches_driver_decode(spark):
    rows = []
    want = {}
    for i in range(12):
        w, h = 5 + i % 3, 4 + i % 4
        px = _pixels(w, h, 3, seed=i)
        rows.append((i, encode_png(w, h, px, filter_mode="cycle")))
        want[i] = (
            w,
            h,
            3,
            sum(px[0::3]),
            sum(px[1::3]),
            sum(px[2::3]),
            None,
        )
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (
            r["width"],
            r["height"],
            r["channels"],
            r["sum_c0"],
            r["sum_c1"],
            r["sum_c2"],
            r["sum_c3"],
        )
        for r in get_operator("png_features")(max_records_per_batch=4)
        .apply({"in": df.repartition(4)})["out"]
        .collect()
    }
    assert got == want


def test_png_features_on_error_modes(spark):
    rows = [
        (1, encode_png(3, 3, _pixels(3, 3, 1), color_type=0)),
        (2, b"junk bytes"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r
        for r in get_operator("png_features")(on_error="null")
        .apply({"in": df})["out"]
        .collect()
    }
    assert out[1]["channels"] == 1 and out[1]["sum_c1"] is None
    assert out[1]["sum_c0"] == sum(_pixels(3, 3, 1))
    # non-PNG/BMP magic: the format sniffer names the supported set
    assert out[2]["width"] is None and "unrecognized" in out[2]["error"]
    assert out[3]["width"] is None and out[3]["error"] is None
    with pytest.raises(Exception, match="unrecognized image format"):
        get_operator("png_features")().apply({"in": df})["out"].collect()
    with pytest.raises(OperatorConfigError, match="on_error"):
        get_operator("png_features")(on_error="ignore")
