"""Pure-stdlib BMP codec (struct-only): uncompressed 24-bit BI_RGB
Windows bitmaps — the second image format behind the multimodal
operators, making ``image_phash`` / ``png_features`` format-agnostic.

Implements the public Windows BITMAPFILEHEADER + BITMAPINFOHEADER
layout: 'BM' magic, a 40-byte (or larger) info header, bottom-up rows
when height is positive / top-down when negative, BGR byte order,
each row padded to a 4-byte boundary. Anything outside uncompressed
24-bit BI_RGB raises ``BmpFormatError`` loudly.

Decode returns the SAME pixel convention as ``png_codec.decode_png``:
``(width, height, channels, pixels)`` with pixels row-major from the
TOP row, RGB order — so every consumer (aHash grids, channel sums) is
codec-agnostic.
"""

from __future__ import annotations

import struct

__all__ = ["BmpFormatError", "decode_bmp", "encode_bmp"]


class BmpFormatError(ValueError):
    """Raised for anything that is not uncompressed 24-bit BI_RGB."""


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """BMP → ``(width, height, 3, rgb_pixels_topdown)``."""
    if len(data) < 54:
        raise BmpFormatError("shorter than the BMP headers")
    if data[0:2] != b"BM":
        raise BmpFormatError("bad BMP signature")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise BmpFormatError(
            f"unsupported info header size {hdr_size} (BITMAPINFOHEADER+)"
        )
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bitcount = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if planes != 1:
        raise BmpFormatError(f"planes must be 1, got {planes}")
    if bitcount != 24:
        raise BmpFormatError(
            f"unsupported bit depth {bitcount} (only 24-bit BI_RGB)"
        )
    if compression != 0:
        raise BmpFormatError(
            f"unsupported compression {compression} (only BI_RGB=0)"
        )
    if width <= 0 or height == 0:
        raise BmpFormatError(f"bad dimensions {width}x{height}")
    if pix_off < 14 + hdr_size:
        raise BmpFormatError(
            f"pixel offset {pix_off} overlaps the headers"
        )
    top_down = height < 0
    h = -height if top_down else height
    stride = (3 * width + 3) & ~3
    need = pix_off + stride * h
    if len(data) < need:
        raise BmpFormatError(
            f"truncated pixel array: need {need} bytes, have {len(data)}"
        )
    out = bytearray(3 * width * h)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        src = pix_off + src_row * stride
        dst = 3 * width * row
        line = data[src:src + 3 * width]
        # BGR -> RGB
        out[dst:dst + 3 * width:3] = line[2::3]
        out[dst + 1:dst + 3 * width:3] = line[1::3]
        out[dst + 2:dst + 3 * width:3] = line[0::3]
    return width, h, 3, bytes(out)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB pixels as a standard bottom-up
    24-bit BI_RGB BMP."""
    if width < 1 or height < 1:
        raise BmpFormatError(f"bad dimensions {width}x{height}")
    if len(rgb) != 3 * width * height:
        raise BmpFormatError(
            f"pixel buffer is {len(rgb)} bytes, want {3 * width * height}"
        )
    stride = (3 * width + 3) & ~3
    pad = b"\x00" * (stride - 3 * width)
    body = bytearray()
    for row in range(height - 1, -1, -1):
        src = 3 * width * row
        line = rgb[src:src + 3 * width]
        bgr = bytearray(3 * width)
        bgr[0::3] = line[2::3]
        bgr[1::3] = line[1::3]
        bgr[2::3] = line[0::3]
        body += bgr + pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return file_hdr + info + bytes(body)
