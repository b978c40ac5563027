"""Pure-stdlib PNG codec (W3C PNG spec / RFC 2083): the real image
decode behind the multimodal feature extractor — closes the r7-r10
"codec honestly stubbed" item without bundling an image library.

Scope (documented, validated loudly): 8-bit-depth, non-interlaced
grayscale (color type 0), gray+alpha (4), RGB (2), and RGBA (6) —
the overwhelmingly common PNG shapes. Palette (3), 16-bit depth and
Adam7 interlace raise ``PngFormatError`` naming the unsupported
field; real pipelines route those to a library decoder.

The encoder exists for tests and oracles: it can emit every filter
type (``filter_mode="cycle"`` picks ``y % 5``), so decode
certification genuinely exercises all five unfilters (None / Sub /
Up / Average / Paeth), not just the trivial one.

Reference parity note: the reference engine has no image codec at
all (multimodal is beyond-reference scope); this is public-spec
knowledge only.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Raised on malformed or out-of-scope PNG payloads."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filter_mode: str = "none",
) -> bytes:
    """Minimal 8-bit PNG writer. ``pixels`` is the raw scanline data
    row-major, ``width * height * channels`` bytes. ``filter_mode``:
    ``"none"`` (filter 0 everywhere) or ``"cycle"`` (scanline ``y``
    uses filter ``y % 5`` — the shape that makes a decode test cover
    every unfilter)."""
    if color_type not in _CHANNELS:
        raise PngFormatError(f"unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise PngFormatError(
            f"pixel buffer is {len(pixels)} bytes, need {stride * height}"
        )
    if filter_mode not in ("none", "cycle"):
        raise PngFormatError(f"unknown filter_mode {filter_mode!r}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        ft = (y % 5) if filter_mode == "cycle" else 0
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes(
                (line[i] - prev[i]) & 0xFF for i in range(stride)
            )
        elif ft == 3:  # Average
            raw += bytes(
                (
                    line[i]
                    - (((line[i - ch] if i >= ch else 0) + prev[i]) >> 1)
                )
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG → ``(width, height, channels, pixels)`` with ``pixels``
    the unfiltered row-major scanline bytes. Validates the signature,
    chunk CRCs, IHDR scope (8-bit, non-interlaced, color type in
    0/2/4/6) and the decompressed length."""
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise PngFormatError("bad PNG signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngFormatError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise PngFormatError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise PngFormatError(f"unsupported color type {ctype}")
            if ilace != 0:
                raise PngFormatError("interlaced PNG not supported")
            if comp != 0 or filt != 0:
                raise PngFormatError("nonstandard compression/filter method")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
    if width < 0:
        raise PngFormatError("missing IHDR")
    if not seen_end:
        raise PngFormatError("missing IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngFormatError(
            f"decompressed to {len(raw)} bytes, need {(stride + 1) * height}"
        )
    # Unfilter. None/Up/Sub vectorize exactly (Up is one wrapped byte
    # add against the previous RECONSTRUCTED row; Sub is a per-lane
    # prefix sum, and mod-256 distributes over addition, so an int64
    # cumsum masked to the low byte is bit-identical to the
    # byte-at-a-time loop). Average and Paeth stay sequential — their
    # recurrences read the just-reconstructed LEFT byte through a
    # floor-divide / data-dependent predictor, which has no closed
    # vector form.
    import numpy as np

    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ch = channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(rows[y, 0])
        line = rows[y, 1:]
        if ft == 0:  # None
            cur = line.copy()
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            cur = (
                line.reshape(-1, ch)
                .cumsum(axis=0, dtype=np.int64) & 0xFF
            ).astype(np.uint8).reshape(-1)
        elif ft == 2:  # Up
            cur = ((line.astype(np.uint16) + prev) & 0xFF).astype(np.uint8)
        elif ft in (3, 4):
            lb = bytearray(line.tobytes())
            pb = prev.tobytes()
            if ft == 3:  # Average
                for i in range(stride):
                    left = lb[i - ch] if i >= ch else 0
                    lb[i] = (lb[i] + ((left + pb[i]) >> 1)) & 0xFF
            else:  # Paeth
                for i in range(stride):
                    left = lb[i - ch] if i >= ch else 0
                    ul = pb[i - ch] if i >= ch else 0
                    lb[i] = (lb[i] + _paeth(left, pb[i], ul)) & 0xFF
            cur = np.frombuffer(bytes(lb), dtype=np.uint8)
        else:
            raise PngFormatError(f"unknown filter type {ft} on row {y}")
        out[y] = cur
        prev = cur
    return width, height, channels, out.tobytes()
