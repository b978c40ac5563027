"""Pure-stdlib GIF codec: GIF87a/GIF89a decode (LZW inflate, global
and local color tables, extension-block skipping, interlace de-pass)
plus a deterministic encoder for tests and synthetic corpora — the
third image format behind the multimodal operators.

Implements the public CompuServe GIF specification (GIF89a, 1990; the
format W3C documents alongside PNG): a logical screen descriptor, an
optional global color table, extension blocks introduced by 0x21
(skipped via their sub-block chains), image descriptors introduced by
0x2C with optional local color tables, and LZW-compressed pixel
indices in 255-byte-max sub-blocks with variable-width codes
(min_code_size+1 .. 12 bits, little-endian bit packing, CLEAR resets
the table, EOI terminates). Decode returns the FIRST image frame as
RGB through the palette — animation compositing is out of scope and
documented (a training-data pipeline fingerprints stills; frame
sampling belongs to a video stage).

Decode returns the SAME pixel convention as ``png_codec.decode_png``
and ``bmp_codec.decode_bmp``: ``(width, height, 3, pixels)``
row-major from the top row, RGB order.
"""

from __future__ import annotations

import struct

__all__ = [
    "GifFormatError",
    "decode_gif",
    "decode_gif_frames",
    "encode_gif",
    "encode_gif_animation",
]


class GifFormatError(ValueError):
    """Raised for anything that is not a decodable GIF still."""


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF-variant LZW: variable-width codes, CLEAR/EOI, 12-bit cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader over the concatenated sub-block payload
    acc = 0
    nbits = 0
    pos = 0

    def base_table():
        return {i: bytes([i]) for i in range(clear)}

    table = base_table()
    width = min_code_size + 1
    next_code = eoi + 1
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                # streams may omit EOI; stop when pixels are filled
                if len(out) >= n_pixels:
                    return out
                raise GifFormatError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = base_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise GifFormatError(f"bad first LZW code {code}")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise GifFormatError(f"LZW code {code} out of sequence")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_pixels and pos >= len(data) and nbits < width:
            return out


def _iter_gif_frames(data: bytes):
    """Lazy frame walk: yields ``(left, top, width, height, rgb)``
    per image descriptor in stream order. Laziness matters for
    parity: ``decode_gif`` (the certified first-frame contract)
    takes one item, so malformations in LATER frames never raise
    there — exactly the pre-r13 behavior."""
    if len(data) < 13:
        raise GifFormatError("shorter than the GIF header")
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("bad GIF signature")
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1)
        gct = data[pos:pos + 3 * n]
        if len(gct) < 3 * n:
            raise GifFormatError("truncated global color table")
        pos += 3 * n
    got_frame = False
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            if not got_frame:
                raise GifFormatError("no image frame before trailer")
            return
        if b == 0x21:  # extension: label + sub-block chain
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise GifFormatError(f"unexpected block introducer 0x{b:02x}")
        # image descriptor
        if pos + 10 > len(data):
            raise GifFormatError("truncated image descriptor")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        table = gct
        if iflags & 0x80:
            n = 2 ** ((iflags & 0x07) + 1)
            table = data[pos:pos + 3 * n]
            if len(table) < 3 * n:
                raise GifFormatError("truncated local color table")
            pos += 3 * n
        if table is None:
            raise GifFormatError("no color table for the image frame")
        if w < 1 or h < 1:
            raise GifFormatError(f"bad frame dimensions {w}x{h}")
        if pos >= len(data):
            raise GifFormatError("missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise GifFormatError(f"bad LZW minimum code size {min_code}")
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            size = data[pos]
            chunk = data[pos + 1:pos + 1 + size]
            if len(chunk) < size:
                raise GifFormatError("truncated LZW sub-block")
            lzw += chunk
            pos += 1 + size
        pos += 1  # the terminating zero-length sub-block
        idx = _lzw_decode(min_code, bytes(lzw), w * h)
        if len(idx) < w * h:
            raise GifFormatError(
                f"LZW stream yielded {len(idx)} of {w * h} pixels"
            )
        idx = idx[:w * h]
        if iflags & 0x40:  # interlaced: de-pass the four passes
            rows = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                rows.extend(range(start, h, step))
            deint = bytearray(w * h)
            for src_row, dst_row in enumerate(rows):
                deint[dst_row * w:(dst_row + 1) * w] = (
                    idx[src_row * w:(src_row + 1) * w]
                )
            idx = deint
        ncolors = len(table) // 3
        out = bytearray(3 * w * h)
        for i, ci in enumerate(idx):
            if ci >= ncolors:
                raise GifFormatError(
                    f"palette index {ci} outside the {ncolors}-color table"
                )
            out[3 * i:3 * i + 3] = table[3 * ci:3 * ci + 3]
        got_frame = True
        yield left, top, w, h, bytes(out)
    if not got_frame:
        raise GifFormatError("no image frame found")


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """GIF → ``(width, height, 3, rgb_pixels_topdown)`` (first
    frame)."""
    _left, _top, w, h, rgb = next(_iter_gif_frames(data))
    return w, h, 3, rgb


def decode_gif_frames(data: bytes) -> list[tuple[int, int, int, int, bytes]]:
    """Every image descriptor in the stream → list of ``(left, top,
    width, height, rgb)`` — animation frame enumeration. Each frame
    decodes on its OWN rectangle through its own (local or global)
    color table; disposal/compositing onto the logical screen is a
    modeling decision left downstream (``gif_frames`` samples and
    fingerprints per-frame pixels, it does not replay an animation)."""
    return list(_iter_gif_frames(data))


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def emit_data(code):
        # width growth LAGS the table addition by one emission: the
        # decoder's additions lag the encoder's by one READ, so the
        # decoder grows (next_code_dec == 1<<w, post-add) exactly
        # before the SECOND emission after the encoder's triggering
        # addition — grow here, at emit time, when next_code has
        # already passed the boundary
        nonlocal width
        if next_code > (1 << width) and width < 12:
            width += 1
        emit(code)

    emit(clear)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit_data(table[prev])
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
        else:
            emit_data(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit_data(table[prev])
    emit_data(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _palettize(
    width: int, height: int, rgb: bytes
) -> tuple[bytes, int, bytearray]:
    """Build a color table from the distinct colors of one frame →
    ``(table_bytes, size_bits, palette_indices)``; more than 256
    distinct colors raise (quantization is a modeling decision, not
    a codec's)."""
    palette: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(width * height):
        c = bytes(rgb[3 * i:3 * i + 3])
        ci = palette.get(c)
        if ci is None:
            if len(palette) == 256:
                raise GifFormatError(
                    "more than 256 distinct colors (quantize upstream)"
                )
            ci = len(palette)
            palette[c] = ci
        indices.append(ci)
    # color table size: power of two >= max(len(palette), 2)
    bits = 1
    while (1 << bits) < max(len(palette), 2):
        bits += 1
    table = bytearray()
    for c in palette:
        table += c
    table += b"\x00" * (3 * (1 << bits) - len(table))
    return bytes(table), bits, indices


def _sub_blocks(lzw: bytes) -> bytes:
    """Split an LZW stream into 255-byte-max sub-blocks + terminator."""
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes(blocks)


def encode_gif_animation(
    width: int,
    height: int,
    frames: list[bytes],
    delay_cs: int = 10,
) -> bytes:
    """Encode a list of full-screen top-down RGB frames as an
    animated GIF89a: NETSCAPE2.0 looping application extension, then
    per frame a Graphic Control Extension (delay ``delay_cs`` in
    centiseconds, disposal 'do not dispose') + an image descriptor at
    (0, 0) with its OWN local color table — each frame palettizes
    independently, so frames may differ in palette freely. The
    decoder side (``decode_gif_frames``) round-trips every frame's
    pixels exactly."""
    if not frames:
        raise GifFormatError("animation needs at least one frame")
    for f in frames:
        if len(f) != 3 * width * height:
            raise GifFormatError(
                f"frame buffer is {len(f)} bytes, want {3 * width * height}"
            )
    out = bytearray()
    out += b"GIF89a"
    # no global color table: every frame carries a local one
    out += struct.pack("<HHBBB", width, height, 0, 0, 0)
    # NETSCAPE looping extension (exercises sub-block-chain skipping)
    out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    for rgb in frames:
        table, bits, indices = _palettize(width, height, rgb)
        min_code = max(2, bits)
        # GCE: disposal=1 (leave), no transparency
        out += b"\x21\xF9\x04" + struct.pack(
            "<BHB", 0x04, int(delay_cs), 0
        ) + b"\x00"
        out += b"\x2C" + struct.pack(
            "<HHHHB", 0, 0, width, height, 0x80 | (bits - 1)
        )
        out += table
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(min_code, bytes(indices)))
    out += b"\x3B"
    return bytes(out)


def encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB pixels as a single-frame,
    non-interlaced GIF89a (palette built from the distinct colors;
    more than 256 distinct colors raise — quantization is a modeling
    decision, not a codec's)."""
    if width < 1 or height < 1:
        raise GifFormatError(f"bad dimensions {width}x{height}")
    if len(rgb) != 3 * width * height:
        raise GifFormatError(
            f"pixel buffer is {len(rgb)} bytes, want {3 * width * height}"
        )
    table, bits, indices = _palettize(width, height, rgb)
    min_code = max(2, bits)
    lzw = _lzw_encode(min_code, bytes(indices))
    blocks = _sub_blocks(lzw)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
        + bytes(table)
        + b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3B"
    )
