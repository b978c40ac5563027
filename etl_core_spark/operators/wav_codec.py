"""Pure-stdlib RIFF/WAVE 16-bit PCM codec (struct-only, no external
libs) — the audio sibling of ``png_codec``: real decode for the
multimodal feature path, a deterministic encoder for tests and
synthetic corpora.

Implements the public Microsoft/IBM RIFF WAVE format (also RFC 2361's
WAVE format registry): a ``RIFF`` container with ``fmt `` (PCM,
format tag 1) and ``data`` chunks; unknown chunks (``LIST``,
``fact``, ...) are skipped per the spec's chunk-walking rule, odd
chunk sizes consume a pad byte. Only integer 16-bit signed
little-endian PCM is accepted — compressed or float formats raise
``WavFormatError`` loudly (the container has no codec libraries; the
reference's receivers expose the same decode-or-fail contract for
binary media, src/etl_core/components/... binary ingest paths).

No floats anywhere: samples are exact ints in [-32768, 32767], so
every statistic downstream (sums, sums of squares, peaks) is integer
arithmetic an oracle can replay bit-for-bit.
"""

from __future__ import annotations

import struct
from array import array

__all__ = ["WavFormatError", "decode_wav", "encode_wav"]


class WavFormatError(ValueError):
    """Raised for anything that is not valid 16-bit PCM RIFF/WAVE."""


def decode_wav(raw: bytes) -> tuple[int, int, array]:
    """Decode a 16-bit PCM WAV file → ``(sample_rate, channels,
    samples)`` where ``samples`` is the flat interleaved
    ``array('h')`` (frame-major, channel-minor, exactly as stored).
    """
    if len(raw) < 12:
        raise WavFormatError("not a RIFF file: shorter than the header")
    if raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise WavFormatError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise WavFormatError("fmt chunk shorter than 16 bytes")
            tag, channels, rate, _brate, _balign, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != 1:
                raise WavFormatError(
                    f"unsupported format tag {tag} (only PCM=1)"
                )
            if bits != 16:
                raise WavFormatError(
                    f"unsupported bit depth {bits} (only 16-bit PCM)"
                )
            if channels < 1:
                raise WavFormatError("channel count must be >= 1")
            fmt = (rate, channels)
        elif cid == b"data":
            data = body
        # unknown chunks (LIST, fact, cue, ...) are skipped; odd
        # sizes consume a pad byte per the RIFF spec
        pos += 8 + size + (size & 1)
    if fmt is None:
        raise WavFormatError("missing fmt chunk")
    if data is None:
        raise WavFormatError("missing data chunk")
    rate, channels = fmt
    if len(data) % 2:
        raise WavFormatError("data chunk length is odd for 16-bit PCM")
    samples = array("h")
    samples.frombytes(data)
    import sys

    if sys.byteorder == "big":  # pragma: no cover - LE hosts everywhere
        samples.byteswap()
    if len(samples) % channels:
        raise WavFormatError(
            f"{len(samples)} samples do not divide into {channels} channels"
        )
    return rate, channels, samples


def encode_wav(sample_rate: int, channels: int, samples) -> bytes:
    """Encode flat interleaved 16-bit signed samples into a minimal
    PCM WAV file (one fmt + one data chunk)."""
    if int(channels) < 1:
        raise WavFormatError("channel count must be >= 1")
    if int(sample_rate) < 1:
        raise WavFormatError("sample rate must be >= 1")
    buf = array("h", samples)
    if len(buf) % int(channels):
        raise WavFormatError(
            f"{len(buf)} samples do not divide into {channels} channels"
        )
    import sys

    if sys.byteorder == "big":  # pragma: no cover - LE hosts everywhere
        buf = array("h", buf)
        buf.byteswap()
    data = buf.tobytes()
    block_align = 2 * int(channels)
    byte_rate = int(sample_rate) * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, int(channels), int(sample_rate), byte_rate,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
