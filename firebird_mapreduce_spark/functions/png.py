"""Minimal pure-stdlib PNG codec (8-bit RGB, non-interlaced).

Exists so the multimodal decode path can be REAL in a container with no
image libraries: the fixture files are valid PNGs (signature, CRC-checked
chunks, zlib-compressed IDAT, per-scanline filters), and the decoder
actually parses, inflates, and unfilters them.  Everything here is from
the public PNG specification (W3C PNG, RFC 2083); only ``zlib``/
``struct`` from the standard library are used.

Scope is deliberately the teaching-corpus subset — bit depth 8, color
type 2 (truechannel RGB), no interlace — with all five scanline filters
(None/Sub/Up/Average/Paeth) supported on both sides.  Pillow, when
present on executors, is preferred by the multimodal operators for
arbitrary real-world images; this codec is the guaranteed-available
fallback and the fixture generator.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_encode(
    width: int,
    height: int,
    rgb: bytes,
    filter_mode: str = "none",
) -> bytes:
    """Encode raw RGB bytes (row-major, 3 bytes/pixel) as a PNG.

    ``filter_mode``: ``"none"`` writes filter 0 on every scanline;
    ``"mixed"`` cycles filters 0..4 per row — same decoded image, but it
    forces a decoder through every unfilter path (used by tests to prove
    the decoder is real, not a filter-0-only shortcut)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    stride = width * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ftype = 0 if filter_mode == "none" else y % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[i] - (((row[i - 3] if i >= 3 else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - 3] if i >= 3 else 0,
                        prev[i],
                        prev[i - 3] if i >= 3 else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit RGB non-interlaced PNG to ``(width, height,
    rgb_bytes)``.  Verifies the signature and each chunk's CRC; raises
    ``ValueError`` for anything outside the supported subset."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(data):
        # bounds-check the declared chunk length against the remaining
        # buffer BEFORE slicing, so truncated/oversized inputs raise the
        # documented ValueError, never struct.error/IndexError
        if pos + 8 > len(data):
            raise ValueError("truncated PNG: incomplete chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 12 + length > len(data):
            raise ValueError(
                f"truncated PNG: chunk length {length} exceeds remaining data"
            )
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            if len(payload) != 13:
                raise ValueError(f"bad IHDR payload length {len(payload)}")
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG subset: need 8-bit RGB non-interlaced, got "
                    f"depth={depth} color={ctype} interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out += line
        prev = bytes(line)
    return width, height, bytes(out)
