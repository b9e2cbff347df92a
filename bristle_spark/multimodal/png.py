"""Pure-stdlib PNG codec (zlib inflate + per-scanline unfilter).

The container ships no image libraries, so the image pipeline's real-
codec path mirrors the WAV move (multimodal._wav_decode): PNG's IDAT
stream is stdlib ``zlib``, and the five scanline filters (None / Sub /
Up / Average / Paeth) are spec'd byte math — everything needed to run
the m_resize / m_phash / m_patchify kernels on REAL encoded payloads
is implementable without a dependency. Format details follow the
public W3C PNG specification (ISO/IEC 15948); the Pillow backend
remains the general-codec path for formats beyond PNG.

Scope: 8-bit greyscale (color type 0) and 8-bit RGB (color type 2),
non-interlaced — the fixture shapes plus the common ML-preprocessing
case. Interlaced or exotic bit depths raise ValueError (a payload
error, not a silent misread), the same policy as the WAV decoder's
8-bit rejection.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (supported subset)
_CHANNELS = {0: 1, 2: 3}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    *,
    channels: int = 1,
    filter_type: int = 4,
    compress_level: int = 9,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` samples per
    pixel) as a real PNG. ``filter_type`` applies one spec filter to
    every scanline (0..4); ``compress_level`` is passed to zlib (0 =
    stored blocks). Defaults produce the hardest decode path — Paeth
    filtering under full DEFLATE."""
    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count {channels}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; {stride * height} expected"
        )
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    bpp = channels  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
        elif filter_type == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:  # Average
            raw += bytes(
                (line[i] - ((line[i - bpp] if i >= bpp else 0) + prev[i]) // 2) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = line
    idat = zlib.compress(bytes(raw), compress_level)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` — raw 8-bit
    row-major samples. Verifies chunk CRCs, concatenates multi-IDAT
    streams, inflates with stdlib zlib and inverts all five scanline
    filters. Raises ValueError on anything outside the supported subset
    (interlace, bit depth != 8, palette/alpha color types) so a payload
    the codec cannot faithfully decode is an error, never a misread."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}; 8 required")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_end = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped by construction
    if width < 0:
        raise ValueError("missing IHDR")
    if not seen_end:
        raise ValueError("missing IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("inflated size does not match dimensions")
    bpp = channels
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)
