"""Pure-stdlib BMP codec (decoder + minimal encoder).

Rounds out the real-image lane (round 13, after PNG/JPEG/GIF/VP8L):
BMP is the simplest container still common in crawled archives and
datasets — BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows,
4-byte row padding.  Scope (documented, asserted): uncompressed
(BI_RGB) 24-bit BGR and 32-bit BGRA, 8-bit paletted, top-down
(negative height) variants; RLE4/RLE8/bitfields compression,
16-bit and sub-byte depths raise typed ``BmpFormatError`` for
quarantine.  Output is RGB (3ch) or RGBA (4ch for 32bpp).

The encoder exists for fixture synthesis under the driver's hash
gate (the established codec-gate recipe).  Layout follows the
public Windows BMP format documentation.  Reference parity note:
the reference repo has no media handling (SURVEY.md §2.C)."""

from __future__ import annotations

import struct


class BmpFormatError(ValueError):
    """Raised for malformed BMPs and valid-but-unsupported variants;
    the message names the reason for quarantine grouping."""


def bmp_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a BMP to (width, height, channels, pixel bytes) —
    RGB for 24-bit/paletted, RGBA for 32-bit; rows returned
    top-down regardless of storage order."""
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpFormatError("not a BMP (missing BM signature)")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise BmpFormatError(
            f"BITMAPCOREHEADER ({hdr_size} bytes) not supported"
        )
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h == 0:
        raise BmpFormatError("non-positive BMP dimensions")
    if planes != 1:
        raise BmpFormatError(f"planes {planes} != 1")
    if compression != 0:
        raise BmpFormatError(
            f"compression {compression} not supported (BI_RGB only); "
            "quarantine"
        )
    if bpp not in (8, 24, 32):
        raise BmpFormatError(f"{bpp}-bit BMP not supported; quarantine")
    palette = None
    if bpp == 8:
        (colors_used,) = struct.unpack("<I", data[46:50])
        n_colors = colors_used or 256
        pal_off = 14 + hdr_size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(data):
            raise BmpFormatError("truncated BMP palette")
        palette = [
            data[pal_off + 4 * i : pal_off + 4 * i + 3]  # BGR(A)
            for i in range(n_colors)
        ]
    nch = 4 if bpp == 32 else 3
    row_bytes = (w * bpp // 8 + 3) & ~3
    need = pixel_off + row_bytes * h
    if need > len(data):
        raise BmpFormatError("truncated BMP pixel data")
    out = bytearray(w * h * nch)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = pixel_off + src_row * row_bytes
        o = row * w * nch
        if bpp == 8:
            for x in range(w):
                idx = data[base + x]
                if idx >= len(palette):
                    raise BmpFormatError(
                        f"palette index {idx} outside "
                        f"{len(palette)}-entry table"
                    )
                b, g, r = palette[idx]
                out[o : o + 3] = bytes((r, g, b))
                o += 3
        elif bpp == 24:
            for x in range(w):
                b, g, r = data[base + 3 * x : base + 3 * x + 3]
                out[o : o + 3] = bytes((r, g, b))
                o += 3
        else:
            for x in range(w):
                b, g, r, a = data[base + 4 * x : base + 4 * x + 4]
                out[o : o + 4] = bytes((r, g, b, a))
                o += 4
    return w, h, nch, bytes(out)


def bmp_dimensions(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the info header without
    touching pixel data — the routing-probe pattern."""
    if len(data) < 30 or data[:2] != b"BM":
        raise BmpFormatError("not a BMP (missing BM signature)")
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise BmpFormatError(
            f"BITMAPCOREHEADER ({hdr_size} bytes) not supported"
        )
    w, h_raw = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    if w <= 0 or h_raw == 0:
        raise BmpFormatError("non-positive BMP dimensions")
    return w, abs(h_raw), 4 if bpp == 32 else 3


def bmp_encode(
    w: int,
    h: int,
    pixels: bytes,
    channels: int = 3,
    top_down: bool = False,
    palette: list[bytes] | None = None,
) -> bytes:
    """Write a BMP: 24-bit BGR from RGB input, 32-bit BGRA from
    RGBA input, or 8-bit paletted when ``palette`` is given (then
    ``pixels`` is w*h indices).  ``top_down`` stores a negative
    height with rows in natural order."""
    if palette is not None:
        if len(pixels) != w * h:
            raise BmpFormatError(f"need {w * h} indices")
        if len(palette) > 256 or max(pixels) >= len(palette):
            raise BmpFormatError("palette size/index out of range")
        bpp = 8
        pal_block = b"".join(
            bytes((p[2], p[1], p[0], 0)) for p in palette  # RGB->BGR0
        )
    elif channels in (3, 4):
        if len(pixels) != w * h * channels:
            raise BmpFormatError(f"need {w * h * channels} pixel bytes")
        bpp = channels * 8
        pal_block = b""
    else:
        raise BmpFormatError(f"channels {channels} not supported")
    row_bytes = (w * bpp // 8 + 3) & ~3
    pixel_off = 14 + 40 + len(pal_block)
    body = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for row in rows:
        line = bytearray()
        if palette is not None:
            line += pixels[row * w : (row + 1) * w]
        elif bpp == 24:
            for x in range(w):
                i = (row * w + x) * 3
                line += bytes((pixels[i + 2], pixels[i + 1], pixels[i]))
        else:
            for x in range(w):
                i = (row * w + x) * 4
                line += bytes((
                    pixels[i + 2], pixels[i + 1], pixels[i],
                    pixels[i + 3],
                ))
        line += b"\x00" * (row_bytes - len(line))
        body += line
    out = bytearray(b"BM")
    out += struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, 0,
        len(body), 2835, 2835,
        len(palette) if palette is not None else 0, 0,
    )
    out += pal_block
    out += body
    return bytes(out)
