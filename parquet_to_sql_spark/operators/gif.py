"""Pure-stdlib GIF codec (decoder + minimal encoder).

Closes the biggest remaining real-web quarantine bucket in the
multimodal lane (VERDICT r12 "What's missing" #2): after PNG and
JPEG (baseline/progressive/4:2:2/4:2:0/CMYK), GIF is the next image
format a crawl actually contains, and its two hard parts — LZW
decompression and palette/interlace handling — are pure byte
arithmetic with no third-party dependency.  So a third real format
decodes end-to-end inside ``mapInPandas``/``mapInArrow``.

Scope (documented, asserted):
- GIF87a and GIF89a signatures;
- global and local color tables (any power-of-two size 2..256);
- LZW decompression with the full GIF variant semantics: variable
  code width 3..12 bits, LSB-first packing, clear/EOI codes,
  deferred-clear (width pins at 12 until a clear code arrives);
- Adam-style 4-pass row interlace;
- the FIRST frame of animations (subsequent image descriptors are
  ignored — a crawl features stage wants one representative frame);
- GIF89a Graphic Control transparency: transparent pixels of the
  first frame render as the logical-screen background color (the
  only deterministic choice on a fresh canvas), as does any canvas
  area the first frame's rectangle does not cover;
- output is always 3-channel RGB (palette-mapped), matching the
  channel convention of the other real decoders.

Malformed framing, missing color tables, out-of-range LZW codes and
truncated sub-block streams raise typed ``GifFormatError`` for
quarantine — a training pipeline routes those, never guesses.

The encoder exists so tests and the gate query can synthesize golden
files executor-side (the ``multimodal_png_decode_real`` recipe): it
writes a single-frame GIF89a with a global color table, real LZW
compression (with mid-stream clear codes when the table fills) and
an optional interlace flag so the deinterlacer is exercised under
the driver's hash gate.

Reference parity note: the reference repo (ParquetImporter.php) has
no media handling at all; this module is part of the mandated
LLM-pipeline extension surface (SURVEY.md §2.C multimodal).  Format
layout follows the public GIF89a specification (CompuServe, 1990)
and RFC 2046's image/gif registration.
"""

from __future__ import annotations

import struct

_SIGNATURES = (b"GIF87a", b"GIF89a")


class GifFormatError(ValueError):
    """Raised for malformed GIFs and valid-but-unsupported variants;
    the message names the reason so pipeline quarantine buckets can
    group by it."""


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a length-prefixed sub-block sequence starting at
    ``pos``; returns (payload, position after the 0 terminator)."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("truncated sub-block stream")
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise GifFormatError("truncated sub-block payload")
        out += data[pos : pos + size]
        pos += size


def _skip_subblocks(data: bytes, pos: int) -> int:
    """Advance past a sub-block sequence without materializing it."""
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("truncated sub-block stream")
        size = data[pos]
        pos += 1
        if size == 0:
            return pos
        pos += size
        if pos > n:
            raise GifFormatError("truncated sub-block payload")


def _lzw_decode(payload: bytes, min_code_size: int, n_px: int) -> bytes:
    """GIF-variant LZW: variable code width starting at
    ``min_code_size + 1`` (max 12), codes packed LSB-first across the
    concatenated sub-block payload.  Decodes exactly ``n_px`` index
    bytes (extra trailing codes are ignored, matching real-world
    writers that pad); fewer raises (truncated stream)."""
    if not 2 <= min_code_size <= 11:
        raise GifFormatError(f"LZW minimum code size {min_code_size} invalid")
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary: code -> decoded byte string; roots are single indices
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0  # LSB-first bit accumulator
    nbits = 0
    i = 0
    n = len(payload)
    while len(out) < n_px:
        while nbits < width:
            if i >= n:
                raise GifFormatError("truncated LZW stream")
            acc |= payload[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(roots)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise GifFormatError("first LZW code after clear not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise GifFormatError(f"LZW code {code} out of range")
        out += entry
        prev = entry
        # width grows when the NEXT code could not fit; pins at 12
        # (deferred clear: stays 12 until a clear code)
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_px:
        raise GifFormatError("LZW stream ended before the frame filled")
    return bytes(out[:n_px])


def _deinterlace(idx: bytes, w: int, h: int) -> bytes:
    """GIF 4-pass interlace: rows 0,8,16.. then 4,12.. then 2,6..
    then 1,3.. — reorder the decoded row sequence back to natural."""
    out = bytearray(len(idx))
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for row in range(start, h, step):
            out[row * w : (row + 1) * w] = idx[src * w : (src + 1) * w]
            src += 1
    return bytes(out)


def _color_table(data: bytes, pos: int, packed: int) -> tuple[list[bytes], int]:
    """Read a color table if the packed byte's bit-7 flag says one
    follows; returns ([rgb triples], new position)."""
    if not packed & 0x80:
        return [], pos
    size = 2 << (packed & 0x07)
    end = pos + 3 * size
    if end > len(data):
        raise GifFormatError("truncated color table")
    return [data[pos + 3 * i : pos + 3 * i + 3] for i in range(size)], end


def gif_frames(
    data: bytes, max_frames: int | None = None
) -> tuple[int, int, list[dict]]:
    """Walk EVERY frame of a (possibly animated) GIF and return
    ``(width, height, frames)`` where each frame dict carries the
    fully COMPOSITED logical-screen canvas after that frame renders
    — what a frame-sampling pipeline feeds downstream — plus its
    timing/control metadata:

    ``{"rgb": bytes(sw*sh*3), "delay_cs": int, "disposal": int,
       "rect": (left, top, fw, fh), "interlaced": bool,
       "local_palette": bool}``

    Full GIF89a animation semantics: per-frame Graphic Control
    (delay, disposal, transparency — each applying to exactly one
    image), disposal methods 0/1 (leave), 2 (restore the frame's
    rect to background) and 3 (restore to the pre-frame canvas),
    transparency compositing OVER the prior canvas state, local
    palettes overriding the global one per frame, and interlace per
    frame.  ``max_frames`` caps the walk (a sampler rarely needs
    every frame of a long animation); None decodes all."""
    if len(data) < 13 or data[:6] not in _SIGNATURES:
        raise GifFormatError("not a GIF (missing GIF87a/GIF89a signature)")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed, bg_index = data[10], data[11]
    if sw == 0 or sh == 0:
        raise GifFormatError("zero-dimension logical screen")
    pos = 13
    gct, pos = _color_table(data, pos, packed)
    bg = gct[bg_index] if gct and bg_index < len(gct) else b"\x00\x00\x00"

    import numpy as np

    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:, :] = np.frombuffer(bg, np.uint8)
    frames: list[dict] = []
    transparent: int | None = None
    delay_cs = 0
    disposal = 0
    prev_disposal = 0
    prev_rect: tuple[int, int, int, int] | None = None
    prev_snapshot: np.ndarray | None = None
    n = len(data)
    while pos < n:
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise GifFormatError("truncated extension block")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control (applies to next image)
                body, pos = _read_subblocks(data, pos)
                if len(body) >= 4:
                    disposal = (body[0] >> 2) & 0x7
                    (delay_cs,) = struct.unpack("<H", body[1:3])
                    transparent = body[3] if body[0] & 0x01 else None
            else:  # comment / plain text / application: skip
                pos = _skip_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown block introducer 0x{block:02X}")
        if pos + 9 > n:
            raise GifFormatError("truncated image descriptor")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        if fw == 0 or fh == 0:
            raise GifFormatError("zero-dimension frame")
        if left + fw > sw or top + fh > sh:
            raise GifFormatError("frame rectangle exceeds logical screen")
        lct, pos = _color_table(data, pos, ipacked)
        palette = lct or gct
        if not palette:
            raise GifFormatError("no color table (neither global nor local)")
        if pos >= n:
            raise GifFormatError("truncated before LZW minimum code size")
        mcs = data[pos]
        payload, pos = _read_subblocks(data, pos + 1)
        idx = _lzw_decode(payload, mcs, fw * fh)
        if ipacked & 0x40:
            idx = _deinterlace(idx, fw, fh)

        # dispose of the PREVIOUS frame before drawing this one
        if frames and prev_rect is not None:
            pl, pt, pw, ph = prev_rect
            if prev_disposal == 2:  # restore rect to background
                canvas[pt : pt + ph, pl : pl + pw] = np.frombuffer(
                    bg, np.uint8
                )
            elif prev_disposal == 3 and prev_snapshot is not None:
                canvas = prev_snapshot.copy()
        if disposal == 3:
            prev_snapshot = canvas.copy()

        npal = len(palette)
        pal = np.frombuffer(b"".join(palette), np.uint8).reshape(npal, 3)
        frame = np.frombuffer(idx, np.uint8).reshape(fh, fw)
        opaque = (
            frame != transparent if transparent is not None
            else np.ones_like(frame, bool)
        )
        if int(frame[opaque].max(initial=0)) >= npal:
            raise GifFormatError(
                f"pixel index outside {npal}-entry palette"
            )
        region = canvas[top : top + fh, left : left + fw]
        region[opaque] = pal[frame[opaque]]
        frames.append(
            {
                "rgb": canvas.tobytes(),
                "delay_cs": delay_cs,
                "disposal": disposal,
                "rect": (left, top, fw, fh),
                "interlaced": bool(ipacked & 0x40),
                "local_palette": bool(lct),
            }
        )
        prev_disposal, prev_rect = disposal, (left, top, fw, fh)
        transparent, delay_cs, disposal = None, 0, 0  # GCE is one-shot
        if max_frames is not None and len(frames) >= max_frames:
            return sw, sh, frames
    if not frames:
        raise GifFormatError("no image descriptor before trailer/EOF")
    return sw, sh, frames


def gif_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first frame of a GIF to (width, height, 3,
    rgb_bytes) on the logical-screen canvas.  Width/height are the
    LOGICAL SCREEN dims; the frame rectangle is composited at its
    (left, top) offset and everything else — including transparent
    pixels — renders as the background color (GCT[background index],
    or black without a GCT).  The single-frame view of
    ``gif_frames`` (one shared walk, max_frames=1)."""
    sw, sh, frames = gif_frames(data, max_frames=1)
    return sw, sh, 3, frames[0]["rgb"]


def gif_dimensions(data: bytes) -> tuple[int, int, int]:
    """Logical-screen (width, height, 3) from the 13-byte header
    WITHOUT touching any LZW data — the metadata probe a routing/
    manifest stage runs where a full decode would be absurd (the
    ``jpeg_dimensions`` pattern).  The channel count is always 3:
    GIF is palette-mapped RGB by construction."""
    if len(data) < 13 or data[:6] not in _SIGNATURES:
        raise GifFormatError("not a GIF (missing GIF87a/GIF89a signature)")
    w, h = struct.unpack("<HH", data[6:10])
    if w == 0 or h == 0:
        raise GifFormatError("zero-dimension logical screen")
    return w, h, 3


def _lzw_encode(idx: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compression: emits a clear code first, grows
    the code width as the table fills, and resets with a clear code
    at 4096 entries (the simple always-clear writer every decoder
    must accept).  LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in idx:
        candidate = prefix + bytes([b])
        if candidate in table:
            prefix = candidate
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[candidate] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        if next_code == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _palette_block(
    palette: list[bytes] | list[tuple[int, int, int]],
) -> tuple[int, bytes]:
    """(bits, table_bytes) for a palette padded to the next power of
    two; bits is also the LZW minimum code size (GIF floor of 2)."""
    npal = len(palette)
    if not 2 <= npal <= 256:
        raise GifFormatError(f"palette size {npal} out of range 2..256")
    bits = max(2, (npal - 1).bit_length())
    table = bytearray()
    for entry in palette:
        r, g, b = entry if not isinstance(entry, bytes) else tuple(entry)
        table += bytes((r, g, b))
    table += b"\x00\x00\x00" * ((1 << bits) - npal)
    return bits, bytes(table)


def _image_block(
    fw: int,
    fh: int,
    indices: bytes,
    bits: int,
    left: int = 0,
    top: int = 0,
    interlace: bool = False,
    lct: bytes | None = None,
    lct_bits: int = 0,
) -> bytes:
    """Image descriptor + optional local color table + LZW data
    sub-blocks for one frame."""
    ipacked = (0x40 if interlace else 0) | (
        0x80 | (lct_bits - 1) if lct is not None else 0
    )
    out = bytearray(
        b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + bytes([ipacked])
    )
    if lct is not None:
        out += lct
    if interlace:
        rows = bytearray()
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            for row in range(start, fh, step):
                rows += indices[row * fw : (row + 1) * fw]
        indices = bytes(rows)
    out.append(bits)
    comp = _lzw_encode(indices, bits)
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
    return bytes(out)


def _gce_block(
    disposal: int, delay_cs: int, transparent: int | None
) -> bytes:
    """Graphic Control Extension (applies to the next image only)."""
    flags = ((disposal & 0x7) << 2) | (0x01 if transparent is not None else 0)
    return bytes((0x21, 0xF9, 4, flags)) + struct.pack(
        "<H", delay_cs
    ) + bytes((transparent or 0, 0))


def gif_encode(
    w: int,
    h: int,
    indices: bytes,
    palette: list[bytes] | list[tuple[int, int, int]],
    interlace: bool = False,
    transparent: int | None = None,
    background: int = 0,
) -> bytes:
    """Write a single-frame GIF89a: ``indices`` is w*h palette
    indices, ``palette`` up to 256 RGB triples (padded to the next
    power of two).  ``interlace`` stores rows in 4-pass order so the
    decoder's deinterlacer is exercised; ``transparent`` adds a
    Graphic Control Extension marking that index."""
    if len(indices) != w * h:
        raise GifFormatError(f"need {w * h} indices, got {len(indices)}")
    if max(indices) >= len(palette):
        raise GifFormatError("pixel index outside palette")
    bits, table = _palette_block(palette)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes((0x80 | (bits - 1), background, 0))
    out += table
    if transparent is not None:
        out += _gce_block(0, 0, transparent)
    out += _image_block(w, h, indices, bits, interlace=interlace)
    out += b"\x3b"
    return bytes(out)


def gif_encode_animation(
    w: int,
    h: int,
    frames: list[dict],
    global_palette: list[bytes] | None = None,
    background: int = 0,
    loop: int | None = 0,
) -> bytes:
    """Write a multi-frame GIF89a animation.  Each frame dict:

    ``{"indices": bytes(fw*fh), "palette": [...] | None (use
    global), "left": 0, "top": 0, "fw": w, "fh": h, "delay_cs": 0,
    "disposal": 0, "transparent": None, "interlace": False}``

    ``loop`` writes the NETSCAPE2.0 application extension (0 =
    forever, None = omit).  Every frame gets its own Graphic
    Control Extension (one-shot per the spec), so per-frame delay/
    disposal/transparency round-trip through ``gif_frames``."""
    if not frames:
        raise GifFormatError("animation needs at least one frame")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    gbits = 0
    if global_palette is not None:
        gbits, gtable = _palette_block(global_palette)
        out += bytes((0x80 | (gbits - 1), background, 0))
        out += gtable
    else:
        out += bytes((0, background, 0))
    if loop is not None:
        out += (
            b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
            + struct.pack("<H", loop) + b"\x00"
        )
    for f in frames:
        fw, fh = f.get("fw", w), f.get("fh", h)
        left, top = f.get("left", 0), f.get("top", 0)
        indices = f["indices"]
        if len(indices) != fw * fh:
            raise GifFormatError(
                f"frame needs {fw * fh} indices, got {len(indices)}"
            )
        pal = f.get("palette")
        if pal is not None:
            bits, table = _palette_block(pal)
            npal = len(pal)
            lct, lct_bits = table, bits
        elif global_palette is not None:
            bits, npal = gbits, len(global_palette)
            lct, lct_bits = None, 0
        else:
            raise GifFormatError(
                "frame has no palette and no global palette exists"
            )
        if max(indices) >= npal:
            raise GifFormatError("pixel index outside palette")
        out += _gce_block(
            f.get("disposal", 0), f.get("delay_cs", 0),
            f.get("transparent"),
        )
        out += _image_block(
            fw, fh, indices, bits, left=left, top=top,
            interlace=f.get("interlace", False),
            lct=lct, lct_bits=lct_bits,
        )
    out += b"\x3b"
    return bytes(out)
