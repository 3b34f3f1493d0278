"""Pure-stdlib baseline JPEG codec (decoder + minimal encoder).

Extends the real-modality story (VERDICT r09 "next round" #2) to the
format web crawls are actually made of: baseline sequential DCT JPEG
per the public ITU-T T.81 spec — marker parsing, canonical Huffman
decode (F.2.2.3 MINCODE/MAXCODE), coefficient EXTEND, dequantization,
8x8 inverse DCT (numpy, batched across blocks), chroma upsampling and
JFIF YCbCr->RGB.  No third-party imaging library exists in the
container (PIL/libjpeg re-verified absent every round); numpy +
stdlib `struct` are the only dependencies, exactly like the PNG/AVI
codecs beside it.

Scope (documented, asserted): baseline (SOF0), extended sequential
(SOF1), and — since round 12 — PROGRESSIVE (SOF2) Huffman scans with
both spectral selection and successive approximation (T.81 Annex G:
DC first/refine, AC first/refine with EOB-run coding, interleaved DC
scans, non-interleaved AC scans over each component's own block
grid, restart intervals inside every scan kind); 8-bit samples, 1
component (grayscale) or 3 components (JFIF YCbCr) with sampling
factors 1-2 (4:4:4, 4:2:2, 4:2:0), restart intervals (DRI/RSTn),
and — since round 12 — 4-component Adobe CMYK/YCCK frames (APP14
transform flag 0 or 2, values stored inverted per the Adobe
convention, converted to display RGB on the way out; a 4-component
frame WITHOUT the APP14 flag quarantines rather than guessing the
channel meaning).  Everything else raises :class:`JpegFormatError`
naming the reason — arithmetic coding (SOF9-11),
lossless/hierarchical, 12-bit precision — so a training pipeline
routes those to a quarantine bucket rather than guessing (same
contract as the PNG and AVI codecs).

Determinism contract: the decoder's IDCT is float64 with one
canonical rounding (numpy round-half-even) and 0..255 clipping; for
per-block-CONSTANT content the reconstruction is mathematically
exact (only the DC coefficient is nonzero and the quantizer divides
it), which is what makes the `multimodal_jpeg_decode_real` gate
query value-exact against an arithmetic DuckDB oracle that never
decodes anything.

The encoder exists so tests and the gate query can synthesize
fixtures executor-side: single-scan baseline, 4:4:4, standard
Annex K Huffman tables, configurable flat quantization, optional
restart intervals to exercise the RSTn path.

Reference parity note: the reference repo (ParquetImporter.php) has
no media handling; this module is mandated LLM-pipeline extension
surface (SURVEY.md §2.C multimodal).
"""

from __future__ import annotations

import functools
import struct

import numpy as np


class JpegFormatError(ValueError):
    """Malformed JPEGs and valid-but-unsupported variants
    (progressive / arithmetic / 12-bit / CMYK); the message names the
    reason so quarantine buckets can group by it."""


# zig-zag scan order: index in scan order -> index in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
# forward: S = M @ s @ M.T     inverse: s = M.T @ S @ M
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = (_c / 2.0) * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# ITU-T T.81 Annex K typical Huffman tables: (BITS[1..16], HUFFVAL)
_K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

_UNSUPPORTED_SOF = {
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


# AC table for PROGRESSIVE encoding: progressive AC scans need the
# EOBn symbols (run<<4 with run 1..14 — end-of-band runs spanning up
# to 2^14 blocks) that the Annex K BASELINE tables simply do not
# contain.  Rather than grow a frequency-optimizing table builder,
# use the trivially valid canonical table that assigns EVERY symbol
# (run 0..15 x size 0..10 = 176 symbols: all EOBn, ZRL, and every
# run/size pair an 8-bit-sample scan can produce) an 8-bit code —
# 176 <= 256 leaves Kraft slack, the decoder's 8-bit LUT resolves
# every code in one index, and fixture compactness is irrelevant.
_P_AC_ALL8 = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


class _HuffTable:
    """Canonical Huffman table per T.81 F.2.2.3: MINCODE/MAXCODE/
    VALPTR indexed by code length."""

    def __init__(self, bits: list[int], huffval: list[int]):
        if len(bits) != 16 or sum(bits) != len(huffval):
            raise JpegFormatError("inconsistent DHT (BITS vs HUFFVAL)")
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        # encoder side: value -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.enc[huffval[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        # fast path: 8-bit prefix lookup (covers the overwhelmingly
        # common short codes in one dict-free index); cached by table
        # content because the Annex K tables recur across every image
        self.key = (tuple(bits), tuple(huffval))
        self.lut8 = _lut8(*self.key)


@functools.lru_cache(maxsize=64)
def _lut8(bits: tuple, huffval: tuple) -> list:
    """256-entry (value, code_length) table for Huffman codes of
    length <= 8: entry i resolves the code that is a prefix of the
    8-bit string i, or (0, 0) when the code is longer than 8 bits
    (the per-bit fallback walk handles those)."""
    lut = [(0, 0)] * 256
    code = 0
    k = 0
    for length in range(1, 9):
        for _ in range(bits[length - 1]):
            base = code << (8 - length)
            for filler in range(1 << (8 - length)):
                lut[base + filler] = (huffval[k], length)
            code += 1
            k += 1
        code <<= 1
    return lut


@functools.lru_cache(maxsize=64)
def _lut16(bits: tuple, huffval: tuple, is_dc: bool) -> list:
    """65536-entry MULTI-SYMBOL table: entry p resolves the Huffman
    code that is a prefix of the 16-bit string p TOGETHER with its
    trailing magnitude bits, packed as one int

        E = total_bits | (size << 5) | (run << 9)

    where total_bits = code length + magnitude size (<= 31 fits 5
    bits), size is the DC category / AC magnitude size, and run is
    the AC zero-run (0 for DC).  E == 0 means fall back to the
    canonical walk: code+magnitude straddles 16 bits, or a DC
    category > 15 that the fallback must reject.  One list index
    replaces a Huffman decode, a receive(), and an EXTEND per
    coefficient — the decode hot loop's multi-symbol fast path
    (VERDICT r10 "Next round" #3).  Cached by table content because
    the Annex K tables recur across every image."""
    lut = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            rs = huffval[k]
            size = rs if is_dc else rs & 0xF
            run = 0 if is_dc else rs >> 4
            # AC size-0 symbols: only 0x00 (EOB, run 0) and 0xF0
            # (ZRL, run 15) are defined by T.81; rs = 0x10..0xE0 are
            # undefined, and the canonical fallback walk treats them
            # as EOB (sz == 0, rs != 0xF0 -> break).  Encode them
            # with run 0 here too so the SAME malformed stream
            # decodes identically whichever path resolves the code
            # (ADVICE r11: the fast path's "size 0, run > 0 -> ZRL"
            # shortcut diverged from the fallback on these symbols).
            if not is_dc and size == 0 and rs != 0xF0:
                run = 0
            total = length + size
            if size <= 15 and total <= 16:
                e = total | (size << 5) | (run << 9)
                base = code << (16 - length)
                lut[base : base + (1 << (16 - length))] = [e] * (
                    1 << (16 - length)
                )
            code += 1
            k += 1
        code <<= 1
    return lut


# bit-buffer masks up to the reader's high-water mark (fill keeps
# nbits < 24; magnitude receives stay below 40)
_BMASK = tuple((1 << n) - 1 for n in range(40))


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the scan's entropy-coded data into RESTART segments,
    un-stuffing 0xFF00 as it goes (one pass over the scan bytes,
    instead of per-bit marker checks in the hot loop): returns
    (segments, position_of_the_terminating_marker).  Validates RSTn
    ordering (markers must cycle RST0..RST7)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n_rst = 0
    n = len(data)
    while True:
        b = data.find(0xFF, i)
        if b < 0:
            raise JpegFormatError("entropy data ran out before EOI")
        cur += data[i:b]
        if b + 1 >= n:
            raise JpegFormatError("dangling 0xFF at end of scan")
        nxt = data[b + 1]
        if nxt == 0x00:
            cur += b"\xff"
            i = b + 2
        elif 0xD0 <= nxt <= 0xD7:
            if nxt != 0xD0 + (n_rst & 7):
                raise JpegFormatError(
                    f"restart marker out of order: expected "
                    f"RST{n_rst & 7}, got 0xFF{nxt:02X}"
                )
            segs.append(bytes(cur))
            cur = bytearray()
            n_rst += 1
            i = b + 2
        else:
            segs.append(bytes(cur))
            return segs, b


class _SegBits:
    """Chunk-buffered bit reader over one pre-unstuffed restart
    segment.  Up to 16 bits of trailing 1-fill are served past the
    segment end (T.81 pad-bit semantics — the final EOB's code can
    straddle the pad); needing more raises the truncation error."""

    __slots__ = ("d", "i", "buf", "nbits", "slack")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.buf = 0
        self.nbits = 0
        self.slack = 0

    def _fill(self) -> None:
        if self.i < len(self.d):
            self.buf = (self.buf << 8) | self.d[self.i]
            self.i += 1
        else:
            if self.slack >= 16:
                raise JpegFormatError("entropy data ran out before EOI")
            self.buf = (self.buf << 8) | 0xFF
            self.slack += 8
        self.nbits += 8

    def receive(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def decode(self, table: _HuffTable) -> int:
        while self.nbits < 8:
            self._fill()
        p = (self.buf >> (self.nbits - 8)) & 0xFF
        v, ln = table.lut8[p]
        if ln:
            self.nbits -= ln
            self.buf &= (1 << self.nbits) - 1
            return v
        # code longer than 8 bits: continue the canonical walk
        code = p
        self.nbits -= 8
        self.buf &= (1 << self.nbits) - 1
        length = 8
        while code > table.maxcode[length]:
            length += 1
            if length > 16:
                raise JpegFormatError(
                    "invalid Huffman code (no match in 16 bits)"
                )
            code = (code << 1) | self.receive(1)
        return table.huffval[
            table.valptr[length] + code - table.mincode[length]
        ]


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map the t-bit magnitude v to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG -> (width, height, channels, pixels).

    ``pixels`` is row-major 8-bit RGB (3 components) or grayscale
    (1 component), ``width * height * channels`` bytes.  Raises
    :class:`JpegFormatError` on malformed input and on every variant
    outside the documented scope (baseline, extended sequential, and
    progressive Huffman frames).
    """
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    frame = None  # (w, h, [(cid, hsamp, vsamp, tq)])
    restart_interval = 0
    out = None
    progressive = False
    prog = None  # progressive coefficient state, built at first SOS
    adobe_transform = None  # APP14 color-transform flag (CMYK/YCCK)

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at byte {pos}")
        # 0xFF fill bytes may pad before any marker (T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise JpegFormatError("truncated marker segment")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise JpegFormatError(f"truncated 0xFF{marker:02X} segment")
        pos += seglen

        if marker in _UNSUPPORTED_SOF:
            raise JpegFormatError(
                f"{_UNSUPPORTED_SOF[marker]} not supported; "
                "baseline sequential Huffman only — quarantine"
            )
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    q = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                    i += 64
                elif pq == 1:
                    q = np.frombuffer(seg[i : i + 128], dtype=">u2")
                    i += 128
                else:
                    raise JpegFormatError(f"bad DQT precision {pq}")
                if len(q) != 64:
                    raise JpegFormatError("truncated DQT table")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = q  # de-zigzag to natural order
                qtables[tq] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                i += 17 + n
                t = _HuffTable(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = t
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2 (prog.)
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise JpegFormatError(
                    f"{prec}-bit precision not supported (8 only) — quarantine"
                )
            if nc not in (1, 3, 4):
                raise JpegFormatError(
                    f"{nc}-component image not supported "
                    "(grayscale/YCbCr/Adobe CMYK)"
                )
            if w == 0 or h == 0:
                raise JpegFormatError("zero-dimension image")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise JpegFormatError(
                        f"sampling factors {hs}x{vs} not supported (1-2)"
                    )
                comps.append((cid, hs, vs, tq))
            frame = (w, h, comps)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            adobe_transform = seg[11]  # APP14: 0 CMYK/RGB, 1 YCC, 2 YCCK
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            w, h, comps = frame
            if len(comps) == 4:
                # Adobe is the only 4-component JPEG convention in
                # the wild; without the APP14 transform flag the
                # channel meaning is a guess — quarantine instead
                if adobe_transform not in (0, 2):
                    raise JpegFormatError(
                        "4-component image without an Adobe APP14 "
                        "CMYK/YCCK transform flag — quarantine"
                    )
            elif len(comps) == 3 and adobe_transform == 0:
                # ADVICE r12: APP14 transform 0 on a 3-component
                # frame declares the samples are RGB, not YCbCr —
                # decoding through the YCbCr matrix would produce
                # wrong colors silently.  The ambiguity contract is
                # quarantine, not a guess.
                raise JpegFormatError(
                    "3-component image with Adobe APP14 transform 0 "
                    "(RGB) — the YCbCr path does not apply; quarantine"
                )
            ns = seg[0]
            if progressive:
                if prog is None:
                    prog = _ProgressiveState(frame)
                pos = _decode_progressive_scan(
                    data, pos, seg, prog, dc_tabs, ac_tabs,
                    restart_interval,
                )
                continue
            if ns != len(comps):
                raise JpegFormatError(
                    "partial/multi-scan not supported in a sequential "
                    "frame (baseline single scan only) — quarantine"
                )
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
            out = _decode_scan(
                data, pos, frame, sel, qtables, dc_tabs, ac_tabs,
                restart_interval, adobe_transform,
            )
            pos = out[1]
            out = out[0]
        # APPn / COM / others: skipped (length already consumed)

    if progressive:
        if prog is None:
            raise JpegFormatError("no scan decoded (missing SOS)")
        out = prog.reconstruct(qtables, adobe_transform)
    if out is None:
        raise JpegFormatError("no scan decoded (missing SOS)")
    w, h, comps = frame
    # 4-component Adobe CMYK/YCCK converts to display RGB on the way
    # out — the pixel buffer is 3 channels regardless of the frame's
    # component count
    return w, h, min(len(comps), 3), out


def _decode_scan(data, pos, frame, sel, qtables, dc_tabs, ac_tabs, ri,
                 adobe_transform=None):
    """Entropy-decode the single interleaved scan, inverse-DCT every
    block (numpy, batched per component), upsample and color-convert.
    Returns (pixels, new_pos)."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    per = []
    for cid, hs, vs, tq in comps:
        if tq not in qtables:
            raise JpegFormatError(f"missing quant table {tq}")
        if cid not in sel:
            raise JpegFormatError(f"component {cid} missing from SOS")
        td, ta = sel[cid]
        if td not in dc_tabs or ta not in ac_tabs:
            raise JpegFormatError(f"missing Huffman table (DC {td} / AC {ta})")
        bw, bh = mcux * hs, mcuy * vs
        per.append({
            "hs": hs, "vs": vs, "q": qtables[tq],
            "dc": dc_tabs[td], "ac": ac_tabs[ta],
            "coef": np.zeros((bh * bw, 8, 8), dtype=np.int64),
            "bw": bw, "pred": 0,
        })

    segs, new_pos = _entropy_segments(data, pos)
    n_mcu = mcux * mcuy
    expected_segs = -(-n_mcu // ri) if ri else 1
    if len(segs) != expected_segs:
        raise JpegFormatError(
            f"restart-segment count {len(segs)} != expected "
            f"{expected_segs} (interval {ri}, {n_mcu} MCUs)"
        )
    # stage coefficients in flat Python lists; one bulk numpy
    # scatter back to natural order per component at the end
    for st in per:
        st["flat"] = [0] * (st["coef"].shape[0] * 64)
        st["dc16"] = _lut16(*st["dc"].key, True)
        st["ac16"] = _lut16(*st["ac"].key, False)
    # Multi-symbol hot loop: one 16-bit peek resolves (code, category/
    # run-size, magnitude bits) through the cached _lut16 tables.  The
    # peek itself is one index into a per-segment table of overlapping
    # 24-bit byte windows (built in one vectorized numpy pass), so the
    # only per-coefficient state is the BIT POSITION — no bit buffer,
    # no refill loop, no masking bookkeeping.  Coefficients stage in
    # ZIGZAG order (flat[base + k], no per-store permutation lookup);
    # one vectorized scatter per component restores natural order
    # below.  Each pre-unstuffed restart segment is padded with 8
    # bytes of 1-fill (T.81 pad-bit semantics); the post-segment
    # accounting rejects any decode that consumed more than 16 bits
    # past the real data, matching the old reader's slack rule, and
    # running off the pad entirely raises via IndexError below.
    msk = _BMASK
    try:
        for seg_idx, seg in enumerate(segs):
            d = seg + b"\xff\xff\xff\xff\xff\xff\xff\xff"
            db = np.frombuffer(d, np.uint8).astype(np.int64)
            a24 = ((db[:-2] << 16) | (db[1:-1] << 8) | db[2:]).tolist()
            bp = 0  # bit position from segment start
            for st in per:
                st["pred"] = 0
            m_lo = seg_idx * ri if ri else 0
            m_hi = min(m_lo + ri, n_mcu) if ri else n_mcu
            for m in range(m_lo, m_hi):
                my, mx = divmod(m, mcux)
                for st in per:
                    hs, vs, bw = st["hs"], st["vs"], st["bw"]
                    flat = st["flat"]
                    dc16, ac16 = st["dc16"], st["ac16"]
                    pred = st["pred"]
                    for by in range(vs):
                        for bx in range(hs):
                            base = (
                                (my * vs + by) * bw + (mx * hs + bx)
                            ) * 64
                            # ---- DC: one peek resolves code+magnitude
                            p = (
                                a24[bp >> 3] >> (8 - (bp & 7))
                            ) & 0xFFFF
                            e = dc16[p]
                            if e:
                                adv = e & 31
                                bp += adv
                                t = e >> 5
                                if t:
                                    mag = (p >> (16 - adv)) & msk[t]
                                    pred += (
                                        mag
                                        if mag >> (t - 1)
                                        else mag - msk[t]
                                    )
                            else:
                                # straddles 16 bits (or invalid): walk
                                tab = st["dc"]
                                mc = tab.maxcode
                                ln = 1
                                while p >> (16 - ln) > mc[ln]:
                                    ln += 1
                                    if ln > 16:
                                        raise JpegFormatError(
                                            "invalid Huffman code "
                                            "(no match in 16 bits)"
                                        )
                                code = p >> (16 - ln)
                                t = tab.huffval[
                                    tab.valptr[ln] + code - tab.mincode[ln]
                                ]
                                bp += ln
                                if t > 15:
                                    raise JpegFormatError(
                                        f"bad DC category {t}"
                                    )
                                if t:
                                    p2 = (
                                        a24[bp >> 3] >> (8 - (bp & 7))
                                    ) & 0xFFFF
                                    mag = p2 >> (16 - t)
                                    bp += t
                                    pred += (
                                        mag
                                        if mag >> (t - 1)
                                        else mag - msk[t]
                                    )
                            flat[base] = pred
                            # ---- AC
                            k = 1
                            while k < 64:
                                p = (
                                    a24[bp >> 3] >> (8 - (bp & 7))
                                ) & 0xFFFF
                                e = ac16[p]
                                if e:
                                    adv = e & 31
                                    bp += adv
                                    sz = (e >> 5) & 15
                                    if sz:
                                        k += e >> 9
                                        if k > 63:
                                            raise JpegFormatError(
                                                "AC run past block end"
                                            )
                                        mag = (p >> (16 - adv)) & msk[sz]
                                        flat[base + k] = (
                                            mag
                                            if mag >> (sz - 1)
                                            else mag - msk[sz]
                                        )
                                        k += 1
                                    elif e >> 9:  # ZRL
                                        k += 16
                                    else:  # EOB
                                        break
                                else:
                                    tab = st["ac"]
                                    mc = tab.maxcode
                                    ln = 1
                                    while p >> (16 - ln) > mc[ln]:
                                        ln += 1
                                        if ln > 16:
                                            raise JpegFormatError(
                                                "invalid Huffman code "
                                                "(no match in 16 bits)"
                                            )
                                    code = p >> (16 - ln)
                                    rs = tab.huffval[
                                        tab.valptr[ln]
                                        + code
                                        - tab.mincode[ln]
                                    ]
                                    bp += ln
                                    sz = rs & 0xF
                                    if sz == 0:
                                        if rs == 0xF0:  # ZRL
                                            k += 16
                                            continue
                                        break  # EOB
                                    k += rs >> 4
                                    if k > 63:
                                        raise JpegFormatError(
                                            "AC run past block end"
                                        )
                                    p2 = (
                                        a24[bp >> 3] >> (8 - (bp & 7))
                                    ) & 0xFFFF
                                    mag = p2 >> (16 - sz)
                                    bp += sz
                                    flat[base + k] = (
                                        mag
                                        if mag >> (sz - 1)
                                        else mag - msk[sz]
                                    )
                                    k += 1
                    st["pred"] = pred
            if bp > 8 * len(seg) + 16:
                raise JpegFormatError("entropy data ran out before EOI")
    except IndexError:
        raise JpegFormatError("entropy data ran out before EOI") from None
    for st in per:
        # staged in zigzag order: one vectorized scatter to natural
        zzc = np.asarray(st["flat"], dtype=np.int64).reshape(-1, 64)
        nat = np.empty_like(zzc)
        nat[:, _ZIGZAG] = zzc
        st["coef"] = nat.reshape(-1, 8, 8)
        del st["flat"]

    return _reconstruct(per, w, h, hmax, vmax, adobe_transform), new_pos


def _reconstruct(per, w, h, hmax, vmax, adobe_transform=None) -> bytes:
    """Dequantize + inverse-DCT every component's coefficient array
    (natural order, (n_blocks, 8, 8) on the MCU-padded grid),
    replicate-upsample subsampled planes, and color-convert — the
    shared back half of the baseline and progressive decode paths.
    Four components follow the Adobe convention (the only one in
    the wild): values stored INVERTED, ``adobe_transform`` 2 means
    YCCK (channels 0-2 through the YCbCr matrix first); display RGB
    is then ``round(Cinv * Kinv / 255)`` per channel — never an
    exact .5 (2*c*k is even, 255 odd), so the rounding is
    engine-agnostic."""
    planes = []
    for st in per:
        deq = st["coef"] * st["q"]  # (n, 8, 8) * (8, 8) broadcast
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_M, deq.astype(np.float64),
                            _DCT_M, optimize=True)
        px = np.clip(np.round(spatial) + 128.0, 0, 255).astype(np.uint8)
        bw = st["bw"]
        bh = px.shape[0] // bw
        plane = (
            px.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # replicate-upsample to full MCU-grid resolution
        fy, fx = vmax // st["vs"], hmax // st["hs"]
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0].tobytes()
    if len(planes) == 4:
        if adobe_transform == 2:  # YCCK: 0-2 through the YCC matrix
            y = planes[0].astype(np.float64)
            cb = planes[1].astype(np.float64) - 128.0
            cr = planes[2].astype(np.float64) - 128.0
            cmy = np.clip(np.round(np.stack(
                [
                    y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb,
                ],
                axis=-1,
            )), 0, 255)
        else:  # transform 0: channels ARE inverted CMY directly
            cmy = np.stack(planes[:3], axis=-1).astype(np.float64)
        kinv = planes[3].astype(np.float64)[..., None]
        rgb = np.round(cmy * kinv / 255.0)
        return np.clip(rgb, 0, 255).astype(np.uint8).tobytes()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


class _ProgressiveState:
    """Coefficient accumulator for a progressive (SOF2) frame: one
    zigzag-order flat int list per component on the MCU-padded block
    grid, updated scan by scan (T.81 Annex G), scattered to natural
    order and reconstructed once at EOI.

    Non-interleaved scans address only the component's USED blocks —
    ceil(comp_width/8) x ceil(comp_height/8) per T.81 A.2.2, which is
    NARROWER than the MCU-padded grid when a 4:2:0 luma plane has an
    odd MCU-row remainder — so each component carries both widths and
    ``block_base`` maps a scan block index onto the padded array."""

    def __init__(self, frame):
        w, h, comps = frame
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.comps: dict[int, dict] = {}
        self.order: list[int] = []
        for cid, hs, vs, tq in comps:
            bw, bh = self.mcux * hs, self.mcuy * vs
            cw, ch = -(-w * hs // self.hmax), -(-h * vs // self.vmax)
            self.comps[cid] = {
                "hs": hs, "vs": vs, "tq": tq, "bw": bw, "bh": bh,
                "ubw": -(-cw // 8), "ubh": -(-ch // 8),
                "flat": [0] * (bw * bh * 64),
                "dc_seen": False,
            }
            self.order.append(cid)

    def reconstruct(self, qtables, adobe_transform=None) -> bytes:
        w, h, _ = self.frame
        per = []
        for cid in self.order:
            st = self.comps[cid]
            if st["tq"] not in qtables:
                raise JpegFormatError(f"missing quant table {st['tq']}")
            zzc = np.asarray(st["flat"], dtype=np.int64).reshape(-1, 64)
            nat = np.empty_like(zzc)
            nat[:, _ZIGZAG] = zzc
            per.append({
                "coef": nat.reshape(-1, 8, 8), "q": qtables[st["tq"]],
                "bw": st["bw"], "hs": st["hs"], "vs": st["vs"],
            })
        return _reconstruct(per, w, h, self.hmax, self.vmax,
                            adobe_transform)


def _decode_progressive_scan(data, pos, seg, prog, dc_tabs, ac_tabs, ri):
    """Decode one progressive scan (T.81 G.2): DC first/refine over
    interleaved MCUs or a single component's blocks, AC first/refine
    over exactly one component's blocks with EOB-run coding.  Updates
    ``prog`` in place; returns the position of the terminating
    marker."""
    ns = seg[0]
    if len(seg) < 4 + 2 * ns:
        raise JpegFormatError("truncated SOS header")
    scomps = []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        if cs not in prog.comps:
            raise JpegFormatError(f"scan component {cs} not in frame")
        scomps.append((cs, tt >> 4, tt & 0xF))
    ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0xF
    is_dc = ss == 0
    if is_dc:
        if se != 0:
            raise JpegFormatError(
                f"progressive scan with Ss=0 must have Se=0 (got {se})"
            )
    else:
        if not (1 <= ss <= se <= 63):
            raise JpegFormatError(f"bad spectral band {ss}..{se}")
        if ns != 1:
            raise JpegFormatError(
                "progressive AC scans must be non-interleaved (ns=1)"
            )
    if al > 13 or (ah and ah != al + 1):
        raise JpegFormatError(
            f"bad successive approximation Ah={ah} Al={al}"
        )
    refine = ah != 0

    # resolve tables up front (DC refinement needs none)
    for cs, td, ta in scomps:
        st = prog.comps[cs]
        if is_dc:
            if not refine:
                if td not in dc_tabs:
                    raise JpegFormatError(f"missing Huffman table (DC {td})")
                st["dct"] = dc_tabs[td]
            if refine and not st["dc_seen"]:
                raise JpegFormatError("DC refinement before DC first scan")
            if not refine:
                st["dc_seen"] = True
        else:
            if not st["dc_seen"]:
                raise JpegFormatError("AC scan before the DC first scan")
            if ta not in ac_tabs:
                raise JpegFormatError(f"missing Huffman table (AC {ta})")
            st["act"] = ac_tabs[ta]

    interleaved = is_dc and ns > 1
    if interleaved:
        n_units = prog.mcux * prog.mcuy
    else:
        st0 = prog.comps[scomps[0][0]]
        n_units = st0["ubw"] * st0["ubh"]

    segs, new_pos = _entropy_segments(data, pos)
    expected = -(-n_units // ri) if ri else 1
    if len(segs) != expected:
        raise JpegFormatError(
            f"restart-segment count {len(segs)} != expected {expected} "
            f"(interval {ri}, {n_units} units)"
        )

    u = 0
    for sdata in segs:
        bits = _SegBits(sdata)
        preds = dict.fromkeys((sc[0] for sc in scomps), 0)
        eobrun = 0
        u_hi = min(u + ri, n_units) if ri else n_units
        while u < u_hi:
            if interleaved:
                my, mx = divmod(u, prog.mcux)
                for cs, _, _ in scomps:
                    st = prog.comps[cs]
                    hs, vs, bw = st["hs"], st["vs"], st["bw"]
                    flat = st["flat"]
                    for by in range(vs):
                        for bx in range(hs):
                            base = (
                                (my * vs + by) * bw + (mx * hs + bx)
                            ) * 64
                            if refine:
                                if bits.receive(1):
                                    flat[base] |= 1 << al
                            else:
                                preds[cs] = _dc_first(
                                    bits, st["dct"], flat, base,
                                    preds[cs], al,
                                )
            else:
                cs = scomps[0][0]
                st = prog.comps[cs]
                by, bx = divmod(u, st["ubw"])
                base = (by * st["bw"] + bx) * 64
                flat = st["flat"]
                if is_dc:
                    if refine:
                        if bits.receive(1):
                            flat[base] |= 1 << al
                    else:
                        preds[cs] = _dc_first(
                            bits, st["dct"], flat, base, preds[cs], al
                        )
                elif refine:
                    eobrun = _ac_refine(
                        bits, st["act"], flat, base, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_first(
                        bits, st["act"], flat, base, ss, se, al, eobrun
                    )
            u += 1
    return new_pos


def _dc_first(bits, dc_tab, flat, base, pred, al) -> int:
    """One block of a first DC scan (G.2.1): baseline DIFF decode in
    the point-transformed domain; the stored coefficient is the
    accumulated predictor scaled back up by 2^Al."""
    t = bits.decode(dc_tab)
    if t > 15:
        raise JpegFormatError(f"bad DC category {t}")
    pred += _extend(bits.receive(t), t) if t else 0
    flat[base] = pred << al
    return pred

def _ac_first(bits, ac_tab, flat, base, ss, se, al, eobrun) -> int:
    """One block of a first AC scan (G.2.2): run/size coding within
    the band with EOBn end-of-band runs; magnitudes are scaled by
    2^Al (the AC point transform divides magnitude, not value)."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = bits.decode(ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += bits.receive(r)
            break
        k += r
        if k > se:
            raise JpegFormatError("AC run past band end")
        flat[base + k] = _extend(bits.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(bits, ac_tab, flat, base, ss, se, al, eobrun) -> int:
    """One block of an AC refinement scan (G.2.3 / figure G.7): each
    already-nonzero coefficient passed over consumes one correction
    bit; newly significant coefficients arrive as run/1 symbols with
    a sign bit; EOBn runs carry the correction bits of every block
    they cover.  Bitwise ops on the (possibly negative) stored
    values follow two's complement exactly as the spec's integer
    arithmetic does."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = bits.decode(ac_tab)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.receive(r)
                    break
                # r == 15: skip over 16 zero-HISTORY coefficients
            else:
                if s != 1:
                    raise JpegFormatError(
                        "AC refinement magnitude size != 1"
                    )
                newval = p1 if bits.receive(1) else -p1
            while k <= se:
                c = flat[base + k]
                if c:
                    if bits.receive(1) and not (c & p1):
                        flat[base + k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s:
                if k > se:
                    raise JpegFormatError("AC refinement run past band end")
                flat[base + k] = newval
            k += 1
    if eobrun:
        while k <= se:
            c = flat[base + k]
            if c:
                if bits.receive(1) and not (c & p1):
                    flat[base + k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per T.81


def _encode_block(wtr, coef_zz, pred, dc_tab, ac_tab):
    """Huffman-encode one quantized block given in zigzag order;
    returns the new DC predictor."""
    diff = int(coef_zz[0]) - pred
    t = 0 if diff == 0 else int(diff if diff > 0 else -diff).bit_length()
    code, ln = dc_tab.enc[t]
    wtr.put(code, ln)
    if t:
        wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab.enc[0xF0]  # ZRL
            wtr.put(code, ln)
            run -= 16
        s = int(v if v > 0 else -v).bit_length()
        code, ln = ac_tab.enc[(run << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab.enc[0x00]  # EOB
        wtr.put(code, ln)
    return int(coef_zz[0])


def _quantized_components(
    width, height, pixels, channels, quant, subsampling, pixels_are_ycbcr
):
    """Shared encoder front half (validation, color transform, 4:2:0
    mean-subsample, edge-pad, FDCT, flat quantization): returns
    ``(blocks_per_comp, grids)`` where blocks_per_comp[c] is the
    (n_blocks, 64) zigzag-order quantized coefficients and grids[c]
    the component's (blocks-wide, blocks-high)."""
    if channels not in (1, 3, 4):
        raise JpegFormatError(f"channels {channels} not supported (1/3/4)")
    if channels == 4 and subsampling != "444":
        raise JpegFormatError("4-component encode supports 4:4:4 only")
    if len(pixels) != width * height * channels:
        raise JpegFormatError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    if not 1 <= quant <= 255:
        raise JpegFormatError(f"quant {quant} out of range 1..255")
    if subsampling not in ("444", "422", "420"):
        raise JpegFormatError(f"subsampling {subsampling!r} not supported")
    if subsampling == "420":
        if channels != 3:
            raise JpegFormatError("4:2:0 requires 3 channels")
        if width % 16 or height % 16:
            raise JpegFormatError(
                "4:2:0 requires width and height to be multiples of 16"
            )
    if subsampling == "422":
        if channels != 3:
            raise JpegFormatError("4:2:2 requires 3 channels")
        if width % 16 or height % 8:
            raise JpegFormatError(
                "4:2:2 requires width % 16 == 0 and height % 8 == 0"
            )
    if pixels_are_ycbcr and channels != 3:
        raise JpegFormatError("pixels_are_ycbcr requires 3 channels")

    px = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 4:
        # Adobe CMYK/YCCK planes pass through untransformed — the
        # caller supplies the (inverted) component values directly
        planes = [px[..., i] for i in range(4)]
    elif channels == 3 and pixels_are_ycbcr:
        planes = [px[..., 0], px[..., 1], px[..., 2]]
    elif channels == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [px[..., 0]]

    if subsampling == "420":
        planes = [
            planes[0],
            planes[1].reshape(height // 2, 2, width // 2, 2).mean(axis=(1, 3)),
            planes[2].reshape(height // 2, 2, width // 2, 2).mean(axis=(1, 3)),
        ]
    elif subsampling == "422":
        planes = [
            planes[0],
            planes[1].reshape(height, width // 2, 2).mean(axis=2),
            planes[2].reshape(height, width // 2, 2).mean(axis=2),
        ]

    qt = np.full((8, 8), float(quant))
    blocks_per_comp = []
    grids = []  # per-component (blocks-wide, blocks-high)
    for plane in planes:
        ph, pw = plane.shape
        cbw, cbh = -(-pw // 8), -(-ph // 8)
        # edge-pad by replication to a whole number of blocks
        p = np.pad(
            plane,
            ((0, cbh * 8 - ph), (0, cbw * 8 - pw)),
            mode="edge",
        )
        blk = (
            p.reshape(cbh, 8, cbw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        S = np.einsum("ux,nxy,vy->nuv", _DCT_M, blk - 128.0, _DCT_M,
                      optimize=True)
        q = np.round(S / qt).astype(np.int64)
        blocks_per_comp.append(q.reshape(-1, 64)[:, _ZIGZAG])
        grids.append((cbw, cbh))
    return blocks_per_comp, grids


def _mcu_schedule(channels, grids, subsampling, width, height):
    """Component/block-index pairs per MCU in scan order (4 luma +
    1 Cb + 1 Cr per 16x16 MCU under 4:2:0; 2 luma + 1 Cb + 1 Cr per
    16x8 MCU under 4:2:2; one block per component otherwise)."""
    if subsampling == "422":
        lbw = grids[0][0]
        cw = grids[1][0]
        return [
            [
                (0, my * lbw + 2 * mx),
                (0, my * lbw + 2 * mx + 1),
                (1, my * cw + mx),
                (2, my * cw + mx),
            ]
            for my in range(height // 8)
            for mx in range(width // 16)
        ]
    if subsampling == "420":
        lbw = grids[0][0]
        cw = grids[1][0]
        return [
            [
                (0, (2 * my) * lbw + 2 * mx),
                (0, (2 * my) * lbw + 2 * mx + 1),
                (0, (2 * my + 1) * lbw + 2 * mx),
                (0, (2 * my + 1) * lbw + 2 * mx + 1),
                (1, my * cw + mx),
                (2, my * cw + mx),
            ]
            for my in range(height // 16)
            for mx in range(width // 16)
        ]
    bw0, bh0 = grids[0]
    return [[(c, m) for c in range(channels)] for m in range(bw0 * bh0)]


def jpeg_encode(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    quant: int = 8,
    restart_interval: int = 0,
    subsampling: str = "444",
    pixels_are_ycbcr: bool = False,
    adobe_transform: int | None = None,
) -> bytes:
    """Encode 8-bit pixels as a baseline JPEG (grayscale, 4:4:4
    YCbCr, or — with ``subsampling="420"`` — 4:2:0 YCbCr with 16x16
    MCUs), standard Annex K Huffman tables, FLAT quantization table
    of value ``quant`` everywhere.

    ``quant=8`` makes per-8x8-block-CONSTANT content decode EXACTLY
    (the DC coefficient of a flat block is 8*(v-128), an exact
    multiple of 8), which is what the gate query's arithmetic oracle
    relies on; smaller/larger values trade fidelity like a normal
    quality knob.  ``restart_interval`` > 0 emits DRI + RSTn markers
    every that-many MCUs (exercises the decoder's restart path).

    ``subsampling="420"`` (channels=3 only) downsamples both chroma
    planes by 2x2 mean and interleaves 4 luma + 1 Cb + 1 Cr block per
    MCU; dimensions must be multiples of 16 (the gate fixtures are —
    generic edge MCUs are out of documented scope).  With
    per-MCU-constant chroma the 2x2 mean is exact, so flat-block
    arithmetic survives the subsample/upsample round trip.
    ``subsampling="422"`` downsamples chroma HORIZONTALLY only (1x2
    mean; 2 luma + 1 Cb + 1 Cr per 16x8 MCU; width % 16 == 0,
    height % 8 == 0) — the digital-camera default that exercises the
    decoder's asymmetric hs=2/vs=1 sampling path.

    ``pixels_are_ycbcr=True`` (channels=3 only) treats the input
    planes as ALREADY YCbCr, skipping the float RGB->YCbCr forward
    matrix — integer Y/Cb/Cr planes then hit the FDCT exactly, which
    is what lets the color gate's oracle predict the decoder's
    rounded RGB output without decoding.
    """
    blocks_per_comp, grids = _quantized_components(
        width, height, pixels, channels, quant, subsampling,
        pixels_are_ycbcr,
    )
    dc_l, ac_l = _HuffTable(*_K_DC_LUMA), _HuffTable(*_K_AC_LUMA)
    dc_c, ac_c = _HuffTable(*_K_DC_CHROMA), _HuffTable(*_K_AC_CHROMA)
    mcu_sched = _mcu_schedule(channels, grids, subsampling, width, height)

    wtr = _BitWriter()
    preds = [0] * channels
    rst = 0
    for m, entries in enumerate(mcu_sched):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0] * channels
        for c, bi in entries:
            preds[c] = _encode_block(
                wtr,
                blocks_per_comp[c][bi],
                preds[c],
                dc_l if (c == 0 or channels == 4) else dc_c,
                ac_l if (c == 0 or channels == 4) else ac_c,
            )
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_inv = np.zeros(64, dtype=np.int64)
    zz_inv[_ZIGZAG] = np.arange(64)
    qt_zz = np.full(64, quant, dtype=np.uint8)  # flat: zigzag == natural
    out = bytearray(b"\xff\xd8")  # SOI
    if channels == 4:
        if adobe_transform not in (0, 2):
            raise JpegFormatError(
                "4-component encode requires adobe_transform 0 (CMYK) "
                "or 2 (YCCK)"
            )
        out += seg(
            0xEE,
            b"Adobe" + struct.pack(">HHH", 100, 0, 0)
            + bytes([adobe_transform]),
        )
    out += seg(0xDB, bytes([0x00]) + qt_zz.tobytes())  # DQT id 0
    if channels == 3:
        out += seg(0xDB, bytes([0x01]) + qt_zz.tobytes())  # DQT id 1
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for c in range(channels):
        samp = (0x22 if subsampling == "420"
                else 0x21 if subsampling == "422" else 0x11) if c == 0 else 0x11
        sof += bytes([c + 1, samp, 0 if (c == 0 or channels == 4) else 1])
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _K_DC_LUMA) + dht(1, 0, _K_AC_LUMA)
    if channels == 3:
        out += dht(0, 1, _K_DC_CHROMA) + dht(1, 1, _K_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for c in range(channels):
        sos += bytes([c + 1, 0x00 if (c == 0 or channels == 4) else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_progressive(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    quant: int = 8,
    restart_interval: int = 0,
    subsampling: str = "444",
    pixels_are_ycbcr: bool = False,
    scans: list | None = None,
    adobe_transform: int | None = None,
) -> bytes:
    """Encode 8-bit pixels as a PROGRESSIVE (SOF2) JPEG over the same
    front half as :func:`jpeg_encode` (identical quantized
    coefficients — a progressive stream of the same image decodes to
    EXACTLY the same pixels as the baseline stream, which is the
    codec suite's cross-path identity check).

    ``scans`` is the scan script, a list of ``(comp_indices, Ss, Se,
    Ah, Al)`` tuples; the default exercises every Annex G scan kind:
    interleaved DC first at Al=1, per-component spectral-selection AC
    first scans (1-5 then 6-63) at Al=2, AC refinement 2->1 and 1->0,
    and a DC refinement.  Constraints (documented scope): DC scans
    cover ALL components, AC scans exactly one; refinement scans must
    step Al down by exactly 1 from a previously-sent band.  AC scans
    use a fixed all-8-bit-code table (``_P_AC_ALL8``) because the
    Annex K baseline tables lack the EOBn symbols progressive coding
    needs.  ``restart_interval`` > 0 emits DRI + RSTn inside every
    scan (units = MCUs for DC scans, blocks for AC scans), resetting
    DC predictors and flushing EOB runs at each boundary.

    Unlike the baseline encoder, 4:2:0 here accepts ANY dimensions
    that are multiples of 8: the image is edge-replicated to whole
    16x16 MCUs for the interleaved DC scan (what real encoders do),
    while the SOF carries the TRUE dimensions and the
    NON-INTERLEAVED AC scans cover only each component's USED block
    grid (ceil(comp_size/8) per T.81 A.2.2) — which is NARROWER
    than the MCU-padded grid whenever a dimension is an odd
    multiple of 8, the exact block-addressing seam most real-web
    progressive 4:2:0 images exercise in the decoder."""
    enc_w, enc_h, enc_px = width, height, pixels
    if subsampling == "420" and channels == 3 and (
        width % 16 or height % 16
    ):
        if width % 8 or height % 8:
            raise JpegFormatError(
                "progressive 4:2:0 requires multiples of 8"
            )
        enc_w, enc_h = -(-width // 16) * 16, -(-height // 16) * 16
        arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
            height, width, channels
        )
        arr = np.pad(
            arr,
            ((0, enc_h - height), (0, enc_w - width), (0, 0)),
            mode="edge",
        )
        enc_px = arr.tobytes()
    blocks_per_comp, grids = _quantized_components(
        enc_w, enc_h, enc_px, channels, quant, subsampling,
        pixels_are_ycbcr,
    )
    # per-component USED block grid from the TRUE dims (what the
    # non-interleaved AC scans iterate) vs the padded grid width
    # (how block indices address blocks_per_comp rows)
    used: list[tuple[int, int, int]] = []  # (ubw, ubh, padded_gw)
    for c in range(channels):
        if subsampling == "420" and c > 0:
            cw, ch = -(-width // 2), -(-height // 2)
        elif subsampling == "422" and c > 0:
            cw, ch = -(-width // 2), height
        else:
            cw, ch = width, height
        used.append((-(-cw // 8), -(-ch // 8), grids[c][0]))
    dc_tabs = [
        _HuffTable(
            *(_K_DC_LUMA if (c == 0 or channels == 4) else _K_DC_CHROMA)
        )
        for c in range(channels)
    ]
    ac_tab = _HuffTable(*_P_AC_ALL8)
    mcu_sched = _mcu_schedule(channels, grids, subsampling, enc_w, enc_h)

    if scans is None:
        all_c = tuple(range(channels))
        scans = [(all_c, 0, 0, 0, 1)]
        for lo, hi in ((1, 5), (6, 63)):
            scans += [((c,), lo, hi, 0, 2) for c in range(channels)]
        scans += [((c,), 1, 63, 2, 1) for c in range(channels)]
        scans += [(all_c, 0, 0, 1, 0)]
        scans += [((c,), 1, 63, 1, 0) for c in range(channels)]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qt_zz = np.full(64, quant, dtype=np.uint8)
    out = bytearray(b"\xff\xd8")
    if channels == 4:
        if adobe_transform not in (0, 2):
            raise JpegFormatError(
                "4-component encode requires adobe_transform 0 (CMYK) "
                "or 2 (YCCK)"
            )
        out += seg(
            0xEE,
            b"Adobe" + struct.pack(">HHH", 100, 0, 0)
            + bytes([adobe_transform]),
        )
    out += seg(0xDB, bytes([0x00]) + qt_zz.tobytes())
    if channels == 3:
        out += seg(0xDB, bytes([0x01]) + qt_zz.tobytes())
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for c in range(channels):
        samp = (0x22 if subsampling == "420"
                else 0x21 if subsampling == "422" else 0x11) if c == 0 else 0x11
        sof += bytes([c + 1, samp, 0 if (c == 0 or channels == 4) else 1])
    out += seg(0xC2, sof)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _K_DC_LUMA)
    if channels == 3:
        out += dht(0, 1, _K_DC_CHROMA)
    out += dht(1, 0, _P_AC_ALL8)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    for comp_idx, ss, se, ah, al in scans:
        if ss == 0:
            if tuple(comp_idx) != tuple(range(channels)):
                raise JpegFormatError(
                    "progressive encoder: DC scans must cover all "
                    "components"
                )
        elif len(comp_idx) != 1:
            raise JpegFormatError(
                "progressive encoder: AC scans take exactly one component"
            )
        sos = bytes([len(comp_idx)])
        for c in comp_idx:
            td = 0 if (c == 0 or channels == 4) else 1
            sos += bytes([c + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        if ss == 0 and ah == 0:
            ent = _encode_dc_first(
                blocks_per_comp, mcu_sched, dc_tabs, al, restart_interval
            )
        elif ss == 0:
            ent = _encode_dc_refine(
                blocks_per_comp, mcu_sched, al, restart_interval
            )
        else:
            c = comp_idx[0]
            ubw, ubh, gw = used[c]
            order = [
                by * gw + bx for by in range(ubh) for bx in range(ubw)
            ]
            enc = _encode_ac_first if ah == 0 else _encode_ac_refine
            ent = enc(
                blocks_per_comp[c], order, ac_tab, ss, se, al,
                restart_interval,
            )
        out += ent
    out += b"\xff\xd9"
    return bytes(out)


def _rst(wtr: _BitWriter, n: int) -> int:
    """Flush the bit buffer and append the next cyclic RSTn marker."""
    wtr.flush()
    wtr.out += bytes([0xFF, 0xD0 + (n & 7)])
    return n + 1


def _encode_dc_first(blocks_per_comp, mcu_sched, dc_tabs, al, ri) -> bytes:
    wtr = _BitWriter()
    preds = [0] * len(blocks_per_comp)
    rst = 0
    for m, entries in enumerate(mcu_sched):
        if ri and m and m % ri == 0:
            rst = _rst(wtr, rst)
            preds = [0] * len(blocks_per_comp)
        for c, bi in entries:
            v = int(blocks_per_comp[c][bi][0]) >> al  # arithmetic shift
            diff = v - preds[c]
            preds[c] = v
            t = 0 if diff == 0 else abs(diff).bit_length()
            code, ln = dc_tabs[c].enc[t]
            wtr.put(code, ln)
            if t:
                wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    wtr.flush()
    return bytes(wtr.out)


def _encode_dc_refine(blocks_per_comp, mcu_sched, al, ri) -> bytes:
    wtr = _BitWriter()
    rst = 0
    for m, entries in enumerate(mcu_sched):
        if ri and m and m % ri == 0:
            rst = _rst(wtr, rst)
        for c, bi in entries:
            wtr.put((int(blocks_per_comp[c][bi][0]) >> al) & 1, 1)
    wtr.flush()
    return bytes(wtr.out)


def _encode_ac_first(blocks, order, ac_tab, ss, se, al, ri) -> bytes:
    wtr = _BitWriter()
    eobrun = 0
    rst = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_tab.enc[r << 4]
            wtr.put(code, ln)
            if r:
                wtr.put(eobrun - (1 << r), r)
            eobrun = 0

    for u, bi in enumerate(order):
        if ri and u and u % ri == 0:
            flush_eob()
            rst = _rst(wtr, rst)
        zz = blocks[bi]
        # AC point transform: sign * (magnitude >> Al)
        tv = {}
        last_nz = ss - 1
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = (abs(v) >> al)
            tv[k] = t if v >= 0 else -t
            if t:
                last_nz = k
        if last_nz < ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for k in range(ss, last_nz + 1):
            v = tv[k]
            if v == 0:
                r += 1
                continue
            while r > 15:
                code, ln = ac_tab.enc[0xF0]
                wtr.put(code, ln)
                r -= 16
            s = abs(v).bit_length()
            code, ln = ac_tab.enc[(r << 4) | s]
            wtr.put(code, ln)
            wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if last_nz < se:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    wtr.flush()
    return bytes(wtr.out)


def _encode_ac_refine(blocks, order, ac_tab, ss, se, al, ri) -> bytes:
    """Figure G.7 correction coding: BE bits ride with the pending
    EOB run, BR bits with the current block's next emitted symbol."""
    wtr = _BitWriter()
    eobrun = 0
    be_bits: list[int] = []
    rst = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_tab.enc[r << 4]
            wtr.put(code, ln)
            if r:
                wtr.put(eobrun - (1 << r), r)
            eobrun = 0
        for b in be_bits:
            wtr.put(b, 1)
        be_bits.clear()

    for u, bi in enumerate(order):
        if ri and u and u % ri == 0:
            flush_eob()
            rst = _rst(wtr, rst)
        zz = blocks[bi]
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob_pos = ss - 1
        for i, t in enumerate(absv):
            if t == 1:
                eob_pos = ss + i
        br_bits: list[int] = []
        r = 0
        for k in range(ss, se + 1):
            t = absv[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob_pos:
                flush_eob()
                code, ln = ac_tab.enc[0xF0]
                wtr.put(code, ln)
                r -= 16
                for b in br_bits:
                    wtr.put(b, 1)
                br_bits = []
            if t > 1:
                br_bits.append(t & 1)
                continue
            flush_eob()
            code, ln = ac_tab.enc[(r << 4) | 1]
            wtr.put(code, ln)
            wtr.put(1 if int(zz[k]) >= 0 else 0, 1)
            for b in br_bits:
                wtr.put(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            be_bits.extend(br_bits)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    wtr.flush()
    return bytes(wtr.out)


def jpeg_dimensions(data: bytes) -> tuple[int, int, int]:
    """Parse ``(width, height, components)`` from the SOF0/SOF1/SOF2
    frame header WITHOUT touching the entropy-coded data — the
    metadata probe a routing/manifest stage runs on millions of
    images where a full decode would be absurd (same marker-walk
    discipline as jpeg_decode: 0xFF fill bytes skipped, standalone
    markers passed over, unsupported SOF variants and malformed
    framing raise typed JpegFormatError for quarantine).

    The third element is the FRAME component count exactly as the
    SOF header declares it — 4 for Adobe CMYK/YCCK — NOT the channel
    count of a decoded pixel buffer: ``jpeg_decode`` converts
    4-component Adobe frames to display RGB and returns 3 channels
    for the same file (ADVICE r12).  Consumers sizing buffers as
    ``w*h*channels`` for a subsequent decode must use the decode's
    own channel value, not this probe's."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at byte {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise JpegFormatError("truncated marker segment")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise JpegFormatError(f"truncated 0xFF{marker:02X} segment")
        if marker in _UNSUPPORTED_SOF:
            raise JpegFormatError(
                f"{_UNSUPPORTED_SOF[marker]} not supported; quarantine"
            )
        if marker in (0xC0, 0xC1, 0xC2):
            if len(seg) < 6:
                raise JpegFormatError("truncated SOF header")
            h, w = struct.unpack(">HH", seg[1:5])
            return w, h, seg[5]
        pos += seglen
    raise JpegFormatError("no SOF frame header before scan/EOI")
