"""MPEG audio (MP3) frame-header probe (pure stdlib).

The audio twin of the image routing probes (round 13): a crawl's
audio lane needs stream parameters — sample rate, bitrate, channel
mode, frame count, duration — WITHOUT an audio decode, exactly like
``jpeg_dimensions`` for images.  This walks ISO/IEC 11172-3 /
13818-3 Layer III frame headers: the 11-bit sync word, version
(MPEG1/2/2.5), the per-version bitrate and sample-rate tables, the
padding bit, and the Layer III frame-length arithmetic
(144 * bitrate / rate for MPEG1; 72 * bitrate / rate for the
half-rate versions).  A leading ID3v2 tag (synchsafe length) is
skipped; ID3v1 trailers are tolerated.  Free-format (bitrate index
0), Layer I/II, and reserved fields raise typed ``Mp3FormatError``
for quarantine — routed, never guessed.

The builder writes deterministic zero-payload frame sequences for
probe fixtures (headers are real; audio payload is silence bytes —
the probe never reads payload).  Reference parity note: the
reference repo has no media handling (SURVEY.md §2.C)."""

from __future__ import annotations


class Mp3FormatError(ValueError):
    """Raised for malformed/unsupported MPEG audio streams; the
    message names the reason for quarantine grouping."""


# bitrate kbps tables for Layer III, index 1..14 (0 = free, 15 = bad)
_BITRATE_V1 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_BITRATE_V2 = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
# sample rates by version key: 3=MPEG1, 2=MPEG2, 0=MPEG2.5
_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = 0
    for b in data[6:10]:
        if b & 0x80:
            raise Mp3FormatError("ID3v2 size bytes not synchsafe")
        size = (size << 7) | b
    return 10 + size


def mp3_probe(data: bytes) -> dict:
    """Walk every Layer III frame -> {"n_frames", "sample_rate",
    "channels", "bitrate_kbps" (first frame), "vbr" (any frame's
    bitrate differs), "duration_ms" (exact integer floor),
    "version" ("1"/"2"/"2.5")}."""
    pos = _skip_id3v2(data)
    n = len(data)
    n_frames = 0
    rate = channels = first_kbps = version_key = None
    vbr = False
    total_samples = 0
    while pos < n:
        if n - pos < 4:
            if data[pos:] == b"" or n - pos < 4 and data[pos:pos + 3] == b"TAG":
                break
            raise Mp3FormatError("trailing bytes too short for a frame")
        if data[pos : pos + 3] == b"TAG" and n - pos == 128:
            break  # ID3v1 trailer
        h = int.from_bytes(data[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            raise Mp3FormatError(f"lost frame sync at byte {pos}")
        ver = (h >> 19) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (h >> 17) & 0x3
        if ver == 1:
            raise Mp3FormatError("reserved MPEG version")
        if layer != 1:  # 1 = Layer III
            raise Mp3FormatError(
                "only Layer III supported (Layer I/II quarantine)"
            )
        bidx = (h >> 12) & 0xF
        ridx = (h >> 10) & 0x3
        pad = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if bidx == 0:
            raise Mp3FormatError("free-format bitrate; quarantine")
        if bidx == 15 or ridx == 3:
            raise Mp3FormatError("reserved bitrate/sample-rate index")
        table = _BITRATE_V1 if ver == 3 else _BITRATE_V2
        kbps = table[bidx]
        this_rate = _RATES[ver][ridx]
        this_ch = 1 if mode == 3 else 2
        if rate is None:
            rate, channels, first_kbps, version_key = (
                this_rate, this_ch, kbps, ver
            )
        elif this_rate != rate or this_ch != channels:
            raise Mp3FormatError("sample rate/mode changes mid-stream")
        if kbps != first_kbps:
            vbr = True
        spf = 1152 if ver == 3 else 576
        frame_len = (spf // 8) * kbps * 1000 // this_rate + pad
        if pos + frame_len > n:
            raise Mp3FormatError("truncated final frame")
        n_frames += 1
        total_samples += spf
        pos += frame_len
    if n_frames == 0:
        raise Mp3FormatError("no MPEG audio frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "bitrate_kbps": first_kbps,
        "vbr": vbr,
        "duration_ms": total_samples * 1000 // rate,
        "version": {3: "1", 2: "2", 0: "2.5"}[version_key],
    }


def mp3_build(
    n_frames: int,
    version: int = 3,
    bitrate_index: int = 9,
    rate_index: int = 0,
    mono: bool = False,
    pad_pattern=None,
    id3v2_bytes: int = 0,
) -> bytes:
    """Deterministic Layer III frame sequence with real headers and
    zero payloads; ``pad_pattern(i)`` -> 0/1 sets each frame's
    padding bit (default: off).  ``id3v2_bytes`` prepends a dummy
    ID3v2 tag of that payload size."""
    if version not in (3, 2, 0):
        raise Mp3FormatError("version key must be 3, 2 or 0")
    if not 1 <= bitrate_index <= 14 or not 0 <= rate_index <= 2:
        raise Mp3FormatError("bitrate/rate index out of range")
    out = bytearray()
    if id3v2_bytes:
        out += b"ID3\x04\x00\x00" + bytes(
            (id3v2_bytes >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out += b"\x00" * id3v2_bytes
    table = _BITRATE_V1 if version == 3 else _BITRATE_V2
    kbps = table[bitrate_index]
    rate = _RATES[version][rate_index]
    spf = 1152 if version == 3 else 576
    for i in range(n_frames):
        pad = pad_pattern(i) if pad_pattern else 0
        h = (
            (0x7FF << 21) | (version << 19) | (1 << 17)  # Layer III
            | (1 << 16)  # no CRC
            | (bitrate_index << 12) | (rate_index << 10) | (pad << 9)
            | ((3 if mono else 0) << 6)
        )
        frame_len = (spf // 8) * kbps * 1000 // rate + pad
        out += h.to_bytes(4, "big") + b"\x00" * (frame_len - 4)
    return bytes(out)
