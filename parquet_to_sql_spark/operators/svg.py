"""SVG dimensions probe (pure stdlib, round 13).

SVG is the one major web image format that is TEXT — a routing/
manifest stage wants its intrinsic size without an XML library or a
render pass.  This probes the ROOT ``<svg>`` start tag (skipping
the XML declaration, comments, DOCTYPE and processing
instructions): integer-pixel ``width``/``height`` attributes
(bare numbers or a ``px`` suffix per the CSS pixel default), with
the ``viewBox`` width/height as the fallback when either attribute
is missing or relative (``%``/``em``/``auto`` — a document with no
absolute intrinsic size).  Anything without a root svg tag or any
resolvable size raises typed ``SvgFormatError`` for quarantine.

Reference parity note: the reference repo has no media handling
(SURVEY.md §2.C)."""

from __future__ import annotations

import re


class SvgFormatError(ValueError):
    """Raised for non-SVG payloads and SVGs with no resolvable
    intrinsic size; the message names the reason."""


_ROOT = re.compile(rb"<svg\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_SKIP = re.compile(
    rb"\A(?:\s+|<\?.*?\?>|<!--.*?-->|<!DOCTYPE[^>]*>)*", re.DOTALL
)
_PX = re.compile(rb"\A\s*(\d+)\s*(?:px)?\s*\Z", re.IGNORECASE)


def _attr(attrs: bytes, name: bytes) -> bytes | None:
    m = re.search(
        name + rb'\s*=\s*(?:"([^"]*)"|\'([^\']*)\')',
        attrs, re.IGNORECASE,
    )
    if not m:
        return None
    return m.group(1) if m.group(1) is not None else m.group(2)


def svg_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) in CSS pixels from the root svg tag, falling
    back to the viewBox for missing/relative attributes."""
    head = data[:4096]
    prolog = _SKIP.match(head)
    m = _ROOT.search(head, prolog.end() if prolog else 0)
    if not m:
        raise SvgFormatError("no root <svg> tag found")
    attrs = m.group(1)
    vb = None
    vb_raw = _attr(attrs, rb"viewBox")
    if vb_raw is not None:
        parts = re.split(rb"[\s,]+", vb_raw.strip())
        if len(parts) == 4:
            try:
                vb = (int(float(parts[2])), int(float(parts[3])))
            except ValueError:
                raise SvgFormatError(f"bad viewBox {vb_raw!r}")

    def side(name: bytes) -> int | None:
        raw = _attr(attrs, name)
        if raw is None:
            return None
        px = _PX.match(raw)
        if px:
            return int(px.group(1))
        return None  # relative/other units: defer to viewBox

    w, h = side(rb"width"), side(rb"height")
    if w is None or h is None:
        if vb is None:
            raise SvgFormatError(
                "no absolute width/height and no viewBox — no "
                "intrinsic size; quarantine"
            )
        w = vb[0] if w is None else w
        h = vb[1] if h is None else h
    if w <= 0 or h <= 0:
        raise SvgFormatError("non-positive SVG dimensions")
    return w, h
