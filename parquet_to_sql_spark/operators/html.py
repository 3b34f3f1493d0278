"""Pure-stdlib HTML text extraction (the WARC -> documents step).

A crawl pipeline's raw payloads are HTML; the `documents` table is
what's left AFTER visible-text extraction.  This module implements
that step with the stdlib ``html.parser`` (tolerant, spec-shaped,
zero dependencies — the same footprint contract as the PNG/JPEG/WARC
codecs): visible text nodes (script/style/noscript/template contents
excluded), the <title>, and outgoing <a href> links.

Determinism contract (what the gate query's oracle pins): text =
every visible text node, entity-decoded by the parser, each node
whitespace-stripped, empties dropped, nodes joined by ONE space —
a canonical normalization any two engines can agree on, robust to
how markup happens to split the nodes.

Malformed HTML never raises (html.parser is tolerant by design —
real crawl HTML is broken HTML); only non-UTF-8 byte payloads raise
:class:`HtmlFormatError` for the quarantine bucket.

Reference parity note: the reference repo has no crawl handling;
this is mandated LLM-pipeline extension surface (SURVEY.md §2.C).
"""

from __future__ import annotations

from html.parser import HTMLParser


class HtmlFormatError(ValueError):
    """Raised for undecodable (non-UTF-8) payloads; message names the
    reason for quarantine-bucket grouping."""


# Only these tags open a skip span; void elements (br, img, ...) need
# no special casing here because none of them are skip-content tags —
# a void start tag can never open a span this extractor would need to
# close (ADVICE r10: an unused _VOID set implied otherwise).
_SKIP_CONTENT = {"script", "style", "noscript", "template"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.links: list[str] = []
        self.title_parts: list[str] = []
        self.n_tags = 0
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        self.n_tags += 1
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)

    def handle_startendtag(self, tag, attrs):
        # self-closing spelling: count the tag, never open a skip span
        self.n_tags += 1
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        s = data.strip()
        if s:
            self.parts.append(" ".join(s.split()))


def html_extract(payload: bytes | str) -> dict:
    """Extract ``{"title", "text", "links", "n_tags"}`` from an HTML
    payload.  ``text`` is the canonical visible-text normalization
    documented in the module header; ``links`` preserves document
    order (dedup is the caller's policy, e.g. the URL frontier's)."""
    if isinstance(payload, bytes):
        try:
            payload = payload.decode("utf-8", "strict")
        except UnicodeDecodeError as exc:
            raise HtmlFormatError(f"payload is not UTF-8: {exc}")
    p = _Extractor()
    p.feed(payload)
    p.close()
    return {
        "title": " ".join("".join(p.title_parts).split()),
        "text": " ".join(p.parts),
        "links": p.links,
        "n_tags": p.n_tags,
    }
