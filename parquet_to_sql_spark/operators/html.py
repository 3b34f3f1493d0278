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


# Tags that delimit text BLOCKS for main-content scoring (block-level
# per the HTML living standard's default rendering, plus the
# sectioning/navigation elements) and the site-chrome containers
# whose contents are boilerplate by construction.
_BLOCK_TAGS = {
    "p", "div", "li", "ul", "ol", "dl", "dt", "dd", "table", "tr",
    "td", "th", "section", "article", "main", "blockquote", "pre",
    "h1", "h2", "h3", "h4", "h5", "h6", "nav", "header", "footer",
    "aside", "body", "form",
}
_CHROME_TAGS = {"nav", "header", "footer", "aside"}


class _BlockParser(HTMLParser):
    """Segments visible text into blocks at block-level tag
    boundaries, tracking per block: words, how many of them sit
    inside <a>, and whether any text arrived under an open
    nav/header/footer/aside."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[list[str], int, bool]] = []
        self.title_parts: list[str] = []
        self._words: list[str] = []
        self._linked = 0
        self._chrome_hit = False
        self._skip_depth = 0
        self._chrome_depth = 0
        self._a_depth = 0
        self._in_title = False

    def _flush(self) -> None:
        if self._words:
            self.blocks.append((self._words, self._linked, self._chrome_hit))
        self._words = []
        self._linked = 0
        self._chrome_hit = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _CHROME_TAGS:
            self._chrome_depth += 1
        if tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if tag == "title":
            self._in_title = False
            return
        if tag in _BLOCK_TAGS:
            self._flush()  # flush BEFORE leaving a chrome container
        if tag in _CHROME_TAGS and self._chrome_depth:
            self._chrome_depth -= 1
        if tag == "a" and self._a_depth:
            self._a_depth -= 1

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        toks = data.split()
        if not toks:
            return
        self._words.extend(toks)
        if self._a_depth:
            self._linked += len(toks)
        if self._chrome_depth:
            self._chrome_hit = True


def html_main_content(payload: bytes | str) -> dict:
    """Main-content extraction — what production LLM pipelines run
    instead of all-visible-text: segment the page into text blocks
    at block-level boundaries and drop boilerplate by
    text-density/link-density scoring (the trafilatura/boilerpipe
    family's core heuristic, here as three DETERMINISTIC rules so a
    gate query can pin the output arithmetically):

    1. ``chrome`` — any text that arrived inside an open
       nav/header/footer/aside is site chrome;
    2. ``linky`` — a block whose linked words are the majority
       (2 * linked > words) is navigation-shaped (related-posts
       rows, tag clouds, pagination);
    3. ``shortlink`` — a block under 3 words containing a link is a
       call-to-action fragment ("Subscribe now"), not prose.

    Everything else is main content.  Returns ``{"title",
    "main_text" (kept blocks joined by one space, each block's words
    joined by one space), "main_words", "boiler_words", "n_blocks",
    "n_main_blocks", "n_chrome_blocks", "n_link_boiler_blocks"}``.
    Same tolerance contract as :func:`html_extract`: malformed HTML
    never raises; non-UTF-8 bytes raise :class:`HtmlFormatError`."""
    if isinstance(payload, bytes):
        try:
            payload = payload.decode("utf-8", "strict")
        except UnicodeDecodeError as exc:
            raise HtmlFormatError(f"payload is not UTF-8: {exc}")
    p = _BlockParser()
    p.feed(payload)
    p.close()
    p._flush()
    main_parts: list[str] = []
    main_words = boiler_words = 0
    n_chrome = n_link_boiler = 0
    for words, linked, chrome in p.blocks:
        if chrome:
            n_chrome += 1
            boiler_words += len(words)
        elif 2 * linked > len(words) or (len(words) < 3 and linked):
            n_link_boiler += 1
            boiler_words += len(words)
        else:
            main_parts.append(" ".join(words))
            main_words += len(words)
    return {
        "title": " ".join("".join(p.title_parts).split()),
        "main_text": " ".join(main_parts),
        "main_words": main_words,
        "boiler_words": boiler_words,
        "n_blocks": len(p.blocks),
        "n_main_blocks": len(p.blocks) - n_chrome - n_link_boiler,
        "n_chrome_blocks": n_chrome,
        "n_link_boiler_blocks": n_link_boiler,
    }


class _RobotsMetaParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.contents: list[str] = []

    def _collect(self, tag, attrs):
        if tag != "meta":
            return
        d = {k.lower(): (v or "") for k, v in attrs}
        if d.get("name", "").strip().lower() == "robots":
            self.contents.append(d.get("content", ""))

    handle_starttag = _collect
    handle_startendtag = _collect


def html_robots_meta(payload: bytes | str) -> dict:
    """Parse ``<meta name=robots content=...>`` directives (the
    in-document half of the robots exclusion protocol's indexing
    rules; the HTTP half is the X-Robots-Tag header) ->
    ``{"noindex": bool, "nofollow": bool}``.  Directive tokens are
    comma-separated, ASCII-case-insensitive, whitespace-tolerant;
    ``none`` means both; MULTIPLE robots meta tags union
    restrictively (the most restrictive combination wins, the
    documented cross-source rule).  Tolerant of malformed HTML like
    the extractors beside it; non-UTF-8 bytes raise
    :class:`HtmlFormatError`."""
    if isinstance(payload, bytes):
        try:
            payload = payload.decode("utf-8", "strict")
        except UnicodeDecodeError as exc:
            raise HtmlFormatError(f"payload is not UTF-8: {exc}")
    p = _RobotsMetaParser()
    p.feed(payload)
    p.close()
    noindex = nofollow = False
    for content in p.contents:
        toks = {t.strip().lower() for t in content.split(",")}
        noindex |= bool(toks & {"noindex", "none"})
        nofollow |= bool(toks & {"nofollow", "none"})
    return {"noindex": noindex, "nofollow": nofollow}


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
