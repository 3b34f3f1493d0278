"""HTML extractor (operators/html.py): skip-span exclusion, entity
decode, link order, nesting, tolerance to broken markup, and the
UTF-8 quarantine."""

from __future__ import annotations

import pytest

from parquet_to_sql_spark.operators.html import HtmlFormatError, html_extract


def test_script_style_noscript_never_leak():
    html = (
        "<body><p>keep1</p><script>leak()</script><style>.x{}</style>"
        "<noscript>leak</noscript><template>leak</template><p>keep2</p>"
        "<script><style>nested</style>still in script</script>ok</body>"
    )
    out = html_extract(html)
    assert out["text"] == "keep1 keep2 ok"


def test_entities_and_whitespace_canon():
    out = html_extract("<p>  a &amp;  b </p>\n\n<p>c&lt;d</p>")
    assert out["text"] == "a & b c<d"


def test_links_preserve_order_incl_self_closing():
    out = html_extract(
        '<a href="/1">x</a><a name="no-href">y</a><a href="/2"/>'
        '<img src="i.png"/><a href="/3">z</a>'
    )
    assert out["links"] == ["/1", "/2", "/3"]
    assert out["text"] == "x y z"


def test_title_separate_from_text():
    out = html_extract("<title> T  1 </title><p>body</p>")
    assert out["title"] == "T 1"
    assert out["text"] == "body"


def test_broken_markup_is_tolerated_not_fatal():
    # unclosed tags, stray brackets, bogus nesting — crawl reality
    out = html_extract("<p>a <b>bold <p>next</i> < notatag & done")
    assert "a" in out["text"] and "next" in out["text"]


def test_non_utf8_quarantines():
    with pytest.raises(HtmlFormatError, match="not UTF-8"):
        html_extract(b"\xff\xfe\x00broken")
