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


def test_main_content_block_rules():
    """html_main_content's three boilerplate rules, each in
    isolation: chrome containers, majority-linked blocks, short
    linked fragments — and prose with a MINORITY inline link must
    survive as main content with the link word kept."""
    from parquet_to_sql_spark.operators.html import html_main_content

    out = html_main_content(
        "<html><head><title>T</title></head><body>"
        "<header>Site Header</header>"
        '<nav><a href="/a">one</a> <a href="/b">two</a></nav>'
        '<p>alpha beta gamma <a href="/m">more</a></p>'
        '<div><a href="/r">rel</a> <a href="/s">sel</a> x</div>'
        '<p><a href="/go">Go</a> now</p>'
        "<footer>c 2020 <a href=/t>terms</a></footer>"
        "</body></html>"
    )
    assert out["title"] == "T"
    assert out["main_text"] == "alpha beta gamma more"
    assert out["main_words"] == 4
    assert out["n_blocks"] == 6
    assert out["n_main_blocks"] == 1
    assert out["n_chrome_blocks"] == 3  # header, nav, footer
    assert out["n_link_boiler_blocks"] == 2  # rel-row + "Go now"
    assert out["boiler_words"] == 2 + 2 + 3 + 2 + 3


def test_main_content_density_boundary_and_nesting():
    """2*linked == words is NOT majority-linked (stays main); text
    nested inside chrome via inner block tags is still chrome; body
    text outside any block flushes as its own block; scripts never
    leak."""
    from parquet_to_sql_spark.operators.html import html_main_content

    # exactly half linked: 2*2 > 4 is false -> main
    out = html_main_content('<p><a href=x>a b</a> c d</p>')
    assert out["n_main_blocks"] == 1 and out["main_words"] == 4

    out = html_main_content(
        "<nav><ul><li>x1</li><li>x2</li></ul></nav><p>keep this prose</p>"
    )
    assert out["main_text"] == "keep this prose"
    assert out["n_chrome_blocks"] == 2  # each li flushed under nav

    out = html_main_content(
        "<body>stray words here<p>real paragraph text</p>"
        "<script>var x='leak leak';</script></body>"
    )
    assert out["main_text"] == "stray words here real paragraph text"
    assert out["n_blocks"] == 2

    # bytes contract mirrors html_extract
    import pytest
    from parquet_to_sql_spark.operators.html import HtmlFormatError

    with pytest.raises(HtmlFormatError, match="not UTF-8"):
        html_main_content(b"\xff\xfe<nope>")


def test_robots_meta_grammar_and_union():
    """<meta name=robots>: case-insensitive names/tokens, the 'none'
    shorthand, whitespace tolerance, multi-tag restrictive union,
    and non-robots meta tags ignored."""
    from parquet_to_sql_spark.operators.html import html_robots_meta

    assert html_robots_meta("<meta name=ROBOTS content='NoIndex'>") == {
        "noindex": True, "nofollow": False,
    }
    assert html_robots_meta('<meta name="robots" content=" none ">') == {
        "noindex": True, "nofollow": True,
    }
    assert html_robots_meta(
        '<meta name="robots" content="nofollow">'
        '<meta name="robots" content="noindex">'
    ) == {"noindex": True, "nofollow": True}
    assert html_robots_meta(
        '<meta name="description" content="noindex">'
        '<meta charset="utf-8"><p>x</p>'
    ) == {"noindex": False, "nofollow": False}
    # self-closing spelling and unrelated directives
    assert html_robots_meta(
        '<meta name="robots" content="max-snippet:50, NOFOLLOW"/>'
    ) == {"noindex": False, "nofollow": True}
