"""Differential tests: FastSegmenter vs the stdlib-HTMLParser reference
segmenter must produce identical extraction results on the entire
fixture corpus and on seeded generated pages; on arbitrary garbage both
must not crash."""

from __future__ import annotations

import dataclasses
import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.fixtures import build_page, gen_pages_table  # noqa: E402
from cvocr_spark.kernel import DEFAULT_CONFIG, extract  # noqa: E402

FAST = dataclasses.replace(DEFAULT_CONFIG, fast_parse=True)
SLOW = dataclasses.replace(DEFAULT_CONFIG, fast_parse=False)


def _same(html: bytes) -> None:
    a, b = extract(html, FAST), extract(html, SLOW)
    assert a.text == b.text
    assert a.spans == b.spans
    assert a.score == b.score
    assert [(x.block_id, x.tag, x.text, x.cls) for x in a.blocks] == [
        (x.block_id, x.tag, x.text, x.cls) for x in b.blocks
    ]


def test_fast_equals_reference_on_fixture_corpus():
    for sf in ("0.001", "0.01"):
        pages = gen_pages_table(f"/root/testdata/sf{sf}/documents.parquet")
        for i in range(pages.num_rows):
            _same(pages.column("html")[i].as_py())


def test_fast_handles_edge_markup():
    cases = [
        b"<script>if (a<b) { x='</div>'; }</script><p>real content that is long enough</p>",
        b"<style>p:before{content:'<'}</style><p>real content that is long enough here</p>",
        b"<title>skip me</title><p>real content that is long enough to pass the rule</p>",
        b"<textarea><p>not content</p></textarea><p>real content long enough to pass ok</p>",
        b"<!-- <p>commented out</p> --><p>real content that is long enough to pass it</p>",
        b"<![CDATA[<p>cdata</p>]]><p>real content that is long enough to pass the bar</p>",
        b"<p>unterminated <script>var x = 1;",
        b"<P>UPPERCASE TAGS WITH text that is long enough to be actual page content</P>",
        b"<p/><p>self closing then real content that is long enough to pass the rule</p>",
        b"<div hidden><p>invisible</p></div><p>real content long enough to pass the bar</p>",
        b'<div style="display:none"><p>gone</p></div><p>real content long enough to pass</p>',
        b"<p>entity test &amp; &lt;tag&gt; &#65; &nbsp; plus words to reach threshold ok</p>",
        # ADVICE r1 (high): non-ASCII whose str.lower() changes length
        # (U+0130 'İ' lowers to 2 chars) before a rawtext element — a
        # lowercased shadow string desynchronizes close-tag offsets and
        # silently drops the following paragraph
        ("İ" * 30 + "<script>var x=1;</script>"
         "<p>paragraph after the dotted capital I that must survive fully</p>").encode("utf-8"),
        ("<p>mixed İstanbul text long enough to be kept as actual content here</p>"
         "<style>a{}</style><p>second paragraph also long enough to be kept ok</p>").encode("utf-8"),
        # ADVICE r1 (low): '</scripts>' must NOT close '</script' (html.parser
        # requires the exact name; prefix-matching leaks script source)
        b"<script>var a=1; </scripts> var b=2;</script><p>content after script long enough</p>",
        b"<script>x</script foo='bar'> leaked? no</script><p>trailing real content here ok</p>",
        b"<SCRIPT>y</ScRiPt><p>case-insensitive close with real content long enough here</p>",
        b"<script>z</script ><p>whitespace before gt with real content long enough here</p>",
        # ADVICE r4 (low): a quote ENTITY inside a class value must not
        # change attribute tokenization (parse first, decode values
        # after — HTMLParser order); and an entity-encoded boiler token
        # must still be recognized after per-value decode
        b'<div class="x&quot;newsletter">subscribe now to our letter</div>'
        b"<p>real content that is long enough to pass the keep rule today ok</p>",
        b'<div class="news&#108;etter">subscribe now to our daily letter</div>'
        b"<p>real content that is long enough to pass the keep rule today ok</p>",
        b'<div class="x" &quot;newsletter&quot;><p>attr soup with real content long enough</p></div>',
    ]
    for c in cases:
        _same(c)


def test_rawtext_close_is_exact_name():
    """'</scripts>' stays inside the script; the real '</script>' closes
    it — the paragraph after must be extracted, the script source not."""
    html = (
        b"<script>var a='</scripts>'; run();</script>"
        b"<p>the only real paragraph of content on this page long enough to keep</p>"
    )
    r = extract(html, FAST)
    assert "run()" not in r.text and "scripts" not in r.text
    assert "only real paragraph" in r.text


def test_nonascii_lower_desync_does_not_drop_content():
    html = ("İ" * 30 + "<script>s()</script><p>" + "kept content words " * 5 + "</p>").encode()
    r = extract(html, FAST)
    assert "kept content words" in r.text
    assert "s()" not in r.text


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.text(alphabet="abcdefghij", min_size=1, max_size=8), min_size=3, max_size=80),
    st.integers(min_value=0, max_value=5000),
)
def test_fast_equals_reference_on_generated_pages(words, doc_id):
    text = " ".join(words)
    _same(build_page(doc_id, text, "en", f"src{doc_id % 9}")[2])


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2048))
def test_fast_never_crashes_on_garbage(raw):
    r = extract(raw, FAST)
    assert isinstance(r.text, str)
    for (_b, s, e, _c) in r.spans:
        assert 0 <= s <= e <= len(r.text)


def test_boiler_class_attr_forms_match_reference():
    """The r4 class-keyword boiler context must make the SAME decision
    in both segmenters for every attribute spelling HTML allows:
    quoting styles, case, multi-token classes, id vs class, entity
    refs in the value (HTMLParser decodes them; the scanner must too),
    keywords appearing in NON-class attrs (must NOT trigger), and
    tokens that merely contain a keyword as a substring (must NOT
    match)."""
    body = b"<p>real content that is long enough to classify as content ok</p>"
    chrome = b"inline promo text between paragraphs long enough to matter here"
    cases = [
        b'<div class="newsletter">%s</div>' % chrome,
        b"<div class='newsletter'>%s</div>" % chrome,
        b"<div class=newsletter>%s</div>" % chrome,
        b'<div CLASS="NEWSLETTER">%s</div>' % chrome,
        b'<div class="box newsletter wide">%s</div>' % chrome,
        b'<div id="newsletter-signup">%s</div>' % chrome,
        b'<div class="news&#108;etter">%s</div>' % chrome,  # entity in value
        b'<div data-x="newsletter">%s</div>' % chrome,  # non-class attr: no trigger
        b'<a href="/newsletter">link</a><div>%s</div>' % chrome,  # href: no trigger
        b'<div class="newsletters">%s</div>' % chrome,  # substring token: no match
        b'<div class="shadow">%s</div>' % chrome,  # 'ad' inside a word: no match
        b'<div class="cta">%s</div>' % chrome,
        b'<nav class="newsletter">%s</nav>' % chrome,  # tag AND class boiler: single count
        b'<div class="promo"><script>x</script>%s</div>' % chrome,  # skip inside boiler
    ]
    for c in cases:
        _same(b"<html><body>" + body + c + body + b"</body></html>")
