"""Hand-written realistic pages with hand-verified expected extraction —
the generator-independent credibility check (the synthetic-corpus
roundtrip can't catch a kernel that is only good at the generator's
shapes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.kernel import extract  # noqa: E402

NEWS_PAGE = b"""<!DOCTYPE html>
<html><head><title>City council approves budget - Example Times</title>
<meta charset="utf-8"><script src="/t.js"></script>
<style>.c{color:red}</style></head>
<body>
<header>
  <div class="logo"><a href="/">Example Times</a></div>
  <nav><ul><li><a href="/politics">Politics</a></li><li><a href="/sports">Sports</a></li>
  <li><a href="/weather">Weather</a></li><li><a href="/login">Log in</a></li></ul></nav>
</header>
<main>
<article>
<h1>City council approves next year's budget after marathon session</h1>
<p>The city council voted 7-2 on Tuesday night to approve a budget that
increases funding for road maintenance while trimming administrative costs
across most departments.</p>
<div class="ad"><a href="/promo">BUY NOW limited offer click here today</a></div>
<p>Council members debated for nearly six hours before reaching an agreement,
with the final compromise restoring funding for the public library system
that an earlier draft had cut.</p>
<p>The budget takes effect at the start of the next fiscal year.</p>
</article>
</main>
<aside><h3>Most read</h3><ul><li><a href="/a1">Storm closes schools</a></li>
<li><a href="/a2">New stadium plan</a></li></ul></aside>
<footer><p>copyright 2025 example times</p>
<ul><li><a href="/terms">terms</a></li><li><a href="/privacy">privacy</a></li></ul></footer>
</body></html>"""

NEWS_EXPECTED = [
    "City council approves next year's budget after marathon session",
    "The city council voted 7-2 on Tuesday night to approve a budget that "
    "increases funding for road maintenance while trimming administrative "
    "costs across most departments.",
    "Council members debated for nearly six hours before reaching an "
    "agreement, with the final compromise restoring funding for the public "
    "library system that an earlier draft had cut.",
    "The budget takes effect at the start of the next fiscal year.",
]


def test_news_page_extraction():
    r = extract(NEWS_PAGE)
    got = r.text.split("\n")
    # every expected content line present, in order, nothing from chrome
    assert got == NEWS_EXPECTED or " ".join(got) == " ".join(NEWS_EXPECTED), got
    for banned in ("Politics", "BUY NOW", "Most read", "copyright", "Log in"):
        assert banned not in r.text


BLOG_PAGE = b"""<html><head><meta charset="utf-8"><title>b</title></head><body>
<div id="nav"><a href="/">home</a> | <a href="/about">about</a> | <a href="/rss">rss</a></div>
<div id="post">
<h2>Why we rewrote our ingestion pipeline</h2>
<p>Last spring our nightly batch started missing its deadline, and every fix
we tried bought us a week at most before the backlog returned.</p>
<p>We eventually concluded the problem was architectural: a single machine
simply cannot parse forty terabytes of markup in a night, no matter how
clever the parser.</p>
<ul>
<li>Partition the corpus by url hash so no host can hot-spot a worker.</li>
<li>Keep every per-document step inside one vectorized stage boundary.</li>
<li>Write per-partition manifests so a failed run resumes exactly.</li>
</ul>
<p>Six months later the same job finishes before midnight.</p>
</div>
<div id="comments"><a href="/c1">12 comments</a> <a href="/reply">reply</a></div>
</body></html>"""


def test_blog_page_with_list_items():
    r = extract(BLOG_PAGE)
    assert "Why we rewrote our ingestion pipeline" in r.text
    assert "forty terabytes" in r.text
    assert "Partition the corpus by url hash" in r.text
    assert "Keep every per-document step" in r.text
    assert "finishes before midnight" in r.text
    assert "12 comments" not in r.text
    assert "home" not in r.text.split()


TABLE_PAGE = b"""<html><body>
<table><tr><th>quarter</th><th>revenue</th></tr>
<tr><td>Q1</td><td>1.2M</td></tr><tr><td>Q2</td><td>1.4M</td></tr></table>
<p>Revenue grew steadily across the first half of the year, driven mostly by
the subscription business and a one-time licensing deal signed in March.</p>
</body></html>"""


def test_table_page_keeps_prose_drops_cells():
    r = extract(TABLE_PAGE)
    assert "Revenue grew steadily" in r.text
    # tiny isolated cells (Q1/Q2/1.2M) are below any content rule
    assert "Q1" not in r.text
