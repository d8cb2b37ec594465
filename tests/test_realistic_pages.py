"""Hand-written realistic pages with hand-verified expected extraction —
the generator-independent credibility check (VERDICT r1 item 4: the
synthetic-corpus roundtrip can't catch a kernel that is only good at
the generator's shapes).

24 pages covering shapes the fixture generator never emits: comment
threads, infoboxes/tables mixing prose and cells, cookie-consent
interstitials, paginated article stubs, non-English pages (de/fr/zh),
forum listings, recipes, code-heavy docs, marketing landers, search
results, error pages, e-commerce, plain text.

Metrics (char-weighted, reported per page and aggregate; definitions
documented in BENCH/BASELINE.md):
  * recall    = matched keep-chars / total keep-chars — `keep` lists
    the page's true content lines in kernel-normalized form.
  * precision = 1 - violating drop-chars / extracted chars — `drop`
    lists boilerplate strings that must not be extracted.
The aggregate floors are asserted; per-page numbers are written to
tests/goldens/realistic_metrics.json for the bench record.
"""

from __future__ import annotations

import json
import os
import sys
from dataclasses import dataclass, field

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.kernel import extract  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


@dataclass
class Page:
    name: str
    html: bytes
    keep: list = field(default_factory=list)   # normalized content substrings
    drop: list = field(default_factory=list)   # boiler substrings that must not leak


PAGES: list[Page] = []


def _page(name, html, keep, drop):
    PAGES.append(Page(name, html if isinstance(html, bytes) else html.encode(), keep, drop))


_CHROME_TOP = """<header><div class="logo"><a href="/">Example Site</a></div>
<nav><ul><li><a href="/one">Section One</a></li><li><a href="/two">Section Two</a></li>
<li><a href="/login">Log in</a></li><li><a href="/join">Sign up free</a></li></ul></nav></header>"""
_CHROME_BOTTOM = """<footer><p>copyright 2025 example site inc</p>
<ul><li><a href="/terms">terms of use</a></li><li><a href="/privacy">privacy policy</a></li>
<li><a href="/cookies">cookie settings</a></li></ul></footer>"""


# -- 1. news article (round-1 page, kept) -------------------------------------
_page(
    "news_article",
    b"""<!DOCTYPE html>
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
</body></html>""",
    keep=[
        "City council approves next year's budget after marathon session",
        "The city council voted 7-2 on Tuesday night to approve a budget that "
        "increases funding for road maintenance while trimming administrative "
        "costs across most departments.",
        "Council members debated for nearly six hours before reaching an "
        "agreement, with the final compromise restoring funding for the public "
        "library system that an earlier draft had cut.",
        "The budget takes effect at the start of the next fiscal year.",
    ],
    drop=["Politics", "BUY NOW", "Most read", "copyright", "Log in"],
)

# -- 2. blog with list items (round-1 page, kept) ------------------------------
_page(
    "blog_with_lists",
    b"""<html><head><meta charset="utf-8"><title>b</title></head><body>
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
</body></html>""",
    keep=[
        "Why we rewrote our ingestion pipeline",
        "Last spring our nightly batch started missing its deadline, and every "
        "fix we tried bought us a week at most before the backlog returned.",
        "We eventually concluded the problem was architectural: a single machine "
        "simply cannot parse forty terabytes of markup in a night, no matter how "
        "clever the parser.",
        "Partition the corpus by url hash so no host can hot-spot a worker.",
        "Keep every per-document step inside one vectorized stage boundary.",
        "Write per-partition manifests so a failed run resumes exactly.",
        "Six months later the same job finishes before midnight.",
    ],
    drop=["12 comments", "reply", "about"],
)

# -- 3. table page (round-1 page, kept) ----------------------------------------
_page(
    "table_mixed",
    b"""<html><body>
<table><tr><th>quarter</th><th>revenue</th></tr>
<tr><td>Q1</td><td>1.2M</td></tr><tr><td>Q2</td><td>1.4M</td></tr></table>
<p>Revenue grew steadily across the first half of the year, driven mostly by
the subscription business and a one-time licensing deal signed in March.</p>
</body></html>""",
    keep=[
        "Revenue grew steadily across the first half of the year, driven mostly "
        "by the subscription business and a one-time licensing deal signed in March.",
    ],
    drop=["Q1", "1.2M", "quarter"],
)

# -- 4. comment thread ---------------------------------------------------------
_page(
    "comment_thread",
    _CHROME_TOP
    + """<main><article>
<h1>Understanding backpressure in streaming systems and why it matters</h1>
<p>Backpressure is the mechanism by which a slow consumer tells a fast
producer to ease off before queues overflow, and it is the difference
between a pipeline that degrades gracefully and one that falls over.</p>
</article>
<section class="comments">
<h3>Comments</h3>
<div class="comment"><span class="author"><a href="/u/1">dataphan</a></span>
<p>We hit exactly this last year and ended up adding a bounded queue between
the two stages, which solved the crashes but introduced latency spikes that
took another month to understand properly.</p>
<a href="/vote">upvote</a> <a href="/reply">reply</a></div>
<div class="comment"><span class="author"><a href="/u/2">sre_kate</a></span>
<p>The article undersells how hard it is to pick the right buffer size when
the downstream latency distribution has a long tail in production traffic.</p>
<a href="/vote">upvote</a> <a href="/reply">reply</a></div>
</section></main>"""
    + _CHROME_BOTTOM,
    keep=[
        "Understanding backpressure in streaming systems and why it matters",
        "Backpressure is the mechanism by which a slow consumer tells a fast "
        "producer to ease off before queues overflow, and it is the difference "
        "between a pipeline that degrades gracefully and one that falls over.",
        # comments ARE user text a training pipeline wants
        "We hit exactly this last year and ended up adding a bounded queue "
        "between the two stages, which solved the crashes but introduced latency "
        "spikes that took another month to understand properly.",
        "The article undersells how hard it is to pick the right buffer size "
        "when the downstream latency distribution has a long tail in production "
        "traffic.",
    ],
    drop=["upvote", "Log in", "Sign up free", "copyright 2025 example site"],
)

# -- 5. wiki-style infobox + prose ----------------------------------------------
_page(
    "wiki_infobox",
    _CHROME_TOP
    + """<main>
<h1>Mount Karstfell</h1>
<table class="infobox">
<tr><th>Elevation</th><td>2,431 m</td></tr>
<tr><th>Range</th><td><a href="/range">Northern Alps</a></td></tr>
<tr><th>First ascent</th><td>1887</td></tr>
</table>
<p>Mount Karstfell is a limestone peak in the northern range whose summit
ridge forms the watershed between two major river systems of the region.</p>
<p>The first recorded ascent was made in 1887 by a survey team mapping the
border, although local shepherds had almost certainly reached the summit
ridge earlier while moving flocks between seasonal pastures.</p>
<h2>Geology</h2>
<p>The peak consists of heavily folded limestone laid down in a shallow sea
and later uplifted, which explains both the extensive cave systems and the
near-vertical strata visible on the east face.</p>
</main>"""
    + _CHROME_BOTTOM,
    keep=[
        "Mount Karstfell",
        # r4: the Geology section heading is keep — same labeling rule
        # as Ingredients/Method on the recipe page (a heading of kept
        # prose is content); it was an omission in the original labels
        "Geology",
        "Mount Karstfell is a limestone peak in the northern range whose summit "
        "ridge forms the watershed between two major river systems of the region.",
        "The first recorded ascent was made in 1887 by a survey team mapping the "
        "border, although local shepherds had almost certainly reached the summit "
        "ridge earlier while moving flocks between seasonal pastures.",
        "The peak consists of heavily folded limestone laid down in a shallow "
        "sea and later uplifted, which explains both the extensive cave systems "
        "and the near-vertical strata visible on the east face.",
    ],
    drop=["Elevation", "2,431 m", "First ascent", "Section One"],
)

# -- 6. cookie-consent interstitial ---------------------------------------------
_page(
    "cookie_consent",
    """<html><body>
<div class="cookie-banner">We and our 132 partners use cookies to personalise
content and ads and to analyse our traffic. <a href="/privacy">Read our
cookie policy</a> or <a href="/manage">manage your preferences</a>.
<button>Accept all</button><button>Reject all</button></div>
"""
    + _CHROME_TOP
    + """<main><article>
<h1>Ferry service resumes after two-week repair closure of the main dock</h1>
<p>The harbour ferry returned to its normal timetable on Monday after
engineers finished replacing the fender piles that a cargo barge damaged
during the storm at the end of last month.</p>
<p>Operators said the repair came in under budget because divers were able to
reuse the original mounting hardware, and no further closures are planned
for the remainder of the season.</p>
</article></main>"""
    + _CHROME_BOTTOM
    + "</body></html>",
    keep=[
        "Ferry service resumes after two-week repair closure of the main dock",
        "The harbour ferry returned to its normal timetable on Monday after "
        "engineers finished replacing the fender piles that a cargo barge damaged "
        "during the storm at the end of last month.",
        "Operators said the repair came in under budget because divers were able "
        "to reuse the original mounting hardware, and no further closures are "
        "planned for the remainder of the season.",
    ],
    drop=["Accept all", "132 partners", "manage your preferences"],
)

# -- 7. paginated article stub ---------------------------------------------------
_page(
    "paginated_stub",
    _CHROME_TOP
    + """<main><article>
<h1>The long decline of the regional sorting office, part one of three</h1>
<p>When the sorting office opened in 1954 it handled mail for half the
county, and three generations of the same families worked its floors before
the volumes began to fall.</p>
<p class="teaser">Continue reading on page two, where we follow the last
night shift before the machines were switched off for good.</p>
<div class="pagination"><a href="/p1">1</a> <a href="/p2">2</a>
<a href="/p3">3</a> <a href="/next">Next page</a></div>
</article></main>"""
    + _CHROME_BOTTOM,
    keep=[
        "The long decline of the regional sorting office, part one of three",
        "When the sorting office opened in 1954 it handled mail for half the "
        "county, and three generations of the same families worked its floors "
        "before the volumes began to fall.",
        "Continue reading on page two, where we follow the last night shift "
        "before the machines were switched off for good.",
    ],
    drop=["Next page", "Section Two"],
)

# -- 8. German article ------------------------------------------------------------
_page(
    "german_article",
    """<html><head><meta charset="utf-8"></head><body>
<nav><a href="/start">Startseite</a> <a href="/politik">Politik</a>
<a href="/anmelden">Anmelden</a></nav>
<article>
<h1>Gemeinderat beschließt neuen Radweg entlang der alten Bahntrasse</h1>
<p>Der Gemeinderat hat am Dienstagabend mit großer Mehrheit beschlossen, den
seit Jahren diskutierten Radweg entlang der stillgelegten Bahntrasse zu
bauen und dafür Mittel aus dem Landesprogramm abzurufen.</p>
<p>Die Bauarbeiten sollen im Frühjahr beginnen und noch vor dem Winter
abgeschlossen sein, sofern die Genehmigung der Bezirksregierung rechtzeitig
eintrifft.</p>
</article>
<footer><a href="/impressum">Impressum</a> <a href="/datenschutz">Datenschutz</a></footer>
</body></html>""",
    keep=[
        "Gemeinderat beschließt neuen Radweg entlang der alten Bahntrasse",
        "Der Gemeinderat hat am Dienstagabend mit großer Mehrheit beschlossen, "
        "den seit Jahren diskutierten Radweg entlang der stillgelegten Bahntrasse "
        "zu bauen und dafür Mittel aus dem Landesprogramm abzurufen.",
        "Die Bauarbeiten sollen im Frühjahr beginnen und noch vor dem Winter "
        "abgeschlossen sein, sofern die Genehmigung der Bezirksregierung "
        "rechtzeitig eintrifft.",
    ],
    drop=["Anmelden", "Impressum", "Datenschutz"],
)

# -- 9. French article -------------------------------------------------------------
_page(
    "french_article",
    """<html><head><meta charset="utf-8"></head><body>
<nav><a href="/">Accueil</a> <a href="/actu">Actualités</a>
<a href="/connexion">Connexion</a></nav>
<article>
<h1>La médiathèque municipale rouvrira ses portes au début du printemps</h1>
<p>Après dix-huit mois de travaux, la médiathèque municipale rouvrira ses
portes au public avec une salle de lecture agrandie et un fonds jeunesse
entièrement renouvelé.</p>
<p>La maire a précisé que le budget des travaux avait été tenu et que les
horaires d'ouverture seraient élargis au samedi soir dès la réouverture.</p>
</article>
<footer><a href="/mentions">Mentions légales</a></footer>
</body></html>""",
    keep=[
        "La médiathèque municipale rouvrira ses portes au début du printemps",
        "Après dix-huit mois de travaux, la médiathèque municipale rouvrira ses "
        "portes au public avec une salle de lecture agrandie et un fonds jeunesse "
        "entièrement renouvelé.",
        "La maire a précisé que le budget des travaux avait été tenu et que les "
        "horaires d'ouverture seraient élargis au samedi soir dès la réouverture.",
    ],
    drop=["Connexion", "Mentions légales"],
)

# -- 10. Chinese article (no word spaces: stresses char-based rules) ---------------
_page(
    "chinese_article",
    """<html><head><meta charset="utf-8"></head><body>
<nav><a href="/">首页</a> <a href="/news">新闻</a> <a href="/login">登录</a></nav>
<article>
<h1>市图书馆新馆下月正式向公众开放并延长晚间服务时间</h1>
<p>经过两年多的建设，市图书馆新馆将于下月正式向公众开放，新馆位于滨江文化区，
总建筑面积约五万平方米，藏书容量是旧馆的三倍以上。</p>
<p>图书馆负责人表示，新馆开放后将把晚间闭馆时间延长到十点，并在周末增设少儿
阅读专场，方便上班族和学生读者安排时间。</p>
</article>
<footer>版权所有 示例新闻网</footer>
</body></html>""",
    keep=[
        "市图书馆新馆下月正式向公众开放并延长晚间服务时间",
        "经过两年多的建设，市图书馆新馆将于下月正式向公众开放，新馆位于滨江文化区， "
        "总建筑面积约五万平方米，藏书容量是旧馆的三倍以上。",
        "图书馆负责人表示，新馆开放后将把晚间闭馆时间延长到十点，并在周末增设少儿 "
        "阅读专场，方便上班族和学生读者安排时间。",
    ],
    drop=["登录", "版权所有"],
)

# -- 11. forum thread listing (all links: near-zero content) ------------------------
_page(
    "forum_listing",
    _CHROME_TOP
    + """<main><h2>Latest threads</h2>
<table class="threads">
<tr><td><a href="/t/1">Help with flaky integration tests</a></td><td>14 replies</td></tr>
<tr><td><a href="/t/2">Show: my weekend parser project</a></td><td>3 replies</td></tr>
<tr><td><a href="/t/3">Why is my shuffle so slow</a></td><td>41 replies</td></tr>
<tr><td><a href="/t/4">Hiring thread for the autumn</a></td><td>102 replies</td></tr>
</table>
<div class="pager"><a href="/page/2">older threads</a></div>
</main>"""
    + _CHROME_BOTTOM,
    keep=[],  # an index page has no main content — correct output is (near) empty
    drop=[
        "Help with flaky integration tests",
        "older threads",
        "Sign up free",
    ],
)

# -- 12. recipe -----------------------------------------------------------------------
_page(
    "recipe",
    _CHROME_TOP
    + """<main><article>
<h1>Weeknight lentil soup that actually tastes like something</h1>
<p>This is the soup I make when the fridge is nearly empty: one pot, forty
minutes, and it reheats better the next day than it tastes the first night.</p>
<h2>Ingredients</h2>
<ul>
<li>two cups of brown lentils, rinsed and picked over for stones</li>
<li>one large onion, diced, plus two carrots and two celery stalks</li>
<li>a tin of chopped tomatoes and a litre of vegetable stock</li>
</ul>
<h2>Method</h2>
<p>Sweat the onion, carrot and celery with a pinch of salt until soft, add
the lentils and tomatoes, cover with stock and simmer until the lentils
collapse, then finish with lemon juice and plenty of black pepper.</p>
</article></main>"""
    + _CHROME_BOTTOM,
    keep=[
        "Weeknight lentil soup that actually tastes like something",
        "Ingredients",
        "Method",
        "This is the soup I make when the fridge is nearly empty: one pot, forty "
        "minutes, and it reheats better the next day than it tastes the first night.",
        "two cups of brown lentils, rinsed and picked over for stones",
        "one large onion, diced, plus two carrots and two celery stalks",
        "a tin of chopped tomatoes and a litre of vegetable stock",
        "Sweat the onion, carrot and celery with a pinch of salt until soft, add "
        "the lentils and tomatoes, cover with stock and simmer until the lentils "
        "collapse, then finish with lemon juice and plenty of black pepper.",
    ],
    drop=["Log in", "cookie settings"],
)

# -- 13. docs page with code blocks ----------------------------------------------------
_page(
    "docs_code",
    _CHROME_TOP
    + """<main>
<h1>Configuring the retry policy for outbound requests in the client</h1>
<p>The client retries idempotent requests automatically, and the policy
below controls how many attempts are made and how the backoff grows
between them.</p>
<pre>retry:
  max_attempts: 5
  backoff_base_ms: 200
  backoff_multiplier: 2.0
  retry_on: [timeout, connection_reset]</pre>
<p>Setting max_attempts to one disables retries entirely, which is the right
choice for endpoints that are not idempotent, such as payment submission.</p>
</main>"""
    + _CHROME_BOTTOM,
    keep=[
        "Configuring the retry policy for outbound requests in the client",
        "The client retries idempotent requests automatically, and the policy "
        "below controls how many attempts are made and how the backoff grows "
        "between them.",
        "retry: max_attempts: 5 backoff_base_ms: 200 backoff_multiplier: 2.0 "
        "retry_on: [timeout, connection_reset]",
        "Setting max_attempts to one disables retries entirely, which is the "
        "right choice for endpoints that are not idempotent, such as payment "
        "submission.",
    ],
    drop=["Section One", "terms of use"],
)

# -- 14. marketing lander ----------------------------------------------------------------
_page(
    "marketing_lander",
    """<html><body>
<nav><a href="/">Acme</a> <a href="/pricing">Pricing</a> <a href="/demo">Get a demo</a></nav>
<main>
<h1>Ship data pipelines your whole team can actually understand</h1>
<p>Acme turns your scattered cron jobs into one declarative pipeline with
lineage, retries and alerting built in, so the person on call at three in
the morning can see exactly which upstream broke and why.</p>
<div class="cta"><a href="/signup">Start free trial</a></div>
<h2>Loved by data teams</h2>
<p>Teams tell us the biggest change is cultural: when every dataset has a
visible owner and a freshness contract, the weekly argument about whose
numbers are right simply stops happening.</p>
</main>
<footer><a href="/about">about</a> <a href="/careers">careers</a> © acme inc</footer>
</body></html>""",
    keep=[
        "Ship data pipelines your whole team can actually understand",
        "Loved by data teams",
        "Acme turns your scattered cron jobs into one declarative pipeline with "
        "lineage, retries and alerting built in, so the person on call at three "
        "in the morning can see exactly which upstream broke and why.",
        "Teams tell us the biggest change is cultural: when every dataset has a "
        "visible owner and a freshness contract, the weekly argument about whose "
        "numbers are right simply stops happening.",
    ],
    drop=["Start free trial", "Get a demo", "careers"],
)

# -- 15. search results page ---------------------------------------------------------------
_page(
    "search_results",
    _CHROME_TOP
    + """<main><h2>Results for "lentil soup"</h2>
<div class="result"><a href="/r/1">Weeknight lentil soup recipe</a>
<span class="snippet">one pot, forty minutes, reheats well...</span></div>
<div class="result"><a href="/r/2">Red lentil curry soup</a>
<span class="snippet">a spicier take with coconut milk...</span></div>
<div class="result"><a href="/r/3">Lentil soup freezer guide</a>
<span class="snippet">portioning and thawing tips...</span></div>
<div class="pager"><a href="/s?p=2">more results</a></div>
</main>"""
    + _CHROME_BOTTOM,
    keep=[
        # the query-echo heading is the only non-link text; everything
        # else must vanish (see test_index_pages_extract_near_nothing)
        'Results for "lentil soup"',
    ],
    drop=["Weeknight lentil soup recipe", "more results", "Sign up free"],
)

# -- 16. 404 error page ----------------------------------------------------------------------
_page(
    "error_404",
    _CHROME_TOP
    + """<main><h1>Page not found</h1>
<p>The page you were looking for has been moved or no longer exists; check
the address for typos or head back to the front page to start again.</p>
</main>"""
    + _CHROME_BOTTOM,
    keep=[
        # the apology paragraph IS the page's only text; keeping it is the
        # defensible call (quality filters downstream handle 404 text)
        "Page not found",
        "The page you were looking for has been moved or no longer exists; "
        "check the address for typos or head back to the front page to start "
        "again.",
    ],
    drop=["Section One", "copyright"],
)

# -- 17. e-commerce product page ---------------------------------------------------------------
_page(
    "product_page",
    _CHROME_TOP
    + """<main>
<h1>Fjellvann 30L waterproof hiking pack</h1>
<div class="buy"><span class="price">€89</span>
<a href="/cart">Add to cart</a> <a href="/wishlist">Save</a></div>
<h2>Description</h2>
<p>The Fjellvann 30 is a fully welded roll-top pack built for wet-weather
day hikes, with a stiffened back panel that keeps the load stable on
scrambles and a side zip that reaches the bottom of the main compartment.</p>
<p>The hip belt is removable and the shoulder straps take the same padding
as our larger expedition packs, which is why this bag carries heavier loads
more comfortably than anything else in its size class.</p>
<ul class="specs"><li>volume 30 litres</li><li>weight 840 grams</li></ul>
</main>"""
    + _CHROME_BOTTOM,
    keep=[
        "Fjellvann 30L waterproof hiking pack",
        "Description",
        "volume 30 litres",
        "weight 840 grams",
        "The Fjellvann 30 is a fully welded roll-top pack built for wet-weather "
        "day hikes, with a stiffened back panel that keeps the load stable on "
        "scrambles and a side zip that reaches the bottom of the main compartment.",
        "The hip belt is removable and the shoulder straps take the same padding "
        "as our larger expedition packs, which is why this bag carries heavier "
        "loads more comfortably than anything else in its size class.",
    ],
    drop=["Add to cart", "€89", "Save"],
)

# -- 18. newsletter/interstitial-heavy article ----------------------------------------------------
_page(
    "newsletter_heavy",
    _CHROME_TOP
    + """<main><article>
<h1>What the harbour cranes tell you about the health of world trade</h1>
<p>Counting active cranes from the hill above the container terminal turns
out to track the published throughput statistics with surprising accuracy,
about a quarter earlier than the official series is released.</p>
<div class="newsletter"><h3>Enjoying this story?</h3>
<p><a href="/subscribe">Subscribe to our free weekly newsletter</a> and never
miss a dispatch from the waterfront.</p></div>
<p>The method fails in fog season, which is also when the port authority's
own numbers are at their least reliable, so the two series disagree most
exactly when both are least trustworthy.</p>
</article></main>"""
    + _CHROME_BOTTOM,
    keep=[
        "What the harbour cranes tell you about the health of world trade",
        "Counting active cranes from the hill above the container terminal turns "
        "out to track the published throughput statistics with surprising "
        "accuracy, about a quarter earlier than the official series is released.",
        "The method fails in fog season, which is also when the port authority's "
        "own numbers are at their least reliable, so the two series disagree most "
        "exactly when both are least trustworthy.",
    ],
    drop=["Subscribe to our free weekly newsletter", "Enjoying this story?"],
)

# -- 19. plain text payload ------------------------------------------------------------------------
_page(
    "plain_text_readme",
    b"""INSTALLATION NOTES

Unpack the archive into a directory of your choice and run the bootstrap
script once as a regular user; it creates a local configuration file and
never needs root.

If the bootstrap reports a missing compiler, install the build tools for
your platform and run it again; partial installs are safe to repeat.""",
    keep=[
        "INSTALLATION NOTES",
        "Unpack the archive into a directory of your choice and run the "
        "bootstrap script once as a regular user; it creates a local "
        "configuration file and never needs root.",
        "If the bootstrap reports a missing compiler, install the build tools "
        "for your platform and run it again; partial installs are safe to repeat.",
    ],
    drop=[],
)

# -- 20. dl/blockquote longform --------------------------------------------------------------------
_page(
    "interview_blockquote",
    _CHROME_TOP
    + """<main><article>
<h1>An oral history of the night the data centre flooded</h1>
<p>Ten years on, the engineers who carried servers up two flights of stairs
in ankle-deep water tell the story in their own words.</p>
<blockquote>We knew the pumps had lost power when the fire doors started
weeping, and from that moment we had maybe forty minutes before the water
reached the bottom rack.</blockquote>
<p>The facility reopened eleven days later with every pump on its own
circuit, a change the industry quietly copied within a couple of years.</p>
</article></main>"""
    + _CHROME_BOTTOM,
    keep=[
        "An oral history of the night the data centre flooded",
        "Ten years on, the engineers who carried servers up two flights of "
        "stairs in ankle-deep water tell the story in their own words.",
        "We knew the pumps had lost power when the fire doors started weeping, "
        "and from that moment we had maybe forty minutes before the water "
        "reached the bottom rack.",
        "The facility reopened eleven days later with every pump on its own "
        "circuit, a change the industry quietly copied within a couple of years.",
    ],
    drop=["Section Two", "privacy policy"],
)


# -- 21. FAQ accordion (details/summary) ------------------------------------------------------------
_page(
    "faq_accordion",
    _CHROME_TOP
    + """<main><h1>Frequently asked questions about the allotment waiting list</h1>
<details><summary>How long is the current waiting time for a plot?</summary>
<p>Most applicants wait between two and four years depending on the site,
and the list for the riverside site moves noticeably faster because its
plots are smaller and turn over more often.</p></details>
<details><summary>Can I share a plot with another household?</summary>
<p>Yes, joint tenancies are allowed as long as both parties register, and
shared plots are actually encouraged on the larger sites where a full plot
is too much work for one household.</p></details>
</main>"""
    + _CHROME_BOTTOM,
    keep=[
        "Frequently asked questions about the allotment waiting list",
        "How long is the current waiting time for a plot?",
        "Most applicants wait between two and four years depending on the site, "
        "and the list for the riverside site moves noticeably faster because its "
        "plots are smaller and turn over more often.",
        "Can I share a plot with another household?",
        "Yes, joint tenancies are allowed as long as both parties register, and "
        "shared plots are actually encouraged on the larger sites where a full "
        "plot is too much work for one household.",
    ],
    drop=["Log in", "cookie settings"],
)

# -- 22. image gallery with captions -----------------------------------------------------------------
_page(
    "gallery_captions",
    _CHROME_TOP
    + """<main><h1>Autumn on the upland moors, in pictures</h1>
<figure><img src="/i/1.jpg" alt=""><figcaption>Mist clearing from the eastern
ridge just after sunrise on the first cold morning.</figcaption></figure>
<figure><img src="/i/2.jpg" alt=""><figcaption>A shepherd's hut restored last
year by the volunteer group, now used as a bothy.</figcaption></figure>
<figure><img src="/i/3.jpg" alt=""><figcaption>The old quarry tramway, its
rails long gone but the grade still walkable.</figcaption></figure>
</main>"""
    + _CHROME_BOTTOM,
    keep=[
        "Autumn on the upland moors, in pictures",
        "Mist clearing from the eastern ridge just after sunrise on the first "
        "cold morning.",
        "A shepherd's hut restored last year by the volunteer group, now used as "
        "a bothy.",
        "The old quarry tramway, its rails long gone but the grade still walkable.",
    ],
    drop=["Section One"],
)

# -- 23. legal/terms page (long boilerplate-register text IS the content) -----------------------------
_page(
    "legal_terms",
    _CHROME_TOP
    + """<main><h1>Terms of service</h1>
<p>By creating an account you agree that the service is provided as is,
that scheduled maintenance may interrupt availability with reasonable
notice, and that your stored data remains yours and is exportable at any
time in a documented format.</p>
<p>Either party may terminate the agreement with thirty days written
notice, after which your data is retained for ninety days and then
permanently deleted from production systems and backups on their normal
rotation schedule.</p>
</main>"""
    + _CHROME_BOTTOM,
    keep=[
        "Terms of service",
        "By creating an account you agree that the service is provided as is, "
        "that scheduled maintenance may interrupt availability with reasonable "
        "notice, and that your stored data remains yours and is exportable at "
        "any time in a documented format.",
        "Either party may terminate the agreement with thirty days written "
        "notice, after which your data is retained for ninety days and then "
        "permanently deleted from production systems and backups on their normal "
        "rotation schedule.",
    ],
    drop=["Sign up free", "copyright 2025 example site"],
)

# -- 24. table-of-contents / anchor index ------------------------------------------------------------
_page(
    "toc_index",
    _CHROME_TOP
    + """<main><h2>Contents</h2>
<ol>
<li><a href="#ch1">Chapter one: the survey years</a></li>
<li><a href="#ch2">Chapter two: the narrow gauge era</a></li>
<li><a href="#ch3">Chapter three: closure and afterlife</a></li>
<li><a href="#app">Appendix: rolling stock registers</a></li>
</ol>
<p class="note">This online edition reproduces the 1987 text unchanged apart
from corrections listed in the appendix and newly drawn maps.</p>
</main>"""
    + _CHROME_BOTTOM,
    keep=[
        "This online edition reproduces the 1987 text unchanged apart from "
        "corrections listed in the appendix and newly drawn maps.",
    ],
    drop=["Chapter one: the survey years", "Section Two"],
)


# -- 25. nested templates: chrome wrapped in chrome (r3: VERDICT item 6) ------
_page(
    "nested_templates",
    b"""<html><head><title>n</title></head><body>
<div class="shell"><div class="shell-inner">
""" + _CHROME_TOP.encode() + b"""
<div class="subsite"><header><nav><ul><li><a href="/docs">Docs home</a></li>
<li><a href="/docs/api">API</a></li><li><a href="/docs/faq">FAQ</a></li></ul></nav></header>
<main><article>
<h1>Configuring retry backoff</h1>
<p>The client retries failed calls with exponential backoff starting at one
second and doubling to a ceiling of two minutes, and it retries forever
unless the error is marked permanent by the server.</p>
<p>Set the ceiling lower for interactive tools and higher for nightly batch
jobs, which would rather wait out a long incident than fail the whole run.</p>
</article></main>
<footer><a href="/docs/edit">Edit this page</a> <a href="/docs/src">View source</a></footer>
</div>
""" + _CHROME_BOTTOM.encode() + b"""
</div></div></body></html>""",
    keep=[
        "Configuring retry backoff",
        "The client retries failed calls with exponential backoff starting at "
        "one second and doubling to a ceiling of two minutes, and it retries "
        "forever unless the error is marked permanent by the server.",
        "Set the ceiling lower for interactive tools and higher for nightly "
        "batch jobs, which would rather wait out a long incident than fail the "
        "whole run.",
    ],
    drop=["Docs home", "Edit this page", "View source", "Section One", "cookie settings"],
)

# -- 26. Arabic RTL article with Arabic boilerplate ---------------------------
_page(
    "arabic_rtl",
    """<html dir="rtl" lang="ar"><head><meta charset="utf-8"><title>a</title></head><body>
<header><nav><ul><li><a href="/">الصفحة الرئيسية</a></li><li><a href="/news">الأخبار</a></li>
<li><a href="/login">تسجيل الدخول</a></li></ul></nav></header>
<main><article>
<h1>افتتاح خط السكة الجديد بين المدينتين</h1>
<p>افتتح خط السكة الحديدية الجديد يوم الثلاثاء بعد خمس سنوات من الأعمال، وهو يختصر زمن الرحلة بين المدينتين من ثلاث ساعات إلى خمسين دقيقة فقط حسب الجدول المعلن.</p>
<p>وقالت هيئة النقل إن التذاكر ستباع عبر التطبيق والمحطات معا، وإن الأسعار ستبقى مخفضة خلال الشهر الأول لتشجيع الركاب على تجربة الخط.</p>
</article></main>
<footer><p>جميع الحقوق محفوظة ٢٠٢٥</p><a href="/terms">شروط الاستخدام</a></footer>
</body></html>""".encode(),
    keep=[
        "افتتاح خط السكة الجديد بين المدينتين",
        "افتتح خط السكة الحديدية الجديد يوم الثلاثاء بعد خمس سنوات من الأعمال، وهو يختصر زمن الرحلة بين المدينتين من ثلاث ساعات إلى خمسين دقيقة فقط حسب الجدول المعلن.",
        "وقالت هيئة النقل إن التذاكر ستباع عبر التطبيق والمحطات معا، وإن الأسعار ستبقى مخفضة خلال الشهر الأول لتشجيع الركاب على تجربة الخط.",
    ],
    drop=["تسجيل الدخول", "جميع الحقوق محفوظة"],
)

# -- 27. Hebrew article with mixed RTL/LTR (latin product names inline) ------
_page(
    "hebrew_mixed_rtl",
    """<html dir="rtl" lang="he"><head><meta charset="utf-8"><title>h</title></head><body>
<header><nav><a href="/">דף הבית</a> <a href="/tech">טכנולוגיה</a> <a href="/join">הרשמה</a></nav></header>
<main><article>
<h1>סקירה: מחשב הלוח Quartz Tab 11 מגיע לשוק</h1>
<p>מכשיר Quartz Tab 11 מציע מסך בהיר במיוחד וסוללה שמחזיקה יום עבודה מלא, אבל המקלדת הנלווית נמכרת בנפרד ומייקרת את העסקה באופן מורגש.</p>
<p>בבדיקות שלנו המכשיר סיים עריכת וידאו בסיסית מהר יותר מקודמו בכרבע, והחימום נשאר נמוך גם אחרי שעה של משחק רציף.</p>
</article></main>
<footer><p>כל הזכויות שמורות</p><a href="/privacy">מדיניות פרטיות</a></footer>
</body></html>""".encode(),
    keep=[
        "סקירה: מחשב הלוח Quartz Tab 11 מגיע לשוק",
        "מכשיר Quartz Tab 11 מציע מסך בהיר במיוחד וסוללה שמחזיקה יום עבודה מלא, אבל המקלדת הנלווית נמכרת בנפרד ומייקרת את העסקה באופן מורגש.",
        "בבדיקות שלנו המכשיר סיים עריכת וידאו בסיסית מהר יותר מקודמו בכרבע, והחימום נשאר נמוך גם אחרי שעה של משחק רציף.",
    ],
    drop=["הרשמה", "כל הזכויות שמורות"],
)

# -- 28. Chinese page with CJK chrome (nav/footer boilerplate in Chinese) -----
_page(
    "cjk_boilerplate",
    """<html lang="zh"><head><meta charset="utf-8"><title>z</title></head><body>
<header><nav><ul><li><a href="/">首页</a></li><li><a href="/news">新闻</a></li>
<li><a href="/login">登录</a></li><li><a href="/reg">免费注册</a></li></ul></nav></header>
<main><article>
<h1>市图书馆完成扩建后重新开放</h1>
<p>经过两年的扩建工程，市图书馆于本周一重新向公众开放，新馆面积比原来增加了一倍，并首次设立了面向青少年的独立阅览区。</p>
<p>馆方表示，开放首周将延长服务时间至晚上十点，读者凭现有借书证即可进入所有新区域，无需重新办理手续。</p>
</article></main>
<aside><h3>热门推荐</h3><ul><li><a href="/a">本地天气预警</a></li><li><a href="/b">地铁延线规划</a></li></ul></aside>
<footer><p>版权所有 2025 示例新闻网</p><a href="/terms">使用条款</a> <a href="/privacy">隐私政策</a></footer>
</body></html>""".encode(),
    keep=[
        "市图书馆完成扩建后重新开放",
        "经过两年的扩建工程，市图书馆于本周一重新向公众开放，新馆面积比原来增加了一倍，并首次设立了面向青少年的独立阅览区。",
        "馆方表示，开放首周将延长服务时间至晚上十点，读者凭现有借书证即可进入所有新区域，无需重新办理手续。",
    ],
    drop=["免费注册", "热门推荐", "版权所有", "隐私政策"],
)

# -- 29. huge single-block page (one ~6k-char paragraph: stresses the
#        intra-block split + bounded re-split path on real prose) -------------
_HUGE_SENTENCE = (
    "The survey crews moved up the valley a mile at a time, driving stakes "
    "into frozen ground and arguing about grades that would decide which "
    "villages got a station and which got a whistle stop. "
)
_page(
    "huge_single_block",
    (
        "<html><head><title>g</title></head><body>"
        + _CHROME_TOP
        + "<main><article><p>"
        + _HUGE_SENTENCE * 30
        + "</p></article></main>"
        + _CHROME_BOTTOM
        + "</body></html>"
    ).encode(),
    keep=[(_HUGE_SENTENCE * 30).strip()],
    drop=["Sign up free", "cookie settings"],
)

# -- 30. div-soup: content buried under ~40 wrapper divs ----------------------
_page(
    "deep_div_soup",
    (
        "<html><head><title>d</title></head><body>"
        + _CHROME_TOP
        + "<div>" * 40
        + "<h1>Why the harbour lights are green on the north pier</h1>"
        + "<p>The colour scheme dates to a nineteenth century ordinance that "
        + "reserved red lamps for the coal wharves, and the harbour board has "
        + "simply never seen a reason to change a rule every sailor already "
        + "knows.</p>"
        + "</div>" * 40
        + _CHROME_BOTTOM
        + "</body></html>"
    ).encode(),
    keep=[
        "Why the harbour lights are green on the north pier",
        "The colour scheme dates to a nineteenth century ordinance that "
        "reserved red lamps for the coal wharves, and the harbour board has "
        "simply never seen a reason to change a rule every sailor already "
        "knows.",
    ],
    drop=["Section Two", "terms of use"],
)

# -- 31. template-in-template ad sandwich: content interleaved with repeated
#        identical ad units (the repeated-unit shape of real CMS output) ------
_AD_UNIT = (
    '<div class="adunit"><span>Advertisement</span>'
    '<a href="/click">Shop the winter sale now</a></div>'
)
_page(
    "ad_sandwich",
    (
        "<html><head><title>s</title></head><body>"
        + _CHROME_TOP
        + "<main><article><h1>Night trains return to the coastal line</h1>"
        + _AD_UNIT
        + "<p>The overnight service resumes next month with two departures a "
        + "week, reviving a route that ended fifteen years ago when the rolling "
        + "stock was sold abroad.</p>"
        + _AD_UNIT
        + "<p>Operators say demand from hikers and festival crowds made the "
        + "case, and the timetable leaves town late enough to catch the last "
        + "connections from the capital.</p>"
        + _AD_UNIT
        + "</article></main>"
        + _CHROME_BOTTOM
        + "</body></html>"
    ).encode(),
    keep=[
        "Night trains return to the coastal line",
        "The overnight service resumes next month with two departures a week, "
        "reviving a route that ended fifteen years ago when the rolling stock "
        "was sold abroad.",
        "Operators say demand from hikers and festival crowds made the case, "
        "and the timetable leaves town late enough to catch the last "
        "connections from the capital.",
    ],
    drop=["Advertisement", "Shop the winter sale now", "Sign up free"],
)

# -- 32. link-FREE promo interstitial (r4): plain-text marketing copy long
#        enough to pass every length/link-density rule — only the
#        class-keyword context can catch it ----------------------------------
_page(
    "promo_plaintext",
    _CHROME_TOP
    + """<main><article>
<h1>The quiet revival of the town's covered market</h1>
<p>Stall rents were frozen for three years while the roof was rebuilt, and
the gamble paid off: occupancy is back above ninety percent and the fish
counter queues on Saturdays reach the side entrance again.</p>
<div class="promo">Limited offer: three months free on any stall when you
register before the end of the season, terms and conditions apply to new
traders only.</div>
<p>Traders credit the decision to keep the wholesale entrance open during
the works, which let regular customers keep their habits while the rest of
the building was a construction site.</p>
<div class="social-share"><span>Share this story</span><span>Copy link</span></div>
</article></main>"""
    + _CHROME_BOTTOM,
    keep=[
        "The quiet revival of the town's covered market",
        "Stall rents were frozen for three years while the roof was rebuilt, "
        "and the gamble paid off: occupancy is back above ninety percent and "
        "the fish counter queues on Saturdays reach the side entrance again.",
        "Traders credit the decision to keep the wholesale entrance open "
        "during the works, which let regular customers keep their habits "
        "while the rest of the building was a construction site.",
    ],
    drop=[
        # 100+ chars of link-free text: invisible to link-density and
        # length rules; the class="promo" context is the only signal
        "Limited offer: three months free",
        "Share this story",
        "Copy link",
    ],
)

# -- 33. enumeration-heading noise (r4): generic digit headings between
#        paragraphs stay dropped (the heading-affinity promotion's
#        digit-refusal guard), while the alphabetic section heading is kept --
_page(
    "digit_headings",
    _CHROME_TOP
    + """<main><article>
<h1>Keeping a sourdough starter alive through the winter</h1>
<h3>part 1</h3>
<p>Cold kitchens slow the culture down, so move the jar to the top of the
refrigerator where the compressor's warmth keeps it a few degrees above the
rest of the shelf.</p>
<h3>part 2</h3>
<p>Feeding once a week is enough below fifteen degrees; the surface liquid
is harmless and stirs back in, and a grey tint is age rather than spoilage.</p>
<h2>Troubleshooting</h2>
<p>A starter that smells of acetone is hungry, not dead: two feeds twelve
hours apart at room temperature will bring the yeast population back.</p>
</article></main>"""
    + _CHROME_BOTTOM,
    keep=[
        "Keeping a sourdough starter alive through the winter",
        "Troubleshooting",
        "Cold kitchens slow the culture down, so move the jar to the top of "
        "the refrigerator where the compressor's warmth keeps it a few "
        "degrees above the rest of the shelf.",
        "Feeding once a week is enough below fifteen degrees; the surface "
        "liquid is harmless and stirs back in, and a grey tint is age rather "
        "than spoilage.",
        "A starter that smells of acetone is hungry, not dead: two feeds "
        "twelve hours apart at room temperature will bring the yeast "
        "population back.",
    ],
    drop=["part 1", "part 2", "Sign up free"],
)

# -- harness -----------------------------------------------------------------


def _metrics(p: Page) -> dict:
    r = extract(p.html)
    joined = r.text.replace("\n", " ")
    keep_total = sum(len(s) for s in p.keep)
    keep_hit = sum(len(s) for s in p.keep if s in joined)
    viol = sum(len(s) for s in p.drop if s in joined)
    recall = keep_hit / keep_total if keep_total else 1.0
    precision = 1.0 - (viol / len(joined)) if joined else 1.0
    # EXHAUSTIVE precision (r3, VERDICT item 6): every extracted
    # non-space char must be covered by some keep span — labels are
    # exhaustive per page, so anything uncovered is a leak by
    # definition, not merely a spot-listed one.
    covered = [False] * len(joined)
    for s in p.keep:
        start = 0
        while True:
            i = joined.find(s, start)
            if i < 0:
                break
            for j in range(i, i + len(s)):
                covered[j] = True
            start = i + 1
    nonspace = [i for i, ch in enumerate(joined) if ch != " "]
    exh = (
        sum(1 for i in nonspace if covered[i]) / len(nonspace)
        if nonspace
        else 1.0
    )
    segs, cur = [], ""
    for i, ch in enumerate(joined):
        if not covered[i]:
            cur += ch
        else:
            if cur.strip():
                segs.append(cur.strip())
            cur = ""
    if cur.strip():
        segs.append(cur.strip())
    return {
        "page": p.name,
        "recall": round(recall, 4),
        "precision": round(precision, 4),
        "precision_exhaustive": round(exh, 4),
        "extracted_chars": len(r.text),
        "missed": [s[:60] for s in p.keep if s not in joined],
        "leaked": [s[:60] for s in p.drop if s in joined],
        "uncovered": [s[:60] for s in segs[:5]],
    }


def test_realistic_corpus_precision_recall():
    rows = [_metrics(p) for p in PAGES]
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    mean_precision = sum(r["precision"] for r in rows) / len(rows)
    mean_exh = sum(r["precision_exhaustive"] for r in rows) / len(rows)
    out = {
        "n_pages": len(rows),
        "mean_recall": round(mean_recall, 4),
        "mean_precision": round(mean_precision, 4),
        "mean_precision_exhaustive": round(mean_exh, 4),
        "pages": rows,
    }
    with open(os.path.join(HERE, "goldens", "realistic_metrics.json"), "w") as f:
        json.dump(out, f, indent=1)
    report = "\n".join(
        f"{r['page']:22s} recall={r['recall']:.2f} precision={r['precision']:.2f}"
        f" exh={r['precision_exhaustive']:.2f}"
        + (f" missed={r['missed']}" if r["missed"] else "")
        + (f" leaked={r['leaked']}" if r["leaked"] else "")
        + (f" uncovered={r['uncovered']}" if r["uncovered"] else "")
        for r in rows
    )
    assert len(rows) >= 30, f"corpus shrank to {len(rows)} pages"
    assert mean_recall >= 0.9, f"mean recall {mean_recall:.3f}\n{report}"
    assert mean_precision >= 0.95, f"mean precision {mean_precision:.3f}\n{report}"
    assert mean_exh >= 0.99, f"mean exhaustive precision {mean_exh:.4f}\n{report}"
    for r in rows:
        assert r["recall"] >= 0.5, f"{r['page']} recall collapsed\n{report}"
        assert r["precision"] >= 0.8, f"{r['page']} precision collapsed\n{report}"


def test_index_pages_extract_near_nothing():
    """Link farms (forum listing, SERP) must yield (near-)empty text —
    the shape where a naive length heuristic fails worst."""
    for p in PAGES:
        if p.name in ("forum_listing", "search_results"):
            r = extract(p.html)
            assert len(r.text) <= 60, f"{p.name}: leaked {r.text[:120]!r}"


def test_plain_text_page_routes_and_extracts():
    p = next(p for p in PAGES if p.name == "plain_text_readme")
    r = extract(p.html)
    assert "plain_text" in r.flags
    for s in p.keep:
        assert s in r.text.replace("\n", " ")
