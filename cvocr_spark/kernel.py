"""Pure-Python per-document main-content extraction kernel.

This is the graft of cvOCR's staged layout-analysis pipeline
(reference: /root/reference, C++/OpenCV) onto HTML bytes.  Every stage
cites the SURVEY.md §2 operator row and the reference location whose
semantics it re-expresses:

  stage                      SURVEY row  reference
  ---------------------      ----------  -------------------------------
  decode cascade             P6/F5       reco.py:43-62 (normalize)
  chrome strip               P1          preprocess.h:97-160 (eliminateVerLine)
  block segmentation         P2/P3       preprocess.h:313-371 (findRotatedRectsWithMSER)
  block sanitation           P4          preprocess.h:171-211 (rotatedRectsFilter)
  text normalization         P6          preprocess.h:497-536 (extractTextLines)
  intra-block split          P7          cut.h:221-249 (cut)
  bounded re-split           P8          cut.h:256-315 (doReCut/reCut)
  per-doc standards          A1/A2       preprocess.h:376-385, cut.h:158-185
  is-content predicate       F1          cut.h:324-356 (validChinesePatch)
  similarity guard           F2          cut.h:365-384 (isSimilar)
  rule cascade classify      C1          cut.h:680-725 (findTextlineType)
  neighbor relabel           W2          cut.h:733-769 (findPatchType)
  run-length promotion       W3          cut.h:812-859 (findEnglishText)
  lookahead block fusion     P10         cut.h:400-497 (merge)
  low-score absorb           C3          reco.py:159-192 (refreshRegion)
  ordered assembly           W7          reco.py:246-265

The kernel is stdlib-only (html.parser), fully deterministic (no
wall-clock, no dict-order dependence, fixed decode cascade), and never
raises on malformed input: it is the single Python stage that runs
inside Spark's ``mapInArrow`` (SURVEY §3 graft lifecycle).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field
from html.parser import HTMLParser

__all__ = ["extract", "ExtractResult", "Block", "KernelConfig", "DEFAULT_CONFIG"]

# --------------------------------------------------------------------------
# configuration (analogue of the reference's #define constants, cut.h:36-60)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class KernelConfig:
    # decode
    max_html_bytes: int = 2 * 1024 * 1024  # giant-page cap (SURVEY §4 spill row)
    charset_sniff_bytes: int = 1024
    # classification thresholds (analogue of MIN_SIMILIRITY / shape ratios,
    # cut.h:332: aspect>=0.83 && h_ratio>=0.85 && w_ratio>=0.85)
    max_link_density: float = 0.50   # >= this => boilerplate
    content_link_density: float = 0.10
    loose_link_density: float = 0.25
    min_content_chars: int = 25
    loose_content_chars: int = 80
    short_chars: int = 15            # below: too short to promote
    std_ratio: float = 0.5           # vs per-doc standard length (cut.h:332)
    filtered_mean_min_chars: int = 20  # A2 filter (cut.h:166-168 analogue)
    # re-split (cut.h:256-315)
    resplit_factor: float = 4.0 / 3.0  # re-split blocks > factor*standard (cut.h:306)
    resplit_min_chars: int = 480       # absolute floor for re-split trigger
    resplit_max_chars: int = 2000      # absolute ceiling: a lone giant block
    #                                    is its own doc standard, so the
    #                                    relative rule alone never fires
    max_resplit_depth: int = 10        # hard recursion bound (cut.h:260)
    # neighbor relabel (cut.h:733-769)
    max_promotions: int = 3            # <=3 promotions per doc (cut.h:737,764-767)
    # run-length promotion (cut.h:812-859)
    min_run: int = 3                   # >=3 consecutive (cut.h:824)
    run_link_density: float = 0.20
    # fusion (cut.h:400-497)
    max_fuse_lookahead: int = 4        # try fusing 2..5 adjacent (cut.h:446-455)
    similar_ratio: float = 0.8         # MIN_SIMILIRITY (cut.h:40)
    # low-confidence absorb (reco.py:167-176): a content block whose
    # classifier confidence is below absorb_conf AND whose length is
    # <= absorb_ratio of its neighbor is absorbed into that neighbor —
    # the graft of refreshRegion consuming per-patch recognition scores
    # (reco.py:167, confidences tesstool.h:44-47)
    absorb_conf: float = 0.5
    absorb_ratio: float = 0.4
    # segmentation backend: the fast regex scanner (fastparse.py) or the
    # stdlib-HTMLParser reference path; both verified block-identical on
    # the fixture corpus (tests/test_fastparse.py)
    fast_parse: bool = True


DEFAULT_CONFIG = KernelConfig()

# --------------------------------------------------------------------------
# data model (analogue of struct Patch / struct Region, cut.h:63-114)
# --------------------------------------------------------------------------


@dataclass
class Block:
    block_id: int = -1        # document order (mTLIndex analogue, preprocess.h:452-487)
    depth: int = 0            # DOM depth at flush time
    tag: str = ""             # flushing container tag
    text: str = ""            # normalized text
    raw_chars: int = 0        # chars before normalization
    link_chars: int = 0       # chars inside <a> subtrees
    n_tags: int = 0           # descendant tag count (for text_density)
    boiler_ctx: bool = False  # inside nav/header/footer/aside/form
    cls: str = "undecided"    # content | boilerplate | noise | undecided
    conf: float = 0.0         # confidence of the assigned cls (normalized
    #                           class-affinity score; reco.py:64-79 analogue)
    candidates: list = field(default_factory=list)  # [(cls, score)] desc —
    #                           the top-k candidate labels w/ confidences
    #                           (reco.py:41, tesstool.h:44-47)
    char_start: int = -1      # offset into assembled text (kept blocks only)
    char_end: int = -1

    @property
    def n_chars(self) -> int:
        return len(self.text)

    @property
    def link_density(self) -> float:
        return self.link_chars / self.raw_chars if self.raw_chars > 0 else 0.0

    @property
    def text_density(self) -> float:
        return self.n_chars / (1.0 + self.n_tags)


@dataclass
class ExtractResult:
    text: str = ""
    spans: list = field(default_factory=list)   # [(block_id, char_start, char_end, cls)]
    blocks: list = field(default_factory=list)  # all Blocks (classified)
    n_blocks: int = 0                           # kept blocks
    score: float = 0.0                          # kept_chars / total_chars
    flags: str = ""                             # 'truncated', 'empty', ...


# --------------------------------------------------------------------------
# stage 0 — decode cascade (deterministic; SURVEY §7 "what's hard" row 1)
# --------------------------------------------------------------------------

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


def decode_html(raw: bytes, cfg: KernelConfig = DEFAULT_CONFIG) -> tuple[str, str]:
    """BOM -> meta-charset scan (first 1024 bytes) -> utf-8, errors='replace'.

    Returns (decoded_text, flags).  Fixed cascade: byte-identical goldens
    require the same decode on every run and every executor.
    """
    flags = []
    if len(raw) > cfg.max_html_bytes:
        raw = raw[: cfg.max_html_bytes]
        flags.append("truncated")
    codec = None
    for bom, name in _BOMS:
        if raw.startswith(bom):
            codec = name
            break
    if codec is None:
        m = _META_CHARSET_RE.search(raw[: cfg.charset_sniff_bytes])
        if m:
            declared = m.group(1).decode("ascii", "replace").lower()
            try:
                b"x".decode(declared)
                codec = declared
            except (LookupError, UnicodeDecodeError):
                flags.append("bad_charset")
    if codec is None:
        codec = "utf-8"
    try:
        text = raw.decode(codec, errors="replace")
    except Exception:  # exotic codecs may still fail on truncated input
        text = raw.decode("utf-8", errors="replace")
        flags.append("decode_fallback")
    return text, ",".join(flags)


# --------------------------------------------------------------------------
# stage 1-2 — chrome strip (P1) + block segmentation (P2) via stdlib parser
# --------------------------------------------------------------------------

# subtrees whose text never reaches the output (P1 chrome strip —
# the graft of mask-out at preprocess.h:147-159)
_SKIP_TAGS = frozenset(
    """script style template noscript head title svg iframe object embed
    canvas video audio picture source map area form button select option
    optgroup datalist textarea input label""".split()
)

# boilerplate-context containers (tag-context feature for C1)
_BOILER_TAGS = frozenset("nav header footer aside".split())

# class/id keyword boilerplate context (r4, VERDICT r3 #10): semantic
# HTML stops at the four tags above, but real chrome lives in
# <div class="newsletter">, <div class="cookie-banner">, ... — the
# classic boilerpipe/jusText class-keyword signal.  An element whose
# class or id contains one of these TOKENS (split on non-alphanumerics,
# exact token match — 'shadow' never matches 'ad') extends boiler_ctx
# over its subtree exactly like a <nav>.  The token list is
# conservative: every word is a strong chrome marker; generic layout
# words (banner, hero, box) are deliberately absent because page titles
# live inside them.  Fixed the measured newsletter-CTA leak
# (tests/goldens/realistic_metrics.json) without touching any of the
# other 31 labeled pages.
_BOILER_CLASS_TOKENS = frozenset(
    """newsletter subscribe signup promo promotion advert advertisement
    adunit sponsored sponsor cookie cookies consent gdpr popup modal
    overlay social share sharing related recommended recommendations
    paywall breadcrumb breadcrumbs sidebar cta""".split()
)
# cheap containment pre-gate before attr tokenization (the fastparse
# hot path runs this on every attributed tag — keep it one regex)
_BOILER_HINT_RE = re.compile(
    r"newsletter|subscrib|signup|promo|advert|adunit|sponsor|cookie"
    r"|consent|gdpr|popup|modal|overlay|social|shar|related|recommend"
    r"|paywall|breadcrumb|sidebar|\bcta\b",
    re.IGNORECASE,
)
_TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")


def _has_boiler_class(class_id_values: list[str]) -> bool:
    for v in class_id_values:
        for tok in _TOKEN_SPLIT_RE.split(v.lower()):
            if tok in _BOILER_CLASS_TOKENS:
                return True
    return False


# heading tags: a heading belongs to the section that FOLLOWS it
# (W2 heading-affinity rule, r4)
_HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())

# tags that flush the current block (P2 candidate-region boundaries —
# graft of MSER candidate detection, preprocess.h:313-371)
_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li td th tr dt dd pre blockquote article
    section main figure figcaption table ul ol dl caption address hr
    details summary body center fieldset legend nav header footer
    aside""".split()
)

# void elements — never pushed on the open-tag stack
_VOID_TAGS = frozenset(
    "br img meta link hr input area base col embed source track wbr param".split()
)

_HIDDEN_STYLE_RE = re.compile(r"display\s*:\s*none|visibility\s*:\s*hidden")

# markup sniff: anything that could open a tag/comment/doctype.  A doc
# with NO such token is a text/plain payload (the C2 plain-text route);
# a bare '<' followed by space/digit (e.g. "a < b") does not count.
_TAG_LIKE_RE = re.compile(r"<[a-zA-Z!/?]")


class _Segmenter(HTMLParser):
    """One-pass DOM walk: chrome strip + candidate block emission.

    Lenient by construction: html.parser never raises on malformed
    markup; unmatched end tags are ignored, unclosed tags are popped
    lazily (graft of the clamp-to-page sanitation, preprocess.h:187-205).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)  # entity decode = F5/P6
        self.stack: list[str] = []
        self.skip_depth = 0      # >0 => inside a skipped subtree
        self.boiler_depth = 0    # >0 => inside nav/header/footer/aside
        self.link_depth = 0      # >0 => inside <a>
        self.blocks: list[Block] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._raw_chars = 0
        self._n_tags = 0
        self._cur_tag = "body"
        self._skip_marks: list[int] = []
        self._boiler_marks: list[int] = []

    # -- block flushing ----------------------------------------------------
    def _flush(self) -> None:
        if self._raw_chars == 0:
            self._parts.clear()
            self._n_tags = 0
            return
        raw = "".join(self._parts)
        b = Block(
            depth=len(self.stack),
            tag=self._cur_tag,
            text=raw,  # normalized later (P6)
            raw_chars=self._raw_chars,
            link_chars=self._link_chars,
            n_tags=self._n_tags,
            boiler_ctx=self.boiler_depth > 0,
        )
        self.blocks.append(b)
        self._parts.clear()
        self._link_chars = 0
        self._raw_chars = 0
        self._n_tags = 0

    # -- parser callbacks ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        hidden = False
        cls_vals: list[str] = []
        for k, v in attrs:
            if k == "hidden":
                hidden = True
            elif k == "style" and v and _HIDDEN_STYLE_RE.search(v.lower()):
                hidden = True
            elif k in ("class", "id") and v:
                cls_vals.append(v)
        boiler_cls = bool(cls_vals) and any(
            _BOILER_HINT_RE.search(v) for v in cls_vals
        ) and _has_boiler_class(cls_vals)
        if tag == "br":
            # P7 separator: a <br> inside a block is a soft split point
            # (blank-line sentinel; single source newlines are mere
            # whitespace and must NOT split — HTML semantics)
            self._parts.append("\n\n")
            return
        if tag in _VOID_TAGS:
            if self.skip_depth == 0:
                self._n_tags += 1
            return
        if tag in _BLOCK_TAGS and self.skip_depth == 0:
            self._flush()
            self._cur_tag = tag
        self.stack.append(tag)
        if tag in _SKIP_TAGS or hidden:
            self.skip_depth += 1
            # remember where the skip started so endtag can unwind it
            self._skip_marks.append(len(self.stack))
        elif self.skip_depth == 0:
            self._n_tags += 1
            if tag in _BOILER_TAGS:
                self.boiler_depth += 1
            elif boiler_cls:
                # class-keyword chrome container: same context effect as
                # nav/header/footer/aside, unwound via a depth mark
                # (the tag name alone can't identify it at pop time)
                self.boiler_depth += 1
                self._boiler_marks.append(len(self.stack))
            if tag == "a":
                self.link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in _VOID_TAGS:
            return
        if tag not in self.stack:
            return  # unmatched close: ignore (lenient)
        # pop lazily up to and including `tag`
        while self.stack:
            popped = self.stack.pop()
            marks = self._skip_marks
            if marks and marks[-1] == len(self.stack) + 1:
                marks.pop()
                self.skip_depth = max(0, self.skip_depth - 1)
            elif self.skip_depth == 0:
                # flush BEFORE unwinding boiler/link context: the block
                # closing here must carry the context it lived in
                if popped in _BLOCK_TAGS:
                    self._flush()
                    self._cur_tag = self.stack[-1] if self.stack else "body"
                if popped in _BOILER_TAGS:
                    self.boiler_depth = max(0, self.boiler_depth - 1)
                elif (
                    self._boiler_marks
                    and self._boiler_marks[-1] == len(self.stack) + 1
                ):
                    self._boiler_marks.pop()
                    self.boiler_depth = max(0, self.boiler_depth - 1)
                if popped == "a":
                    self.link_depth = max(0, self.link_depth - 1)
            if popped == tag:
                break

    def handle_data(self, data: str) -> None:
        if self.skip_depth > 0 or not data:
            return
        self._parts.append(data)
        stripped = len(data.strip())
        self._raw_chars += stripped
        if self.link_depth > 0:
            self._link_chars += stripped

    def handle_comment(self, data: str) -> None:  # comments stripped (P1)
        pass

    def close(self) -> None:
        super().close()
        self._flush()


_WS_RE = re.compile(r"\s+")
# split only at blank-line runs (zero-ink-run analogue, cut.h:234-245);
# a single newline is pretty-printing whitespace, not a separator
_BLANKLINE_RE = re.compile(r"\n[ \t]*\n\s*")


def _normalize(s: str) -> str:
    """P6 text normalization: NFC + whitespace collapse + trim.

    Graft of deskew/threshold line cleanup (preprocess.h:497-536);
    entity decode already done by the parser (convert_charrefs).
    """
    return _WS_RE.sub(" ", unicodedata.normalize("NFC", s)).strip()


# --------------------------------------------------------------------------
# stage 3 — intra-block split (P7) + bounded re-split (P8)
# --------------------------------------------------------------------------


def _split_block(b: Block, cfg: KernelConfig) -> list[Block]:
    """P7: split a raw block at separator runs (blank lines / <br> marks),
    the graft of zero-ink-run column splitting (cut.h:234-245)."""
    pieces = [p for p in _BLANKLINE_RE.split(b.text) if p.strip()]
    if len(pieces) <= 1:
        b.text = _normalize(b.text)
        return [b] if b.text else []
    out = []
    for p in pieces:
        t = _normalize(p)
        if not t:
            continue  # min-width guard analogue (cut.h:240)
        nb = Block(
            depth=b.depth, tag=b.tag,
            raw_chars=max(1, round(b.raw_chars * len(t) / max(1, b.n_chars))),
            link_chars=0 if b.link_chars == 0 else
            round(b.link_chars * len(t) / max(1, b.n_chars)),
            n_tags=b.n_tags, boiler_ctx=b.boiler_ctx, text=t,
        )
        out.append(nb)
    return out


def _resplit(text: str, limit: int, depth: int, cfg: KernelConfig) -> list[str]:
    """P8: recursive re-split of over-long segments with a rising
    threshold and a hard recursion bound (cut.h:256-315, bound cut.h:260).

    Splits at the weakest separator: sentence boundary nearest the middle,
    else the space nearest the middle.  Each split consumes exactly one
    separator char run, preserving the join-with-'\\n' reconstruction
    invariant used by the roundtrip oracle.
    """
    if depth >= cfg.max_resplit_depth or len(text) <= limit:
        return [text]
    mid = len(text) // 2
    cut_at = -1
    # prefer a sentence boundary '. ' near the middle (coarse mode, P3)
    best = None
    for m in re.finditer(r"\. ", text):
        pos = m.start() + 1  # the space index
        if 0 < pos < len(text) - 1:
            d = abs(pos - mid)
            if best is None or d < best[0]:
                best = (d, pos)
    if best is not None and best[0] <= len(text) // 4:
        cut_at = best[1]
    if cut_at < 0:  # fine mode: nearest space (MODE_SHORT, preprocess.h:282-305)
        left = text.rfind(" ", 0, mid)
        right = text.find(" ", mid)
        cands = [c for c in (left, right) if c > 0]
        if not cands:
            return [text]
        cut_at = min(cands, key=lambda c: (abs(c - mid), c))
    head, tail = text[:cut_at], text[cut_at + 1:]
    if not head or not tail:
        return [text]
    # rising threshold per recursion (cut.h:260-263: minCutPixes+1 per level)
    nxt = limit + max(1, limit // 10)
    return _resplit(head, nxt, depth + 1, cfg) + _resplit(tail, nxt, depth + 1, cfg)


# --------------------------------------------------------------------------
# stage 4 — per-doc standards (A1/A2) + rule cascade (F1/C1)
# --------------------------------------------------------------------------


def _doc_standard_len(blocks: list[Block], cfg: KernelConfig) -> float:
    """A2 filtered mean: mean block length excluding short/link-heavy
    blocks, with fallback to unfiltered mean when none qualify
    (cut.h:158-185 incl. the count==0 fallback at cut.h:178-184)."""
    good = [
        b.n_chars
        for b in blocks
        if b.n_chars >= cfg.filtered_mean_min_chars and b.link_density < cfg.max_link_density
    ]
    if good:
        return sum(good) / len(good)
    allb = [b.n_chars for b in blocks if b.n_chars > 0]
    return (sum(allb) / len(allb)) if allb else 0.0


def _classify(b: Block, std_len: float, cfg: KernelConfig) -> str:
    """C1 deterministic ordered rule cascade (cut.h:680-725) with the
    F1 vs-per-doc-standard predicate (cut.h:324-356)."""
    n = b.n_chars
    ld = b.link_density
    if n == 0:
        return "noise"
    if ld >= cfg.max_link_density:
        return "boilerplate"
    if b.boiler_ctx:
        # inside nav/header/footer/aside: only long, link-free text survives
        if ld > 0.0 or n < max(cfg.loose_content_chars, std_len):
            return "boilerplate"
        return "undecided"
    # F1: compare against per-doc standard (the meanHeight/meanWidth analogue)
    if n >= max(cfg.min_content_chars, cfg.std_ratio * std_len) and ld <= cfg.content_link_density:
        return "content"
    if n >= cfg.loose_content_chars and ld <= cfg.loose_link_density:
        return "content"
    if ld == 0.0 and n >= cfg.short_chars:
        return "content"
    if n < cfg.short_chars and ld == 0.0:
        return "undecided"
    return "boilerplate"


def _neighbor_relabel(blocks: list[Block], cfg: KernelConfig) -> None:
    """W2: an undecided block whose left or right neighbor is content is
    promoted, bounded promotions per document (cut.h:733-769, cap at
    cut.h:737,764-767).  Left-to-right scan = deterministic."""
    promos = 0
    for i, b in enumerate(blocks):
        if promos >= cfg.max_promotions:
            break
        if b.cls != "undecided":
            continue
        prev_c = i > 0 and blocks[i - 1].cls == "content"
        next_c = i + 1 < len(blocks) and blocks[i + 1].cls == "content"
        # min-substance guard: a 4-char table cell next to prose is not
        # content (the thin/flat-shape precondition of cut.h:764).
        # Exception (r4): a HEADING whose next block is content belongs
        # to that section regardless of its own length — 'Method' before
        # a recipe paragraph is content at 6 chars (the measured
        # short-heading drop, realistic_metrics.json); a heading whose
        # following block is chrome gets no such promotion, and neither
        # does one containing a digit ('part 3', 'Page 2' — the
        # digit-run refusal of cut.h:468-472, same guard as
        # _run_length_promote: generic enumeration headings are noise).
        substantial = b.n_chars >= 10 or (
            b.tag in _HEADING_TAGS
            and next_c
            and b.n_chars >= 2
            and not any(ch.isdigit() for ch in b.text)
        )
        # boiler-context blocks get NO single-block neighbor rescue: a
        # link-free promo sitting between two paragraphs is exactly the
        # shape this would wrongly promote (r4, promo_plaintext page).
        # A genuinely mis-contained article still recovers through the
        # multi-block run-length promotion, which requires >= min_run
        # consecutive blocks — isolated interstitials never have that.
        if (
            (prev_c or next_c)
            and b.link_density == 0.0
            and substantial
            and not b.boiler_ctx
        ):
            b.cls = "content"
            promos += 1


def _run_length_promote(blocks: list[Block], cfg: KernelConfig) -> None:
    """W3 gaps-and-islands: >= min_run consecutive undecided blocks with
    low link density collapse into content (cut.h:812-859; >=3 rule at
    cut.h:824)."""
    i = 0
    n = len(blocks)
    while i < n:
        if blocks[i].cls != "undecided" or blocks[i].link_density > cfg.run_link_density:
            i += 1
            continue
        j = i
        while (
            j < n
            and blocks[j].cls == "undecided"
            and blocks[j].link_density <= cfg.run_link_density
        ):
            j += 1
        if j - i >= cfg.min_run:
            total = sum(blocks[k].n_chars for k in range(i, j))
            mean = total / (j - i)
            # substance guards (the similar-and-short / digit-run refusal
            # of cut.h:468-472): a run of table cells or menu stubs has
            # high count but tiny mean length — not content
            if total >= cfg.loose_content_chars and mean >= cfg.short_chars:
                for k in range(i, j):
                    blocks[k].cls = "content"
        i = j


def _assign_confidence(b: Block, std_len: float, cfg: KernelConfig) -> None:
    """Set b.conf (normalized affinity of the ASSIGNED class) and
    b.candidates (all classes with scores, desc — the top-k candidate
    list of C2, reco.py:41).

    Deterministic class-affinity scores in [0,1] from the same features
    the rule cascade reads (reco.py:64-79, tesstool.h:44-47 analogue).
    Hot path (runs per block): flat locals, no dict/genexpr — profiled
    at 27% of kernel time in the naive form.
    """
    n = b.n_chars
    rc = b.raw_chars
    ld = (b.link_chars / rc) if rc > 0 else 0.0
    std = cfg.min_content_chars
    alt = cfg.std_ratio * std_len
    if alt > std:
        std = alt
    if std < 1.0:
        std = 1.0
    len_term = n / std
    if len_term > 1.0:
        len_term = 1.0
    link_term = 1.0 - ld / cfg.max_link_density
    if link_term < 0.0:
        link_term = 0.0
    s_content = len_term * link_term
    if b.boiler_ctx:
        s_content *= 0.35
    s_boiler = ld / cfg.max_link_density
    if s_boiler > 1.0:
        s_boiler = 1.0
    if b.boiler_ctx and s_boiler < 0.75:
        s_boiler = 0.75
    alt = 1.0 - n / cfg.loose_content_chars
    alt = 0.55 * alt if alt > 0.0 else 0.0
    if alt > s_boiler:
        s_boiler = alt
    if n == 0:
        s_noise = 1.0
    elif n < cfg.short_chars:
        s_noise = 0.5 * (cfg.short_chars - n) / cfg.short_chars
    else:
        s_noise = 0.0
    total = s_content + s_boiler + s_noise
    if total <= 0.0:
        nc = 1.0 if b.cls == "content" else 0.0
        nb = 1.0 if b.cls == "boilerplate" else 0.0
        nn = 1.0 if b.cls == "noise" else 0.0
    else:
        nc = s_content / total
        nb = s_boiler / total
        nn = s_noise / total
    cls = b.cls
    b.conf = round(nc if cls == "content" else nb if cls == "boilerplate" else nn, 4)
    cands = [("content", round(nc, 4)), ("boilerplate", round(nb, 4)), ("noise", round(nn, 4))]
    cands.sort(key=lambda kv: (-kv[1], kv[0]))
    b.candidates = cands


def _is_similar(a: Block, b: Block, cfg: KernelConfig) -> bool:
    """F2 similarity guard (cut.h:365-384): similar short blocks are list
    items — fusing them would glue a menu into fake content."""
    if a.n_chars == 0 or b.n_chars == 0:
        return False
    r = min(a.n_chars, b.n_chars) / max(a.n_chars, b.n_chars)
    return r >= cfg.similar_ratio and a.tag == b.tag


def _fuse(blocks: list[Block], std_len: float, cfg: KernelConfig) -> list[Block]:
    """P10 lookahead fusion (cut.h:400-497): fuse a short content block
    with following adjacent content blocks when the fused length passes
    the standard and the refusal guards don't fire (cut.h:458-479)."""
    out: list[Block] = []
    i = 0
    n = len(blocks)
    while i < n:
        b = blocks[i]
        if b.cls != "content":
            out.append(b)
            i += 1
            continue
        j = i + 1
        acc = b
        while (
            j < n
            and j - i <= cfg.max_fuse_lookahead
            and blocks[j].cls == "content"
            and blocks[j].block_id == blocks[j - 1].block_id + 1  # gap guard (cut.h:458)
            and acc.n_chars < cfg.loose_content_chars               # already-valid guard (cut.h:461)
            and not _is_similar(acc, blocks[j], cfg)                # similar-short guard (cut.h:468-472)
        ):
            fused = Block(
                block_id=acc.block_id,
                depth=min(acc.depth, blocks[j].depth),
                tag=acc.tag,
                text=acc.text + " " + blocks[j].text,
                raw_chars=acc.raw_chars + blocks[j].raw_chars,
                link_chars=acc.link_chars + blocks[j].link_chars,
                n_tags=acc.n_tags + blocks[j].n_tags,
                boiler_ctx=acc.boiler_ctx,
                cls="content",
            )
            _assign_confidence(fused, std_len, cfg)  # conf reflects fused features
            acc = fused
            j += 1
        out.append(acc)
        i = j if j > i + 1 else i + 1
    return out


def _absorb_low_conf(blocks: list[Block], cfg: KernelConfig) -> list[Block]:
    """C3 low-confidence merge (reco.py:159-192): a content block whose
    classifier confidence is below ``absorb_conf`` AND whose length is
    at most ``absorb_ratio`` of the preceding content block is absorbed
    into it — keyed on the per-block confidence (the refreshRegion
    score consumption, reco.py:167), not on raw length alone."""
    out: list[Block] = []
    for b in blocks:
        if (
            out
            and b.cls == "content"
            and out[-1].cls == "content"
            and b.conf < cfg.absorb_conf
            and b.n_chars <= cfg.absorb_ratio * out[-1].n_chars
        ):
            prev = out[-1]
            prev.text = prev.text + " " + b.text
            prev.raw_chars += b.raw_chars
            prev.link_chars += b.link_chars
            continue
        out.append(b)
    return out


# --------------------------------------------------------------------------
# stage 5 — ordered assembly (W7)
# --------------------------------------------------------------------------


def extract(html: bytes | str | None, cfg: KernelConfig = DEFAULT_CONFIG) -> ExtractResult:
    """The full per-document pipeline; never raises.

    Output invariants (SURVEY §5 item 1):
      * ``text`` is the '\\n'-join of kept blocks in document order
      * for every span s: ``text[s.char_start:s.char_end]`` == block text
      * spans sorted by char_start, non-overlapping, in-bounds
    """
    res = ExtractResult()
    if html is None:
        res.flags = "empty"
        return res
    if isinstance(html, str):
        html = html.encode("utf-8", "replace")
    if not html:
        res.flags = "empty"
        return res
    # content-type sniff: non-HTML payloads short-circuit before parsing.
    # PDF/layout parse is a dispatch seam like the reference's recognizer
    # dispatch (reco.py:94-148): route by magic, stub what the container
    # lacks libraries for (a real deployment plugs pdfminer/mupdf here).
    if html[:5] == b"%PDF-":
        res.flags = "pdf_unsupported"
        return res
    if html[:2] in (b"\x1f\x8b", b"PK"):  # gzip / zip containers
        res.flags = "binary_container"
        return res
    try:
        doc, flags = decode_html(html, cfg)
        res.flags = flags
        if _TAG_LIKE_RE.search(doc) is None and doc.strip():
            # plain-text passthrough (C2 dispatch seam, reco.py:94-148):
            # crawl tables carry text/plain payloads; one whole-doc block
            # enters the SAME split/classify/assemble pipeline below
            res.flags = (flags + "," if flags else "") + "plain_text"
            stripped = doc.strip()
            raw_blocks = [
                Block(
                    depth=0, tag="body", text=doc,
                    raw_chars=len(stripped), link_chars=0, n_tags=0,
                    boiler_ctx=False,
                )
            ]
        else:
            if cfg.fast_parse:
                from .fastparse import FastSegmenter

                seg = FastSegmenter()
            else:
                seg = _Segmenter()
            seg.feed(doc)
            seg.close()
            raw_blocks = seg.blocks

        # P7 split + P6 normalize
        blocks: list[Block] = []
        for b in raw_blocks:
            blocks.extend(_split_block(b, cfg))

        # P4 sanitation: drop empty/whitespace-only (already handled), clamp
        blocks = [b for b in blocks if b.n_chars > 0]

        # A1/A2 per-doc standards
        std_len = _doc_standard_len(blocks, cfg)

        # P8 bounded re-split of over-long blocks
        limit = int(
            min(
                max(cfg.resplit_min_chars, cfg.resplit_factor * max(std_len, 1.0)),
                cfg.resplit_max_chars,
            )
        )
        resplit: list[Block] = []
        for b in blocks:
            if b.n_chars > limit and " " in b.text:
                for piece in _resplit(b.text, limit, 0, cfg):
                    nb = Block(
                        depth=b.depth, tag=b.tag, text=piece,
                        raw_chars=max(1, round(b.raw_chars * len(piece) / b.n_chars)),
                        link_chars=0 if b.link_chars == 0 else
                        round(b.link_chars * len(piece) / b.n_chars),
                        n_tags=b.n_tags, boiler_ctx=b.boiler_ctx,
                    )
                    resplit.append(nb)
            else:
                resplit.append(b)
        blocks = resplit

        # W1 document-order numbering (reading-order index analogue)
        for i, b in enumerate(blocks):
            b.block_id = i

        # C1/F1 classify
        for b in blocks:
            b.cls = _classify(b, std_len, cfg)

        # W2 neighbor relabel, W3 run-length promotion
        _neighbor_relabel(blocks, cfg)
        _run_length_promote(blocks, cfg)

        # leftover undecided => boilerplate (noise lines dropped, cut.h:697)
        for b in blocks:
            if b.cls == "undecided":
                b.cls = "boilerplate"

        # per-block confidence + candidate labels for the FINAL class
        # (after promotions, so conf reflects what the doc-level rules
        # actually decided)
        for b in blocks:
            _assign_confidence(b, std_len, cfg)

        res.blocks = list(blocks)

        # P10 fusion + C3 low-confidence absorb operate on the kept sequence
        fused = _fuse(blocks, std_len, cfg)
        fused = _absorb_low_conf(fused, cfg)

        # W7 ordered assembly with char-span offsets
        kept = [b for b in fused if b.cls == "content" and b.n_chars > 0]
        parts: list[str] = []
        spans: list[tuple[int, int, int, str]] = []
        pos = 0
        for b in kept:
            if parts:
                pos += 1  # the '\n' separator
            start = pos
            parts.append(b.text)
            pos += b.n_chars
            spans.append((b.block_id, start, pos, b.cls))
        res.text = "\n".join(parts)
        res.spans = spans
        res.n_blocks = len(kept)
        # score from PRE-fusion blocks: fusion adds separator chars to the
        # fused text, which must not inflate the keep ratio past 1.0
        total = sum(b.n_chars for b in blocks)
        kept_chars = sum(b.n_chars for b in blocks if b.cls == "content")
        res.score = (kept_chars / total) if total else 0.0
        return res
    except Exception as e:  # absolute backstop: never fail a partition
        res.flags = (res.flags + "," if res.flags else "") + "error:" + type(e).__name__
        res.text = ""
        res.spans = []
        res.n_blocks = 0
        res.score = 0.0
        return res
