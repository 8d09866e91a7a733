"""fit_markdown/fit_html differential contract: the kernel's
PruningContentFilter and BM25ContentFilter vs an INDEPENDENT simulator of
the reference's filter logic.

The reference filters (content_filter_strategy.py:381-777) need
bs4+lxml+snowballstemmer, none of which ship in this container, so their
output cannot be captured directly (same situation the scraper contract
documents in scripts/make_scraper_fixtures.py). Instead this module
re-implements the reference algorithms a SECOND time, from the reference
source, with deliberately different code shape:

  * metrics recomputed recursively per node (the reference's own O(n^2)
    get_text/encode_contents pattern) vs the kernel's memoized single pass;
  * its own serializer for tag_len / output (same documented byte
    convention: html.escape text, quoted attrs, <void/>);
  * its own chunk walk, BM25 implementation and query extraction.

Shared by declaration (a convention, not filter logic): the DOM parse
(kernel parse_html — parsing dialect is already pinned by the scraper/
markdown byte contracts) and, in the stemming cases, the Porter2 stemmer
(kernel/porter2.py implements the published snowball-English algorithm;
the snowball C implementation itself is the external seam — the
no-stemming cases below are stemmer-independent, matching the reference's
use_stemming=False flag).

Inputs: the 22 reference-authored full pages (ref_markdown_pages.json.gz),
a pruning-sensitive construct set, and seeded well-formed fuzz pages.
Comparison is exact on the returned block lists.
"""

from __future__ import annotations

import gzip
import json
import math
import os
import random
import re
from collections import Counter

import pytest

from crawl4ai_custom_spark.kernel.content_filter import (
    BM25ContentFilter,
    PruningContentFilter,
)
from crawl4ai_custom_spark.kernel.htmldom import (
    VOID_TAGS,
    Comment,
    Node,
    parse_html,
)
from crawl4ai_custom_spark.kernel.porter2 import porter2_stem

_DIR = os.path.dirname(os.path.abspath(__file__))

# ---------------------------------------------------------------------------
# independent simulator
# ---------------------------------------------------------------------------

_SIM_EXCLUDED = {"nav", "footer", "header", "aside", "script", "style",
                 "form", "iframe", "noscript"}
_SIM_NEG = re.compile(
    r"nav|footer|header|sidebar|ads|comment|promo|advert|social|share", re.I)
_SIM_TAG_W = {"div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0,
              "span": 0.3, "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2,
              "h2": 1.1, "h3": 1.0, "h4": 0.9, "h5": 0.8, "h6": 0.7}
_SIM_TAG_IMP = {"article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2,
                "h1": 1.4, "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6}


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    # kernel convention: html.escape(quote=True) — both quote chars escaped
    return _esc_text(s).replace('"', "&quot;").replace("'", "&#x27;")


def _sim_outer(n) -> str:
    if isinstance(n, str):
        return _esc_text(n)
    if isinstance(n, Comment):
        return "<!--" + n.data + "-->"
    open_tag = "<" + n.tag + "".join(
        ' %s="%s"' % (k, _esc_attr(v)) for k, v in n.attrs.items())
    if n.tag in VOID_TAGS:
        return open_tag + "/>"
    return open_tag + ">" + _sim_inner(n) + "</" + n.tag + ">"


def _sim_inner(n) -> str:
    return "".join(_sim_outer(c) for c in n.children)


def _sim_get_text_strip(n) -> str:
    """bs4 get_text(strip=True): stripped strings, '' separator."""
    if isinstance(n, str):
        return n.strip()
    if isinstance(n, Comment):
        return ""
    return "".join(_sim_get_text_strip(c) for c in n.children)


def _sim_get_text_raw(n) -> str:
    if isinstance(n, str):
        return n
    if isinstance(n, Comment):
        return ""
    return "".join(_sim_get_text_raw(c) for c in n.children)


def _sim_strip_comments_and_excluded(n: Node) -> None:
    n.children[:] = [
        c for c in n.children
        if not isinstance(c, Comment)
        and not (isinstance(c, Node) and c.tag in _SIM_EXCLUDED)
    ]
    for c in n.children:
        if isinstance(c, Node):
            _sim_strip_comments_and_excluded(c)


def _sim_score(n: Node, min_words: int | None) -> float:
    text = _sim_get_text_strip(n)
    text_len = len(text)
    tag_len = len(_sim_inner(n))
    link_text_len = 0
    for c in n.children:
        if isinstance(c, Node) and c.tag == "a":
            if len(c.children) == 1 and isinstance(c.children[0], str):
                link_text_len += len(c.children[0].strip())
    if min_words and text.count(" ") + 1 < min_words:
        return -1.0
    score = 0.4 * (text_len / tag_len if tag_len > 0 else 0.0)
    score += 0.2 * (1 - (link_text_len / text_len if text_len > 0 else 0.0))
    score += 0.2 * _SIM_TAG_W.get(n.tag, 0.5)
    cid = 0.0
    if n.get("class") is not None and _SIM_NEG.match(n.get("class")):
        cid -= 0.5
    if n.get("id") is not None and _SIM_NEG.match(n.get("id")):
        cid -= 0.5
    score += 0.1 * max(0.0, cid)
    score += 0.1 * math.log(text_len + 1)
    return score / 1.0


def _sim_prune(n: Node, threshold: float, ttype: str,
               min_words: int | None) -> bool:
    """True => node removes itself."""
    score = _sim_score(n, min_words)
    if ttype == "fixed":
        remove = score < threshold
    else:
        text_len = len(_sim_get_text_strip(n))
        tag_len = len(_sim_inner(n))
        ltl = 0
        for c in n.children:
            if isinstance(c, Node) and c.tag == "a":
                if len(c.children) == 1 and isinstance(c.children[0], str):
                    ltl += len(c.children[0].strip())
        thr = threshold
        if _SIM_TAG_IMP.get(n.tag, 0.7) > 1:
            thr *= 0.8
        if (text_len / tag_len if tag_len > 0 else 0.0) > 0.4:
            thr *= 0.9
        if (ltl / text_len if text_len > 0 else 1.0) > 0.6:
            thr *= 1.2
        remove = score < thr
    if remove:
        return True
    n.children[:] = [
        c for c in n.children
        if not (isinstance(c, Node) and _sim_prune(c, threshold, ttype, min_words))
    ]
    return False


def sim_prune_filter(html: str, threshold: float = 0.48,
                     threshold_type: str = "fixed",
                     min_words: int | None = None) -> list[str]:
    root = parse_html(html)
    _sim_strip_comments_and_excluded(root)
    body = root.find("body") or root
    if _sim_prune(body, threshold, threshold_type, min_words):
        return []
    return [
        _sim_outer(c) for c in body.children
        if isinstance(c, Node) and len(_sim_get_text_strip(c)) > 0
    ]


# ---- BM25 side -------------------------------------------------------------

_SIM_NOISE = {"ccp", "up", "↑", "▲", "⬆️", "a", "an", "at", "by", "in",
              "of", "on", "to", "the"}
_SIM_STOP = set("""a an and are as at be by for from has he in is it its of
on that the to was were will with i you she we they me him her us them my
your his our their mine yours hers ours theirs myself yourself himself
herself itself ourselves themselves am been being have had having do does
did doing about above across after against along among around before behind
below beneath beside between beyond down during except inside into near off
out outside over past through toward under underneath until up upon within
but or nor yet so although because since unless this these those what which
who whom whose when where why how all any both each few more most other some
such can cannot can't could couldn't may might must mustn't shall should
shouldn't will won't would wouldn't not n't no none""".split())

_SIM_INLINE = {"a", "abbr", "acronym", "b", "bdo", "big", "br", "button",
               "cite", "code", "dfn", "em", "i", "img", "input", "kbd",
               "label", "map", "object", "q", "samp", "script", "select",
               "small", "span", "strong", "sub", "sup", "textarea", "time",
               "tt", "var"}
_SIM_HEADERS = {"h1", "h2", "h3", "h4", "h5", "h6", "header"}
_SIM_PRIORITY = {"h1": 5.0, "h2": 4.0, "h3": 3.0, "title": 4.0,
                 "strong": 2.0, "b": 1.5, "em": 1.5, "blockquote": 2.0,
                 "code": 2.0, "pre": 1.5, "th": 1.5}


def _sim_clean_tokens(toks: list[str]) -> list[str]:
    return [t for t in toks
            if len(t) > 2 and t not in _SIM_NOISE and t not in _SIM_STOP
            and not t.startswith(("↑", "▲", "⬆"))]


def _sim_chunks(body: Node) -> list[tuple[int, str, str, Node]]:
    chunks, cur, idx = [], [], 0
    stack = [(body, False)]
    while stack:
        el, visited = stack.pop()
        if visited:
            if cur and el.tag not in _SIM_INLINE:
                text = " ".join("".join(cur).split())
                if text:
                    chunks.append((idx, text,
                                   "header" if el.tag in _SIM_HEADERS
                                   else "content", el))
                    idx += 1
                cur = []
            continue
        if isinstance(el, str):
            if el.strip():
                cur.append(el.strip())
            continue
        if isinstance(el, Comment):
            if el.data.strip():
                cur.append(el.data.strip())
            continue
        if not el.children:
            continue
        stack.append((el, True))
        for c in reversed(el.children):
            stack.append((c, False))
    if cur:
        text = " ".join("".join(cur).split())
        if text:
            chunks.append((idx, text, "content", body))
    return chunks


def _sim_bm25_scores(corpus: list[list[str]], query: list[str]) -> list[float]:
    n = len(corpus)
    tfs = [Counter(d) for d in corpus]
    dls = [len(d) for d in corpus]
    avgdl = sum(dls) / n if n else 0.0
    df = Counter()
    for tf in tfs:
        df.update(tf.keys())
    idf, neg, tot = {}, [], 0.0
    for w, d in df.items():
        v = math.log(n - d + 0.5) - math.log(d + 0.5)
        idf[w] = v
        tot += v
        if v < 0:
            neg.append(w)
    eps = 0.25 * (tot / len(idf)) if idf else 0.0
    for w in neg:
        idf[w] = eps
    out = []
    for tf, dl in zip(tfs, dls):
        s = 0.0
        if avgdl > 0:
            norm = 1.5 * (1 - 0.75 + 0.75 * dl / avgdl)
            for q in query:
                f = tf.get(q, 0)
                if f:
                    s += idf.get(q, 0.0) * f * 2.5 / (f + norm)
        out.append(s)
    return out


def _sim_clean_element(tag) -> str:
    unwanted_t = {"script", "style", "aside", "form", "iframe", "noscript"}
    unwanted_a = {"style", "onclick", "onmouseover", "align", "bgcolor",
                  "class", "id"}
    out = []

    def render(el):
        if isinstance(el, str):
            out.append(_esc_text(el.strip()))
            return
        if isinstance(el, Comment):
            out.append(_esc_text(el.data.strip()))
            return
        if el.tag in unwanted_t:
            return
        out.append("<" + el.tag)
        for k, v in el.attrs.items():
            if k not in unwanted_a:
                out.append(' %s="%s"' % (k, _esc_attr(v)))
        if el.tag in VOID_TAGS:
            out.append("/>")
            return
        out.append(">")
        for c in el.children:
            render(c)
        out.append("</" + el.tag + ">")

    render(tag)
    return "".join(out)


def sim_bm25_filter(html: str, user_query: str | None = None,
                    threshold: float = 1.0,
                    use_stemming: bool = False) -> list[str]:
    root = parse_html(html)
    body = root.find("body") or root

    query = user_query
    if not query:
        parts = []
        t = root.find("title")
        if t is not None and len(t.children) == 1 \
                and isinstance(t.children[0], str):
            parts.append(t.children[0])
        h1 = root.find("h1")
        if h1 is not None:
            parts.append(_sim_get_text_raw(h1))
        temp = ""
        for mn in ("keywords", "description"):
            meta = next((m for m in root.iter("meta")
                         if (m.get("name") or "") == mn), None)
            if meta is not None and meta.get("content"):
                parts.append(meta.get("content"))
                temp += meta.get("content")
        if not temp:
            for p in body.iter("p"):
                t = _sim_get_text_raw(p)
                if len(t) > 150:
                    parts.append(t[:150])
                    break
        query = " ".join(p for p in parts if p)
    if not query:
        return []

    cands = _sim_chunks(body)
    if not cands:
        return []

    def toks(s):
        t = s.lower().split()
        if use_stemming:
            t = [porter2_stem(x) for x in t]
        return _sim_clean_tokens(t)

    scores = _sim_bm25_scores([toks(c[1]) for c in cands], toks(query))
    sel = [(i, tag) for s, (i, _t, _tt, tag) in zip(scores, cands)
           if s * _SIM_PRIORITY.get(tag.tag, 1.0) >= threshold]
    sel.sort(key=lambda x: x[0])
    return [_sim_clean_element(tag) for _i, tag in sel]


# ---------------------------------------------------------------------------
# inputs
# ---------------------------------------------------------------------------

CONSTRUCTS = {
    "article_vs_nav": (
        '<html><body><nav class="nav"><a href="/a">Home</a><a href="/b">About'
        '</a><a href="/c">Shop</a></nav><article><h1>Deep Dive</h1><p>'
        'A long and meaningful paragraph about distributed query engines, '
        'shuffles, partitions, and the gentle art of predicate pushdown in '
        'columnar scans across very large tables.</p></article>'
        '<footer>Copyright 2026 Example Corp</footer></body></html>'),
    "link_farm": (
        '<html><body><div><a href="/1">one</a> <a href="/2">two</a> '
        '<a href="/3">three</a> <a href="/4">four</a></div>'
        '<div><p>Actual content with enough words to make the text length '
        'factor push this well past the pruning threshold for sure, plus '
        'more words for good measure and even more.</p></div></body></html>'),
    "sidebar_classes": (
        '<html><body><div class="sidebar-widget"><span>ad</span></div>'
        '<div class="content-main"><p>Primary content paragraph that keeps '
        'going for long enough to be retained by any sane content filter '
        'implementation, really quite long indeed.</p></div></body></html>'),
    "nested_sections": (
        '<html><body><section><h2>Top</h2><section><h3>Inner</h3><p>Nested '
        'sections with text spread across levels so pruning decisions '
        'cascade down the tree as the recursion proceeds deeper and deeper '
        'into the page structure.</p></section></section></body></html>'),
    "anchor_string_quirk": (
        '<html><body><div><a href="/x">plain text anchor</a>'
        '<a href="/y"><b>bold anchor ignored by a.string</b></a>'
        '<p>Sibling paragraph with a healthy amount of plain words to '
        'balance the link density computation here and make it long.</p>'
        '</div></body></html>'),
    "comments_and_pre": (
        '<html><body><!-- a comment --><pre>code block   with   spaces'
        '</pre><p>Paragraph following a preformatted block, also long '
        'enough to survive the composite score threshold comfortably with '
        'extra words.</p></body></html>'),
    "table_page": (
        '<html><head><title>Spec Table</title></head><body><table><thead>'
        '<tr><th>Key</th><th>Value</th></tr></thead><tbody><tr><td>weight'
        '</td><td>10kg</td></tr><tr><td>height</td><td>30cm</td></tr>'
        '</tbody></table><p>Accompanying prose describing the table in '
        'enough words to stay above the pruning threshold for this test '
        'case obviously.</p></body></html>'),
    "short_spans": (
        '<html><body><span>hi</span><div><span>tiny</span></div>'
        '<p>The one real paragraph of this page, containing the meaningful '
        'words a content filter is supposed to keep around for downstream '
        'markdown conversion.</p></body></html>'),
    "no_body_fragment": (
        '<p>Bare fragment paragraph, long enough to clear thresholds, used '
        'to exercise the missing-body wrap path of both filters with many '
        'extra words to be safe.</p>'),
    "bm25_query_page": (
        '<html><head><title>Widget Catalog</title><meta name="description" '
        'content="widgets and gadget accessories"></head><body>'
        '<h1>Widget Catalog</h1><p>This widget is the finest widget among '
        'all widgets, a widget for widget lovers.</p><p>Unrelated prose '
        'about weather patterns and migratory birds flying south in '
        'winter.</p><blockquote>widget praise quote</blockquote>'
        '</body></html>'),
}


_WORDS = ("spark shuffle partition column row join filter scan predicate "
          "vector batch arrow codegen stage task executor driver memory "
          "disk network broadcast hash sort merge skew salt bucket").split()


def _fuzz_page(seed: int) -> str:
    rng = random.Random(seed)

    def words(n):
        return " ".join(rng.choice(_WORDS) for _ in range(n))

    blocks = []
    for _ in range(rng.randint(3, 8)):
        kind = rng.randrange(6)
        if kind == 0:
            blocks.append("<p>%s</p>" % words(rng.randint(3, 60)))
        elif kind == 1:
            links = "".join('<a href="/l%d">%s</a>' % (i, words(rng.randint(1, 3)))
                            for i in range(rng.randint(2, 6)))
            blocks.append('<div class="%s">%s</div>'
                          % (rng.choice(["nav-box", "content", "menu", "main"]),
                             links))
        elif kind == 2:
            blocks.append("<h2>%s</h2>" % words(rng.randint(1, 5)))
        elif kind == 3:
            items = "".join("<li>%s</li>" % words(rng.randint(1, 8))
                            for _ in range(rng.randint(2, 5)))
            blocks.append("<ul>%s</ul>" % items)
        elif kind == 4:
            blocks.append('<section><h3>%s</h3><p>%s</p></section>'
                          % (words(2), words(rng.randint(10, 40))))
        else:
            blocks.append("<blockquote>%s</blockquote>" % words(rng.randint(2, 10)))
    title = words(3)
    return ('<html><head><title>%s</title></head><body>%s</body></html>'
            % (title, "".join(blocks)))


def _pages() -> list[tuple[str, str]]:
    with gzip.open(os.path.join(_DIR, "fixtures",
                                "ref_markdown_pages.json.gz"), "rt") as f:
        full = json.load(f)
    cases = [(name, rec["html"]) for name, rec in sorted(full.items())]
    cases += sorted(CONSTRUCTS.items())
    cases += [("fuzz_%02d" % i, _fuzz_page(20260818 + i)) for i in range(20)]
    return cases


# ---------------------------------------------------------------------------
# the contracts
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,html", _pages(), ids=[n for n, _ in _pages()])
def test_pruning_fixed_matches_independent_sim(name, html):
    ours = PruningContentFilter().filter_content(html)
    sim = sim_prune_filter(html)
    assert ours == sim


@pytest.mark.parametrize("name,html", _pages(), ids=[n for n, _ in _pages()])
def test_pruning_dynamic_matches_independent_sim(name, html):
    ours = PruningContentFilter(threshold_type="dynamic",
                                threshold=0.45).filter_content(html)
    sim = sim_prune_filter(html, threshold=0.45, threshold_type="dynamic")
    assert ours == sim


@pytest.mark.parametrize("name,html", _pages(), ids=[n for n, _ in _pages()])
def test_pruning_min_words_matches_independent_sim(name, html):
    ours = PruningContentFilter(min_word_threshold=8).filter_content(html)
    sim = sim_prune_filter(html, min_words=8)
    assert ours == sim


@pytest.mark.parametrize("name,html", _pages(), ids=[n for n, _ in _pages()])
def test_bm25_no_stemming_matches_independent_sim(name, html):
    ours = BM25ContentFilter(use_stemming=False).filter_content(html)
    sim = sim_bm25_filter(html, use_stemming=False)
    assert ours == sim


@pytest.mark.parametrize("name,html", _pages(), ids=[n for n, _ in _pages()])
def test_bm25_stemming_and_query_matches_independent_sim(name, html):
    ours = BM25ContentFilter(user_query="spark widget shuffle",
                             use_stemming=True).filter_content(html)
    sim = sim_bm25_filter(html, user_query="spark widget shuffle",
                          use_stemming=True)
    assert ours == sim
