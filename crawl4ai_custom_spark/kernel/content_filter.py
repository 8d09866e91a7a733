"""Fit-markdown content filters: Pruning and BM25.

Capability parity with the reference's PruningContentFilter
(/root/reference/crawl4ai/content_filter_strategy.py:533-777) and
BM25ContentFilter (:381-530), re-derived on our DOM:

PruningContentFilter — recursive composite-score prune over the cleaned body:
  score = 0.4*text_density + 0.2*(1-link_density) + 0.2*tag_weight
        + 0.1*class_id_weight + 0.1*text_length_factor
  nodes scoring below the threshold (default 0.48) are dropped bottom-up;
  survivors re-serialize as fit_html.

BM25ContentFilter — page query from title/h1/meta-description (fallback:
first paragraph > 150 chars); block-level text chunks in document order;
BM25 over the page's own chunk corpus; chunks with score*tag_weight >=
threshold survive, re-emitted in document order.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .htmldom import Node, body_of, parse_html
from .textproc import BM25, clean_tokens

_TAG_WEIGHTS = {
    "article": 1.0, "main": 1.0, "section": 0.9, "p": 0.9, "pre": 0.9,
    "blockquote": 0.85, "td": 0.8, "h1": 0.9, "h2": 0.85, "h3": 0.8,
    "h4": 0.75, "h5": 0.7, "h6": 0.7, "li": 0.6, "div": 0.5, "span": 0.4,
    "table": 0.8, "ul": 0.5, "ol": 0.5,
    "aside": 0.1, "nav": 0.0, "footer": 0.0, "header": 0.1, "form": 0.1,
}
_NEG_CLASS_HINTS = (
    "sidebar", "nav", "menu", "footer", "header", "ad", "ads", "advert",
    "promo", "social", "share", "comment", "widget", "banner", "cookie",
    "popup", "related", "breadcrumb",
)
_POS_CLASS_HINTS = ("content", "article", "main", "body", "post", "text", "story")

_CHUNK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li pre blockquote td caption figcaption".split()
)
_BM25_TAG_WEIGHTS = {
    "h1": 5.0, "h2": 4.0, "h3": 3.0, "h4": 2.5, "h5": 2.0, "h6": 2.0,
    "p": 1.0, "li": 0.8, "pre": 1.2, "blockquote": 1.2, "td": 0.9,
    "caption": 1.5, "figcaption": 1.2,
}


def _class_id_weight(n: Node) -> float:
    blob = " ".join(n.classes + [n.get("id") or ""]).lower()
    w = 0.0
    if any(h in blob for h in _NEG_CLASS_HINTS):
        w -= 0.5
    if any(h in blob for h in _POS_CLASS_HINTS):
        w += 0.5
    return max(-1.0, min(1.0, w))


def _link_text_len(n: Node) -> int:
    return sum(len(a.text()) for a in n.iter("a"))


@dataclass
class PruningContentFilter:
    threshold: float = 0.48
    min_word_threshold: int = 2

    # one bottom-up pass memoizes (text_len, link_text_len, html_len, words,
    # has_img) per node — scoring then is O(1) per node instead of a full
    # subtree walk (the filter was the kernel's hottest path)
    def _measure(self, n: Node, memo: dict, in_link: bool = False) -> tuple:
        tlen = ltlen = words = 0
        hlen = 2 + len(n.tag)  # '<tag'
        for k, v in n.attrs.items():
            hlen += 4 + len(k) + len(v)
        has_img = n.tag == "img"
        is_link = in_link or n.tag == "a"
        for c in n.children:
            if isinstance(c, str):
                t = len(c.strip())
                tlen += t
                words += len(c.split())
                hlen += len(c)
                if is_link:
                    ltlen += t
            elif isinstance(c, Node):
                ct, cl, ch, cw, ci = self._measure(c, memo, is_link)
                tlen += ct
                ltlen += cl if not is_link else ct
                hlen += ch
                words += cw
                has_img = has_img or ci
        hlen += 3 + len(n.tag)  # '</tag>'
        memo[id(n)] = (tlen, ltlen, hlen, words, has_img)
        return memo[id(n)]

    def score(self, n: Node, memo: dict | None = None) -> float:
        if memo is None or id(n) not in memo:
            memo = {}
            self._measure(n, memo)
        tlen, ltlen, hlen, _w, _i = memo[id(n)]
        text_density = min(1.0, 3.0 * tlen / max(1, hlen))
        link_density = min(1.0, ltlen / max(1, tlen))
        tag_w = _TAG_WEIGHTS.get(n.tag, 0.5)
        cid_w = _class_id_weight(n)
        tl_factor = min(1.0, math.log1p(tlen) / 8.0)
        return (
            0.3 * text_density
            + 0.2 * (1.0 - link_density)
            + 0.3 * tag_w
            + 0.1 * cid_w
            + 0.1 * tl_factor
        )

    def _prune(self, n: Node, memo: dict | None = None) -> None:
        if memo is None:
            memo = {}
            self._measure(n, memo)
        for c in list(n.children):
            if not isinstance(c, Node):
                continue
            if c.tag in ("img", "br", "hr", "table"):
                continue
            _t, _l, _h, words, has_img = memo[id(c)]
            if words < self.min_word_threshold and not has_img:
                c.detach()
                continue
            if self.score(c, memo) < self.threshold:
                c.detach()
                continue
            self._prune(c, memo)

    def filter_content(self, html: str | Node) -> str:
        """Returns fit_html (surviving fragments of the body)."""
        root = html if isinstance(html, Node) else parse_html(html)
        body = body_of(root)
        self._prune(body)
        return body.inner_html() if body.tag in ("body", "#root") else body.to_html()


@dataclass
class BM25ContentFilter:
    threshold: float = 1.0
    user_query: str | None = None

    def _page_query(self, root: Node) -> str:
        if self.user_query:
            return self.user_query
        parts: list[str] = []
        t = root.find("title")
        if t is not None:
            parts.append(t.text())
        h1 = root.find("h1")
        if h1 is not None:
            parts.append(h1.text())
        for m in root.iter("meta"):
            if (m.get("name") or "").lower() in ("description", "keywords"):
                parts.append(m.get("content") or "")
        q = " ".join(p for p in parts if p).strip()
        if not q:
            for p in root.iter("p"):
                txt = p.text()
                if len(txt) > 150:
                    return txt[:300]
        return q

    def filter_content(self, html: str | Node) -> str:
        root = html if isinstance(html, Node) else parse_html(html)
        query = clean_tokens(self._page_query(root))
        if not query:
            return ""
        body = body_of(root)
        chunks: list[tuple[Node, list[str], float]] = []
        for n in body.iter():
            if n.tag in _CHUNK_TAGS:
                toks = clean_tokens(n.text())
                if toks:
                    chunks.append((n, toks, _BM25_TAG_WEIGHTS.get(n.tag, 1.0)))
        if not chunks:
            return ""
        bm = BM25([c[1] for c in chunks])
        scores = bm.scores(query)
        survivors = [
            node.to_html()
            for (node, _toks, w), s in zip(chunks, scores)
            if s * w >= self.threshold
        ]
        return "\n".join(survivors)
