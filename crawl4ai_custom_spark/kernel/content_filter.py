"""Fit-markdown content filters: reference-exact Pruning and BM25.

Semantics re-derived line-by-line (no code copied) from the reference's
PruningContentFilter (/root/reference/crawl4ai/content_filter_strategy.py:
533-777), BM25ContentFilter (:381-530) and the shared base helpers
(:33-380): `filter_content(html) -> list[str]` of surviving block
fragments; the markdown generator wraps each in `<div>` and joins with
newlines (markdown_generation_strategy.py:235-239) to form fit_html /
fit_markdown.

The ONE deliberate deviation is dialect: metric lengths and output use
this kernel's DOM + serializer (htmldom) instead of bs4(lxml), which this
environment does not ship — the same caveat documented in schemaprep. The
differential contract (tests/test_fit_differential.py) therefore compares
against an INDEPENDENT stdlib re-implementation of the reference logic
over its own DOM, not captured reference bytes.

Reference quirks preserved faithfully because they change output:
  * pruning's class/id weight is ``0.1 * max(0, score)`` with score <= 0
    always, so it NEVER contributes — but its 0.1 stays in total_weight;
  * ``negative_patterns.match`` (prefix match, not search) in the pruning
    class/id scorer;
  * text_len concatenates per-string ``.strip()`` results with NO
    separator (bs4 ``get_text(strip=True)``), so words fuse across tags;
  * ``link_text_len`` counts only DIRECT ``<a>`` children whose sole child
    is a text node (bs4 ``a.string``);
  * the BODY node itself is scored first — a failing body prunes the page;
  * pruning's ``min_word_threshold`` counts words as ``text.count(' ')+1``
    over the fused text;
  * BM25 chunk text is ``' '.join(''.join(stripped_parts).split())`` —
    again the fused-concatenation quirk;
  * BM25 tokenization is plain ``lower().split()`` (punctuation attached)
    followed by the reference's clean_tokens (len>2, exact-match stopword
    list, arrow-prefix strips);
  * BM25 idf is the rank_bm25 "Okapi" variant: ln((N-df+.5)/(df+.5)) with
    negative idfs floored to ``epsilon * average_idf``;
  * comments count as text in the BM25 chunk walk and in clean_element
    (bs4's Comment is a NavigableString/str subclass), while pruning
    removes them up front.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass, field

from .htmldom import VOID_TAGS, Comment, Node, body_of, parse_html
from .porter2 import porter2_stem

EXCLUDED_TAGS = frozenset(
    "nav footer header aside script style form iframe noscript".split()
)
NEGATIVE_PATTERNS = re.compile(
    r"nav|footer|header|sidebar|ads|comment|promo|advert|social|share", re.I
)

# ---------------------------------------------------------------------------
# shared text metrics (bs4-get_text(strip=True) equivalents)
# ---------------------------------------------------------------------------


def fused_text(n: Node) -> str:
    """Concatenated stripped descendant strings, NO separator — the exact
    shape of bs4 ``get_text(strip=True)`` that all reference metrics use."""
    parts: list[str] = []

    def walk(node: Node) -> None:
        for c in node.children:
            if c.__class__ is str:
                s = c.strip()
                if s:
                    parts.append(s)
            elif c.__class__ is Node:
                walk(c)

    walk(n)
    return "".join(parts)


def _remove_comments(n: Node) -> None:
    for c in list(n.children):
        if c.__class__ is Comment:
            n.children.remove(c)
        elif c.__class__ is Node:
            _remove_comments(c)


def _remove_excluded(n: Node, tags: frozenset[str] = EXCLUDED_TAGS) -> None:
    for c in list(n.children):
        if c.__class__ is Node:
            if c.tag in tags:
                n.children.remove(c)
            else:
                _remove_excluded(c, tags)


# ---------------------------------------------------------------------------
# PruningContentFilter (reference :533-777)
# ---------------------------------------------------------------------------

_PRUNE_TAG_WEIGHTS = {
    "div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0, "span": 0.3,
    "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2, "h2": 1.1, "h3": 1.0,
    "h4": 0.9, "h5": 0.8, "h6": 0.7,
}
_TAG_IMPORTANCE = {
    "article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2, "h1": 1.4,
    "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6,
}
_METRIC_WEIGHTS = {
    "text_density": 0.4, "link_density": 0.2, "tag_weight": 0.2,
    "class_id_weight": 0.1, "text_length": 0.1,
}


@dataclass
class PruningContentFilter:
    """Top-down composite-score prune (reference `_prune_tree`): a node
    scoring below the (fixed or dynamic) threshold is decomposed with its
    whole subtree; survivors recurse. Output = the body's surviving element
    children that still carry text."""

    min_word_threshold: int | None = None
    threshold_type: str = "fixed"       # 'fixed' | 'dynamic'
    threshold: float = 0.48

    # -- single bottom-up measurement pass -------------------------------
    # The reference recomputes get_text/encode_contents per node (O(n^2));
    # metrics are prune-invariant (detaching a child never changes a
    # sibling's or descendant's numbers), so ONE pass memoizes
    # (text_len, inner_len, outer_len, n_spaces) per node id.
    def _measure(self, n: Node, memo: dict) -> tuple[int, int, int, int]:
        tlen = inner = spaces = 0
        for c in n.children:
            if c.__class__ is str:
                s = c.strip()
                tlen += len(s)
                spaces += s.count(" ")
                # len(escape(c, quote=False)) without building the copy:
                # & -> &amp; (+4), < -> &lt; / > -> &gt; (+3 each)
                inner += (len(c) + 4 * c.count("&")
                          + 3 * c.count("<") + 3 * c.count(">"))
            elif c.__class__ is Comment:
                inner += 7 + len(c.data)  # <!--...-->
            elif c.__class__ is Node:
                ct, _ci, co, cs = self._measure(c, memo)
                tlen += ct
                spaces += cs
                inner += co
        # len(escape(v, quote=True)): adds &quot;/&#x27; (+5 each) on top
        open_len = 1 + len(n.tag) + sum(
            4 + len(k) + len(v) + 4 * v.count("&") + 3 * v.count("<")
            + 3 * v.count(">") + 5 * v.count('"') + 5 * v.count("'")
            for k, v in n.attrs.items()
        )
        if n.tag in VOID_TAGS:
            outer = open_len + 2          # '<tag .../>'
        else:
            outer = open_len + 1 + inner + 3 + len(n.tag)
        memo[id(n)] = (tlen, inner, outer, spaces)
        return memo[id(n)]

    @staticmethod
    def _link_text_len(n: Node) -> int:
        """Direct <a> children whose SOLE child is a text node (a.string)."""
        total = 0
        for c in n.children:
            if c.__class__ is Node and c.tag == "a":
                if len(c.children) == 1 and c.children[0].__class__ is str:
                    total += len(c.children[0].strip())
        return total

    @staticmethod
    def _class_id_weight(n: Node) -> float:
        score = 0.0
        cls = n.get("class")
        if cls is not None and NEGATIVE_PATTERNS.match(cls):
            score -= 0.5
        eid = n.get("id")
        if eid is not None and NEGATIVE_PATTERNS.match(eid):
            score -= 0.5
        return score

    def _composite_score(self, n: Node, text_len: int, tag_len: int,
                         link_text_len: int, n_spaces: int) -> float:
        if self.min_word_threshold:
            if n_spaces + 1 < self.min_word_threshold:
                return -1.0  # guaranteed removal
        w = _METRIC_WEIGHTS
        score = 0.0
        total = 0.0
        density = text_len / tag_len if tag_len > 0 else 0.0
        score += w["text_density"] * density
        total += w["text_density"]
        link_d = 1.0 - (link_text_len / text_len if text_len > 0 else 0.0)
        score += w["link_density"] * link_d
        total += w["link_density"]
        score += w["tag_weight"] * _PRUNE_TAG_WEIGHTS.get(n.tag, 0.5)
        total += w["tag_weight"]
        score += w["class_id_weight"] * max(0.0, self._class_id_weight(n))
        total += w["class_id_weight"]
        score += w["text_length"] * math.log(text_len + 1)
        total += w["text_length"]
        return score / total

    def _should_remove(self, n: Node, memo: dict) -> bool:
        text_len, inner_len, _outer, n_spaces = memo[id(n)]
        link_text_len = self._link_text_len(n)
        score = self._composite_score(n, text_len, inner_len, link_text_len,
                                      n_spaces)
        if self.threshold_type == "fixed":
            return score < self.threshold
        tag_importance = _TAG_IMPORTANCE.get(n.tag, 0.7)
        text_ratio = text_len / inner_len if inner_len > 0 else 0.0
        link_ratio = link_text_len / text_len if text_len > 0 else 1.0
        threshold = self.threshold
        if tag_importance > 1:
            threshold *= 0.8
        if text_ratio > 0.4:
            threshold *= 0.9
        if link_ratio > 0.6:
            threshold *= 1.2
        return score < threshold

    def _prune_tree(self, n: Node, memo: dict) -> bool:
        """Returns True when the node removed itself (caller detaches)."""
        if self._should_remove(n, memo):
            return True
        for c in list(n.children):
            if c.__class__ is Node and self._prune_tree(c, memo):
                n.children.remove(c)
        return False

    def filter_blocks(self, html: str | bytes | Node) -> list[Node]:
        """Surviving top-level body blocks as live Nodes (mutates a passed
        tree, like the reference mutates its soup)."""
        root = html if isinstance(html, Node) else parse_html(html)
        _remove_comments(root)
        _remove_excluded(root)
        body = body_of(root)
        memo: dict = {}
        self._measure(body, memo)
        if self._prune_tree(body, memo):
            return []
        return [
            c for c in body.children
            if c.__class__ is Node and len(fused_text(c)) > 0
        ]

    def filter_content(self, html: str | bytes | Node) -> list[str]:
        """Reference contract: list of serialized surviving blocks."""
        return [b.to_html() for b in self.filter_blocks(html)]


# ---------------------------------------------------------------------------
# BM25ContentFilter (reference :381-530 + base :33-380)
# ---------------------------------------------------------------------------

# the reference's clean_tokens noise/stopword sets (utils.py:2543-2770)
_NOISE = frozenset("ccp up ↑ ▲ ⬆️ a an at by in of on to the".split())
_REF_STOPWORDS = frozenset("""
a an and are as at be by for from has he in is it its of on that the to was
were will with i you she we they me him her us them my your his our their
mine yours hers ours theirs myself yourself himself herself itself ourselves
themselves am been being have had having do does did doing about above across
after against along among around before behind below beneath beside between
beyond down during except inside into near off out outside over past through
toward under underneath until up upon within but or nor yet so although
because since unless this these those what which who whom whose when where
why how all any both each few more most other some such can cannot can't
could couldn't may might must mustn't shall should shouldn't will won't would
wouldn't not n't no none
""".split())

_INLINE_TAGS = frozenset(
    "a abbr acronym b bdo big br button cite code dfn em i img input kbd "
    "label map object q samp script select small span strong sub sup "
    "textarea time tt var".split()
)
_HEADER_TAGS = frozenset("h1 h2 h3 h4 h5 h6 header".split())

_BM25_PRIORITY_TAGS = {
    "h1": 5.0, "h2": 4.0, "h3": 3.0, "title": 4.0, "strong": 2.0, "b": 1.5,
    "em": 1.5, "blockquote": 2.0, "code": 2.0, "pre": 1.5, "th": 1.5,
}

_CLEAN_UNWANTED_TAGS = frozenset("script style aside form iframe noscript".split())
_CLEAN_UNWANTED_ATTRS = frozenset(
    "style onclick onmouseover align bgcolor class id".split()
)


def ref_clean_tokens(tokens: list[str]) -> list[str]:
    """The reference's clean_tokens (utils.py:2543-2770): len>2, exact-match
    noise/stopword drop, arrow-prefix drop. Tokens arrive as plain
    whitespace splits — punctuation stays attached."""
    return [
        t for t in tokens
        if len(t) > 2
        and t not in _NOISE
        and t not in _REF_STOPWORDS
        and not t.startswith(("↑", "▲", "⬆"))
    ]


class BM25Okapi:
    """rank_bm25-variant Okapi BM25 (public algorithm): raw idf
    ln((N-df+0.5)/(df+0.5)); words with negative idf floored to
    epsilon * average_idf."""

    def __init__(self, corpus: list[list[str]], k1: float = 1.5,
                 b: float = 0.75, epsilon: float = 0.25):
        self.k1, self.b = k1, b
        self.n = len(corpus)
        self.doc_lens = [len(d) for d in corpus]
        self.avgdl = (sum(self.doc_lens) / self.n) if self.n else 0.0
        self.tfs = [Counter(d) for d in corpus]
        df: Counter = Counter()
        for tf in self.tfs:
            df.update(tf.keys())
        self.idf: dict[str, float] = {}
        negative = []
        idf_sum = 0.0
        for word, d in df.items():
            v = math.log(self.n - d + 0.5) - math.log(d + 0.5)
            self.idf[word] = v
            idf_sum += v
            if v < 0:
                negative.append(word)
        avg_idf = idf_sum / len(self.idf) if self.idf else 0.0
        eps = epsilon * avg_idf
        for word in negative:
            self.idf[word] = eps

    def get_scores(self, query: list[str]) -> list[float]:
        out = []
        for tf, dl in zip(self.tfs, self.doc_lens):
            s = 0.0
            if self.avgdl > 0:
                norm = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
                for q in query:
                    f = tf.get(q, 0)
                    if f:
                        s += self.idf.get(q, 0.0) * f * (self.k1 + 1.0) / (f + norm)
            out.append(s)
        return out


def extract_page_query(root: Node, body: Node,
                       user_query: str | None = None) -> str:
    """Reference extract_page_query (:125-159): title.string + first h1
    text + meta keywords/description contents; first long <p> prefix when
    no meta content exists."""
    if user_query:
        return user_query
    parts: list[str] = []
    title = root.find("title")
    if title is not None and len(title.children) == 1 \
            and title.children[0].__class__ is str:
        parts.append(title.children[0])
    h1 = root.find("h1")
    if h1 is not None:
        parts.append(_raw_text(h1))
    temp = ""
    for meta_name in ("keywords", "description"):
        meta = _find_meta(root, meta_name)
        if meta is not None and meta.get("content"):
            parts.append(meta.get("content"))
            temp += meta.get("content")
    if not temp:
        for p in body.iter("p"):
            t = _raw_text(p)
            if len(t) > 150:
                parts.append(t[:150])
                break
    return " ".join(p for p in parts if p)


def _raw_text(n: Node) -> str:
    """bs4 get_text() with default args: raw strings concatenated, no
    separator, no strip."""
    parts: list[str] = []

    def walk(node: Node) -> None:
        for c in node.children:
            if c.__class__ is str:
                parts.append(c)
            elif c.__class__ is Node:
                walk(c)

    walk(n)
    return "".join(parts)


def _find_meta(root: Node, name: str) -> Node | None:
    for m in root.iter("meta"):
        if (m.get("name") or "") == name:
            return m
    return None


def extract_text_chunks(body: Node, min_word_threshold: int | None = None
                        ) -> list[tuple[int, str, str, Node]]:
    """Reference extract_text_chunks (:160-266): iterative stack walk that
    accumulates text and flushes a chunk at the end of each non-inline
    element. Comments count as text (bs4 NavigableString quirk)."""
    chunks: list[tuple[int, str, str, Node]] = []
    current_text: list[str] = []
    chunk_index = 0

    stack: list[tuple[object, bool]] = [(body, False)]
    while stack:
        element, visited = stack.pop()
        if visited:
            # end of a block element — flush
            if current_text and element.tag not in _INLINE_TAGS:
                text = " ".join("".join(current_text).split())
                if text:
                    tag_type = "header" if element.tag in _HEADER_TAGS else "content"
                    chunks.append((chunk_index, text, tag_type, element))
                    chunk_index += 1
                current_text = []
            continue
        if element.__class__ is str:
            if element.strip():
                current_text.append(element.strip())
            continue
        if element.__class__ is Comment:
            if element.data.strip():
                current_text.append(element.data.strip())
            continue
        children = element.children
        if not children:
            continue
        stack.append((element, True))
        for child in reversed(children):
            stack.append((child, False))

    if current_text:
        text = " ".join("".join(current_text).split())
        if text:
            chunks.append((chunk_index, text, "content", body))

    if min_word_threshold:
        chunks = [c for c in chunks if len(c[1].split()) >= min_word_threshold]
    return chunks


def clean_element_node(tag: Node) -> Node:
    """Reference clean_element (:322-380) as a cleaned CLONE: drops
    script/style/aside/form/iframe/noscript subtrees and the unwanted
    attributes; text nodes are stripped in place (words may fuse — quirk
    preserved); comment text is emitted raw (bs4 str-subclass quirk)."""
    out = Node(tag.tag, {k: v for k, v in tag.attrs.items()
                         if k not in _CLEAN_UNWANTED_ATTRS})
    for c in tag.children:
        if c.__class__ is str:
            s = c.strip()
            if s:
                out.append(s)
        elif c.__class__ is Comment:
            s = c.data.strip()
            if s:
                out.append(s)
        elif c.__class__ is Node and c.tag not in _CLEAN_UNWANTED_TAGS:
            out.append(clean_element_node(c))
    return out


@dataclass
class BM25ContentFilter:
    """Page-query BM25 over the page's own text chunks; chunks whose
    score * priority-tag weight clears the threshold survive, re-emitted in
    document order as cleaned fragments."""

    user_query: str | None = None
    bm25_threshold: float = 1.0
    use_stemming: bool = True
    priority_tags: dict = field(default_factory=lambda: dict(_BM25_PRIORITY_TAGS))

    def _tokens(self, text: str) -> list[str]:
        toks = text.lower().split()
        if self.use_stemming:
            # the reference stems with snowballstemmer('english'); that
            # package is absent here, so this uses a from-scratch
            # implementation of the same PUBLISHED Porter2 algorithm
            # (kernel/porter2.py) — reference-shaped; exact C-implementation
            # parity is unverifiable in this container (documented seam;
            # use_stemming=False, a reference constructor flag, is exact)
            toks = [porter2_stem(t) for t in toks]
        return ref_clean_tokens(toks)

    def filter_blocks(self, html: str | bytes | Node) -> list[Node]:
        root = html if isinstance(html, Node) else parse_html(html)
        body = body_of(root)
        query = extract_page_query(root, body, self.user_query)
        if not query:
            return []
        candidates = extract_text_chunks(body)
        if not candidates:
            return []
        corpus = [self._tokens(c[1]) for c in candidates]
        q = self._tokens(query)
        scores = BM25Okapi(corpus).get_scores(q)
        selected = [
            (idx, tag)
            for s, (idx, _text, _tt, tag) in zip(scores, candidates)
            if s * self.priority_tags.get(tag.tag, 1.0) >= self.bm25_threshold
        ]
        selected.sort(key=lambda x: x[0])
        return [clean_element_node(tag) for _idx, tag in selected]

    def filter_content(self, html: str | bytes | Node) -> list[str]:
        return [b.to_html() for b in self.filter_blocks(html)]
