"""Minimal, deterministic HTML DOM on stdlib ``html.parser``.

The container has no lxml/bs4, and the engine must not depend on them anyway:
this DOM is the substrate for the extraction pipeline (scraper -> markdown ->
content filters), replacing the reference's lxml/bs4 usage
(/root/reference/crawl4ai/content_scraping_strategy.py:101-900) with a pure
Python implementation that runs identically in executors and in pytest.

Design: tolerant tag-soup parsing (auto-close of p/li/tr/td/... on sibling
open, unmatched closes pop to nearest), text nodes as plain ``str`` children,
void elements never pushed, comments preserved as Comment nodes (filters
remove them explicitly, mirroring the reference's explicit comment removal).
"""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

BLOCK_TAGS = frozenset(
    """address article aside blockquote body details dialog dd div dl dt
    fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr
    li main nav ol p pre section table tbody td tfoot th thead tr ul""".split()
)

# tag -> set of open tags it implicitly closes when it opens as a sibling
_AUTOCLOSE = {
    "p": {"p"},
    "li": {"li"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "thead": {"thead"},
    "tbody": {"thead", "tbody"},
    "tfoot": {"tbody", "thead"},
}

_WS_RE = re.compile(r"\s+")


class Comment:
    __slots__ = ("data",)

    def __init__(self, data: str):
        self.data = data


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Node | None" = None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[object] = []  # Node | Comment | str
        self.parent = parent

    # ---- tree ops -------------------------------------------------------
    def append(self, child: object) -> None:
        if isinstance(child, Node):
            child.parent = self
        self.children.append(child)

    def remove_child(self, child: object) -> None:
        self.children = [c for c in self.children if c is not child]

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.remove_child(self)
            self.parent = None

    # ---- traversal ------------------------------------------------------
    def iter(self, tag: str | None = None):
        """Depth-first pre-order over element nodes (document order)."""
        stack: list[Node] = [self]
        out: list[Node] = []
        pop = stack.pop
        extend = stack.extend
        append = out.append
        while stack:
            n = pop()
            if n is not self and (tag is None or n.tag == tag):
                append(n)
            # hot loop: exact-type listcomp over a reversed slice beats an
            # isinstance genexpr by ~2x (no Node subclasses exist)
            extend([c for c in n.children[::-1] if c.__class__ is Node])
        return out

    def iter_gen(self, tag: str | None = None):
        """Lazy depth-first pre-order traversal (early-exit friendly)."""
        stack: list[Node] = [self]
        while stack:
            n = stack.pop()
            if n is not self and (tag is None or n.tag == tag):
                yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))

    def find(self, tag: str) -> "Node | None":
        return next(self.iter_gen(tag), None)

    def get(self, key: str, default: str | None = None) -> str | None:
        return self.attrs.get(key, default)

    @property
    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    # ---- text -----------------------------------------------------------
    def text(self, *, sep: str = " ", strip: bool = True) -> str:
        """All descendant text. Whitespace-normalized unless strip=False
        (pre/code callers need the raw bytes, newlines included)."""
        parts: list[str] = []
        self._collect_text(parts)
        joined = sep.join(parts)
        if not strip:
            return joined
        return _WS_RE.sub(" ", joined).strip()

    def _collect_text(self, parts: list[str]) -> None:
        for c in self.children:
            cls = c.__class__
            if cls is str:
                parts.append(c)
            elif cls is Node:
                c._collect_text(parts)

    def own_text(self) -> str:
        return _WS_RE.sub(
            " ", " ".join(c for c in self.children if isinstance(c, str))
        ).strip()

    def word_count(self) -> int:
        return len(self.text().split())

    def clone(self) -> "Node":
        """Deep copy of the subtree — 3-6x cheaper than re-parsing the
        serialized HTML, which is what callers needing a private mutable
        tree (schemaprep beside scrap) would otherwise do."""
        c = Node(self.tag, dict(self.attrs))
        append = c.children.append
        for ch in self.children:
            if ch.__class__ is Node:
                sub = ch.clone()
                sub.parent = c
                append(sub)
            elif ch.__class__ is Comment:
                append(Comment(ch.data))
            else:
                append(ch)
        return c

    # ---- serialization --------------------------------------------------
    def to_html(self) -> str:
        out: list[str] = []
        self._serialize(out)
        return "".join(out)

    def inner_html(self) -> str:
        out: list[str] = []
        for c in self.children:
            _serialize_child(c, out)
        return "".join(out)

    def _serialize(self, out: list[str]) -> None:
        if self.tag == "#root":
            for c in self.children:
                _serialize_child(c, out)
            return
        out.append("<" + self.tag)
        for k, v in self.attrs.items():
            out.append(f' {k}="{escape(v, quote=True)}"')
        if self.tag in VOID_TAGS:
            out.append("/>")
            return
        out.append(">")
        for c in self.children:
            _serialize_child(c, out)
        out.append(f"</{self.tag}>")

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Node {self.tag} attrs={self.attrs} kids={len(self.children)}>"


def _serialize_child(c: object, out: list[str]) -> None:
    cls = c.__class__
    if cls is str:
        out.append(escape(c, quote=False))
    elif cls is Comment:
        out.append(f"<!--{c.data}-->")
    else:
        c._serialize(out)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]

    # -- helpers
    def _top(self) -> Node:
        return self.stack[-1]

    def _autoclose_for(self, tag: str) -> None:
        closes = _AUTOCLOSE.get(tag)
        if not closes:
            return
        if self._top().tag in closes:
            self.stack.pop()

    # -- parser events
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        self._autoclose_for(tag)
        node = Node(tag, {k.lower(): (v if v is not None else "") for k, v in attrs})
        self._top().append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        node = Node(tag, {k.lower(): (v if v is not None else "") for k, v in attrs})
        self._top().append(node)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched close: ignore

    def handle_data(self, data: str) -> None:
        if data:
            self._top().append(data)

    def handle_comment(self, data: str) -> None:
        self._top().append(Comment(data))


def parse_html(html: str | bytes) -> Node:
    """Parse HTML (str or utf-8 bytes) into a Node tree rooted at '#root'."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TreeBuilder()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever tree we built — tolerant by design
    return p.root


def body_of(root: Node) -> Node:
    """The <body> element, or the root itself when no body exists."""
    return root.find("body") or root
