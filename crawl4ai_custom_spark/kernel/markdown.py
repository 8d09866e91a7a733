"""HTML -> Markdown generation, from scratch over the htmldom tree.

Capability parity with the reference's DefaultMarkdownGenerator +
CustomHTML2Text (/root/reference/crawl4ai/markdown_generation_strategy.py:55-260,
/root/reference/crawl4ai/html2text/) without porting that code: a
deterministic block/inline walker producing

  raw_markdown            — plain conversion, links inline [text](href)
  markdown_with_citations — links become ``text⟨n⟩`` markers
  references_markdown     — '## References' block listing ⟨n⟩: url
  fit_markdown / fit_html — conversion of the content-filtered HTML
                            (see content_filter.py)

The output format is OUR byte-contract: tests pin it against golden strings,
giving the same guarantee the reference gets from its html2text vendoring.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .htmldom import BLOCK_TAGS, Comment, Node, parse_html

_WS = re.compile(r"\s+")
_SKIP = frozenset("script style noscript template head title meta link".split())


@dataclass
class MarkdownResult:
    raw_markdown: str = ""
    markdown_with_citations: str = ""
    references_markdown: str = ""
    fit_markdown: str = ""
    fit_html: str = ""


@dataclass
class _Ctx:
    citations: bool = False
    refs: list[tuple[str, str]] = field(default_factory=list)  # (url, title)
    ref_index: dict[str, int] = field(default_factory=dict)

    def cite(self, href: str, title: str) -> int:
        if href not in self.ref_index:
            self.ref_index[href] = len(self.refs) + 1
            self.refs.append((href, title))
        return self.ref_index[href]


def _inline(node: Node, ctx: _Ctx) -> str:
    parts: list[str] = []
    for c in node.children:
        if isinstance(c, str):
            parts.append(_WS.sub(" ", c))
        elif isinstance(c, Comment):
            continue
        elif c.tag in _SKIP:
            continue
        elif c.tag in ("strong", "b"):
            t = _inline(c, ctx).strip()
            if t:
                parts.append(f"**{t}**")
        elif c.tag in ("em", "i"):
            t = _inline(c, ctx).strip()
            if t:
                parts.append(f"*{t}*")
        elif c.tag == "code":
            t = c.text()
            if t:
                parts.append(f"`{t}`")
        elif c.tag == "a":
            txt = _inline(c, ctx).strip() or (c.get("href") or "")
            href = c.get("href") or ""
            if not href:
                parts.append(txt)
            elif ctx.citations:
                n = ctx.cite(href, c.get("title") or txt)
                parts.append(f"{txt}⟨{n}⟩")
            else:
                parts.append(f"[{txt}]({href})")
        elif c.tag == "img":
            alt = c.get("alt") or ""
            src = c.get("src") or ""
            parts.append(f"![{alt}]({src})")
        elif c.tag == "br":
            parts.append("  \n")
        else:
            parts.append(_inline(c, ctx))
    return "".join(parts)


def _table_md(t: Node, ctx: _Ctx) -> str:
    rows: list[list[str]] = []
    for tr in t.iter("tr"):
        cells = [
            _inline(c, ctx).strip().replace("|", "\\|")
            for c in tr.children
            if isinstance(c, Node) and c.tag in ("td", "th")
        ]
        if cells:
            rows.append(cells)
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    out = ["| " + " | ".join(rows[0]) + " |", "|" + "---|" * width]
    out += ["| " + " | ".join(r) + " |" for r in rows[1:]]
    return "\n".join(out)


def _list_md(node: Node, ctx: _Ctx, ordered: bool, depth: int) -> str:
    lines: list[str] = []
    i = 0
    for c in node.children:
        if not isinstance(c, Node) or c.tag != "li":
            continue
        i += 1
        bullet = f"{i}. " if ordered else "- "
        sub: list[str] = []
        inline_parts: list[str] = []
        for g in c.children:
            if isinstance(g, Node) and g.tag in ("ul", "ol"):
                sub.append(_list_md(g, ctx, g.tag == "ol", depth + 1))
            elif isinstance(g, Node) and g.tag in BLOCK_TAGS:
                inline_parts.append(_inline(g, ctx))
            elif isinstance(g, str):
                inline_parts.append(_WS.sub(" ", g))
            elif isinstance(g, Node):
                inline_parts.append(_inline(g, ctx))
        text = _WS.sub(" ", "".join(inline_parts)).strip()
        lines.append("  " * depth + bullet + text)
        lines.extend(s for s in sub if s)
    return "\n".join(lines)


def _blocks(node: Node, ctx: _Ctx, out: list[str]) -> None:
    for c in node.children:
        if isinstance(c, str):
            t = _WS.sub(" ", c).strip()
            if t:
                out.append(t)
        elif isinstance(c, Comment):
            continue
        elif c.tag in _SKIP:
            continue
        elif c.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            lvl = int(c.tag[1])
            t = _inline(c, ctx).strip()
            if t:
                out.append("#" * lvl + " " + t)
        elif c.tag == "p":
            t = _inline(c, ctx).strip()
            if t:
                out.append(t)
        elif c.tag == "pre":
            code = c.find("code")
            raw = (code if code is not None else c).text(sep="", strip=False)
            raw = raw.strip("\n")
            lang = ""
            if code is not None:
                for cls in code.classes:
                    if cls.startswith("language-"):
                        lang = cls[9:]
            out.append(f"```{lang}\n{raw}\n```")
        elif c.tag == "blockquote":
            inner: list[str] = []
            _blocks(c, ctx, inner)
            if not inner:
                t = _inline(c, ctx).strip()
                inner = [t] if t else []
            if inner:
                out.append("\n".join("> " + line for b in inner for line in b.split("\n")))
        elif c.tag in ("ul", "ol"):
            md = _list_md(c, ctx, c.tag == "ol", 0)
            if md:
                out.append(md)
        elif c.tag == "table":
            md = _table_md(c, ctx)
            if md:
                out.append(md)
        elif c.tag == "hr":
            out.append("---")
        elif c.tag in BLOCK_TAGS or c.tag in ("html", "body", "#root", "main",
                                              "article", "section", "span"):
            # container: does it hold block children?
            if any(isinstance(g, Node) and g.tag in BLOCK_TAGS for g in c.children):
                _blocks(c, ctx, out)
            else:
                t = _inline(c, ctx).strip()
                if t:
                    out.append(t)
        else:
            t = _inline(c, ctx).strip()
            if t:
                out.append(t)


def html_to_markdown(html: str | Node, *, citations: bool = False) -> tuple[str, list[tuple[str, str]]]:
    root = html if isinstance(html, Node) else parse_html(html)
    ctx = _Ctx(citations=citations)
    out: list[str] = []
    _blocks(root, ctx, out)
    return "\n\n".join(out).strip(), ctx.refs


def references_block(refs: list[tuple[str, str]]) -> str:
    if not refs:
        return ""
    lines = ["## References", ""]
    for i, (href, title) in enumerate(refs, 1):
        label = f" {title}" if title else ""
        lines.append(f"⟨{i}⟩{label}: {href}")
    return "\n".join(lines)


def generate_markdown(html: str | Node, fit_html: str | None = None) -> MarkdownResult:
    """Full markdown bundle for one page's cleaned HTML."""
    root = html if isinstance(html, Node) else parse_html(html)
    raw, _ = html_to_markdown(root)
    cited, refs = html_to_markdown(root, citations=True)
    res = MarkdownResult(
        raw_markdown=raw,
        markdown_with_citations=cited,
        references_markdown=references_block(refs),
    )
    if fit_html is not None:
        res.fit_html = fit_html
        res.fit_markdown, _ = html_to_markdown(fit_html)
    return res
