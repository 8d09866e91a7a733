"""fit_html (schema-prep shrink) structural differential: the kernel's
``preprocess_html_for_schema`` vs an INDEPENDENT simulator of the
reference's algorithm (utils.py:3001-3144).

The reference runs on lxml (absent here), so its output cannot be
captured; instead the algorithm is implemented a SECOND time on an
lxml-SHAPED structure (elements carrying ``text``/``tail`` slots, the
model the reference's truncation logic is written against) — a genuinely
different computation shape from the kernel's child-run DOM. Comparison is
POST-PARSE STRUCTURAL equality (tag / kept-attrs / text-run trees), which
sidesteps the serializer-dialect gap documented in kernel/schemaprep.py.

Shared by declaration: the parse itself (kernel parse_html — the parsing
dialect, including blank-text handling, is a parser convention pinned by
the other byte contracts, not schema-prep logic). Everything the reference
FUNCTION does — head drop, noise-tag removal, attribute whitelist +
truncation, text/tail truncation, (tag, class, itertext) first-wins dedup,
size cap — is computed independently on both sides.
"""

from __future__ import annotations

import random

import pytest

from crawl4ai_custom_spark.kernel.htmldom import Comment, Node, parse_html
from crawl4ai_custom_spark.kernel.schemaprep import preprocess_html_for_schema

# ---------------------------------------------------------------------------
# lxml-shaped element model + converter
# ---------------------------------------------------------------------------


class LElem:
    __slots__ = ("tag", "attrib", "text", "tail", "children", "parent")

    def __init__(self, tag):
        self.tag = tag
        self.attrib: dict[str, str] = {}
        self.text: str | None = None
        self.tail: str | None = None
        self.children: list["LElem"] = []
        self.parent: "LElem | None" = None

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

    def itertext(self):
        if self.text:
            yield self.text
        for c in self.children:
            yield from c.itertext()
            if c.tail:
                yield c.tail

    def remove(self, child):
        self.children.remove(child)
        child.parent = None


def to_lxml_shape(n: Node) -> LElem:
    """Kernel DOM -> text/tail model (comments dropped like the reference's
    remove_comments parser flag)."""
    el = LElem(n.tag)
    el.attrib = dict(n.attrs)
    last_child: LElem | None = None
    for c in n.children:
        if c.__class__ is str:
            if last_child is None:
                el.text = (el.text or "") + c
            else:
                last_child.tail = (last_child.tail or "") + c
        elif c.__class__ is Comment:
            continue
        elif c.__class__ is Node:
            sub = to_lxml_shape(c)
            sub.parent = el
            el.children.append(sub)
            last_child = sub
    return el


# ---------------------------------------------------------------------------
# the reference algorithm, literally, on the lxml-shaped tree
# ---------------------------------------------------------------------------

_SIM_REMOVE = ["script", "style", "noscript", "iframe", "canvas", "svg",
               "video", "audio", "source", "track", "map", "area"]
_SIM_KEEP_ATTRS = {"id", "class", "name", "type", "value"}


def sim_preprocess(root: LElem, text_threshold=100, attr_value_threshold=200):
    """Mutates and returns root (the reference mutates its tree)."""
    # 1. remove head
    for el in list(root.iter()):
        if el.tag == "head" and el.parent is not None:
            el.parent.remove(el)
    # 2. remove unwanted tags (per-tag pass like the reference's xpath loop)
    for tag in _SIM_REMOVE:
        for el in list(root.iter()):
            if el.tag == tag and el.parent is not None:
                el.parent.remove(el)
    # 3. attrs + text/tail truncation (root skipped)
    for el in root.iter():
        if el.parent is None:
            continue
        for attrib in list(el.attrib.keys()):
            if not (attrib in _SIM_KEEP_ATTRS or attrib.startswith("data-")):
                el.attrib.pop(attrib)
            elif len(el.attrib[attrib]) > attr_value_threshold:
                el.attrib[attrib] = el.attrib[attrib][:attr_value_threshold] + "..."
        if el.text and len(el.text.strip()) > text_threshold:
            el.text = el.text.strip()[:text_threshold] + "..."
        if el.tail and len(el.tail.strip()) > text_threshold:
            el.tail = el.tail.strip()[:text_threshold] + "..."
    # 4. first-wins (tag, class, itertext) dedup, document-order snapshot
    seen: set[tuple] = set()
    for el in list(root.iter()):
        if el.parent is None:
            continue
        cls = el.attrib.get("class")
        if not cls:
            continue
        sig = (el.tag, cls, "".join(el.itertext()))
        if sig in seen:
            el.parent.remove(el)
        else:
            seen.add(sig)
    return root


# ---------------------------------------------------------------------------
# structural normal form (shared comparison target)
# ---------------------------------------------------------------------------


def lshape_struct(el: LElem):
    runs = []
    if el.text and el.text.strip():
        runs.append(("#text", 0, el.text.strip()))
    kids = []
    for i, c in enumerate(el.children, start=1):
        kids.append(lshape_struct(c))
        if c.tail and c.tail.strip():
            runs.append(("#text", i, c.tail.strip()))
    return (el.tag, tuple(sorted(el.attrib.items())), tuple(runs), tuple(kids))


def kernel_struct(n: Node):
    runs = []
    kids = []
    i = 0
    pending = []
    for c in n.children:
        if c.__class__ is str:
            pending.append(c)
        elif c.__class__ is Node:
            if pending:
                t = "".join(pending).strip()
                if t:
                    runs.append(("#text", i, t))
                pending = []
            kids.append(kernel_struct(c))
            i += 1
    if pending:
        t = "".join(pending).strip()
        if t:
            runs.append(("#text", i, t))
    return (n.tag, tuple(sorted(n.attrs.items())), tuple(runs), tuple(kids))


def struct_of_kernel_output(fit_html: str):
    root = parse_html(fit_html)
    tops = [c for c in root.children if c.__class__ is Node]
    return tuple(kernel_struct(t) for t in tops)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

LONG = "x" * 130 + " tail of a long text run that must truncate here"
LONG_ATTR = "a" * 230

PAGES = {
    "head_and_scripts": (
        '<html><head><title>t</title><style>.x{}</style></head><body>'
        '<script>bad()</script><p>kept paragraph</p><svg><g></g></svg>'
        '</body></html>'),
    "attr_whitelist": (
        '<html><body><div id="keep" class="c" style="color:red" '
        'onclick="x()" data-widget="yes" role="main" name="n" type="t" '
        'value="v"><span hidden lang="en">text</span></div></body></html>'),
    "attr_truncation": (
        f'<html><body><div class="{LONG_ATTR}" data-big="{LONG_ATTR}" '
        f'title="{LONG_ATTR}"><p>ok</p></div></body></html>'),
    "text_truncation": (
        f'<html><body><p>{LONG}</p><div>short</div>'
        f'<div><span>s</span>{LONG}</div></body></html>'),
    "tail_truncation_at_root_level": (
        f'<html><body><div>lead</div>{LONG}<div>follow</div></body></html>'),
    "dedup_class_sig": (
        '<html><body>'
        '<div class="card">same text</div>'
        '<div class="card">same text</div>'
        '<div class="card">different text</div>'
        '<span class="card">same text</span>'
        '</body></html>'),
    "dedup_nested_first_wins": (
        '<html><body><div class="outer"><p class="p">dup</p>'
        '<p class="p">dup</p></div>'
        '<div class="outer"><p class="p">dup</p></div></body></html>'),
    "no_class_no_dedup": (
        '<html><body><p>dup</p><p>dup</p><p>dup</p></body></html>'),
    "mixed_everything": (
        f'<html><head><meta charset="utf-8"></head><body>'
        f'<nav class="menu"><a href="/a" style="x">A</a></nav>'
        f'<article class="post" data-id="1"><h1 class="hd">Title</h1>'
        f'<p>{LONG}</p><iframe src="x"></iframe>'
        f'<p class="para">dup body</p><p class="para">dup body</p>'
        f'</article><audio src="a.mp3"></audio></body></html>'),
    "comments_dropped": (
        '<html><body><!-- note --><div class="c"><!-- inner -->text</div>'
        '</body></html>'),
}

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
          "mu nu xi omicron pi rho sigma tau upsilon").split()


def _fuzz(seed: int) -> str:
    rng = random.Random(seed)

    def words(n):
        return " ".join(rng.choice(_WORDS) for _ in range(n))

    def block(depth):
        kind = rng.randrange(7)
        if kind == 0:
            return "<p>%s</p>" % words(rng.randint(1, 60))
        if kind == 1:
            return '<div class="%s" style="z" data-x="%s">%s</div>' % (
                rng.choice(["card", "row", "cell"]),
                "d" * rng.choice([5, 240]),
                words(rng.randint(1, 40)) if depth > 1 else block(depth + 1))
        if kind == 2:
            return "<script>junk%d()</script>" % rng.randrange(9)
        if kind == 3:
            return '<span class="dup">repeated chunk</span>'
        if kind == 4:
            return "<section>%s%s</section>" % (
                block(depth + 1), words(rng.randint(0, 50)))
        if kind == 5:
            return "<svg><circle r=\"1\"></circle></svg>"
        return "<ul><li>%s</li><li>%s</li></ul>" % (
            words(rng.randint(1, 8)), words(rng.randint(20, 45)))

    body = "".join(block(0) for _ in range(rng.randint(4, 10)))
    return "<html><head><title>f</title></head><body>%s</body></html>" % body


CASES = sorted(PAGES.items()) + [
    ("fuzz_%02d" % i, _fuzz(550 + i)) for i in range(15)
]


@pytest.mark.parametrize("name,html", CASES, ids=[n for n, _ in CASES])
def test_fit_html_matches_independent_lxml_shaped_sim(name, html):
    ours = struct_of_kernel_output(
        preprocess_html_for_schema(html, text_threshold=100,
                                   attr_value_threshold=200))
    lroot = to_lxml_shape(parse_html(html))
    tops = [c for c in lroot.children]
    sim = tuple(lshape_struct(sim_preprocess(t)) for t in tops)
    assert ours == sim


def test_fit_html_size_cap_string_semantics():
    html = "<html><body>%s</body></html>" % "".join(
        '<p class="p%d">%s</p>' % (i, "w" * 80) for i in range(100))
    out = preprocess_html_for_schema(html, max_size=500)
    assert out.endswith("...") and len(out) == 503
