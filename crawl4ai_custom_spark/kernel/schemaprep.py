"""Structure-preserving HTML shrink for schema generation (fit_html).

Reproduces the observable semantics of the reference's
``preprocess_html_for_schema`` (/root/reference/crawl4ai/utils.py:3001-3144)
on the repo's own stdlib DOM — the container has no lxml, and the engine must
not depend on it:

1. drop <head> entirely (keep body structure);
2. remove script/style/noscript/iframe/canvas/svg/video/audio/source/track/
   map/area subtrees (and comments, which the reference's parser drops);
3. per element (excluding the document root): keep only the attributes
   {id, class, name, type, value} plus any ``data-*``; truncate kept values
   longer than ``attr_value_threshold`` to ``value[:t] + '...'``; truncate
   any text run whose *stripped* length exceeds ``text_threshold`` to
   ``stripped[:t] + '...'`` (the reference applies this to element.text and
   element.tail — i.e. to every maximal text run in the tree);
4. drop duplicate class-bearing elements: first occurrence (document order)
   of each (tag, class attribute, concatenated inner text) signature wins,
   later ones are removed (the reference keys on an xxhash64 of the itertext
   stream — hashing is an optimization, the signature is the text itself);
5. serialize; if the result still exceeds ``max_size``, hard-truncate to
   ``result[:max_size] + '...'``.

The reference's crawl pipeline calls this with text_threshold=500 and
max_size=300_000 to produce ``CrawlResult.fit_html``
(async_webcrawler.py:515); those are the defaults ``fit_html_for_page``
applies. Serialization uses this repo's emitter (void tags as ``<br/>``,
minimal escaping) rather than lxml's, since lxml is absent here — the
structure, not the serializer dialect, is the contract.
"""

from __future__ import annotations

from .htmldom import Comment, Node, parse_html

_REMOVE_TAGS = frozenset(
    """script style noscript iframe canvas svg video audio source track
    map area""".split()
)

_KEEP_ATTRS = frozenset({"id", "class", "name", "type", "value"})


def _strip_comments_and_tags(node: Node) -> None:
    # lxml .remove(el) semantics: el's TAIL (the text up to the next sibling
    # element) is attached to el and disappears with it — so dropping a
    # <script> also drops the text that followed it. Comments differ: the
    # reference's parser removes them at PARSE time (remove_comments), so
    # text around a comment survives and merges.
    kept: list[object] = []
    dropping_tail = False
    for c in node.children:
        if c.__class__ is Comment:
            continue  # parse-time removal: transparent to tails
        if c.__class__ is Node:
            if c.tag in _REMOVE_TAGS or c.tag == "head":
                dropping_tail = True
                continue
            dropping_tail = False
            _strip_comments_and_tags(c)
        elif dropping_tail:  # str run = removed element's tail
            continue
        kept.append(c)
    node.children = kept


def _merge_text_runs(node: Node) -> None:
    """Collapse adjacent str children into single maximal runs (lxml's
    text/tail model sees one run per slot)."""
    merged: list[object] = []
    for c in node.children:
        if c.__class__ is str and merged and merged[-1].__class__ is str:
            merged[-1] = merged[-1] + c
        else:
            merged.append(c)
    node.children = merged
    for c in merged:
        if c.__class__ is Node:
            _merge_text_runs(c)


def _clean_and_truncate(
    node: Node, text_threshold: int, attr_value_threshold: int, *, is_root: bool
) -> None:
    if not is_root:
        for k in list(node.attrs.keys()):
            if not (k in _KEEP_ATTRS or k.startswith("data-")):
                node.attrs.pop(k)
            elif len(node.attrs[k]) > attr_value_threshold:
                node.attrs[k] = node.attrs[k][:attr_value_threshold] + "..."
    out: list[object] = []
    seen_element = False
    for c in node.children:
        if c.__class__ is str:
            # lxml text/tail model: a run before the root's first element
            # child is root.text — the reference's iter() skips the root,
            # so it is never truncated. A run AFTER a child is that child's
            # .tail, and children ARE visited — their tails truncate.
            if not (is_root and not seen_element):
                stripped = c.strip()
                if len(stripped) > text_threshold:
                    c = stripped[:text_threshold] + "..."
            out.append(c)
        else:
            seen_element = True
            _clean_and_truncate(
                c, text_threshold, attr_value_threshold, is_root=False
            )
            out.append(c)
    node.children = out


def _inner_text(node: Node) -> str:
    parts: list[str] = []
    node._collect_text(parts)
    return "".join(parts)


def _dedup_by_class_signature(root: Node) -> None:
    # Document-order snapshot first (the reference snapshots the XPath result
    # then mutates); removal detaches the subtree but the snapshot still
    # visits detached descendants, whose signatures enter `seen` — replicated
    # here by checking only the immediate parent link at visit time.
    snapshot = [el for el in root.iter() if el.attrs.get("class")]
    seen: set[tuple[str, str, str]] = set()
    for el in snapshot:
        parent = el.parent
        if parent is None:
            continue
        cls = el.attrs.get("class")
        if not cls:
            continue
        sig = (el.tag, cls, _inner_text(el))
        if sig in seen:
            # lxml .remove drops the element's tail with it: the text run
            # immediately following (runs are merged by now, so at most one)
            # goes too.
            idx = parent.children.index(el)
            if idx + 1 < len(parent.children) \
                    and parent.children[idx + 1].__class__ is str:
                del parent.children[idx + 1]
            parent.remove_child(el)
            el.parent = None
        else:
            seen.add(sig)


def preprocess_tree(
    root: Node,
    text_threshold: int = 100,
    attr_value_threshold: int = 200,
    max_size: int = 100_000,
) -> str:
    """The shrink pipeline over an already-parsed tree. MUTATES ``root`` —
    callers sharing a parse must hand in a ``Node.clone()``."""
    _strip_comments_and_tags(root)
    _merge_text_runs(root)
    # #root's direct element children play lxml's "root element" part:
    # their attrs/text are untouched, everything below is processed.
    for top in [c for c in root.children if c.__class__ is Node]:
        _clean_and_truncate(
            top, text_threshold, attr_value_threshold, is_root=True
        )
    _dedup_by_class_signature(root)
    result = root.to_html()
    if len(result) > max_size:
        return result[:max_size] + "..."
    return result


def preprocess_html_for_schema(
    html_content: str | bytes,
    text_threshold: int = 100,
    attr_value_threshold: int = 200,
    max_size: int = 100_000,
) -> str:
    """Shrink HTML for schema generation while preserving structure."""
    if isinstance(html_content, (bytes, bytearray)):
        html_content = bytes(html_content).decode("utf-8", errors="replace")
    try:
        return preprocess_tree(
            parse_html(html_content), text_threshold,
            attr_value_threshold, max_size,
        )
    except Exception:
        return (
            html_content[:max_size]
            if len(html_content) > max_size
            else html_content
        )


def fit_html_for_page(html: str | bytes, tree: Node | None = None) -> str:
    """CrawlResult.fit_html parity: the crawl pipeline's parameterization
    (reference async_webcrawler.py:515). Pass the page's already-parsed
    ``tree`` to skip the second parse — it is cloned, never mutated
    (clone is ~7x cheaper than the parse it replaces)."""
    if tree is not None:
        try:
            return preprocess_tree(
                tree.clone(), text_threshold=500, max_size=300_000
            )
        except Exception:
            pass  # fall through to the string path's own fallback
    return preprocess_html_for_schema(
        html, text_threshold=500, max_size=300_000
    )
