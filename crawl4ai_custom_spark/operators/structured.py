"""Schema-driven structured extraction from HTML columns.

Reference parity: JsonCssExtractionStrategy / JsonXPathExtractionStrategy /
RegexExtractionStrategy (/root/reference/crawl4ai/extraction_strategy.py:
989-2160) re-expressed for columns:

  regex_catalog_extract  named-pattern catalog -> (url, name, match) rows,
                         native ``regexp_extract_all`` + posexplode
  schema_extract         {baseSelector, fields:[{name, selector, type,
                         attribute?, transform?}]} evaluated per page on our
                         stdlib DOM inside ONE mapInPandas stage ->
                         array<map<string,string>> column

Selector support (from-scratch engines on htmldom) — CSS: tag, .class,
#id, tag.class, descendant combinators ('a b'), direct child ('a > b'),
[attr] / [attr=value]; XPath subset (selectors starting with '/', '//' or
'.'): / and // axes, *, [@attr], [@attr='v'], positional [n] per context
group. That covers the reference's shipped example schemas;
anything fancier belongs in a custom UDF the user supplies (the strategy ABC
surface of SURVEY.md §2.12).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StringType, StructField, StructType

from ..kernel.htmldom import Node, parse_html

# ---------------------------------------------------------------------------
# regex catalog (native)
# ---------------------------------------------------------------------------

DEFAULT_CATALOG = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s\"'<>]+",
    "phone_us": r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}",
    "price": r"[$€£]\s?\d+(?:[.,]\d{2})?",
    "date_iso": r"\d{4}-\d{2}-\d{2}",
}


def regex_catalog_extract(
    df: DataFrame,
    text_col: str,
    id_col: str,
    catalog: dict[str, str] | None = None,
) -> DataFrame:
    """(id, pattern_name, match) — one row per match, all patterns."""
    catalog = catalog or DEFAULT_CATALOG
    per_pattern = [
        df.select(
            F.col(id_col).alias("id"),
            F.lit(name).alias("pattern_name"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
            ).alias("match"),
        )
        for name, pattern in sorted(catalog.items())
    ]
    out = per_pattern[0]
    for p in per_pattern[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# mini CSS selector engine (kernel-side, from scratch)
# ---------------------------------------------------------------------------

_SIMPLE = re.compile(
    r"^(?P<tag>[a-z0-9]+)?(?P<id>#[\w-]+)?(?P<cls>(?:\.[\w-]+)+)?"
    r"(?P<attr>(?:\[[^\]]+\])*)(?P<pseudo>:[\w-]+(?:\(\d+\))?)?$"
)

# [attr], [attr=v], and the CSS attribute operators the reference's lxml
# engine gets for free from cssselect (extraction_strategy.py:1429-1796):
# ^= prefix, $= suffix, *= substring, ~= word
_ATTR_OP = re.compile(r"^([\w-]+)(?:([\^\$\*~]?)=(.*))?$")


def _match_attr(node: Node, inner: str) -> bool:
    m = _ATTR_OP.match(inner.strip())
    if not m:
        return False
    k, op, v = m.group(1), m.group(2), m.group(3)
    got = node.get(k)
    if v is None:
        return got is not None
    if got is None:
        return False
    v = v.strip().strip("\"'")
    if op == "^":
        return got.startswith(v)
    if op == "$":
        return got.endswith(v)
    if op == "*":
        return v in got
    if op == "~":
        return v in got.split()
    return got == v


def _match_pseudo(node: Node, pseudo: str) -> bool:
    """:nth-child(n) / :first-child / :last-child — the table-scraping
    pseudo-classes the reference's lxml engine special-cases
    (extraction_strategy.py:1468-1472 td:nth-child)."""
    parent = getattr(node, "parent", None)
    if parent is None:
        return False
    siblings = [c for c in parent.children if isinstance(c, Node)]
    try:
        pos = siblings.index(node) + 1  # CSS is 1-based
    except ValueError:
        return False
    m = re.match(r":nth-child\((\d+)\)$", pseudo)
    if m:
        return pos == int(m.group(1))
    if pseudo == ":first-child":
        return pos == 1
    if pseudo == ":last-child":
        return pos == len(siblings)
    return False  # unsupported pseudo -> no match, never a wrong one


def _match_simple(node: Node, sel: str) -> bool:
    m = _SIMPLE.match(sel)
    if not m:
        return False
    tag, id_, cls, attr = m.group("tag"), m.group("id"), m.group("cls"), m.group("attr")
    if tag and node.tag != tag:
        return False
    if id_ and node.get("id") != id_[1:]:
        return False
    if cls:
        need = set(cls[1:].split("."))
        if not need.issubset(set(node.classes)):
            return False
    if attr:
        for block in re.findall(r"\[([^\]]+)\]", attr):
            if not _match_attr(node, block):
                return False
    pseudo = m.group("pseudo")
    if pseudo and not _match_pseudo(node, pseudo):
        return False
    return True


def css_select(root: Node, selector: str) -> list[Node]:
    """Evaluate a (possibly compound) selector; supports ' ' and ' > '."""
    parts = [p for p in re.split(r"\s*(>)\s*|\s+", selector.strip()) if p]
    current: list[Node] = [root]
    direct = False
    for part in parts:
        if part == ">":
            direct = True
            continue
        nxt: list[Node] = []
        seen_ids = set()
        for base in current:
            pool = (
                [c for c in base.children if isinstance(c, Node)]
                if direct
                else base.iter()
            )
            for n in pool:
                if _match_simple(n, part) and id(n) not in seen_ids:
                    seen_ids.add(id(n))
                    nxt.append(n)
        current = nxt
        direct = False
    return current


# ---------------------------------------------------------------------------
# mini XPath engine (the JsonXPathExtractionStrategy subset: / and //
# axes, *, [@attr], [@attr='v'], [n], [last()]; '.' prefix for relative paths)
# ---------------------------------------------------------------------------

_XP_STEP = re.compile(r"^(?P<tag>[\w*-]+)(?P<preds>(?:\[[^\]]+\])*)$")


def _xp_preds(nodes: list[Node], preds: list[str]) -> list[Node]:
    for pred in preds:
        p = pred[1:-1].strip()
        if p.isdigit():  # positional, 1-based, within this context group
            i = int(p) - 1
            nodes = [nodes[i]] if 0 <= i < len(nodes) else []
        elif p == "last()":
            nodes = nodes[-1:]
        elif p.startswith("@"):
            if "=" in p:
                k, v = p[1:].split("=", 1)
                nodes = [n for n in nodes if n.get(k.strip()) == v.strip("'\"")]
            else:
                nodes = [n for n in nodes if n.get(p[1:]) is not None]
        else:
            return []  # unsupported predicate -> no match, never a wrong one
    return nodes


def xpath_select(root: Node, expr: str) -> list[Node]:
    """Evaluate an XPath-subset expression. Positional predicates apply
    within each context node's group (XPath semantics)."""
    expr = expr.strip()
    if expr.startswith("."):
        expr = expr[1:]
    if not expr.startswith("/"):
        expr = "//" + expr
    steps = re.findall(r"(//|/)([^/]+)", expr)
    current: list[Node] = [root]
    for axis, step in steps:
        if step == "text()":
            continue  # text extraction is the field type's job
        m = _XP_STEP.match(step)
        if not m:
            return []
        tag = m["tag"]
        preds = re.findall(r"\[[^\]]+\]", m["preds"] or "")
        nxt: list[Node] = []
        seen: set[int] = set()
        for base in current:
            pool = (
                [c for c in base.children if isinstance(c, Node)]
                if axis == "/"
                else base.iter()
            )
            group = [n for n in pool if tag == "*" or n.tag == tag]
            for n in _xp_preds(group, preds):
                if id(n) not in seen:
                    seen.add(id(n))
                    nxt.append(n)
        current = nxt
    return current


def _select(root: Node, selector: str) -> list[Node]:
    """Engine dispatch: XPath for '/', '//' or '.' prefixed selectors
    (JsonXPathExtractionStrategy), the CSS engine otherwise
    (JsonCssExtractionStrategy)."""
    s = selector.strip()
    if s.startswith(("/", "./")):
        return xpath_select(root, s)
    return css_select(root, s)


_TRANSFORMS = {
    "lowercase": str.lower,
    "uppercase": str.upper,
    "strip": str.strip,
}


def _extract_single(base: Node, fld: dict):
    """text / attribute / html / regex field over the first selector match
    (extraction_strategy.py:1119-1160 _extract_single_field). Returns None
    (-> field omitted / default) when the selector finds nothing.
    Deviation kept from round 1: a groupless regex returns the full match
    rather than erroring into the default like the reference."""
    if fld.get("selector"):
        nodes = _select(base, fld["selector"])
        if not nodes:
            return fld.get("default")
        n = nodes[0]
    else:
        n = base
    ftype = fld.get("type", "text")
    val = None
    if ftype == "text":
        val = n.text()
    elif ftype == "attribute":
        val = n.get(fld.get("attribute", ""))
    elif ftype == "html":
        val = n.to_html()
    elif ftype == "regex":
        m = re.search(fld.get("pattern", ""), n.text())
        val = (m.group(1) if m.groups() else m.group(0)) if m else None
    tr = fld.get("transform")
    if val is not None and tr in _TRANSFORMS:
        val = _TRANSFORMS[tr](val)
    return val if val is not None else fld.get("default")


_SAFE_CALLS = {
    "len": len, "str": str, "int": int, "float": float, "abs": abs,
    "min": min, "max": max, "round": round, "upper": str.upper,
    "lower": str.lower, "strip": str.strip, "title": str.title,
}
_SAFE_NODES = (
    "Expression", "BinOp", "UnaryOp", "BoolOp", "Compare", "IfExp", "Call",
    "Name", "Load", "Constant", "Subscript", "Index", "Slice", "Tuple",
    "List", "Dict", "JoinedStr", "FormattedValue", "Attribute",
    # operators
    "Add", "Sub", "Mult", "Div", "FloorDiv", "Mod", "Pow", "USub", "UAdd",
    "Not", "And", "Or", "Eq", "NotEq", "Lt", "LtE", "Gt", "GtE", "In",
    "NotIn", "Is", "IsNot",
)
_SAFE_STR_METHODS = frozenset(
    "upper lower strip lstrip rstrip title replace split join startswith "
    "endswith format zfill capitalize".split()
)


def _eval_restricted(expr: str, names: dict):
    """AST-whitelisted expression evaluator for computed fields: literals,
    arithmetic/boolean/comparison operators, subscripts, f-strings, a small
    call whitelist, and str methods — no attribute walks to dunders, no
    imports, no statements. Extraction schemas are config, but config from
    a shared catalog must not be arbitrary code execution on executors
    (empty-__builtins__ eval is escapable; this is not)."""
    import ast

    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        kind = type(node).__name__
        if kind not in _SAFE_NODES:
            raise ValueError(f"disallowed syntax in computed field: {kind}")
        if isinstance(node, ast.Attribute):
            if node.attr.startswith("_") or node.attr not in _SAFE_STR_METHODS:
                raise ValueError(f"disallowed attribute: {node.attr}")
        if isinstance(node, ast.Name) and node.id.startswith("__"):
            raise ValueError(f"disallowed name: {node.id}")

    def ev(n):
        if isinstance(n, ast.Expression):
            return ev(n.body)
        if isinstance(n, ast.Constant):
            return n.value
        if isinstance(n, ast.Name):
            if n.id in names:
                return names[n.id]
            if n.id in _SAFE_CALLS:
                return _SAFE_CALLS[n.id]
            raise ValueError(f"unknown name: {n.id}")
        if isinstance(n, ast.Attribute):
            obj = ev(n.value)
            if not isinstance(obj, str):
                raise ValueError("attribute access only on strings")
            return getattr(obj, n.attr)
        if isinstance(n, ast.Call):
            fn = ev(n.func)
            return fn(*[ev(a) for a in n.args],
                      **{k.arg: ev(k.value) for k in n.keywords})
        if isinstance(n, ast.BinOp):
            import operator as op

            ops = {ast.Add: op.add, ast.Sub: op.sub, ast.Mult: op.mul,
                   ast.Div: op.truediv, ast.FloorDiv: op.floordiv,
                   ast.Mod: op.mod, ast.Pow: op.pow}
            return ops[type(n.op)](ev(n.left), ev(n.right))
        if isinstance(n, ast.UnaryOp):
            v = ev(n.operand)
            return (-v if isinstance(n.op, ast.USub)
                    else +v if isinstance(n.op, ast.UAdd) else not v)
        if isinstance(n, ast.BoolOp):
            vals = [ev(v) for v in n.values]
            return all(vals) if isinstance(n.op, ast.And) else any(vals)
        if isinstance(n, ast.Compare):
            import operator as op

            ops = {ast.Eq: op.eq, ast.NotEq: op.ne, ast.Lt: op.lt,
                   ast.LtE: op.le, ast.Gt: op.gt, ast.GtE: op.ge,
                   ast.In: lambda a, b: a in b,
                   ast.NotIn: lambda a, b: a not in b,
                   ast.Is: op.is_, ast.IsNot: op.is_not}
            left = ev(n.left)
            for o, cmp in zip(n.ops, n.comparators):
                right = ev(cmp)
                if not ops[type(o)](left, right):
                    return False
                left = right
            return True
        if isinstance(n, ast.IfExp):
            return ev(n.body) if ev(n.test) else ev(n.orelse)
        if isinstance(n, ast.Subscript):
            idx = n.slice
            if isinstance(idx, ast.Slice):
                return ev(n.value)[
                    ev(idx.lower) if idx.lower else None:
                    ev(idx.upper) if idx.upper else None:
                    ev(idx.step) if idx.step else None]
            return ev(n.value)[ev(idx)]
        if isinstance(n, (ast.Tuple, ast.List)):
            vals = [ev(e) for e in n.elts]
            return tuple(vals) if isinstance(n, ast.Tuple) else vals
        if isinstance(n, ast.Dict):
            return {ev(k): ev(v) for k, v in zip(n.keys, n.values)}
        if isinstance(n, ast.JoinedStr):
            return "".join(str(ev(v)) for v in n.values)
        if isinstance(n, ast.FormattedValue):
            return ev(n.value)
        raise ValueError(f"unsupported node: {type(n).__name__}")

    return ev(tree)


def _compute_field(item: dict, fld: dict):
    """computed field (extraction_strategy.py:1219-1229): an expression over
    the already-extracted sibling fields, evaluated by the restricted AST
    interpreter above (the reference eval()s schema expressions; same
    expressive surface for arithmetic/string schemas, not a code-exec
    vector)."""
    try:
        if "expression" in fld:
            return _eval_restricted(fld["expression"], dict(item))
        if "function" in fld:
            return fld["function"](item)
    except Exception:
        return fld.get("default")
    return fld.get("default")


def _extract_item(base: Node, fields: list[dict]) -> dict:
    """Full field dispatch incl. nested / list / nested_list / computed
    (extraction_strategy.py:1083-1118,1186-1196 _extract_field/_extract_item)."""
    item: dict = {}
    for fld in fields:
        ftype = fld.get("type", "text")
        if ftype == "computed":
            val = _compute_field(item, fld)
        elif ftype == "nested":
            nodes = _select(base, fld["selector"]) if fld.get("selector") else [base]
            val = _extract_item(nodes[0], fld.get("fields", [])) if nodes \
                else fld.get("default")
        elif ftype == "list" and fld.get("fields"):
            nodes = _select(base, fld["selector"]) if fld.get("selector") else [base]
            # reference list items use single-field extraction only (flat)
            val = [
                {f["name"]: v for f in fld["fields"]
                 if (v := _extract_single(n, f)) is not None}
                for n in nodes
            ]
        elif ftype == "nested_list":
            nodes = _select(base, fld["selector"]) if fld.get("selector") else [base]
            val = [_extract_item(n, fld.get("fields", [])) for n in nodes]
        elif ftype == "list":
            # legacy flat list (no sub-fields): pipe-joined texts
            nodes = _select(base, fld["selector"]) if fld.get("selector") else [base]
            val = "|".join(x.text() for x in nodes) if nodes else fld.get("default")
        else:
            val = _extract_single(base, fld)
        if val is not None:
            item[fld["name"]] = val
    return item


def _stringify(val) -> str:
    """Map values are strings in the output column; structured values
    (nested/list) are JSON-encoded in place."""
    if isinstance(val, str):
        return val
    import json

    return json.dumps(val, ensure_ascii=False, separators=(",", ":"))


def _apply_schema(root: Node, schema: dict) -> list[dict[str, str]]:
    out = []
    for base in _select(root, schema.get("baseSelector", "body")):
        rec: dict = {}
        for fld in schema.get("baseFields", []):
            v = _extract_single(base, fld)
            if v is not None:
                rec[fld["name"]] = v
        rec.update(_extract_item(base, schema.get("fields", [])))
        rec = {k: _stringify(v) for k, v in rec.items()}
        if any(v for v in rec.values()):
            out.append(rec)
    return out


SCHEMA_EXTRACT_TYPE = StructType(
    [
        StructField("url", StringType()),
        StructField("records", ArrayType(MapType(StringType(), StringType()))),
    ]
)


def schema_extract(pages: DataFrame, schema: dict,
                   url_col: str = "url", html_col: str = "html") -> DataFrame:
    """pages(url, html) -> (url, records array<map<string,string>>)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for html in pdf[html_col]:
                try:
                    recs.append(_apply_schema(parse_html(html or b""), schema))
                except Exception:
                    recs.append([])
            yield pd.DataFrame({"url": pdf[url_col], "records": recs})

    return pages.select(F.col(url_col).alias("url"), html_col).mapInPandas(
        fn, SCHEMA_EXTRACT_TYPE
    )
