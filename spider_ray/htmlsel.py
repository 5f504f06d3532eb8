"""Real-HTML selection for the rules DSL — stdlib ``html.parser`` only.

The reference's M1 is ``response.xpath(...)``/``response.css(...)``
over arbitrary site markup (lxml/parsel under Scrapy; e.g.
spiders/123wonen_nl.py:62-205). This container has no lxml, so the
graft provides a tolerant DOM built on ``html.parser`` plus a CSS
subset — enough for the selector patterns the 3,788 reference spiders
actually use (tag / class / id / attribute filters, descendant and
child combinators, ``::text`` / ``::attr(name)`` extraction):

    select(root, "div.price::text")
    select(root, "ul#amenities > li::text")
    select(root, "img.photo::attr(src)")
    select(root, "[data-rent]::attr(data-rent)")

Tolerance: unclosed tags auto-close at the nearest matching ancestor
(or stay open to document end), void elements (<img>, <br>, …) never
push the stack, case-insensitive tag names, attribute values with or
without quotes — the messy-markup behaviors html.parser already
normalizes. Parsing is per-document inside ``map_batches`` tasks;
compile selectors once per actor (``Selector`` instances are
picklable and reusable).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# implied end tags (HTML5 tree-construction subset): an incoming start
# tag auto-closes these still-open elements first
_CLOSES_P = frozenset(
    "p div ul ol dl table h1 h2 h3 h4 h5 h6 li blockquote pre section "
    "article form tr".split()
)
_AUTOCLOSE: dict[str, frozenset] = {
    "li": frozenset({"li"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "dd": frozenset({"dd", "dt"}),
    "dt": frozenset({"dd", "dt"}),
    "option": frozenset({"option"}),
}


@dataclass
class Node:
    tag: str
    attrs: dict
    children: list = field(default_factory=list)  # Node | str (text)
    parent: "Node | None" = None

    def text(self) -> str:
        """Concatenated descendant text, whitespace-normalized."""
        out: list[str] = []

        def walk(n: Node) -> None:
            for c in n.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)

        walk(self)
        return re.sub(r"\s+", " ", "".join(out)).strip()

    def iter_nodes(self):
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter_nodes()

    def classes(self) -> frozenset:
        return frozenset((self.attrs.get("class") or "").split())


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("<root>", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        closes = _AUTOCLOSE.get(tag, frozenset())
        while len(self.stack) > 1 and (
            self.stack[-1].tag in closes
            or (self.stack[-1].tag == "p" and tag in _CLOSES_P)
        ):
            self.stack.pop()
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs},
                    parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(
            Node(tag, {k: (v if v is not None else "") for k, v in attrs},
                 parent=self.stack[-1])
        )

    def handle_endtag(self, tag):
        # tolerant close: pop to the nearest matching open tag; ignore
        # stray end tags entirely
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> Node:
    b = _TreeBuilder()
    b.feed(text or "")
    b.close()
    return b.root


# ------------------------------------------------------------------ selectors
_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<attrs>(?:\[[^\]]+\])*)$"
)


@dataclass(frozen=True)
class _Simple:
    tag: str | None
    id: str | None
    classes: frozenset
    attrs: tuple  # of (name, value-or-None)

    def matches(self, n: Node) -> bool:
        if self.tag and self.tag != "*" and n.tag != self.tag:
            return False
        if self.id and n.attrs.get("id") != self.id:
            return False
        if self.classes and not self.classes <= n.classes():
            return False
        for name, val in self.attrs:
            if name not in n.attrs:
                return False
            if val is not None and n.attrs[name] != val:
                return False
        return True


def _parse_simple(tok: str) -> _Simple:
    m = _SIMPLE_RE.match(tok)
    if not m:
        raise ValueError(f"unsupported selector component: {tok!r}")
    attrs = []
    for a in re.findall(r"\[([^\]]+)\]", m.group("attrs") or ""):
        if "=" in a:
            name, _, val = a.partition("=")
            attrs.append((name.strip().lower(), val.strip().strip("'\"")))
        else:
            attrs.append((a.strip().lower(), None))
    return _Simple(
        tag=(m.group("tag") or "").lower() or None,
        id=(m.group("id") or "")[1:] or None,
        classes=frozenset(c for c in (m.group("classes") or "").split(".") if c),
        attrs=tuple(attrs),
    )


class Selector:
    """Compiled CSS-subset selector with an optional extraction pseudo:
    ``"div.a > span.b::text"`` / ``"img::attr(src)"``. No pseudo →
    nodes are returned."""

    def __init__(self, expr: str):
        self.expr = expr
        body, self.extract, self.attr = expr, None, None
        m = re.search(r"::(text|attr\(([\w-]+)\))\s*$", expr)
        if m:
            body = expr[: m.start()]
            self.extract = "attr" if m.group(1).startswith("attr") else "text"
            self.attr = m.group(2)
        # sequence of (combinator, simple): combinator ' ' = descendant,
        # '>' = direct child
        toks = re.findall(r">|[^\s>]+", body.strip())
        self.steps: list[tuple[str, _Simple]] = []
        comb = " "
        for t in toks:
            if t == ">":
                comb = ">"
                continue
            self.steps.append((comb, _parse_simple(t)))
            comb = " "
        if not self.steps:
            raise ValueError(f"empty selector: {expr!r}")

    def _match_nodes(self, root: Node) -> list[Node]:
        current = [root]
        for comb, simple in self.steps:
            nxt: list[Node] = []
            seen = set()
            for base in current:
                if comb == ">":
                    cand = [c for c in base.children if isinstance(c, Node)]
                else:
                    cand = [n for n in base.iter_nodes() if n is not base]
                for n in cand:
                    if simple.matches(n) and id(n) not in seen:
                        seen.add(id(n))
                        nxt.append(n)
            current = nxt
        return current

    def select(self, root: Node) -> list:
        nodes = self._match_nodes(root)
        if self.extract == "text":
            return [n.text() for n in nodes]
        if self.extract == "attr":
            return [n.attrs[self.attr] for n in nodes if self.attr in n.attrs]
        return nodes

    def select_first(self, root: Node):
        out = self.select(root)
        return out[0] if out else None


def select(root_or_html, expr: str) -> list:
    root = (
        root_or_html
        if isinstance(root_or_html, Node)
        else parse_html(root_or_html)
    )
    return Selector(expr).select(root)


def select_first(root_or_html, expr: str):
    out = select(root_or_html, expr)
    return out[0] if out else None
