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
    comments: list = field(default_factory=list)  # <!-- --> bodies

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

    def handle_comment(self, data):
        # kept out of children so text() never leaks comment bodies;
        # the xpath comment() node test reads them
        self.stack[-1].comments.append(data)


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


# ------------------------------------------------------------------ xpath
# The reference's 3,788 spiders overwhelmingly write XPath
# (``response.xpath("//div[@class='price']/text()")``, e.g.
# spiders/123wonen_nl.py:62-205). This compiles the dominant subset
# onto the same tolerant DOM:
#
#   //tag /tag  *  @attr  text()  ..       (axes + node tests)
#   following-sibling:: preceding-sibling:: parent:: self:: descendant::
#   descendant-or-self::                            (r4)
#   axis::text() — e.g. //br/following-sibling::text()  (r4)
#   [@a] [@a='v'] [N] [last()]             (predicates)
#   [position()=N] [position()<N] (=, !=, <, <=, >, >=)   (r4)
#   [contains(@a,'v')] [starts-with(@a,'v')]
#   [contains(text(),'v')] [text()='v'] [contains(.,'v')] [.='v']
#   [contains(following-sibling::text(),'v')]              (r4)
#   text()[contains(.,'v')] / text()[N]                    (r4)
#   [normalize-space()] [not(@a)] [*] [tag]                (r4)
#   [p OR q] / [p AND q] over the atoms above (quote-, paren- and
#   bracket-aware split; 'or'/'and' tokens don't need spaces)
#   normalize-space(path) — string value of first result   (r4)
#   (path)[N] — position over the FLAT result list         (r4)
#   (path)/step — parenthesized path with a trailing step  (r4)
#   comment() — final step; bodies kept off text()         (r4)
#   a | b                                  (top-level union)
#   NESTED predicates: [span[contains(.,'v')]], [td[@c and .='v']] —
#   node-set boolean coercion (true iff non-empty)          (r4)
#   [not(P)] over any supported predicate P                 (r4)
#   path comparisons: [th='v'] (existential), [contains(PATH,'v')]
#   (string value of the FIRST node per XPath)              (r4)
#   @attr[string-preds] — filters the attribute-value list  (r4)
#   @attr[...]/parent::tag — owner-element recovery         (r4)
#   [last()-N], [(P)] parenthesized predicates              (r4)
#   following:: / preceding:: document-order axes           (r4)
#   substring-after/substring-before/string(path, …) — composable
#   string functions over the first result                  (r4)
#   whitespace between node test and predicate ("a [@b]")   (r4)
#
# Out of scope (raises ValueError at compile time): steps AFTER a
# text() step (text-node navigation), concat(), unquoted string
# literals, contains(..,'v') on text() nodes — each a singleton in
# the reference corpus, which this subset now covers at 99.4%
# occurrence-weighted (99.6% excluding f-string fragments the
# extraction regex can't see whole). Position predicates are
# evaluated per context node over the step's candidate list — exact
# for child/sibling axes, the practical reading for ``//``;
# preceding/preceding-sibling candidates come in proximity (reverse
# document) order, matching XPath's [1]-is-nearest semantics.
# contains(following-sibling::text(), s) tests the FIRST following
# text sibling (XPath's string-value-of-first-node rule).

_XP_HEAD_RE = re.compile(
    r"^(?:(?P<axis>following-sibling|preceding-sibling|following|"
    r"preceding|parent|self|descendant-or-self|descendant)::)?"
    r"(?P<test>\*|\.\.|@[\w:-]+|text\(\)|comment\(\)|[\w-]+)$"
)


def _step_parts(raw: str) -> tuple[str, list[str]]:
    """Split one step into (head, [predicate bodies]) — quote- and
    bracket-aware, so nested predicates (``li[span[contains(.,'x')]]``)
    and bracket characters inside string literals
    (``script[contains(.,'L.marker([')]``) parse correctly."""
    q, depth, head_end, start = "", 0, None, 0
    preds: list[str] = []
    for i, ch in enumerate(raw):
        if q:
            if ch == q:
                q = ""
        elif ch in "'\"":
            q = ch
        elif ch == "[":
            if depth == 0:
                if head_end is None:
                    head_end = i
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced ']' in xpath step: {raw!r}")
            if depth == 0:
                preds.append(raw[start:i])
        elif ch.isspace() and depth == 0:
            # whitespace between node test and predicate is legal
            # XPath ("script [@type='x']" appears in the corpus)
            if head_end is None:
                head_end = i
        elif depth == 0 and head_end is not None:
            raise ValueError(f"unsupported xpath step: {raw!r}")
    if depth != 0 or q:
        raise ValueError(f"unbalanced xpath step: {raw!r}")
    return (raw[:head_end] if head_end is not None else raw), preds


def _strip_call(p: str, name: str) -> str | None:
    """If ``p`` is exactly ``name( inner )`` (the closing paren matching
    the opening one is the LAST char), return ``inner``, else None."""
    m = re.match(rf"^{re.escape(name)}\s*\(", p)
    if not m:
        return None
    q, depth = "", 0
    for i in range(m.end() - 1, len(p)):
        ch = p[i]
        if q:
            if ch == q:
                q = ""
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return p[m.end():i] if i == len(p) - 1 else None
    return None
_XP_PRED_RES = [
    ("pos_last", re.compile(r"^last\(\)$")),
    ("pos_last_minus", re.compile(r"^last\(\)\s*-\s*(\d+)$")),
    ("pos", re.compile(r"^(\d+)$")),
    ("pos_cmp", re.compile(r"^position\(\)\s*(=|!=|<=|>=|<|>)\s*(\d+)$")),
    ("attr_eq", re.compile(r"^@([\w:-]+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")$")),
    ("attr_has", re.compile(r"^@([\w:-]+)$")),
    ("attr_contains",
     re.compile(r"^contains\(\s*@([\w:-]+)\s*,\s*(?:'([^']*)'|\"([^\"]*)\")\s*\)$")),
    ("attr_starts",
     re.compile(r"^starts-with\(\s*@([\w:-]+)\s*,\s*(?:'([^']*)'|\"([^\"]*)\")\s*\)$")),
    ("fsib_text_contains",
     re.compile(r"^contains\(\s*following-sibling::text\(\)\s*,\s*"
                r"(?:'([^']*)'|\"([^\"]*)\")\s*\)$")),
    ("text_contains",
     re.compile(r"^contains\(\s*(?:text\(\)|\.)\s*,\s*(?:'([^']*)'|\"([^\"]*)\")\s*\)$")),
    ("text_eq",
     re.compile(r"^(?:text\(\)|\.)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")$")),
    ("text_neq",
     re.compile(r"^(?:text\(\)|\.)\s*!=\s*(?:'([^']*)'|\"([^\"]*)\")$")),
    ("normspace", re.compile(r"^normalize-space\(\s*\)$")),
    ("attr_not", re.compile(r"^not\(\s*@([\w:-]+)\s*\)$")),
    ("haschild", re.compile(r"^\*$")),
    ("child_tag", re.compile(r"^([a-z][\w-]*)$")),
]

_POS_OPS = {
    "=": lambda i, n: i == n, "!=": lambda i, n: i != n,
    "<": lambda i, n: i < n, "<=": lambda i, n: i <= n,
    ">": lambda i, n: i > n, ">=": lambda i, n: i >= n,
}


def _split_bool(p: str, op: str) -> list[str]:
    """Split a predicate body on top-level ``or``/``and`` tokens,
    quote-aware (never inside '...'/"...") and paren/bracket-aware
    (never inside a nested predicate's ``[...]``). The token needs a
    boundary on both sides but not necessarily spaces — the corpus
    writes ``contains(.,'x')or contains(.,'y')``."""
    rx = re.compile(rf"(?<=[\s)'\"]){op}(?=[\s('\"@.])")
    parts, depth, q, start = [], 0, "", 0
    i = 0
    while i < len(p):
        ch = p[i]
        if q:
            if ch == q:
                q = ""
        elif ch in "'\"":
            q = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0:
            m = rx.match(p, i)
            if m:
                parts.append(p[start:i])
                i = m.end()
                start = i
                continue
        i += 1
    parts.append(p[start:])
    return parts


def _xp_parse_pred(p: str):
    p = p.strip()
    for op, kind in (("or", "bool_or"), ("and", "bool_and")):
        parts = _split_bool(p, op)
        if len(parts) > 1:
            return (kind, tuple(_xp_parse_pred(x) for x in parts))
    inner = _strip_call(p, "")
    if inner is not None:  # a fully parenthesized predicate: [(p)]
        return _xp_parse_pred(inner)
    inner = _strip_call(p, "not")
    if inner is not None:
        return ("bool_not", _xp_parse_pred(inner))
    for kind, rx in _XP_PRED_RES:
        m = rx.match(p)
        if m:
            groups = [g for g in m.groups() if g is not None]
            return (kind, *groups)
    # comparisons/functions whose left side is a relative PATH — XPath
    # node-set semantics: = / != are existential over the set's string
    # values, contains/starts-with take the FIRST node's string value
    # (corpus: [th='Surface habitable (m²)'],
    # [contains(.//dt//text(), 'Floor')])
    m = re.match(r"^(.+?)\s*(!=|=)\s*(?:'([^']*)'|\"([^\"]*)\")$", p)
    if m:
        val = m.group(3) if m.group(3) is not None else m.group(4)
        try:
            return ("path_cmp", m.group(2), XPathSelector(m.group(1)), val)
        except ValueError:
            pass
    for fname, kind in (("contains", "path_contains"),
                        ("starts-with", "path_starts")):
        inner = _strip_call(p, fname)
        if inner is not None:
            args = _xp_call_args(inner)
            if len(args) == 2 and re.match(r"^'[^']*'$|^\"[^\"]*\"$",
                                           args[1]):
                try:
                    return (kind, XPathSelector(args[0]), args[1][1:-1])
                except ValueError:
                    pass
    # node-set predicate: a relative path is true iff it selects at
    # least one node from the context node (XPath boolean coercion) —
    # the corpus's ``li[span[contains(.,'Prezzo')]]`` / ``tr[th[.='x']]``
    if re.match(r"^(?:\.//?|@|\*|[a-zA-Z])", p):
        try:
            return ("nested", XPathSelector(p))
        except ValueError:
            pass
    raise ValueError(f"unsupported xpath predicate: [{p}]")


def _xp_pred_matches(kind_args, n: Node) -> bool:
    kind = kind_args[0]
    if kind == "bool_or":
        return any(_xp_pred_matches(sub, n) for sub in kind_args[1])
    if kind == "bool_and":
        return all(_xp_pred_matches(sub, n) for sub in kind_args[1])
    if kind == "bool_not":
        return not _xp_pred_matches(kind_args[1], n)
    if kind == "nested":
        return bool(kind_args[1].select(n))
    if kind == "path_cmp":
        vals = kind_args[2].select(n)
        strs = [v.text() if isinstance(v, Node) else str(v) for v in vals]
        if kind_args[1] == "=":  # existential node-set comparison
            return any(s == kind_args[3] for s in strs)
        return any(s != kind_args[3] for s in strs)
    if kind in ("path_contains", "path_starts"):
        vals = kind_args[1].select(n)
        v = vals[0] if vals else ""
        s = v.text() if isinstance(v, Node) else str(v)
        return (kind_args[2] in s if kind == "path_contains"
                else s.startswith(kind_args[2]))
    if kind == "attr_str":
        # merged @attr[string-preds]/parent:: step: the owner element
        # passes iff the attribute exists and its value passes
        name, preds = kind_args[1], kind_args[2]
        if name not in n.attrs:
            return False
        return bool(XPathSelector._filter_strings([n.attrs[name]],
                                                  preds))
    if kind == "attr_eq":
        return n.attrs.get(kind_args[1]) == kind_args[2]
    if kind == "attr_has":
        return kind_args[1] in n.attrs
    if kind == "attr_contains":
        return kind_args[2] in (n.attrs.get(kind_args[1]) or "")
    if kind == "attr_starts":
        return (n.attrs.get(kind_args[1]) or "").startswith(kind_args[2])
    if kind == "text_contains":
        return kind_args[1] in n.text()
    if kind == "text_eq":
        return n.text() == kind_args[1]
    if kind == "text_neq":
        return n.text() != kind_args[1]
    if kind == "normspace":
        return n.text() != ""  # Node.text() is whitespace-normalized
    if kind == "attr_not":
        return kind_args[1] not in n.attrs
    if kind == "haschild":  # [*]: has at least one element child
        return any(isinstance(c, Node) for c in n.children)
    if kind == "child_tag":  # [h1]: has a child element of that tag
        return any(
            isinstance(c, Node) and c.tag == kind_args[1] for c in n.children
        )
    if kind == "fsib_text_contains":
        # contains(following-sibling::text(), s): XPath takes the
        # string value of the FIRST node of the set = the nearest
        # following text sibling; empty set → '' → False for s != ''
        if n.parent is None:
            return kind_args[1] == ""
        sibs = n.parent.children
        i = next((k for k, c in enumerate(sibs) if c is n), None)
        first = next(
            (c for c in sibs[i + 1:] if isinstance(c, str)), ""
        ) if i is not None else ""
        return kind_args[1] in first
    raise AssertionError(kind)


_TEXT_PRED_ATOMS = {"text_contains", "text_eq", "text_neq", "normspace"}


def _text_pred_ok(kp, allow_pos: bool = True) -> bool:
    """Predicates usable on text()/comment() string nodes; positional
    atoms only at the top level (per-string position inside a boolean
    has no XPath reading we support)."""
    k = kp[0]
    if k in ("bool_or", "bool_and"):
        return all(_text_pred_ok(s, allow_pos=False) for s in kp[1])
    if k == "bool_not":
        return _text_pred_ok(kp[1], allow_pos=False)
    if k in ("pos", "pos_last", "pos_last_minus", "pos_cmp"):
        return allow_pos
    return k in _TEXT_PRED_ATOMS


def _xp_call_args(s: str) -> list[str]:
    """Split a function-call argument list on top-level commas —
    quote-, paren- and bracket-aware."""
    parts, depth, q, start = [], 0, "", 0
    for i, ch in enumerate(s):
        if q:
            if ch == q:
                q = ""
        elif ch in "'\"":
            q = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _xp_split_steps(path: str) -> list[tuple[bool, str]]:
    """'//a/b//c' → [(True,'a'), (False,'b'), (True,'c')] — bool is
    the descendant axis flag."""
    path = path.strip()
    if path == ".":  # the context node itself (normalize-space(.) etc.)
        return [(False, "self::*")]
    if path == "..":  # the parent (contains(..,'v') left sides)
        return [(False, "..")]
    if path.startswith("."):
        path = path[1:]
    steps: list[tuple[bool, str]] = []
    i = 0
    while i < len(path):
        if path.startswith("//", i):
            deep, i = True, i + 2
        elif path.startswith("/", i):
            deep, i = False, i + 1
        elif not steps:  # bare relative step, e.g. "span/text()"
            deep = False
        else:
            raise ValueError(f"unsupported xpath: {path!r}")
        j, depth, q = i, 0, ""
        while j < len(path) and (depth > 0 or q or path[j] != "/"):
            ch = path[j]
            if q:
                if ch == q:
                    q = ""
            elif ch in "'\"":
                q = ch
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            j += 1
        if j == i:
            raise ValueError(f"empty xpath step in {path!r}")
        steps.append((deep, path[i:j]))
        i = j
    if not steps:
        raise ValueError(f"empty xpath: {path!r}")
    return steps


class XPathSelector:
    """Compiled XPath-subset expression; same .select/.select_first
    surface as :class:`Selector`, usable anywhere the rules DSL takes
    a selector."""

    # the (path)[preds]/tail form — string functions are unwrapped
    # before this is applied, so only the parenthesized-path form
    # remains; preds and tail are both optional ((path)/step appears
    # in the corpus without a flat predicate)
    _WRAP_RE = re.compile(
        r"^\(\s*(?P<par>.*?)\s*\)(?P<fpreds>(?:\[[^\]]*\])*)"
        r"(?P<tail>/.*)?$",
        re.DOTALL,
    )

    def __init__(self, expr: str):
        self.expr = expr
        # each branch: (steps, flat_preds, strfns, tail_steps) —
        # flat_preds come from the (path)[N] form and filter the
        # branch's FLAT result list (document order across contexts),
        # unlike per-step [N]; strfns is the stack of XPath string
        # functions wrapping the branch (normalize-space /
        # substring-after / substring-before — composable, applied to
        # the string value of the first result).
        self.paths: list[tuple[list, list, list, list]] = []
        for branch in self._split_union(expr):
            strfns: list[tuple] = []  # outermost first
            flat_preds: list = []
            tail_steps: list = []
            while True:
                inner = _strip_call(branch, "normalize-space")
                if inner is not None:
                    strfns.append(("normspace",))
                    branch = inner.strip()
                    continue
                inner = _strip_call(branch, "string")
                if inner is not None:  # string(path): plain string value
                    strfns.append(("string",))
                    branch = inner.strip()
                    continue
                for name, key in (("substring-after", "after"),
                                  ("substring-before", "before")):
                    inner = _strip_call(branch, name)
                    if inner is not None:
                        args = _xp_call_args(inner)
                        if len(args) != 2 or not re.match(
                            r"^'[^']*'$|^\"[^\"]*\"$", args[1]
                        ):
                            raise ValueError(
                                f"unsupported {name} args: {inner!r}")
                        strfns.append((key, args[1][1:-1]))
                        branch = args[0]
                        break
                else:
                    break
            m = self._WRAP_RE.match(branch)
            if m and m.group("par") is not None:
                flat_preds = [
                    _xp_parse_pred(p)
                    for p in re.findall(r"\[([^\]]*)\]", m.group("fpreds"))
                ]
                if m.group("tail"):  # (path)[N]/more/steps
                    tail_steps = self._compile_steps(m.group("tail"))
                branch = m.group("par")
            if branch == ".":  # normalize-space(.) — the context node
                branch = "self::*"
            self.paths.append(
                (self._compile_steps(branch), flat_preds, strfns,
                 tail_steps)
            )

    def _compile_steps(self, branch: str) -> list:
        steps = []
        for deep, raw in _xp_split_steps(branch):
            if raw == ".":  # redundant self step (corpus: //.//div)
                continue
            head, pred_bodies = _step_parts(raw.strip())
            m = _XP_HEAD_RE.match(head)
            if not m:
                raise ValueError(f"unsupported xpath step: {raw!r}")
            axis = m.group("axis")
            test = m.group("test")
            if test == "..":
                axis, test = "parent", "*"
            elif axis is None:
                axis = "descendant" if deep else "child"
            preds = [_xp_parse_pred(p) for p in pred_bodies]
            if test.startswith("@"):
                # attribute steps take string predicates, applied over
                # the flat attribute-value list (corpus:
                # //iframe/@src[contains(.,'map')],
                # //img//@src[not(contains(.,'empty'))])
                for kp in preds:
                    if not _text_pred_ok(kp):
                        raise ValueError(
                            f"unsupported predicate on {test}: {raw!r}"
                        )
            if test in ("text()", "comment()"):
                if axis in ("following", "preceding"):
                    raise ValueError(
                        f"{test} not supported on axis {axis}: {raw!r}")
                for kp in preds:
                    if not _text_pred_ok(kp):
                        raise ValueError(
                            f"unsupported predicate on {test}: {raw!r}"
                        )
            steps.append((axis, test.lower(), preds, deep))
        # @attr[string-preds]/parent::tag — the attribute node's parent
        # is its owner element, so the pair merges into one self-axis
        # step (corpus: //a/@href[contains(.,'tel')]/parent::a/text())
        merged: list = []
        i = 0
        while i < len(steps):
            axis, test, preds, deep = steps[i]
            if (test.startswith("@") and i + 1 < len(steps)
                    and steps[i + 1][0] == "parent"
                    and axis == "child"
                    and all(_text_pred_ok(kp, allow_pos=False)
                            for kp in preds)):
                _, p_test, p_preds, _ = steps[i + 1]
                merged.append((
                    "self", p_test,
                    [("attr_str", test[1:], tuple(preds))] + list(p_preds),
                    False,
                ))
                i += 2
                continue
            merged.append(steps[i])
            i += 1
        steps = merged
        for axis, test, _, _ in steps[:-1]:
            if test.startswith("@") or test in ("text()", "comment()"):
                raise ValueError(
                    f"{test} must be the final step: {self.expr!r}"
                )
        return steps

    @staticmethod
    def _split_union(expr: str) -> list[str]:
        parts, depth, q, start = [], 0, "", 0
        for i, ch in enumerate(expr):
            if q:
                if ch == q:
                    q = ""
            elif ch in "'\"":
                q = ch
            elif ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "|" and depth == 0:
                parts.append(expr[start:i])
                start = i + 1
        parts.append(expr[start:])
        return [p.strip() for p in parts if p.strip()]

    @staticmethod
    def _texts(n: Node, deep: bool) -> list[str]:
        if not deep:
            return [c for c in n.children if isinstance(c, str)]
        out: list[str] = []

        def walk(x: Node) -> None:
            for c in x.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)

        walk(n)
        return out

    @staticmethod
    def _axis_candidates(base: Node, axis: str) -> list:
        if axis == "child":
            return [c for c in base.children if isinstance(c, Node)]
        if axis == "descendant":
            return [n for n in base.iter_nodes() if n is not base]
        if axis == "descendant-or-self":
            return list(base.iter_nodes())
        if axis == "self":
            return [base]
        if axis == "parent":
            return [base.parent] if base.parent is not None else []
        if axis in ("following", "preceding"):
            # document-order axes: everything after base's subtree /
            # before base's start tag, excluding ancestors; following
            # in document order, preceding in proximity order
            out: list[Node] = []
            node = base
            while node.parent is not None:
                sibs = [c for c in node.parent.children
                        if isinstance(c, Node)]
                i = next((k for k, s in enumerate(sibs) if s is node), None)
                if i is not None:
                    if axis == "following":
                        for s in sibs[i + 1:]:
                            out.extend(s.iter_nodes())
                    else:
                        for s in sibs[:i][::-1]:
                            out.extend(reversed(list(s.iter_nodes())))
                node = node.parent
            return out
        sibs = (
            [c for c in base.parent.children if isinstance(c, Node)]
            if base.parent is not None
            else []
        )
        i = next((k for k, s in enumerate(sibs) if s is base), None)
        if i is None:
            return []
        if axis == "following-sibling":
            return sibs[i + 1:]
        if axis == "preceding-sibling":
            return sibs[:i][::-1]  # proximity order: [1] = nearest
        raise AssertionError(axis)

    def _eval_path(self, root, steps) -> list:
        current = root if isinstance(root, list) else [root]
        for axis, test, preds, deep in steps:
            if test.startswith("@"):
                name = test[1:]
                nodes = current
                if deep:  # //@a: the attribute on self or any descendant
                    nodes = []
                    for n in current:
                        nodes.extend(n.iter_nodes())
                vals = [n.attrs[name] for n in nodes if name in n.attrs]
                return self._filter_strings(vals, preds)
            if test in ("text()", "comment()"):
                out: list[str] = []
                for n in current:
                    if test == "comment()":
                        texts = self._comment_candidates(n, axis, deep)
                    else:
                        texts = self._text_candidates(n, axis, deep)
                    out.extend(self._filter_strings(texts, preds))
                return out
            nxt: list[Node] = []
            seen: set[int] = set()
            for base in current:
                cand = self._axis_candidates(base, axis)
                if test != "*":
                    cand = [n for n in cand if n.tag == test]
                for kp in preds:  # sequential filtering, XPath-style
                    if kp[0] == "pos":
                        k = int(kp[1]) - 1
                        cand = [cand[k]] if 0 <= k < len(cand) else []
                    elif kp[0] == "pos_last":
                        cand = cand[-1:]
                    elif kp[0] == "pos_last_minus":
                        k = len(cand) - 1 - int(kp[1])
                        cand = [cand[k]] if 0 <= k < len(cand) else []
                    elif kp[0] == "pos_cmp":
                        op = _POS_OPS[kp[1]]
                        lim = int(kp[2])
                        cand = [n for i, n in enumerate(cand, 1) if op(i, lim)]
                    else:
                        cand = [n for n in cand if _xp_pred_matches(kp, n)]
                for n in cand:
                    if id(n) not in seen:
                        seen.add(id(n))
                        nxt.append(n)
            current = nxt
        return current

    @staticmethod
    def _filter_strings(texts: list[str], preds) -> list[str]:
        """Sequential XPath-style predicate filtering over a string
        node list (text()/comment() candidates or a flat (path)[N]
        result)."""
        for kp in preds:
            if kp[0] == "pos":
                k = int(kp[1]) - 1
                texts = [texts[k]] if 0 <= k < len(texts) else []
            elif kp[0] == "pos_last":
                texts = texts[-1:]
            elif kp[0] == "pos_last_minus":
                k = len(texts) - 1 - int(kp[1])
                texts = [texts[k]] if 0 <= k < len(texts) else []
            elif kp[0] == "pos_cmp":
                op = _POS_OPS[kp[1]]
                lim = int(kp[2])
                texts = [t for i, t in enumerate(texts, 1) if op(i, lim)]
            else:
                texts = [t for t in texts
                         if XPathSelector._string_pred(t, kp)]
        return texts

    @staticmethod
    def _string_pred(t: str, kp) -> bool:
        k = kp[0]
        if k == "bool_or":
            return any(XPathSelector._string_pred(t, s) for s in kp[1])
        if k == "bool_and":
            return all(XPathSelector._string_pred(t, s) for s in kp[1])
        if k == "bool_not":
            return not XPathSelector._string_pred(t, kp[1])
        if k == "text_contains":
            return kp[1] in t
        if k == "text_eq":
            return t == kp[1]
        if k == "text_neq":
            return t != kp[1]
        if k == "normspace":
            return bool(t.strip())
        raise AssertionError(k)  # unreachable: compile gates the set

    @staticmethod
    def _comment_candidates(n: Node, axis: str, deep: bool) -> list[str]:
        """comment() node candidates: the context node's own comment
        children (child axis) or every comment in its subtree (the
        ``//comment()`` reading)."""
        if axis in ("following-sibling", "preceding-sibling", "parent"):
            raise ValueError(f"comment() not supported on axis {axis}")
        if deep or axis in ("descendant", "descendant-or-self"):
            return [c for x in n.iter_nodes() for c in x.comments]
        return list(n.comments)

    @staticmethod
    def _text_candidates(n: Node, axis: str, deep: bool) -> list[str]:
        """text() node candidates for one context node under an axis:
        child (default), descendant (the ``//text()`` reading), or the
        sibling axes — e.g. ``//br/following-sibling::text()``, the
        reference corpus's most common sibling pattern (38 spiders)."""
        if axis in ("following-sibling", "preceding-sibling"):
            if n.parent is None:
                return []
            sibs = n.parent.children
            i = next((k for k, c in enumerate(sibs) if c is n), None)
            if i is None:
                return []
            if axis == "following-sibling":
                return [c for c in sibs[i + 1:] if isinstance(c, str)]
            return [c for c in sibs[:i][::-1] if isinstance(c, str)]
        return XPathSelector._texts(n, deep or axis in
                                    ("descendant", "descendant-or-self"))

    def select(self, root: Node) -> list:
        out: list = []
        seen: set[int] = set()
        for steps, flat_preds, strfns, tail_steps in self.paths:
            vals = self._eval_path(root, steps)
            for kp in flat_preds:  # (path)[N]: filter the FLAT result
                if kp[0] in ("pos", "pos_last", "pos_last_minus",
                             "pos_cmp") or not any(
                    isinstance(v, Node) for v in vals
                ):
                    vals = self._filter_strings(vals, [kp])
                else:
                    vals = [v for v in vals if _xp_pred_matches(kp, v)]
            if tail_steps:  # (path)[N]/more — continue from the picks
                vals = self._eval_path(
                    [v for v in vals if isinstance(v, Node)], tail_steps
                )
            if strfns:
                # XPath string functions: string value of the first
                # result (empty node-set → ''), innermost applied first
                v = vals[0] if vals else ""
                s = v.text() if isinstance(v, Node) else str(v)
                for fn in reversed(strfns):
                    if fn[0] == "string":
                        pass  # string(): already the string value
                    elif fn[0] == "normspace":
                        s = re.sub(r"\s+", " ", s).strip()
                    elif fn[0] == "after":
                        k = s.find(fn[1])
                        s = s[k + len(fn[1]):] if k >= 0 else ""
                    else:  # before
                        k = s.find(fn[1])
                        s = s[:k] if k >= 0 else ""
                out.append(s)
                continue
            for v in vals:
                key = id(v) if isinstance(v, Node) else ("s", len(out), v)
                if isinstance(v, Node):
                    if key in seen:
                        continue
                    seen.add(key)
                out.append(v)
        return out

    def select_first(self, root: Node):
        out = self.select(root)
        return out[0] if out else None


def is_xpath(expr: str) -> bool:
    e = expr.strip()
    return (
        e.startswith(("/", "./", ".//", "normalize-space(", "@",
                      "substring-after(", "substring-before("))
        or bool(re.match(r"^\(*//", e))
        # relative XPath without a leading axis marker — these
        # substrings never occur in the CSS subset
        or "//" in e
        or "[@" in e
        or "/text()" in e
        or "/comment()" in e
        or "/@" in e
    )


def compile_selector(expr: str):
    """Front door for the rules DSL: XPath-looking expressions compile
    to :class:`XPathSelector`, everything else to the CSS-subset
    :class:`Selector`."""
    return XPathSelector(expr) if is_xpath(expr) else Selector(expr)


def select(root_or_html, expr: str) -> list:
    root = (
        root_or_html
        if isinstance(root_or_html, Node)
        else parse_html(root_or_html)
    )
    return compile_selector(expr).select(root)


def select_first(root_or_html, expr: str):
    out = select(root_or_html, expr)
    return out[0] if out else None
