"""Declarative per-field extraction rules — the graft's user-extension
surface (SURVEY.md §2.10).

The reference's ``ItemClear`` (python_spiders/helper.py:533-653) is a
config-object DSL: each call names an item field, an input (xpath or
literal), then a chain of split/replace steps, numeric extraction,
casing, boolean keyword matching, sqft conversion, per-week rent
scaling, date parsing and energy-label binning. A spider author
composes ~20 such calls instead of writing imperative extraction.

The graft re-expresses that as data: a :class:`FieldRule` record per
output column, compiled by :func:`compile_rules` into ONE vectorized
``map_batches`` body over a table of raw page fields. A "spider" for a
new site is then a :class:`SiteSpec` — seed URLs + a rule table — and
registering one requires no engine code at all.

Rule pipeline order (mirrors ItemClear's application order):
  source → regex-extract → split chain → replace chain → casing →
  one terminal transform (get_num | bool_words | sq_ft | per_week |
  date | energy) — terminal transforms are mutually exclusive like the
  reference's mutually-exclusive keyword args.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa

from . import extract

# tf words per the reference's multilingual yes-set (helper.py ItemClear
# bool handling: yes/si/oui/ja/var/evet …)
TRUE_WORDS = ("yes", "si", "sì", "oui", "ja", "var", "evet", "true", "wahr")


@dataclass(frozen=True)
class FieldRule:
    """One output column's declarative extraction recipe."""

    field: str                    # output column name
    source: str                   # raw-field name, or the literal itself
    literal: bool = False         # True → ``source`` IS the value
    # CSS-subset selector over raw HTML in ``source`` (the reference's
    # input_type='xpath' analog for arbitrary markup; spider_ray.htmlsel)
    selector: str | None = None
    select_all: bool = False      # selector returns the full match list
    regex: str | None = None      # first group (or whole match) from source
    split: tuple = ()             # chain of (separator, index)
    replace: tuple = ()           # chain of (old, new)
    lower: bool = False
    upper: bool = False
    strip: bool = True
    # terminal transforms (at most one):
    get_num: bool = False
    thousand_separator: str = "."
    scale_separator: str = ","
    bool_words: tuple = ()        # truthy keyword match → True else None
    sq_ft: bool = False           # ItemClear conversion int(x*0.09290304)
    per_week: bool = False        # rent×4 (helper.py:649-651)
    date_format: str | None = None
    year_bump: bool = False
    energy: bool = False

    def _scalar(self, value):
        if value is None:
            return None
        s = str(value)
        if self.regex:
            m = re.search(self.regex, s)
            if not m:
                return None
            s = m.group(1) if m.groups() else m.group(0)
        for sep, idx in self.split:
            parts = s.split(sep)
            if not (-len(parts) <= idx < len(parts)):
                return None
            s = parts[idx]
        for old, new in self.replace:
            s = s.replace(old, new)
        if self.strip:
            s = s.strip()
        if self.lower:
            s = s.lower()
        if self.upper:
            s = s.upper()
        if self.get_num:
            n = extract.extract_number_only(
                s, self.thousand_separator, self.scale_separator
            )
            return int(n) if n == int(n) else n
        if self.bool_words:
            low = s.lower()
            return True if any(w in low for w in self.bool_words) else None
        if self.sq_ft:
            n = extract.extract_number_only(
                s, self.thousand_separator, self.scale_separator
            )
            return extract.sq_feet_to_meters_itemclear(n)
        if self.per_week:
            n = extract.extract_number_only(
                s, self.thousand_separator, self.scale_separator
            )
            return extract.per_week_to_month(n)
        if self.date_format:
            if self.year_bump:
                return extract.parse_date_with_year_bump(s, self.date_format)
            return extract.format_date(s, self.date_format)
        if self.energy:
            n = extract.extract_number_only(
                s, self.thousand_separator, self.scale_separator
            )
            return extract.energy_label(n)
        return s

    def apply(self, df: pd.DataFrame) -> pd.Series:
        if self.literal:
            src = pd.Series([self.source] * len(df), index=df.index)
        else:
            src = df.get(self.source, pd.Series([None] * len(df), index=df.index))
        return src.map(self._scalar, na_action="ignore")


_SELECTOR_CACHE: dict = {}  # per-process compiled-selector cache


def _compiled(expr: str):
    from .htmlsel import compile_selector

    s = _SELECTOR_CACHE.get(expr)
    if s is None:
        # XPath-looking expressions (the reference spiders' dominant
        # dialect, e.g. //div[@class='price']/text()) compile to the
        # XPath-subset engine, the rest to the CSS subset
        s = _SELECTOR_CACHE[expr] = compile_selector(expr)
    return s


def compile_rules(rules: list[FieldRule]):
    """Rules → one vectorized ``map_batches`` body (pyarrow in/out).

    Selector rules share one DOM parse per (row, source column) — a
    page referenced by twenty rules is parsed once, not twenty times.
    """
    from .htmlsel import parse_html

    sel_sources = {r.source for r in rules if r.selector}

    def batch_fn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cols = dict(zip(batch.column_names, batch.columns))
        trees = {
            src: [parse_html(h) if h else None for h in df[src]]
            for src in sel_sources
            if src in df.columns
        }
        for rule in rules:
            if rule.selector:
                comp = _compiled(rule.selector)
                roots = trees.get(rule.source, [None] * len(df))
                if rule.select_all:
                    raw = [comp.select(t) if t is not None else None for t in roots]
                    vals = pd.Series(raw, index=df.index)
                else:
                    raw = [
                        comp.select_first(t) if t is not None else None
                        for t in roots
                    ]
                    vals = pd.Series(raw, index=df.index).map(
                        rule._scalar, na_action="ignore"
                    )
            else:
                vals = rule.apply(df)
            cols[rule.field] = pa.array(vals.tolist(), from_pandas=True)
        return pa.table(cols)

    return batch_fn


@dataclass
class SiteSpec:
    """A registered crawl source: seeds + per-host config + rule table —
    the graft's replacement for writing a Spider subclass from
    templates/spiders/basic.tmpl."""

    host: str
    seed_urls: list[str]
    rules: list[FieldRule] = field(default_factory=list)
    country: str = ""
    locale: str = ""
    thousand_separator: str = "."
    scale_separator: str = ","

    def extractor(self):
        return compile_rules(self.rules)
