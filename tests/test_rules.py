"""ItemClear-style declarative rule DSL (spider_ray.rules, SURVEY.md
§2.10) — behavior parity with helper.py:533-653 semantics."""

import pandas as pd
import pyarrow as pa

from spider_ray.rules import TRUE_WORDS, FieldRule, SiteSpec, compile_rules


def _apply(rule, values):
    df = pd.DataFrame({rule.source if not rule.literal else "_": values})
    return rule.apply(df).tolist()


def test_split_replace_chain():
    r = FieldRule("zipcode", "addr", split=((",", -1), (" ", 1)))
    # ", 1012 AB..." → split(' ')[1] == "1012" (leading-space token is [0])
    assert _apply(r, ["Main St 5, 1012 AB Amsterdam"]) == ["1012"]
    r2 = FieldRule("clean", "raw", replace=(("€", ""), (".", "")), get_num=True,
                   thousand_separator=",", scale_separator=".")
    assert _apply(r2, ["€ 1.250"]) == [1250]


def test_terminal_transforms():
    assert _apply(FieldRule("n", "x", get_num=True), ["ca. 1.234,5 m"]) == [1234.5]
    assert _apply(
        FieldRule("furnished", "x", bool_words=TRUE_WORDS), ["Ja, möbliert"]
    ) == [True]
    assert _apply(
        FieldRule("furnished", "x", bool_words=TRUE_WORDS), ["nein"]
    ) == [None]  # True-or-None, never False
    assert _apply(FieldRule("sqm", "x", sq_ft=True), ["1000 sq ft"]) == [92]
    assert _apply(FieldRule("rent", "x", per_week=True), ["250 pw"]) == [1000]
    assert _apply(
        FieldRule("d", "x", date_format="%d/%m/%Y", year_bump=True), ["01/06/2025"]
    ) == ["2026-06-01"]
    assert _apply(FieldRule("e", "x", energy=True), ["95 kWh"]) == ["A"]
    assert _apply(FieldRule("u", "x", upper=True), [" ab "]) == ["AB"]


def test_regex_and_literal():
    r = FieldRule("eid", "url", regex=r"/prop/(\d+)")
    assert _apply(r, ["http://h.test/prop/42?x=1"]) == ["42"]
    lit = FieldRule("source", "h.test", literal=True)
    df = pd.DataFrame({"anything": [1, 2]})
    assert lit.apply(df).tolist() == ["h.test", "h.test"]


def test_none_propagation():
    r = FieldRule("n", "x", get_num=True)
    assert _apply(r, [None]) == [None]
    r2 = FieldRule("z", "x", split=((",", 5),))
    assert _apply(r2, ["a,b"]) == [None]  # out-of-range split index


def test_compiled_batch_fn_and_sitespec(ray_session):
    import ray.data as rd

    spec = SiteSpec(
        host="h.test",
        seed_urls=["http://h.test/list?page=1"],
        rules=[
            FieldRule("rent", "price_raw", get_num=True,
                      thousand_separator=".", scale_separator=","),
            FieldRule("furnished", "desc", bool_words=TRUE_WORDS),
            FieldRule("external_source", "h.test", literal=True),
        ],
    )
    ds = rd.from_items(
        [
            {"price_raw": "€ 1.250 p/m", "desc": "ja, furnished"},
            {"price_raw": "€ 980 p/m", "desc": "unfurnished"},
        ]
    )
    # Ray Data does not preserve block order by default — pin by value
    out = (
        ds.map_batches(spec.extractor(), batch_format="pyarrow")
        .to_pandas()
        .sort_values("rent", ascending=False)
        .reset_index(drop=True)
    )
    assert out["rent"].tolist() == [1250, 980]
    assert out["furnished"].tolist() == [True, None]
    assert set(out["external_source"]) == {"h.test"}


# ---------------------------------------------------------------- real HTML
MESSY_HTML = """
<HTML><Body>
  <div id=listing class="card main">
    <h1 class="title">  Cozy   2-room flat </h1>
    <DIV class="price">€ 1.250,50 <span class=period>per month</span>
    <ul id="amenities">
      <li>Balcony
      <li>Elevator</li>
      <li>Pets allowed: yes
    </ul>
    <p class="desc">Bright flat near the park.
    <img class="photo" src="/img/1.png"><img class="photo" src='/img/2.png'>
    <a href="/contact" data-phone="+31-20-555">contact</a>
    <table><tr><td class="k">Surface</td><td class="v">85 m²</td></tr>
  </div>
</body>
"""


def test_htmlsel_on_messy_markup():
    """Unclosed <li>/<p>/<div>, uppercase tags, unquoted attributes,
    void elements — the tolerant parser + CSS subset must still land
    every selector (VERDICT r1 Missing #1)."""
    from spider_ray.htmlsel import parse_html, select, select_first

    root = parse_html(MESSY_HTML)
    assert select_first(root, "h1.title::text") == "Cozy 2-room flat"
    assert select_first(root, "div.price::text").startswith("€ 1.250,50")
    assert select(root, "ul#amenities > li::text") == [
        "Balcony", "Elevator", "Pets allowed: yes"
    ]
    assert select(root, "img.photo::attr(src)") == ["/img/1.png", "/img/2.png"]
    assert select_first(root, "a[data-phone]::attr(data-phone)") == "+31-20-555"
    assert select_first(root, "td.v::text") == "85 m²"
    assert select_first(root, "#listing h1::text") == "Cozy 2-room flat"
    assert select(root, "div.nope") == []
    # descendant vs child: span.period is NOT a direct child of the card div
    assert select(root, "div.card > span.period") == []
    assert len(select(root, "div.card span.period")) == 1


def test_field_rules_over_real_html(ray_session):
    """SiteSpec rules with ``selector`` extract typed fields straight
    from raw messy markup — the input_type='xpath' analog working on
    HTML that is NOT the synthetic page grammar."""
    import pyarrow as pa
    import ray.data as rd

    from spider_ray.rules import FieldRule, compile_rules

    rules = [
        FieldRule("title", source="body", selector="h1.title::text"),
        FieldRule("rent", source="body", selector="div.price::text",
                  get_num=True),
        FieldRule("pets_allowed", source="body",
                  selector="ul#amenities > li::text",
                  bool_words=("yes",)),
        FieldRule("square_meters", source="body", selector="td.v::text",
                  get_num=True),
        FieldRule("images", source="body", selector="img.photo::attr(src)",
                  select_all=True),
        FieldRule("phone", source="body",
                  selector="a[data-phone]::attr(data-phone)"),
    ]
    ds = rd.from_arrow(pa.table({"body": [MESSY_HTML, "<p>no data</p>"]}))
    out = ds.map_batches(compile_rules(rules), batch_format="pyarrow").to_pandas()
    out = out.sort_values("title", na_position="last").reset_index(drop=True)
    row = out.iloc[0]
    assert row["title"] == "Cozy 2-room flat"
    assert row["rent"] == 1250.5  # EU separators: 1.250,50 → 1250.50
    assert row["square_meters"] == 85
    assert list(row["images"]) == ["/img/1.png", "/img/2.png"]
    assert row["phone"] == "+31-20-555"
    empty = out.iloc[1]
    import pandas as pd

    assert empty["title"] is None and pd.isna(empty["rent"])
