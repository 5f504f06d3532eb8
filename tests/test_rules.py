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
    out = ds.map_batches(spec.extractor(), batch_format="pyarrow").to_pandas()
    assert out["rent"].tolist() == [1250, 980]
    assert out["furnished"].tolist() == [True, None]
    assert set(out["external_source"]) == {"h.test"}
