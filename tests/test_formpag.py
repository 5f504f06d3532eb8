"""FormRequest.from_response semantics (immobiliarefaro_it.py:36-40,
immobiliaretafy_com.py:40): postback-paginated hosts carry a <form>
with server-issued hidden fields instead of a next anchor; the spider
harvests ALL the form's fields from the response and re-POSTs them
with formdata={'num_page': next} overridden. Pages ≥ 2 are reachable
only through the postback (GET 404s; a wrong/missing token 403s)."""

import pytest

from spider_ray.extract import (
    next_page_form_body,
    parse_listing_links,
    parse_pager_form,
)
from spider_ray.synth import World, WorldConfig

from .oracle import OracleCrawler
from .test_dont_filter import _engine_fetch_multisets, _oracle_fetch_multisets
from .test_frontier import CAPTIONS, _cfg, _fetch_sets, _oracle_fetch_sets, _run_engine


def _form_host(cfg, min_pages=2):
    for i in range(cfg.num_hosts):
        if cfg.is_form_pag_host(i) and cfg.pages_for_host(i) >= min_pages:
            return i
    pytest.skip("no multi-page form host in this world")


def test_harvest_and_postback_round_trip():
    cfg = WorldConfig(num_hosts=6, max_pages_per_host=3, details_per_page=3,
                      form_pag_pct=100)
    w = World(cfg)
    i = _form_host(cfg)
    host = cfg.host(i)
    p1 = w.resolve(f"http://{host}/list?page=1")
    links, nxt, _ = parse_listing_links(p1.body)
    assert links and nxt is None  # no next anchor on a postback site
    action, fields = parse_pager_form(p1.body)
    assert action == "/list"
    assert [n for n, _ in fields] == ["__FTOK", "dept", "num_page"]
    p2 = w.resolve(f"http://{host}/list",
                   form_body=next_page_form_body(fields))
    assert p2.status == 200 and p2.kind == "listing"
    assert parse_listing_links(p2.body)[0]
    # last page carries no form (the pagination terminator)
    last = p2
    for _ in range(cfg.pages_for_host(i) - 2):
        last = w.resolve(f"http://{host}/list",
                         form_body=next_page_form_body(
                             parse_pager_form(last.body)[1]))
    assert parse_pager_form(last.body) is None


def test_postback_gates():
    cfg = WorldConfig(num_hosts=6, max_pages_per_host=3, form_pag_pct=100)
    w = World(cfg)
    host = cfg.host(_form_host(cfg))
    # wrong token → 403; GET of page ≥ 2 → 404; token of the WRONG page
    # (page 2's own token sent for page 2, instead of page 1's) → 403
    assert w.resolve(f"http://{host}/list",
                     form_body=b"__FTOK=0&dept=lettings&num_page=2").status == 403
    assert w.resolve(f"http://{host}/list?page=2").status == 404
    tok2 = cfg.form_token(host, 2)
    assert w.resolve(
        f"http://{host}/list",
        form_body=f"__FTOK={tok2}&dept=lettings&num_page=2".encode(),
    ).status == 403
    # missing static field → 403
    tok1 = cfg.form_token(host, 1)
    assert w.resolve(
        f"http://{host}/list",
        form_body=f"__FTOK={tok1}&num_page=2".encode(),
    ).status == 403


def test_attr_order_tolerant_harvest():
    """from_response reads the DOM, not our serializer: shuffled
    attribute order inside the tags must harvest identically."""
    body = (b'<html><body><form method="post" class="pager" action="/go">'
            b'<input value="v1" type="hidden" name="a"/>'
            b'<input name="num_page" type="hidden" value="3"/>'
            b"</form></body></html>")
    action, fields = parse_pager_form(body)
    assert action == "/go" and fields == [("a", "v1"), ("num_page", "3")]
    assert next_page_form_body(fields) == b"a=v1&num_page=4"


@pytest.mark.parametrize("obey", [True, False])
def test_form_pagination_matches_oracle(ray_session, obey):
    cfg = _cfg(num_hosts=6, form_pag_pct=100)
    eng, _ = _run_engine(cfg, obey=obey)
    ora = OracleCrawler(cfg, CAPTIONS, obey_robots=obey).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    # the crawl really went past page 1 on some form host (items from a
    # page-2 detail exist) — the surface is active, not vacuous
    i = _form_host(cfg)
    assert any(u.endswith("/list") for _r, u, _f in ora.fetch_log), \
        "no postback POST ever fetched"


def test_form_pagination_mixed_world_matches_oracle(ray_session):
    """Postback hosts alongside every other pagination style — and the
    dont_filter featured strip offset stays engine=oracle when the
    'next slot' is a form POST instead of an anchor."""
    cfg = _cfg(num_hosts=8, form_pag_pct=50, api_host_pct=25,
               sitemap_host_pct=25, featured_pct=60, redirect_pct=25)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)


def test_form_pagination_streaming_equals_driver(ray_session, tmp_path):
    from .test_streaming import _driver_run, _stream_run

    cfg = WorldConfig(num_hosts=5, max_pages_per_host=3, details_per_page=4,
                      fail_pct=10, notfound_pct=5, form_pag_pct=60)
    dc, dres, dseen = _driver_run(cfg)
    sc, sres, sseen = _stream_run(cfg, tmp_path)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["items"] == dres["items"]
