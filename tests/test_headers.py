"""Request-header middleware surfaces — the four widest uncovered
reference header patterns:

  * Accept-Language content negotiation (295 reference spiders
    hardcode it; 20 via a get_lang helper) — lang hosts splash without
    the header and render month-name dates in the negotiated language
    with it (the M13 multilingual-date surface inside the crawl).
  * Referer / hotlink-protected images (RefererMiddleware is on by
    default in Scrapy; 192 spiders additionally hardcode Referer) —
    /img/* 403s without a same-host Referer.
  * X-Requested-With AJAX gates (49 spiders) — /api/search 403s
    without the header.
  * JSON request bodies (body=json.dumps — 69 spiders) — json_api
    hosts take {"skip":N,"take":M} and 400 a form-encoded body.

Engine = oracle on every surface; negative controls (REFERER_ENABLED
off / spider headers missing) demonstrably lose the gated content in
BOTH the engine and the oracle."""

import json

import pytest

from spider_ray.canon import request_fingerprint
from spider_ray.extract import parse_detail_page, parse_listing_links
from spider_ray.synth import LOCALIZED_MONTHS, World, WorldConfig

from .oracle import OracleCrawler
from .test_dont_filter import _engine_fetch_multisets, _oracle_fetch_multisets
from .test_frontier import (
    CAPTIONS,
    _cfg,
    _fetch_sets,
    _oracle_fetch_sets,
    _run_engine,
)


# ------------------------------------------------------------- unit gates
def test_lang_host_splash_and_negotiation():
    cfg = WorldConfig(num_hosts=4, lang_host_pct=100)
    w = World(cfg)
    i = next(j for j in range(4) if cfg.is_lang_host(j))
    h, lang = cfg.host(i), cfg.host_lang(i)
    assert cfg.spider_headers(h) == {"Accept-Language": lang}
    splash = w.resolve(f"http://{h}/list?page=1")
    assert splash.status == 200 and parse_listing_links(splash.body)[0] == []
    ok = w.resolve(f"http://{h}/list?page=1",
                   headers={"Accept-Language": lang})
    links = parse_listing_links(ok.body)[0]
    assert links
    # wrong language is as good as none
    wrong = w.resolve(f"http://{h}/list?page=1",
                      headers={"Accept-Language": "xx"})
    assert parse_listing_links(wrong.body)[0] == []
    # details: negotiated request renders the SAME drawn date in the
    # language's month names; default request renders numeric %d/%m/%Y
    du = f"http://{h}{links[0]}"
    dloc = parse_detail_page(
        w.resolve(du, attempt=1, headers={"Accept-Language": lang}).body)
    ddef = parse_detail_page(w.resolve(du, attempt=1).body)
    months = LOCALIZED_MONTHS[lang]
    day, mon_name, year = dloc["date_raw"].split(" ")
    d2, m2, y2 = ddef["date_raw"].split("/")
    assert (day, year) == (d2, y2)
    assert mon_name == months[int(m2) - 1]
    # knob off = byte-stable world
    plain = World(WorldConfig(num_hosts=4)).resolve(f"http://{h}/list?page=1")
    assert parse_listing_links(plain.body)[0]


def test_hotlink_gate():
    cfg = WorldConfig(num_hosts=2, hotlink_pct=100)
    w = World(cfg)
    url = "http://h0.test/img/5_0.png"
    assert w.resolve(url).status == 403
    assert w.resolve(url, referer="http://other.test/p").status == 403
    assert w.resolve(url, referer="http://h0.test/prop/5").status == 200
    assert World(WorldConfig(num_hosts=2)).resolve(url).status == 200


def test_xhr_and_json_api_gates():
    cfg = WorldConfig(num_hosts=4, api_host_pct=100, xhr_api_pct=100,
                      json_api_pct=100)
    w = World(cfg)
    h = cfg.host(0)
    assert cfg.spider_headers(h)["X-Requested-With"] == "XMLHttpRequest"
    body = cfg.api_body(h, 0, 4)
    assert json.loads(body) == {"skip": 0, "take": 4}
    url = f"http://{h}/api/search"
    xhr = {"X-Requested-With": "XMLHttpRequest"}
    assert w.resolve(url, form_body=body).status == 403
    ok = w.resolve(url, form_body=body, headers=xhr)
    assert ok.status == 200 and json.loads(ok.body)["results"]
    # a form-encoded body to a JSON endpoint is a 400, not a lenient parse
    assert w.resolve(url, form_body=b"skip=0&take=4", headers=xhr).status == 400
    # form hosts keep their dialect: same world, json_api off
    form_cfg = WorldConfig(num_hosts=4, api_host_pct=100)
    fb = form_cfg.api_body(h, 4, 4, viewstate="tok")
    assert fb == b"skip=4&take=4&viewstate=tok"
    # distinct bodies → distinct request fingerprints (JSON pages are
    # separate frontier entries exactly like form pages)
    fps = {request_fingerprint(url, cfg.api_body(h, s, 4)) for s in (0, 4, 8)}
    assert len(fps) == 3


# ------------------------------------------------- engine = oracle
def test_lang_hosts_match_oracle(ray_session):
    """Content negotiation end to end: fetch multisets + seen sets
    agree, and the engine's ITEMS carry parsed available_date values —
    the month-name dates round-tripped through the multilingual
    extractor (M13 ∘ M14) inside the crawl."""
    cfg = _cfg(lang_host_pct=100, fail_pct=0, notfound_pct=0)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    items = eng.items_table().to_pydict()
    assert items["external_id"], "lang hosts crawled through negotiation"
    dates = [d for d in items["available_date"] if d is not None]
    # every detail page has a date; month-name parsing must not lose them
    assert len(dates) == len(items["available_date"])
    assert all(len(d) == 10 and d[4] == "-" for d in dates)


def test_spider_headers_off_loses_lang_hosts(ray_session):
    """The negative control the splash page exists for: a spider that
    forgot its headers= dict gets the language chooser everywhere —
    zero details, zero items — and the oracle mirrors the loss."""
    cfg = _cfg(lang_host_pct=100, send_spider_headers=False,
               fail_pct=0, notfound_pct=0)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    assert eng.items_table().num_rows == 0
    assert not ora.items


def test_hotlink_hosts_match_oracle_and_referer_off_loses_images(ray_session):
    cfg = _cfg(hotlink_pct=100, fail_pct=0, notfound_pct=0)
    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    assert res["images"] > 0 and len(ora.images) == res["images"]

    off = _cfg(hotlink_pct=100, referer_enabled=False,
               fail_pct=0, notfound_pct=0)
    eng2, res2 = _run_engine(off)
    ora2 = OracleCrawler(off, CAPTIONS).crawl(off.seeds())
    assert _engine_fetch_multisets(eng2) == _oracle_fetch_multisets(ora2)
    assert res2["images"] == 0 and not ora2.images


@pytest.mark.parametrize("obey", [True, False])
def test_api_header_and_body_worlds_match_oracle(ray_session, obey):
    """Mixed API dialects in one world: XHR-gated hosts, JSON-body
    hosts, form hosts, viewstate tokens — per-round fetch multisets and
    seen sets agree at both politeness modes."""
    cfg = _cfg(num_hosts=8, api_host_pct=100, xhr_api_pct=50,
               json_api_pct=50, viewstate_pct=50)
    kinds = {(cfg.is_xhr_api_host(i), cfg.is_json_api_host(i))
             for i in range(8)}
    assert len(kinds) >= 3, "world draw covers mixed dialects"
    eng, _ = _run_engine(cfg, obey=obey, window=3_000)
    ora = OracleCrawler(cfg, CAPTIONS, obey_robots=obey,
                        round_window_ms=3_000).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen


def test_header_surfaces_streaming_matches_driver(ray_session, tmp_path):
    """All four header surfaces at once, streaming = driver (the fetch
    stage is shared, but admission/carry differ — pin the equality)."""
    from spider_ray.frontier_stream import StreamingCrawler

    cfg = _cfg(num_hosts=6, lang_host_pct=60, hotlink_pct=60,
               api_host_pct=40, xhr_api_pct=100, json_api_pct=100)
    eng, res = _run_engine(cfg, window=3_000)
    sc = StreamingCrawler(cfg, CAPTIONS, work_dir=str(tmp_path / "w"),
                          num_dedup_shards=4, obey_robots=True,
                          round_window_ms=3_000)
    sres = sc.crawl(cfg.seeds())
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert sc.seen_set() == eng_seen
    assert sres["fetched"] == res["fetched"]
    assert sres["images"] == res["images"]


def test_http_cache_warm_rerun_on_gated_world(ray_session, tmp_path):
    """HTTP cache × header gates: DummyPolicy keys by fingerprint only
    (headers are not part of the cache key, like Scrapy's), so a warm
    re-run over a fully gated world — negotiated listings, hotlinked
    images, XHR'd JSON APIs — serves every stored response without one
    world resolve and reproduces the cold outputs byte-for-byte."""
    from spider_ray.frontier import Crawler

    cfg = _cfg(lang_host_pct=50, hotlink_pct=100, api_host_pct=34,
               xhr_api_pct=100, json_api_pct=100,
               fail_pct=0, notfound_pct=0)
    cache_dir = str(tmp_path / "hc")

    def run():
        c = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                    round_window_ms=60_000, http_cache_dir=cache_dir)
        c.crawl(cfg.seeds())
        c.close()
        return c

    cold, warm = run(), run()
    assert _fetch_sets(cold) == _fetch_sets(warm)
    assert cold.images_table().to_pydict() == warm.images_table().to_pydict()
    assert cold.images_table().num_rows > 0
    assert sum(row["rows_deferred"] for row in warm.lineage) == 0
