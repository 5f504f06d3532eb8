"""The last two reference request surfaces from the corpus sweep:

  * pinned USER_AGENT custom_settings (delattreimmobilier_com.py:34,
    bespoke_ie.py:30) — UA-strict hosts 403 every non-robots request
    whose User-Agent is not the one string their WAF allow-list knows;
    the spider pins exactly that string, replacing the default rotation
    for that host.
  * dont_redirect meta + per-request handle_httpstatus_list
    (aryes_be.py:80) — withdrawn-listing detection: detail pages 302 to
    a shared /removed landing page; a spider with the flag never
    follows the 302 (the callback sees it via handle_httpstatus_list
    [302] and emits nothing), a spider without it downloads the junk
    landing page once per host.

Engine = oracle on both, negative controls included, streaming =
driver on the combined world."""

from collections import Counter

from spider_ray.fetch import USER_AGENTS
from spider_ray.synth import World, WorldConfig

from .oracle import OracleCrawler
from .test_dont_filter import _engine_fetch_multisets, _oracle_fetch_multisets
from .test_frontier import CAPTIONS, _cfg, _run_engine


# ------------------------------------------------------------- unit gates
def test_ua_gate_in_resolve():
    cfg = WorldConfig(num_hosts=4, ua_strict_pct=100)
    w = World(cfg)
    h = cfg.host(0)
    need = cfg.required_ua(h)
    assert cfg.spider_user_agent(h) == need
    # wrong / missing UA → 403 on every content path; right UA passes
    assert w.resolve(f"http://{h}/list?page=1").status == 403
    assert w.resolve(f"http://{h}/list?page=1",
                     ua=USER_AGENTS[0]).status == 403
    assert w.resolve(f"http://{h}/list?page=1", ua=need).status == 200
    assert w.resolve(f"http://{h}/prop/3", attempt=1, ua=need).status in (
        200, 404, 503)
    # robots.txt is served before the WAF
    assert w.resolve(f"http://{h}/robots.txt").status == 200
    # the author-forgot-the-UA control: no pin, rotation never matches
    off = WorldConfig(num_hosts=4, ua_strict_pct=100, send_pinned_ua=False)
    assert off.spider_user_agent(h) is None
    assert not any(cfg.required_ua(h) == u for u in USER_AGENTS)
    # knob off = byte-stable world
    assert World(WorldConfig(num_hosts=4)).resolve(
        f"http://{h}/list?page=1").status == 200


def test_dead_detail_world_gate():
    cfg = WorldConfig(num_hosts=2, dead_detail_pct=100, fail_pct=0,
                      notfound_pct=0)
    w = World(cfg)
    page = w.resolve("http://h0.test/prop/3")
    assert page.status == 302 and page.kind == "redirect"
    assert page.body == b"http://h0.test/removed"
    # the landing page: a real 200 with nothing extractable
    rm = w.resolve("http://h0.test/removed")
    assert rm.status == 200 and rm.kind == "removed"
    # knob off = byte-stable world
    assert World(WorldConfig(num_hosts=2, fail_pct=0, notfound_pct=0)).resolve(
        "http://h0.test/prop/3").status == 200


# ------------------------------------------------- engine = oracle
def test_ua_strict_pinned_matches_oracle_and_baseline(ray_session):
    """With the USER_AGENT custom_setting applied, a fully strict world
    crawls identically to the unguarded one — the pin exists so the
    gate is never observed — and engine = oracle throughout."""
    cfg = _cfg(ua_strict_pct=100, fail_pct=0, notfound_pct=0)
    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    base = _cfg(fail_pct=0, notfound_pct=0)
    _, bres = _run_engine(base)
    assert (res["fetched"], res["items"], res["images"]) == (
        bres["fetched"], bres["items"], bres["images"])


def test_ua_unpinned_loses_strict_hosts(ray_session):
    """The negative control the pin exists for: rotation never matches
    the WAF string, every request 403s and is retried to exhaustion
    (403 ∈ RETRY_HTTP_CODES), the whole content tree is lost — and the
    oracle mirrors the loss fetch-for-fetch."""
    cfg = _cfg(ua_strict_pct=100, send_pinned_ua=False,
               fail_pct=0, notfound_pct=0)
    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    assert res["items"] == 0 and res["images"] == 0
    assert not ora.items and not ora.images
    # seeds were retried: each seed fingerprint fetched retry_times+1
    total = Counter()
    for c in _engine_fetch_multisets(eng):
        total.update(c)
    assert total and all(n == cfg.retry_times + 1 for n in total.values())


def test_dead_details_dont_redirect_matches_oracle(ray_session):
    """aryes_be semantics: the 302 reaches the callback (never
    followed), dead listings emit nothing, /removed is never fetched."""
    cfg = _cfg(dead_detail_pct=40, dont_redirect_details=True,
               fail_pct=0, notfound_pct=0)
    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    base = _cfg(fail_pct=0, notfound_pct=0)
    _, bres = _run_engine(base)
    assert 0 < res["items"] < bres["items"], "some listings are dead"
    assert not any("/removed" in u for _r, u, _f in ora.fetch_log)


def test_dead_details_followed_without_flag(ray_session):
    """A spider without dont_redirect downloads the landing page (once
    per host — the seen set dedups later arrivals) and still extracts
    nothing from it; items match the flagged crawl, fetches exceed it."""
    cfg = _cfg(dead_detail_pct=40, dont_redirect_details=False,
               fail_pct=0, notfound_pct=0)
    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    removed = [u for _r, u, _f in ora.fetch_log if u.endswith("/removed")]
    assert removed and len(removed) == len(set(removed))
    flagged = _cfg(dead_detail_pct=40, dont_redirect_details=True,
                   fail_pct=0, notfound_pct=0)
    _, fres = _run_engine(flagged)
    assert res["items"] == fres["items"]
    assert res["fetched"] == fres["fetched"] + len(removed)


def test_ua_and_dead_details_streaming_matches_driver(ray_session, tmp_path):
    """Both surfaces at once, streaming = driver (shared fetch/parse
    kernels, different admission/carry — pin the equality)."""
    from spider_ray.frontier_stream import StreamingCrawler

    cfg = _cfg(num_hosts=6, ua_strict_pct=50, dead_detail_pct=40,
               dont_redirect_details=True)
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
    assert sres["items"] == res["items"]
    assert sres["images"] == res["images"]


def test_http_cache_ignores_ua_fix(ray_session, tmp_path):
    """HTTP cache × UA gate: DummyPolicy keys by request fingerprint
    only (the UA is not part of the key, like Scrapy's), so fixing the
    spider's USER_AGENT after a cold unpinned crawl does NOT rescue a
    warm re-run — the stored 403s are re-served without one download.
    This is precisely the documented reason HTTPCACHE_IGNORE_HTTP_CODES
    exists; the faithful default stores and replays the failure."""
    from spider_ray.frontier import Crawler

    cache_dir = str(tmp_path / "hc")

    def run(cfg):
        c = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                    round_window_ms=60_000, http_cache_dir=cache_dir)
        res = c.crawl(cfg.seeds())
        c.close()
        return c, res

    broken = _cfg(ua_strict_pct=100, send_pinned_ua=False,
                  fail_pct=0, notfound_pct=0)
    _, cold = run(broken)
    assert cold["items"] == 0
    fixed = _cfg(ua_strict_pct=100, fail_pct=0, notfound_pct=0)
    _, warm = run(fixed)
    assert warm["items"] == 0, "stored 403s replay despite the UA fix"
    # a fresh cache with the pin crawls normally
    fresh_dir = str(tmp_path / "hc2")
    c3 = Crawler(fixed, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                 round_window_ms=60_000, http_cache_dir=fresh_dir)
    res3 = c3.crawl(fixed.seeds())
    c3.close()
    assert res3["items"] > 0


def test_dont_redirect_retry_precedence(ray_session):
    """Middleware precedence under dont_redirect: a 3xx IN the spider's
    RETRY_HTTP_CODES is retried to exhaustion FIRST (RetryMiddleware
    sits below RedirectMiddleware; the redirect exemption must not
    short-circuit it), and only the exhausted response reaches the
    per-request handle list. With 302 retryable, every dead detail is
    fetched retry_times+1 times on both sides."""
    cfg = _cfg(dead_detail_pct=100, dont_redirect_details=True,
               fail_pct=0, notfound_pct=0,
               retry_http_codes=(500, 503, 504, 302), retry_times=2)
    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    assert res["items"] == 0 and not ora.items
    # every detail fingerprint appears exactly retry_times+1 times
    detail_fp = Counter()
    for _r, u, fp in ora.fetch_log:
        if "/prop/" in u or "/go/" in u:
            detail_fp[fp] += 1
    assert detail_fp and all(n == cfg.retry_times + 1
                             for n in detail_fp.values())
    assert not any(u.endswith("/removed") for _r, u, _f in ora.fetch_log)
