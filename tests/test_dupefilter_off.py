"""DUPEFILTER_CLASS = BaseDupeFilter and HTTPERROR_ALLOWED_CODES
custom_settings.

Reference surfaces:
- spiders/elliotoliver_co_uk.py:34 sets
  ``DUPEFILTER_CLASS: scrapy.dupefilters.BaseDupeFilter`` — request
  dedup wholly OFF for that spider: every occurrence of a URL
  downloads (``BaseDupeFilter.request_seen`` always returns False).
- 12 spiders declare ``HTTPERROR_ALLOWED_CODES`` in custom_settings
  (amsterdamwonen_nl.py:21 [403], wilink_be.py:28 [...401, 403, 503],
  …) — the settings-level twin of the ``handle_httpstatus_list``
  attribute; Scrapy's HttpErrorMiddleware consults the union.

World knobs: ``dedup_off_pct`` (hosts with the filter off),
``related_pct`` (cross-page repeated NORMAL links that make the
dedup-off surface observable), ``httperror_allowed_pct`` (hosts with
a per-spider allow-list drawn from a reference-shaped palette).
"""

from collections import Counter

from spider_ray.extract import parse_listing_links
from spider_ray.frontier import Crawler
from spider_ray.frontier_stream import StreamingCrawler
from spider_ray.synth import World, WorldConfig

from .oracle import OracleCrawler
from .test_dont_filter import _engine_fetch_multisets, _oracle_fetch_multisets
from .test_frontier import CAPTIONS, _cfg, _run_engine


def test_related_anchor_world_shape():
    """Page ≥2 carries a plain anchor back to page 1's slot-0 detail;
    page 1 never does; knob off → byte-stable."""
    cfg = WorldConfig(num_hosts=2, max_pages_per_host=4, related_pct=100)
    w = World(cfg)
    p1_links = parse_listing_links(w.resolve("http://h0.test/list?page=1").body)[0]
    p2_links = parse_listing_links(w.resolve("http://h0.test/list?page=2").body)[0]
    assert p2_links[-1] == p1_links[0]  # the repeat, as a NORMAL link
    assert len(set(p1_links)) == len(p1_links)
    off = World(WorldConfig(num_hosts=2, max_pages_per_host=4))
    assert parse_listing_links(off.resolve("http://h0.test/list?page=2").body)[0] \
        == p2_links[:-1]


def test_dedup_off_hosts_mixed_draw():
    cfg = _cfg(dedup_off_pct=50)
    flags = [cfg.is_dedup_off_host(cfg.host(i)) for i in range(cfg.num_hosts)]
    assert any(flags) and not all(flags)
    assert not WorldConfig(num_hosts=4).is_dedup_off_host("h0.test")


def test_dedup_off_refetches_match_oracle(ray_session):
    """On a DUPEFILTER-off host the related repeat re-downloads (in a
    later round) and re-emits the item; on a dedup-on host the repeat
    dedups away. Engine = oracle down to per-round fetch multisets."""
    cfg = _cfg(dedup_off_pct=50, related_pct=100, fail_pct=0,
               notfound_pct=0, private_pct=0)
    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen

    # the repeat really re-downloads: total fetch multiset has a hash
    # seen in two different rounds (cross-round repeat — dont_filter's
    # featured strip only ever repeats within one round)
    total = Counter()
    per_round = _engine_fetch_multisets(eng)
    rounds_of = {}
    for r, c in enumerate(per_round):
        for h in c:
            rounds_of.setdefault(h, []).append(r)
        total.update(c)
    assert any(len(rs) > 1 for rs in rounds_of.values())

    # ... and only because the filter is off: same world with every
    # spider's dupefilter ON fetches strictly less
    cfg_on = _cfg(dedup_off_pct=0, related_pct=100, fail_pct=0,
                  notfound_pct=0, private_pct=0)
    eng_on, res_on = _run_engine(cfg_on)
    assert res_on["fetched"] < res["fetched"]
    # duplicate item emissions at distinct positions (Scrapy re-runs
    # the callback per download)
    assert res["items"] > res_on["items"]


def test_dedup_off_streaming_equals_driver(ray_session, tmp_path):
    cfg = _cfg(dedup_off_pct=50, related_pct=100)
    d = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True)
    dres = d.crawl(cfg.seeds())
    dseen = set()
    for snap in d.dedup.snapshot():
        dseen.update(int(x) for x in snap)
    s = StreamingCrawler(cfg, CAPTIONS, work_dir=str(tmp_path / "w"),
                         num_dedup_shards=4, obey_robots=True)
    sres = s.crawl(cfg.seeds())
    assert s.seen_set() == dseen
    for k in ("fetched", "items", "images", "seen"):
        assert sres[k] == dres[k], k


def test_host_httpstatus_list_unions_spider_attr():
    cfg = _cfg(httperror_allowed_pct=50, handle_httpstatus_list=(456,))
    lists = [cfg.host_httpstatus_list(cfg.host(i))
             for i in range(cfg.num_hosts)]
    # every host keeps the spider-wide attribute; drawn hosts add
    # their custom_setting codes
    assert all(456 in l for l in lists)
    assert any(len(l) > 1 for l in lists) and any(l == (456,) for l in lists)
    # pct=0 → the attribute alone (byte-stable default)
    assert _cfg(handle_httpstatus_list=(456,)).host_httpstatus_list(
        "h0.test") == (456,)


def test_httperror_allowed_per_host_matches_oracle(ray_session):
    """Soft-401 details: hosts WITH an allow-list containing 401 parse
    them after retries exhaust; hosts WITHOUT fail them. Engine =
    oracle; strictly fewer items than a world where the spider-wide
    attribute allows 401 everywhere."""
    cfg = _cfg(soft401_pct=60, httperror_allowed_pct=50,
               handle_httpstatus_list=(), fail_pct=0, notfound_pct=0,
               private_pct=0)
    # the draw must be mixed AND at least one allowed host must accept
    # 401 for the assertion below to bite
    lists = [cfg.host_httpstatus_list(cfg.host(i))
             for i in range(cfg.num_hosts)]
    assert any(401 in l for l in lists) and any(401 not in l for l in lists)

    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _engine_fetch_multisets(eng) == _oracle_fetch_multisets(ora)
    # images land only for parsed details — the discriminating output
    img = eng.images_table().to_pydict()
    assert {i: (c, f) for i, c, f in
            zip(img["image_id"], img["caption"], img["fmt"])} == \
        {r["image_id"]: (r["caption"], r["fmt"]) for r in ora.images}
    # items: engine is post-validity-filter, oracle pre-filter → subset
    eng_items = set(eng.items_table().column("external_link").to_pylist()) \
        if eng.items_table().num_rows else set()
    assert eng_items <= {r["url"] for r in ora.items}

    cfg_all = _cfg(soft401_pct=60, httperror_allowed_pct=0,
                   handle_httpstatus_list=(401,), fail_pct=0,
                   notfound_pct=0, private_pct=0)
    _, res_all = _run_engine(cfg_all)
    assert res["items"] < res_all["items"]


def test_httperror_allowed_streaming_equals_driver(ray_session, tmp_path):
    cfg = _cfg(soft401_pct=60, httperror_allowed_pct=50,
               handle_httpstatus_list=())
    d = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True)
    dres = d.crawl(cfg.seeds())
    s = StreamingCrawler(cfg, CAPTIONS, work_dir=str(tmp_path / "w"),
                         num_dedup_shards=4, obey_robots=True)
    sres = s.crawl(cfg.seeds())
    for k in ("fetched", "items", "images", "seen"):
        assert sres[k] == dres[k], k
