"""FormRequest/POST pagination (S3) + JSON API source (S4) + skip/take
meta carry (ST10/O2): API hosts paginate by POSTing the SAME URL with a
bumped form body; the request fingerprint covers url+body so each page
is a distinct frontier entry, and has_more=False terminates the chain.
Engine must match the oracle exactly."""

from spider_ray.canon import request_fingerprint
from spider_ray.frontier import Crawler
from spider_ray.synth import World, WorldConfig

from .oracle import OracleCrawler

CAPTIONS = [f"caption {i}" for i in range(4)]


def _cfg(**kw):
    base = dict(num_hosts=4, max_pages_per_host=3, details_per_page=4,
                api_host_pct=100, fail_pct=5, notfound_pct=3, private_pct=10)
    base.update(kw)
    return WorldConfig(**base)


def _fetch_sets(crawler):
    return [frozenset(int(h) for h in arr) for arr in crawler.fetched_hashes]


def _oracle_sets(ora):
    rounds = {}
    for r, _url, fp in ora.fetch_log:
        rounds.setdefault(r, set()).add(fp)
    return [frozenset(rounds.get(i, set())) for i in range(max(rounds) + 1)]


def test_fingerprint_includes_form_body():
    a = request_fingerprint("http://h.test/api/search", b"skip=0&take=8")
    b = request_fingerprint("http://h.test/api/search", b"skip=8&take=8")
    c = request_fingerprint("http://h.test/api/search")
    assert len({a, b, c}) == 3


def test_api_world_resolver():
    cfg = _cfg()
    w = World(cfg, CAPTIONS)
    seeds = cfg.seeds()
    assert all(isinstance(s, dict) for s in seeds)
    import json

    p = w.resolve(seeds[0]["url"], form_body=seeds[0]["form_body"])
    assert p.status == 200 and p.kind == "api"
    data = json.loads(p.body)
    assert len(data["results"]) > 0
    assert isinstance(data["has_more"], bool)
    # GET to the api path (no body) is a 404 — POST-only endpoint
    assert w.resolve(seeds[0]["url"]).status == 404


def test_api_crawl_matches_oracle(ray_session):
    cfg = _cfg()
    eng = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                  round_window_ms=60_000)
    res = eng.crawl(cfg.seeds())
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    # pagination actually happened: at least one host needed page 2
    assert res["rounds"] >= 3
    assert res["items"] > 0 and res["images"] > 0
    # sink rows identical
    img = eng.images_table().to_pydict()
    eng_rows = dict(zip(img["image_id"], img["phash"]))
    ora_rows = {r["image_id"]: r["phash"] for r in ora.images}
    assert eng_rows == ora_rows


def test_mixed_get_and_post_hosts(ray_session):
    cfg = _cfg(api_host_pct=50, num_hosts=6)
    kinds = {cfg.is_api_host(i) for i in range(cfg.num_hosts)}
    assert kinds == {True, False}  # both host types present
    eng = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True)
    eng.crawl(cfg.seeds())
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_sets(ora)


# ---------------------------------------------------- __VIEWSTATE analog


def test_viewstate_world_demands_token():
    """The server issues an opaque token per page and rejects page-2+
    requests that don't echo it (adams.py:91-92 harvest-and-echo)."""
    import json

    cfg = _cfg(viewstate_pct=100, max_pages_per_host=3)
    w = World(cfg, CAPTIONS)
    host = next(cfg.host(i) for i in range(cfg.num_hosts)
                if cfg.is_viewstate_host(i) and cfg.pages_for_host(i) >= 2)
    url = f"http://{host}/api/search"
    p1 = json.loads(w.resolve(url, form_body=b"skip=0&take=4").body)
    assert p1["has_more"] and p1["viewstate"]
    # without the token: rejected; with a wrong token: rejected
    assert w.resolve(url, form_body=b"skip=4&take=4").status == 403
    assert w.resolve(
        url, form_body=b"skip=4&take=4&viewstate=deadbeef").status == 403
    # echoing the issued token: served
    ok = w.resolve(
        url, form_body=f"skip=4&take=4&viewstate={p1['viewstate']}".encode())
    assert ok.status == 200


def test_viewstate_crawl_matches_oracle(ray_session):
    """Engine harvests + echoes the token (oracle in lockstep) and the
    full pagination completes: the crawl reaches the same DETAIL pages
    as a token-free world (page-2+ fingerprints differ — the token is
    part of the form body — but the discovered listing set must not)."""
    cfg = _cfg(viewstate_pct=100, fail_pct=0, notfound_pct=0)
    eng = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True)
    eng.crawl(cfg.seeds())
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_sets(ora)
    plain = _cfg(viewstate_pct=0, fail_pct=0, notfound_pct=0)
    ora_plain = OracleCrawler(plain, CAPTIONS).crawl(plain.seeds())
    details = {u for _r, u, _fp in ora.fetch_log if "/prop/" in u}
    details_plain = {u for _r, u, _fp in ora_plain.fetch_log if "/prop/" in u}
    assert details and details == details_plain


def test_viewstate_streaming_equal_driver(ray_session, tmp_path):
    from .test_streaming import _driver_run, _stream_run

    cfg = _cfg(viewstate_pct=100, num_hosts=3)
    dc, dres, dseen = _driver_run(cfg)
    sc, sres, sseen = _stream_run(cfg, tmp_path)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["items"] == dres["items"]


def test_viewstate_survives_resume(ray_session, tmp_path):
    """The harvested token rides the checkpointed frontier's form_body:
    a crawl resumed mid-pagination still presents the right token on
    the next page (a lost token would 403 the rest of the chain)."""
    cfg = _cfg(viewstate_pct=100, fail_pct=0, notfound_pct=0)
    full = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True)
    full_res = full.crawl(cfg.seeds())
    ck = str(tmp_path / "ck")
    part = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                   checkpoint_dir=ck, max_rounds=2)
    part.crawl(cfg.seeds())
    resumed = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                      checkpoint_dir=ck)
    assert resumed.resume()
    res = resumed.crawl([])
    assert res["fetched"] == full_res["fetched"]
    assert _fetch_sets(resumed) == _fetch_sets(full)
