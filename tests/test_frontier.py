"""Engine-vs-oracle equivalence: fetch log, seen-set, items, sink rows,
resume-with-no-duplicate-fetches, and parallelism-independence.

These are the north-rule correctness gates (BASELINE.json): the Ray
engine's sharded dedup + groupby politeness + actor fetch pool must
reproduce the sequential oracle crawler exactly.
"""

import numpy as np
import pytest

from spider_ray.frontier import Crawler
from spider_ray.imaging import FMT_PNG, decode, psnr
from spider_ray.synth import World, WorldConfig

from .oracle import OracleCrawler

CAPTIONS = [f"caption number {i} with words" for i in range(7)]


def _cfg(**kw):
    base = dict(num_hosts=4, max_pages_per_host=3, details_per_page=4,
                fail_pct=10, notfound_pct=5, private_pct=15)
    base.update(kw)
    return WorldConfig(**base)


def _run_engine(cfg, *, obey=True, window=60_000, shards=4, mode="cuckoo",
                checkpoint_dir=None, max_rounds=64):
    c = Crawler(cfg, CAPTIONS, checkpoint_dir=checkpoint_dir,
                num_dedup_shards=shards, dedup_mode=mode, obey_robots=obey,
                round_window_ms=window, max_rounds=max_rounds)
    res = c.crawl(cfg.seeds())
    return c, res


def _strip_trailing_empty(rounds):
    """Drop trailing zero-fetch rounds: when the last frontier rows are
    politeness-deferred copies whose twin was fetched meanwhile, the
    engine still runs a final round (all rows dedup away, nothing
    fetched) while the oracle's candidate loop just ends — same
    semantics, one empty list of bookkeeping difference."""
    out = list(rounds)
    while out and not out[-1]:
        out.pop()
    return out


def _fetch_sets(crawler):
    """Per-round fetched url_hash frozensets (order within a round is
    defined by seq; across-round sequence is the ordering guarantee)."""
    return _strip_trailing_empty(
        [frozenset(int(h) for h in arr) for arr in crawler.fetched_hashes])


def _oracle_fetch_sets(ores):
    rounds = {}
    for r, _url, fp in ores.fetch_log:
        rounds.setdefault(r, set()).add(fp)
    return _strip_trailing_empty(
        [frozenset(rounds.get(i, set())) for i in range(max(rounds) + 1)]
        if rounds else [])


@pytest.mark.parametrize("obey", [True, False])
def test_engine_matches_oracle(ray_session, obey):
    cfg = _cfg()
    eng, res = _run_engine(cfg, obey=obey)
    ora = OracleCrawler(cfg, CAPTIONS, obey_robots=obey).crawl(cfg.seeds())

    # fetch log: same rounds, same fetch set each round (per-round order
    # inside the engine is by seq — set equality per round pins it)
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    # seen set exact match
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    # sink rows: same image ids, captions, formats, phashes
    img = eng.images_table().to_pydict()
    eng_rows = {
        i: (c, f, p)
        for i, c, f, p in zip(img["image_id"], img["caption"], img["fmt"], img["phash"])
    }
    ora_rows = {r["image_id"]: (r["caption"], r["fmt"], r["phash"]) for r in ora.images}
    assert eng_rows == ora_rows
    # items: same detail URLs extracted
    if eng.items_table().num_rows:
        eng_items = set(eng.items_table().column("external_link").to_pylist())
    else:
        eng_items = set()
    # oracle items are pre-validity-filter; engine items are post-filter —
    # engine items must be a subset with the same required-field survivors
    ora_urls = {r["url"] for r in ora.items}
    assert eng_items <= ora_urls


def test_sink_row_invariants(ray_session):
    """input_hint invariant: decoded pixels PSNR≥40dB vs oracle pixels for
    lossy, exact for lossless; caption equality; phash recompute."""
    from spider_ray.imaging import phash as compute_phash

    cfg = _cfg(num_hosts=3)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    tbl = eng.images_table()
    assert tbl.num_rows > 0
    d = tbl.to_pydict()
    for image_id, data, fmt, ph in zip(d["image_id"], d["bytes"], d["fmt"], d["phash"]):
        ora_px = ora.pixels[image_id]
        px = decode(data, fmt)
        if fmt in (FMT_PNG, "gif", "webp"):  # lossless round-trips exactly
            assert (px == ora_px).all()
        else:
            assert psnr(px, ora_px) >= 40.0 or (px == ora_px).all()
        assert compute_phash(px) == ph


def test_politeness_deferral_small_window(ray_session):
    """A tight window forces deferrals; totals must still match oracle."""
    cfg = _cfg(num_hosts=2, max_pages_per_host=2)
    eng, res = _run_engine(cfg, window=3_000)
    ora = OracleCrawler(cfg, CAPTIONS, round_window_ms=3_000).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    assert sum(row["rows_deferred"] for row in eng.lineage) > 0


def test_shard_count_invariance(ray_session):
    """Dedup shard count is an execution detail — results identical."""
    cfg = _cfg(num_hosts=3)
    eng2, res2 = _run_engine(cfg, shards=2)
    eng8, res8 = _run_engine(cfg, shards=8)
    assert res2 == res8
    assert _fetch_sets(eng2) == _fetch_sets(eng8)


def test_shard_actors_never_reserve_cpu(ray_session):
    """Shard actors must hold ZERO CPU reservation: repeated crawls in
    one session leak handles (task lineage keeps them alive), and at
    num_cpus=0.1 three bench passes at 4 CPUs left <1 CPU available,
    starving every num_cpus=1 map task — a hard wedge. Regression
    guard: the remote class reserves no CPU, and shutdown() releases
    the actors on demand."""
    import ray as _ray

    from spider_ray.dedup import DedupShard, ShardedDedup

    opts = DedupShard._default_options
    assert opts.get("num_cpus", None) == 0
    dd = ShardedDedup(num_shards=4)
    import numpy as np

    dd.register_arrays(
        np.array([1, 2, 3], dtype=np.uint64),
        np.zeros(3, np.int64), np.arange(3, dtype=np.int64), 0,
    )
    shards = list(dd.shards)
    dd.shutdown()
    assert dd.shards == []
    # killed actors must reject further calls
    import pytest as _pytest

    with _pytest.raises(Exception):
        _ray.get(shards[0].size.remote(), timeout=30)


def test_exact_vs_cuckoo_mode(ray_session):
    cfg = _cfg(num_hosts=3)
    engc, resc = _run_engine(cfg, mode="cuckoo")
    enge, rese = _run_engine(cfg, mode="exact")
    assert resc == rese
    assert _fetch_sets(engc) == _fetch_sets(enge)


def test_resume_no_duplicate_fetches(ray_session, tmp_path):
    cfg = _cfg(num_hosts=3)
    full_eng, full_res = _run_engine(cfg)

    # interrupted run: stop after 2 rounds
    ck = str(tmp_path / "ck")
    part, _ = _run_engine(cfg, checkpoint_dir=ck, max_rounds=2)

    # resume from checkpoint
    resumed = Crawler(cfg, CAPTIONS, checkpoint_dir=ck, num_dedup_shards=4,
                      obey_robots=True, round_window_ms=60_000)
    assert resumed.resume()
    res = resumed.crawl([])  # seeds ignored on resume
    assert res["rounds"] == full_res["rounds"]
    assert res["fetched"] == full_res["fetched"]
    assert res["images"] == full_res["images"]

    # no URL fetched twice across the interrupted + resumed run
    all_fetches = np.concatenate(resumed.fetched_hashes)
    skip_ok = 0
    # retries legitimately re-fetch (skip_dedup): count multiplicity>1 only
    # when not explainable by retries
    uniq, counts = np.unique(all_fetches, return_counts=True)
    dup = counts - 1
    total_retries = full_res["fetched"] - len(np.unique(np.concatenate(full_eng.fetched_hashes)))
    assert dup.sum() == total_retries
    # and the resumed totals equal the uninterrupted totals
    assert _fetch_sets(resumed) == _fetch_sets(full_eng)


def test_priority_seeds_admitted_first(ray_session):
    """End-to-end priority-queue check: when the seed list exceeds a
    host's round budget, high-priority seeds fetch in round 0 and
    low-priority ones defer — identically in engine and oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from spider_ray.frontier import assign_seq, make_seed_frontier

    cfg = WorldConfig(num_hosts=1, max_pages_per_host=1, details_per_page=2)
    # one host, many seed URLs (same listing page with distinct query
    # params so they dedup apart), tight window → budget < n
    urls = [f"http://h0.test/list?page=1&v={i}" for i in range(12)]
    seed_tbl = make_seed_frontier(urls)
    prio = pa.array([(5 if i % 3 == 0 else 0) for i in range(12)], pa.int32())
    seed_tbl = seed_tbl.set_column(
        seed_tbl.schema.get_field_index("priority"), "priority", prio
    )
    c = Crawler(cfg, CAPTIONS, num_dedup_shards=2, obey_robots=True,
                round_window_ms=3_000, max_rounds=1)
    c.frontier = assign_seq(seed_tbl, 0)
    c._to_register = c.frontier
    c.crawl([])
    rules_delay = None
    from spider_ray.politeness import PolitenessAdmit, host_budget

    admit = PolitenessAdmit(cfg, 3_000, True)
    k = host_budget(admit.rules_for("h0.test").crawl_delay_ms, 3_000)
    assert 0 < k < 12
    fetched = set(int(h) for h in c.fetched_hashes[0])
    # all priority-5 seeds (4 of them) must be among the admitted
    from spider_ray.canon import canonicalize
    from spider_ray.hashing import xxh64

    high = {xxh64(canonicalize(u)) for i, u in enumerate(urls) if i % 3 == 0}
    if k >= len(high):
        assert high <= fetched
    assert len(fetched) == k


def test_sitemap_hosts_match_oracle(ray_session):
    """S5 — XML sitemap discovery (sitemaps.org index → urlset →
    details): engine and oracle must agree on fetch sets, seen-set and
    sink rows when some hosts are seeded via /sitemap.xml."""
    cfg = _cfg(num_hosts=5, sitemap_host_pct=70)
    assert any(cfg.is_sitemap_host(i) for i in range(cfg.num_hosts))
    assert any(
        not cfg.is_sitemap_host(i) and not cfg.is_api_host(i)
        for i in range(cfg.num_hosts)
    )  # mixed world: sitemap + listing hosts
    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    img = eng.images_table().to_pydict()
    eng_rows = dict(zip(img["image_id"], img["phash"]))
    ora_rows = {r["image_id"]: r["phash"] for r in ora.images}
    assert eng_rows == ora_rows
    assert res["images"] > 0 and res["items"] > 0


def test_dataset_from_refs_public_fallback(ray_session, monkeypatch):
    """from_local_tables' zero-task fast path uses ray.data._internal;
    the public from_arrow_refs fallback (forced via env) must produce
    an identical dataset (ADVICE r3 / VERDICT r3 Next-round #7). The
    mirror stays the DEFAULT: r5 trialled the public path as default
    per VERDICT r4 #5 and it deadlocked both 2-CPU scaling legs (the
    per-block metadata ray.get starving behind blocked fetch workers)
    while winning only ~1% at 32 CPUs — see dataset_from_refs'
    docstring for the recorded measurements."""
    import pandas as pd
    import pyarrow as pa

    from spider_ray.frontier import from_local_tables

    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    fast = from_local_tables([t, t.slice(0, 2)])
    monkeypatch.setenv("SPIDER_RAY_PUBLIC_FROM_REFS", "1")
    slow = from_local_tables([t, t.slice(0, 2)])
    monkeypatch.delenv("SPIDER_RAY_PUBLIC_FROM_REFS")
    assert fast.schema() == slow.schema()
    assert fast.count() == slow.count() == 5
    pd.testing.assert_frame_equal(fast.to_pandas(), slow.to_pandas())


def test_retried_task_reproduces_winner_mask(ray_session):
    """A Ray-retried fused round task re-runs the winner query AFTER its
    first attempt already push_committed the admitted hashes. The
    round-aware seen exemption must reproduce the original mask instead
    of admitting zero rows (ADVICE r3 medium)."""
    from spider_ray.dedup import ShardedDedup

    d = ShardedDedup(num_shards=2)
    h = np.arange(1, 9, dtype=np.uint64) * np.uint64(7919)
    sp = np.zeros(len(h), dtype=np.int64)
    sl = np.arange(len(h), dtype=np.int64)
    d.register_arrays(h, sp, sl, round_no=1)
    mask1 = d.winner_mask_arrays(h, sp, sl, round_no=1)
    assert mask1.all()
    # first attempt commits in-task, then the worker dies mid-fetch
    d.push_commit(h[mask1], round_no=1)
    # retry: same block, same round — must reproduce mask1 exactly
    mask2 = d.winner_mask_arrays(h, sp, sl, round_no=1)
    np.testing.assert_array_equal(mask1, mask2)
    # a retry may re-commit; still idempotent
    d.push_commit(h[mask2], round_no=1)
    np.testing.assert_array_equal(d.winner_mask_arrays(h, sp, sl, 1), mask1)
    # after the driver-side barrier clears the round, the commits are
    # permanent: round 2 sees every hash as seen
    d.clear_round(1)
    assert d.seen_mask_arrays(h).all()
    d.register_arrays(h, sp, sl, round_no=2)
    assert not d.winner_mask_arrays(h, sp, sl, round_no=2).any()
    d.shutdown()


def test_redirects_match_oracle(ray_session):
    """301 alias links (redirect_pct > 0): the engine follows the
    Location into the next round's frontier exactly like the
    sequential oracle — fetch sets (which now include the alias
    fetches), seen set and sink rows all agree; redirect targets
    dedup normally (a target reached twice is fetched once)."""
    from spider_ray.synth import World, detail_href

    cfg = _cfg(redirect_pct=40, fail_pct=0, notfound_pct=0)
    # the world really emits aliases and 301s at this pct
    w = World(cfg, CAPTIONS)
    aliases = [k for k in range(60) if detail_href(cfg, k).startswith("/go/")]
    assert aliases, "redirect_pct did not produce alias links"
    page = w.resolve(f"http://h0.test/go/{aliases[0]}")
    assert page.status == 301 and page.body.startswith(b"http://h0.test/prop/")

    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    img = eng.images_table().to_pydict()
    eng_rows = {
        i: (c, f, p)
        for i, c, f, p in zip(img["image_id"], img["caption"], img["fmt"],
                              img["phash"])
    }
    ora_rows = {r["image_id"]: (r["caption"], r["fmt"], r["phash"])
                for r in ora.images}
    assert eng_rows == ora_rows
    # the alias fetches really happened (strictly more fetches than a
    # no-redirect world over the same content)
    plain = OracleCrawler(_cfg(redirect_pct=0, fail_pct=0, notfound_pct=0),
                          CAPTIONS).crawl(cfg.seeds())
    assert len(ora.fetch_log) > len(plain.fetch_log)
    # ...but the same DETAIL content is reached: identical sink rows
    plain_rows = {r["image_id"] for r in plain.images}
    assert {r["image_id"] for r in ora.images} == plain_rows


def test_content_encoding_matches_oracle(ray_session):
    """HTTP compression (gzip_pct > 0): the world serves gzip/deflate
    wire bodies; the fetch stage's transparent decode (the Scrapy
    HttpCompressionMiddleware analog) hands parse identical bytes, so
    engine and oracle agree — and the whole crawl output matches the
    uncompressed world's output exactly."""
    import gzip as _gzip

    from spider_ray.synth import World

    cfg = _cfg(gzip_pct=50, fail_pct=0, notfound_pct=0)
    # the world really compresses at this pct, deterministically
    w = World(cfg, CAPTIONS)
    encs = set()
    for p in range(1, 3):
        page = w.resolve(f"http://h0.test/list?page={p}")
        encs.add(page.content_encoding)
        if page.content_encoding == "gzip":
            assert page.body[:2] == b"\x1f\x8b"
            assert _gzip.decompress(page.body).startswith(b"<html>")
        again = w.resolve(f"http://h0.test/list?page={p}")
        assert again.body == page.body  # deterministic member header
    probe = [w.resolve(f"http://h0.test/prop/{k}").content_encoding
             for k in range(40)]
    assert "gzip" in set(probe) | encs, "gzip_pct produced no gzip pages"

    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    img = eng.images_table().to_pydict()
    eng_rows = {
        i: (c, f, p)
        for i, c, f, p in zip(img["image_id"], img["caption"], img["fmt"],
                              img["phash"])
    }
    ora_rows = {r["image_id"]: (r["caption"], r["fmt"], r["phash"])
                for r in ora.images}
    assert eng_rows == ora_rows
    # the coding is wire-only: identical crawl to the identity world
    plain_eng, plain_res = _run_engine(
        _cfg(gzip_pct=0, fail_pct=0, notfound_pct=0))
    assert _fetch_sets(eng) == _fetch_sets(plain_eng)
    assert res["images"] == plain_res["images"]
    assert res["items"] == plain_res["items"]


def test_charset_world_matches_oracle(ray_session):
    """windows-1252 detail pages (latin1_pct > 0): the shared parse
    kernel sniffs the meta charset and decodes, so engine and oracle
    agree — and extracted items/captions equal the all-UTF-8 world's
    (the coding is representation-only)."""
    from spider_ray.synth import World

    caps = [f"légère caption {i} — 80 m²" for i in range(5)]
    cfg = _cfg(latin1_pct=60, fail_pct=0, notfound_pct=0)
    w = World(cfg, caps)
    # the world really serves cp1252 bytes at this pct
    hit = [w.resolve(f"http://h0.test/prop/{k}") for k in range(24)]
    cp = [p for p in hit if p.status == 200
          and b'charset="windows-1252"' in p.body]
    assert cp, "latin1_pct produced no cp1252 pages"
    assert any(b"l\xe9g\xe8re" in p.body for p in cp)  # true cp1252 bytes

    c1 = Crawler(cfg, caps, num_dedup_shards=4, obey_robots=True,
                 round_window_ms=60_000)
    c1.crawl(cfg.seeds())
    ora = OracleCrawler(cfg, caps).crawl(cfg.seeds())
    assert _fetch_sets(c1) == _oracle_fetch_sets(ora)
    img = c1.images_table().to_pydict()
    eng_rows = {i: c for i, c in zip(img["image_id"], img["caption"])}
    ora_rows = {r["image_id"]: r["caption"] for r in ora.images}
    assert eng_rows == ora_rows
    assert any("légère" in c for c in eng_rows.values())
    # identical content to the all-utf-8 world
    c0 = Crawler(_cfg(latin1_pct=0, fail_pct=0, notfound_pct=0), caps,
                 num_dedup_shards=4, obey_robots=True,
                 round_window_ms=60_000)
    c0.crawl(cfg.seeds())
    img0 = c0.images_table().to_pydict()
    assert eng_rows == {i: c for i, c in zip(img0["image_id"],
                                             img0["caption"])}


def test_offsite_filter_matches_oracle(ray_session):
    """Offsite links (offsite_pct > 0): listing pages carry external
    partner links; the OffsiteMiddleware analog drops every extracted
    link outside allowed_domains BEFORE it reaches the dedup shards —
    engine and oracle agree, and the crawl's per-round fetch sets are
    byte-identical to a world with no offsite links at all (only a
    working filter does that: a broken one fetches partner URLs)."""
    from spider_ray.extract import parse_listing_links
    from spider_ray.synth import World

    cfg = _cfg(offsite_pct=50, fail_pct=0, notfound_pct=0)
    w = World(cfg, CAPTIONS)
    links, _nxt, _featured = parse_listing_links(
        w.resolve("http://h0.test/list?page=1").body)
    assert any(".example/" in u for u in links), \
        "offsite_pct did not emit external links"

    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    # the filter really fired (lineage counts the Scrapy
    # offsite/filtered stat) ...
    assert sum(row["rows_offsite"] for row in eng.lineage) > 0
    # ... and dropped links are NOT "seen" (never fingerprinted into
    # the dupefilter): a second extraction of the same partner URL is
    # dropped again, not dedup-skipped
    from spider_ray.canon import canonicalize
    from spider_ray.hashing import xxh64
    off_hash = xxh64(canonicalize("http://partner0.example/promo/0"))
    assert off_hash not in eng_seen
    # identical crawl to the no-offsite world over the same content
    plain, _ = _run_engine(_cfg(offsite_pct=0, fail_pct=0, notfound_pct=0))
    assert _fetch_sets(eng) == _fetch_sets(plain)
    img_a = set(eng.images_table()["image_id"].to_pylist())
    img_b = set(plain.images_table()["image_id"].to_pylist())
    assert img_a == img_b


def test_url_is_from_any_domain():
    from spider_ray.canon import url_is_from_any_domain as f

    assert f("h3.test", ("test",))
    assert f("a.b.test", ("test",))
    assert f("wredevelopment.ca", ("wredevelopment.ca",))
    assert f("www.wredevelopment.ca", ("wredevelopment.ca",))
    assert not f("xtest", ("test",))          # suffix needs a dot
    assert not f("partner0.example", ("test",))
    assert not f("test.example", ("test",))   # domain as a LABEL prefix
    assert f("H3.TEST", ("test",)) and f("h3.test", ("TEST",))  # case-folded
    assert not f("", ("test",)) and not f("h3.test", ())


def test_cookie_jar_matches_oracle(ray_session):
    """Session-gated hosts (cookie_host_pct > 0): listing pages set a
    session cookie and detail pages 403 without it. The engine's
    CookiesMiddleware analog learns the cookie from the listing
    response (round-aligned visibility) and replays it on later
    same-host fetches — engine equals oracle, and the crawl loses
    NOTHING vs the ungated world (only a working jar does that: no
    jar means every gated detail 403s through its retries and dies)."""
    from spider_ray.synth import World

    cfg = _cfg(cookie_host_pct=60, fail_pct=0, notfound_pct=0)
    w = World(cfg, CAPTIONS)
    gated = [i for i in range(cfg.num_hosts) if cfg.is_cookie_host(i)]
    assert gated, "cookie_host_pct produced no gated hosts"
    host = f"h{gated[0]}.test"
    assert w.resolve(f"http://{host}/prop/0").status == 403
    assert w.resolve(f"http://{host}/prop/0",
                     cookie=cfg.session_cookie(host)).status == 200
    assert w.resolve(f"http://{host}/list?page=1").set_cookie

    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    # the jar learned exactly the gated hosts' sessions
    assert eng.cookie_jar == {
        f"h{i}.test": cfg.session_cookie(f"h{i}.test") for i in gated
    }
    # gating transparent: identical crawl to the ungated world
    plain, pres = _run_engine(_cfg(cookie_host_pct=0, fail_pct=0,
                                   notfound_pct=0))
    assert res["items"] == pres["items"]
    assert res["images"] == pres["images"]
    assert _fetch_sets(eng) == _fetch_sets(plain)


def test_handle_httpstatus_matches_oracle(ray_session):
    """handle_httpstatus_list (njestates_co_uk.py:30 and 16 more
    reference spiders): soft-401 detail pages (full body behind an
    auth-warning status) are retried to exhaustion — 401 is in the
    reference's RETRY_HTTP_CODES — and THEN parsed when 401 is in the
    spider's handled list, exactly like Scrapy's RetryMiddleware →
    HttpErrorMiddleware order. Engine equals oracle with the list on
    and off; the list demonstrably changes what gets extracted."""
    from spider_ray.synth import World

    cfg = _cfg(soft401_pct=40, handle_httpstatus_list=(401,),
               fail_pct=0, notfound_pct=0)
    w = World(cfg, CAPTIONS)
    soft = [k for k in range(40)
            if w.resolve(f"http://h0.test/prop/{k}").status == 401]
    assert soft, "soft401_pct produced no 401 pages"
    p = w.resolve(f"http://h0.test/prop/{soft[0]}", attempt=3)
    assert p.status == 401 and p.body, "soft-401 must keep the full body"

    eng, res = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    img = eng.images_table().to_pydict()
    eng_rows = {i: (c, f) for i, c, f in
                zip(img["image_id"], img["caption"], img["fmt"])}
    assert eng_rows == {r["image_id"]: (r["caption"], r["fmt"])
                        for r in ora.images}

    # retries first: a soft-401 detail is fetched MAX_RETRIES+1 times
    # (it 401s on every attempt) before the exhausted response parses
    from spider_ray.canon import canonicalize
    from spider_ray.hashing import xxh64
    soft_hash = xxh64(canonicalize(f"http://h0.test/prop/{soft[0]}"))
    hits = sum(soft_hash in s for s in _fetch_sets(eng))
    assert hits == 4  # initial fetch + 3 retries (MAX_RETRIES)

    # negative control: Scrapy's default (no handled statuses) — the
    # same world's soft-401 details never parse, so their image links
    # are never discovered; engine still equals oracle
    cfg0 = _cfg(soft401_pct=40, fail_pct=0, notfound_pct=0)
    e0, _ = _run_engine(cfg0)
    o0 = OracleCrawler(cfg0, CAPTIONS).crawl(cfg0.seeds())
    assert _fetch_sets(e0) == _oracle_fetch_sets(o0)
    assert e0.images_table().num_rows < len(eng_rows)


def test_http_cache_at_scale_path(ray_session, tmp_path):
    """The groupby-admission fallback path (prefilter_threshold=0
    forces it) consults the cache too: prefilter never defers hits,
    PolitenessAdmit admits them budget-free — warm re-run equals the
    cold run and the host-aligned path's outputs."""
    cfg = _cfg(fail_pct=0, notfound_pct=0)
    cache_dir = str(tmp_path / "hc")

    def run():
        c = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                    round_window_ms=60_000, http_cache_dir=cache_dir,
                    prefilter_threshold=0, inline_threshold=0)
        c.crawl(cfg.seeds())
        c.close()
        return c

    cold, warm = run(), run()
    assert _fetch_sets(cold) == _fetch_sets(warm)
    assert cold.images_table().to_pydict() == warm.images_table().to_pydict()
    # and the at-scale path agrees with the default host-aligned path
    aligned = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                      round_window_ms=60_000,
                      http_cache_dir=str(tmp_path / "hc2"))
    aligned.crawl(cfg.seeds())
    aligned.close()
    assert _fetch_sets(cold) == _fetch_sets(aligned)


def test_http_cache_epoch_visibility(tmp_path):
    """Unit contract of the store: entries written in round r are
    invisible to lookups at rounds ≤ r of the same run (round-aligned,
    like cookies) but fully visible to the next run (new epoch)."""
    import pyarrow as pa

    from spider_ray.httpcache import HttpCache

    c1 = HttpCache(str(tmp_path), nbuckets=4)
    rows = pa.table({
        "url_hash": pa.array([11, 22], pa.uint64()),
        "host_hash": pa.array([5, 6], pa.uint64()),
        "status": pa.array([200, 503], pa.int32()),
        "kind": pa.array(["detail", "detail"]),
        "body": pa.array([b"a", b""], pa.large_binary()),
        "fmt": pa.array(["", ""]),
        "set_cookie": pa.array(["", ""]),
    })
    c1.store(rows, round_no=3)
    uh = np.array([11, 22, 33], dtype=np.uint64)
    hh = np.array([5, 6, 7], dtype=np.uint64)
    assert c1.hit_mask(uh, hh, before_round=3).tolist() == [False] * 3
    assert c1.hit_mask(uh, hh, before_round=4).tolist() == [True, True, False]
    got = c1.lookup(uh, hh, before_round=4)
    assert got[11] == (200, "detail", b"a", "", "")
    assert got[22][0] == 503  # error statuses cached too (DummyPolicy)
    # a new run (fresh HttpCache on the same dir) sees everything at
    # round 0, and its own epoch is bumped past the stored one
    c2 = HttpCache(str(tmp_path), nbuckets=4)
    assert c2.epoch == c1.epoch + 1
    assert c2.hit_mask(uh, hh, before_round=0).tolist() == [True, True, False]


@pytest.mark.parametrize("retry_times", [0, 1])
def test_retry_times_matches_oracle(ray_session, retry_times):
    """RETRY_TIMES per-spider override (54 reference spiders set it in
    custom_settings): with retry_times=1 a first-attempt-503 page is
    fetched exactly twice and succeeds; with retry_times=0 it dies on
    the first failure — engine equals oracle either way."""
    cfg = _cfg(fail_pct=30, notfound_pct=0, private_pct=0,
               retry_times=retry_times)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    img = eng.images_table().to_pydict()
    assert ({i: c for i, c in zip(img["image_id"], img["caption"])}
            == {r["image_id"]: r["caption"] for r in ora.images})
    # flaky details only 503 on attempt 0, so ONE retry recovers all
    # of them; zero retries loses them
    base, _ = _run_engine(_cfg(fail_pct=0, notfound_pct=0, private_pct=0))
    if retry_times >= 1:
        assert eng.images_table().num_rows == base.images_table().num_rows
    else:
        assert eng.images_table().num_rows < base.images_table().num_rows


def test_cookies_disabled_matches_oracle(ray_session):
    """COOKIES_ENABLED=False / dont_merge_cookies analog (13 + 8
    reference spiders): with the jar off, the crawler neither learns
    nor replays sessions — engine equals oracle, and on a session-
    gated world every gated detail 403s through its retries and dies
    (strictly fewer images than the jar-on crawl)."""
    cfg = _cfg(cookie_host_pct=60, fail_pct=0, notfound_pct=0,
               cookies_enabled=False)
    eng, _ = _run_engine(cfg)
    ora = OracleCrawler(cfg, CAPTIONS).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    assert eng.cookie_jar == {}
    img = eng.images_table().to_pydict()
    assert ({i: c for i, c in zip(img["image_id"], img["caption"])}
            == {r["image_id"]: r["caption"] for r in ora.images})
    on, _ = _run_engine(_cfg(cookie_host_pct=60, fail_pct=0,
                             notfound_pct=0))
    assert eng.images_table().num_rows < on.images_table().num_rows


def test_http_cache_partial_hit_on_world_growth(ray_session, tmp_path):
    """VERDICT r4 #7 — partial-hit contract under world mutation: grow
    the world (3 → 6 hosts = 100% new URL fingerprints on the new
    hosts, zero change on the old) and re-crawl over the old cache.
    ONLY the mutated (new-host) fingerprints may download: the newly
    stored set must equal exactly the set a cold crawl of the grown
    world stores MINUS what the old world stored (host trees are
    independent), the old entries must all survive, and the mutated
    crawl's items/images must equal the cold grown crawl's (old hosts
    parse identically from stored bodies). Compaction-proof accounting
    via HttpCache.fingerprints snapshots (compaction restamps epochs)."""
    from spider_ray.httpcache import HttpCache

    base = dict(max_pages_per_host=2, details_per_page=4,
                fail_pct=10, notfound_pct=5, private_pct=15)
    cfg_old = _cfg(num_hosts=3, **base)
    cfg_new = _cfg(num_hosts=6, **base)

    def run(cfg, cache_dir):
        c = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                    round_window_ms=60_000, http_cache_dir=cache_dir)
        res = c.crawl(cfg.seeds())
        c.close()
        return res

    c1 = str(tmp_path / "hc_old")
    res_old = run(cfg_old, c1)
    s_old = HttpCache.fingerprints(c1)
    assert s_old

    c2 = str(tmp_path / "hc_cold_new")
    res_cold_new = run(cfg_new, c2)
    s_cold_new = HttpCache.fingerprints(c2)
    assert s_old < s_cold_new  # old hosts' downloads are a strict subset

    res_mut = run(cfg_new, c1)  # warm over the OLD cache
    s_mut = HttpCache.fingerprints(c1)
    # only mutated fingerprints downloaded, all of them, nothing lost
    assert s_mut - s_old == s_cold_new - s_old
    assert s_old <= s_mut
    # outputs equal the cold grown crawl (old hosts served from store)
    assert (res_mut["items"], res_mut["images"], res_mut["seen"]) == (
        res_cold_new["items"], res_cold_new["images"], res_cold_new["seen"])
    assert res_mut["fetched"] == res_cold_new["fetched"]
    assert res_old["items"] < res_mut["items"]


def test_http_cache_compaction(tmp_path):
    """compact() merges a bucket's files into one without changing any
    lookup result for later rounds/runs (probe cost stays O(1) files
    per bucket on long crawls)."""
    import pyarrow as pa

    from spider_ray.httpcache import HttpCache

    c = HttpCache(str(tmp_path), nbuckets=2)
    for r in range(6):
        c.store(pa.table({
            "url_hash": pa.array([r * 2, r * 2 + 1], pa.uint64()),
            "host_hash": pa.array([0, 1], pa.uint64()),
            "status": pa.array([200, 200], pa.int32()),
            "kind": pa.array(["detail", "detail"]),
            "body": pa.array([b"x%d" % r, b"y%d" % r], pa.large_binary()),
            "fmt": pa.array(["", ""]),
            "set_cookie": pa.array(["", ""]),
        }), round_no=r)
    uh = np.arange(12, dtype=np.uint64)
    hh = np.array([0, 1] * 6, dtype=np.uint64)
    before = c.lookup(uh, hh, before_round=6)
    assert len(before) == 12
    assert c.compact(max_files_per_bucket=2) == 2
    # one file per bucket now; identical lookups
    import os as _os
    for b in range(2):
        d = tmp_path / f"bucket={b:03d}"
        assert len([n for n in _os.listdir(d) if n.endswith(".parquet")]) == 1
    assert c.lookup(uh, hh, before_round=6) == before
    # a new run still sees everything
    c2 = HttpCache(str(tmp_path), nbuckets=2)
    assert len(c2.lookup(uh, hh, before_round=0)) == 12


def test_http_cache_matches_oracle(ray_session, tmp_path):
    """HTTPCACHE_ENABLED analog (the reference's most-used
    custom_settings key, 175 spiders): DummyPolicy — every download
    stored by fingerprint, hits served without entering the downloader
    (no politeness budget slot, no world resolve). Cold run equals the
    oracle mirror; a warm re-run over the same cache dir refetches
    NOTHING and reproduces the cold outputs byte-for-byte."""
    cfg = _cfg(fail_pct=10, notfound_pct=5)
    cache_dir = str(tmp_path / "httpcache")
    ocache: dict = {}

    cold = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                   round_window_ms=60_000, http_cache_dir=cache_dir)
    cold.crawl(cfg.seeds())
    cold.close()
    o1 = OracleCrawler(cfg, CAPTIONS, http_cache=ocache).crawl(cfg.seeds())
    assert _fetch_sets(cold) == _oracle_fetch_sets(o1)
    img = cold.images_table().to_pydict()
    cold_rows = {i: (c, f, p) for i, c, f, p in
                 zip(img["image_id"], img["caption"], img["fmt"], img["phash"])}
    assert cold_rows == {r["image_id"]: (r["caption"], r["fmt"], r["phash"])
                         for r in o1.images}
    assert ocache, "oracle cache stayed empty"

    # DummyPolicy faithfulness: the first-attempt 503 is CACHED, so its
    # retries re-see the stored failure and the flaky page dies — the
    # cached world extracts strictly less than the uncached one (the
    # documented reason Scrapy has HTTPCACHE_IGNORE_HTTP_CODES)
    nocache, _ = _run_engine(cfg)
    assert len(cold_rows) < nocache.images_table().num_rows

    # warm re-run: same cache dir (new epoch), same oracle dict — the
    # oracle performs ZERO non-robots world resolves, and both sides
    # reproduce the cold outputs with no deferral tail (every hit is
    # admitted budget-free)
    warm = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                   round_window_ms=60_000, http_cache_dir=cache_dir)
    warm.crawl(cfg.seeds())
    warm.close()
    o2 = OracleCrawler(cfg, CAPTIONS, http_cache=ocache)
    downloads = 0
    orig_resolve = o2.world.resolve

    def counting_resolve(url, *a, **kw):
        nonlocal downloads
        if "/robots.txt" not in url:
            downloads += 1
        return orig_resolve(url, *a, **kw)

    o2.world.resolve = counting_resolve
    r2 = o2.crawl(cfg.seeds())
    assert downloads == 0
    assert _fetch_sets(warm) == _oracle_fetch_sets(r2)
    wimg = warm.images_table().to_pydict()
    assert cold_rows == {i: (c, f, p) for i, c, f, p in
                         zip(wimg["image_id"], wimg["caption"],
                             wimg["fmt"], wimg["phash"])}
    assert sum(row["rows_deferred"] for row in warm.lineage) == 0


def test_http_cache_with_checkpoint_resume(ray_session, tmp_path):
    """Checkpoints + cache together: a crawl killed after round 2
    resumes (fresh Crawler = new cache epoch, so the partial run's
    stored responses are fully visible to every round of the resumed
    run) and finishes with the same per-round fetch sets and sink
    rows as the uninterrupted cached run."""
    cfg = _cfg(num_hosts=3, fail_pct=0, notfound_pct=0)
    cache_dir = str(tmp_path / "hc")
    full = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                   round_window_ms=60_000,
                   http_cache_dir=str(tmp_path / "hc_full"))
    full.crawl(cfg.seeds())
    full.close()

    ck = str(tmp_path / "ck")
    part = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                   round_window_ms=60_000, checkpoint_dir=ck,
                   http_cache_dir=cache_dir, max_rounds=2)
    part.crawl(cfg.seeds())
    part.close()
    resumed = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                      round_window_ms=60_000, checkpoint_dir=ck,
                      http_cache_dir=cache_dir)
    assert resumed.resume()
    resumed.crawl([])
    resumed.close()
    assert _fetch_sets(resumed) == _fetch_sets(full)
    assert (resumed.images_table().to_pydict()
            == full.images_table().to_pydict())


def test_cookie_jar_survives_resume(ray_session, tmp_path):
    """The jar rides the lineage checkpoints: a resumed crawl replays
    learned sessions without re-fetching listing pages — same fetch
    sets and sink totals as the uninterrupted run."""
    cfg = _cfg(num_hosts=3, cookie_host_pct=80)
    full_eng, full_res = _run_engine(cfg)
    assert full_eng.cookie_jar, "world produced no cookies"

    ck = str(tmp_path / "ck")
    _run_engine(cfg, checkpoint_dir=ck, max_rounds=2)
    resumed = Crawler(cfg, CAPTIONS, checkpoint_dir=ck, num_dedup_shards=4,
                      obey_robots=True, round_window_ms=60_000)
    assert resumed.resume()
    # restored BEFORE any crawling — from the checkpointed lineage rows
    assert resumed.cookie_jar == full_eng.cookie_jar
    res = resumed.crawl([])
    assert res["fetched"] == full_res["fetched"]
    assert res["images"] == full_res["images"]
    assert _fetch_sets(resumed) == _fetch_sets(full_eng)


def test_kitchen_sink_world_matches_oracle(ray_session, tmp_path):
    """Every world knob nonzero AT ONCE — middleware interactions are
    where faithful analogs usually break (e.g. a gzip body behind a
    soft-401 behind a redirect on a cookie host with a custom retry
    list). Engine = oracle, and streaming = driver, on the same world."""
    cfg = WorldConfig(
        num_hosts=6, max_pages_per_host=2, details_per_page=3,
        fail_pct=10, notfound_pct=5, private_pct=15,
        api_host_pct=34, sitemap_host_pct=25, cookie_host_pct=50,
        viewstate_pct=100, featured_pct=50, custom_politeness_pct=60,
        gzip_pct=40, latin1_pct=30, redirect_pct=25, offsite_pct=30,
        soft401_pct=25, handle_httpstatus_list=(401,),
        httperror_allowed_pct=50, dedup_off_pct=50, related_pct=70,
        lang_host_pct=50, hotlink_pct=50, xhr_api_pct=60, json_api_pct=60,
        form_pag_pct=60, slow_pct=30, download_timeout_ms=20_000,
        timeout_host_pct=50,
        # pinned USER_AGENT + dont_redirect dead-listing detection
        # (note: dont_redirect_details also stops /go/ alias 301s on
        # detail callbacks — faithful Scrapy meta semantics; the
        # follow path keeps its own dedicated tests)
        ua_strict_pct=50, dead_detail_pct=30, dont_redirect_details=True,
        retry_http_codes=(500, 503, 504, 400, 401, 403, 405, 407, 408,
                          416, 456, 502, 429, 307),
    )
    eng, res = _run_engine(cfg, window=3_000)
    ora = OracleCrawler(cfg, CAPTIONS, round_window_ms=3_000).crawl(cfg.seeds())
    assert _fetch_sets(eng) == _oracle_fetch_sets(ora)
    eng_seen = set()
    for snap in eng.dedup.snapshot():
        eng_seen.update(int(x) for x in snap)
    assert eng_seen == ora.seen
    img = eng.images_table().to_pydict()
    eng_rows = dict(zip(img["image_id"], img["phash"]))
    ora_rows = {r["image_id"]: r["phash"] for r in ora.images}
    assert eng_rows == ora_rows

    from spider_ray.frontier_stream import StreamingCrawler

    sc = StreamingCrawler(cfg, CAPTIONS, work_dir=str(tmp_path / "work"),
                          num_dedup_shards=4, obey_robots=True,
                          round_window_ms=3_000)
    sres = sc.crawl(cfg.seeds())
    assert sc.seen_set() == eng_seen
    assert sres["fetched"] == res["fetched"]
    assert sres["images"] == res["images"]
