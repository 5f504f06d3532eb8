"""Unit tests: imaging kernels, cuckoo filter / shard state, robots +
politeness budget, synthetic world determinism."""

import numpy as np
import pytest

from spider_ray import imaging
from spider_ray.dedup import CuckooFilter, _ShardState
from spider_ray.politeness import (
    PolitenessAdmit,
    RobotsRules,
    host_budget,
    parse_robots,
    prefilter_topk_per_host,
)
from spider_ray.synth import World, WorldConfig, image_bytes


# ---------------------------------------------------------------- imaging
def test_png_roundtrip_lossless():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    assert (imaging.decode_png(imaging.encode_png(px)) == px).all()


def test_qpng_psnr_floor():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    out = imaging.decode_png(imaging.encode_qpng(px))
    assert imaging.psnr(px, out) >= 40.0  # the input_hint lossy invariant


def test_psnr_identity_inf():
    px = np.zeros((8, 8, 3), np.uint8)
    assert imaging.psnr(px, px) == float("inf")


def test_phash_properties():
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    a = np.stack([(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], -1).astype(np.uint8)
    b = imaging.decode_png(imaging.encode_qpng(a))  # mild quantization
    assert imaging.hamming64(imaging.phash(a), imaging.phash(b)) <= 8
    rng = np.random.default_rng(9)
    c = rng.integers(0, 256, a.shape, dtype=np.uint8)
    assert imaging.hamming64(imaging.phash(a), imaging.phash(c)) > 10
    # int64 signedness fits the sink column
    assert -(1 << 63) <= imaging.phash(a) < (1 << 63)


def test_jpeg_is_real_now():
    # round 3: imaging.encode_jpeg/decode delegate to the T.81 codec
    # (spider_ray.jpeg) instead of raising — full coverage in
    # tests/test_jpeg.py; here just the imaging-surface round-trip
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = imaging.decode(imaging.encode_jpeg(px, quality=98), "jpeg")
    assert out.shape == px.shape
    with pytest.raises(ValueError):
        imaging.decode(b"xx", "jpeg")  # garbage still rejected


# ---------------------------------------------------------------- cuckoo
def test_cuckoo_filter_no_false_negatives():
    f = CuckooFilter(1 << 12)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, 3000, dtype=np.uint64)
    f.insert_many(keys)
    assert f.contains_many(keys).all()  # never a false negative
    other = rng.integers(0, 2**63, 3000, dtype=np.uint64)
    fresh = np.setdiff1d(other, keys)
    fp_rate = f.contains_many(fresh).mean()
    assert fp_rate < 0.05  # 16-bit fingerprints → tiny FP rate


def test_shard_state_two_phase():
    st = _ShardState(mode="exact")
    h = np.array([10, 10, 20], dtype=np.uint64)
    sp = np.array([5, 3, 1])
    sl = np.array([0, 2, 0])
    st.register(h, sp, sl, round_no=0)
    # min key wins within round for url 10 → (3, 2)
    win = st.winners(h, sp, sl, round_no=0)
    assert win.tolist() == [False, True, True]
    # a registration for the NEXT round must not disturb round 0
    st.register(h[:1], sp[:1] - 5, sl[:1], round_no=1)
    assert st.winners(h, sp, sl, round_no=0).tolist() == [False, True, True]
    st.commit_hashes(np.array([10], dtype=np.uint64))
    st.clear_pending(0)
    assert st.seen_mask(np.array([10, 20], dtype=np.uint64)).tolist() == [True, False]
    snap = st.snapshot()
    st2 = _ShardState(mode="cuckoo")
    st2.restore(snap)
    assert st2.seen_mask(np.array([10, 20], dtype=np.uint64)).tolist() == [True, False]


def test_shard_state_cuckoo_confirms_exact():
    st = _ShardState(capacity=1 << 10, mode="cuckoo")
    keys = np.arange(100, dtype=np.uint64) * 7919
    st.register(keys, np.zeros(100), np.arange(100), round_no=0)
    st.commit_hashes(keys)
    st.clear_pending(0)
    assert st.seen_mask(keys).all()
    # cuckoo false positives are confirmed against the exact set → False
    probe = np.arange(100, dtype=np.uint64) * 104729 + 13
    probe = np.setdiff1d(probe, keys)
    assert not st.seen_mask(probe).any()


# ---------------------------------------------------------------- politeness
def test_parse_robots():
    body = b"User-agent: *\nCrawl-delay: 1.5\nDisallow: /private/\nDisallow: /tmp\n"
    r = parse_robots(body)
    assert r.crawl_delay_ms == 1500
    assert r.disallow == ("/private/", "/tmp")
    assert r.allows("/prop/1") and not r.allows("/private/prop/2")
    other = parse_robots(b"User-agent: googlebot\nDisallow: /\n")
    assert other.allows("/anything")  # non-* section ignored


def test_host_budget():
    assert host_budget(1000, 60_000) == 60
    assert host_budget(100_000, 60_000) == 1  # at least one per round
    assert host_budget(1, 60_000) == 16 * 60  # concurrency cap


def test_politeness_admit_and_prefilter():
    import pandas as pd

    cfg = WorldConfig(num_hosts=2)
    admit = PolitenessAdmit(cfg, round_window_ms=5_000, obey_robots=True)
    rules = admit.rules_for("h0.test")
    k = host_budget(rules.crawl_delay_ms, 5_000)
    n = k + 5
    g = pd.DataFrame(
        {
            "host": ["h0.test"] * n,
            "host_hash": [1] * n,
            "canonical_url": [f"http://h0.test/prop/{i}" for i in range(n)]
            + [],
            "seq_parent": list(range(n)),
            "seq_link": [0] * n,
            "seq": list(range(n)),
        }
    )
    out = admit(g)
    assert out["admitted"].sum() == k
    # first-k by seq
    assert out[out["admitted"]]["seq"].max() < out[~out["admitted"]]["seq"].min()
    # blocked: private path
    g2 = g.copy()
    g2.loc[0, "canonical_url"] = "http://h0.test/private/prop/0"
    out2 = admit(g2)
    assert bool(out2.sort_values("seq").iloc[0]["blocked"])

    pre = prefilter_topk_per_host(g, max_k=3)
    assert (~pre["prefiltered_defer"]).sum() == 3
    assert pre[~pre["prefiltered_defer"]]["seq"].tolist() == [0, 1, 2]


# ---------------------------------------------------------------- synth world
def test_world_is_pure_function():
    cfg = WorldConfig(num_hosts=2)
    w1, w2 = World(cfg, ["c"]), World(cfg, ["c"])
    for url in ["http://h0.test/list?page=1", "http://h0.test/prop/3",
                "http://h0.test/img/3_0.png", "http://h0.test/robots.txt"]:
        p1, p2 = w1.resolve(url), w2.resolve(url)
        assert (p1.status, p1.kind, p1.body) == (p2.status, p2.kind, p2.body)
    b1 = image_bytes(cfg, "3_0")
    b2 = image_bytes(cfg, "3_0")
    assert b1 == b2


def test_world_transient_failure_then_success():
    cfg = WorldConfig(num_hosts=4, fail_pct=100, notfound_pct=0)
    w = World(cfg, ["c"])
    p0 = w.resolve("http://h0.test/prop/1", attempt=0)
    p1 = w.resolve("http://h0.test/prop/1", attempt=1)
    assert p0.status == 503 and p1.status == 200


def test_sink_write_read_roundtrip(ray_session, tmp_path):
    import pyarrow as pa

    from spider_ray.schema import IMAGES_SCHEMA
    from spider_ray.sink import read_images, write_images

    tbl = pa.table(
        {
            "image_id": ["a", "b"],
            "bytes": [b"\x89PNGxx", b"\x89PNGyy"],
            "w": pa.array([4, 5], pa.int32()),
            "h": pa.array([4, 5], pa.int32()),
            "fmt": ["png", "qpng"],
            "caption": ["c1", "c2"],
            "phash": pa.array([1, -2], pa.int64()),
            "src_url": ["http://h0.test/img/0_0.png", "http://h0.test/img/0_1.png"],
        }
    )
    out = str(tmp_path / "sink")
    fmt = write_images(tbl, out)
    assert fmt in ("lance", "parquet")
    back = read_images(out).to_pandas()
    assert sorted(back["image_id"]) == ["a", "b"]
    assert set(back.columns) >= set(IMAGES_SCHEMA.names)


def test_priority_queue_admission():
    """O1 — higher-priority candidates win the budget; FIFO by seq
    within a priority level."""
    from spider_ray.politeness import admit_masks

    hosts = ["h"] * 5
    urls = [f"http://h/prop/{i}" for i in range(5)]
    prio = [0, 0, 5, 0, 5]

    class R:
        crawl_delay_ms = 1000

        @staticmethod
        def allows(path):
            return True

    admitted, blocked = admit_masks(hosts, urls, lambda h: R, 3000, True,
                                    priority=prio)
    # budget k=3 → both prio-5 rows + the first prio-0 row
    assert admitted.tolist() == [True, False, True, False, True]
    assert not blocked.any()


def test_autothrottle_delay_adaptation():
    """ST3 — AutoThrottle update rule: delay converges from START toward
    the host's observed latency, clamped to [START, MAX]."""
    from spider_ray.politeness import (
        AUTOTHROTTLE_MAX_DELAY_MS,
        AUTOTHROTTLE_START_DELAY_MS,
        autothrottle_delay_ms,
    )

    cfg = WorldConfig(num_hosts=64)
    host = next(
        f"h{i}.test" for i in range(64)
        if cfg.host_latency_ms(f"h{i}.test") > 150
    )
    lat = cfg.host_latency_ms(host)
    d0 = autothrottle_delay_ms(cfg, host, 0)
    d1 = autothrottle_delay_ms(cfg, host, 1)
    d8 = autothrottle_delay_ms(cfg, host, 8)
    assert d0 == AUTOTHROTTLE_START_DELAY_MS
    assert d0 < d1 <= d8 <= lat  # converges up toward latency
    assert abs(d8 - lat) <= 2
    # low-latency host stays clamped at the start delay
    slow = next(
        f"h{i}.test" for i in range(64)
        if cfg.host_latency_ms(f"h{i}.test") < AUTOTHROTTLE_START_DELAY_MS
    )
    assert autothrottle_delay_ms(cfg, slow, 10) == AUTOTHROTTLE_START_DELAY_MS
    assert autothrottle_delay_ms(cfg, host, 99) <= AUTOTHROTTLE_MAX_DELAY_MS


def test_prefilter_containment_with_priorities_and_robots():
    """ADVICE r1: the skew prefilter must rank by (-priority, seq) and
    must not count robots-blocked rows toward the kept top-k —
    otherwise the admitted set after prefiltering diverges from
    admitting the full frontier. Property: admission over (rows kept by
    per-batch prefilter) == admission over the full set."""
    import pandas as pd

    from spider_ray.politeness import (
        PolitenessAdmit,
        admit_frame,
        prefilter_topk_per_host,
    )
    from spider_ray.synth import WorldConfig

    cfg = WorldConfig(num_hosts=2)
    admit = PolitenessAdmit(cfg, round_window_ms=2_000, obey_robots=True)
    n = 40
    rows = []
    for i in range(n):
        # every 5th row is robots-blocked (/private/); priorities cycle
        priv = "/private" if i % 5 == 0 else ""
        rows.append(
            {
                "host": "h0.test",
                "host_hash": 1,
                "canonical_url": f"http://h0.test{priv}/prop/{i}",
                "priority": [0, 3, 1][i % 3],
                "seq_parent": i,
                "seq_link": 0,
                "seq": i,
            }
        )
    full = pd.DataFrame(rows)
    k = 6  # the host budget for this window/delay

    baseline = admit_frame(full, admit.rules_for, 2_000, True,
                           delay_for=admit.delay_for)
    base_adm = set(baseline[baseline["admitted"]]["seq"])
    base_blk = set(baseline[baseline["blocked"]]["seq"])

    # prefilter applied per-batch over an arbitrary split (the combiner
    # sees partial views, as map_batches does)
    kept = []
    for lo, hi in [(0, 13), (13, 27), (27, 40)]:
        pre = prefilter_topk_per_host(full.iloc[lo:hi], max_k=k, cfg=cfg,
                                      obey_robots=True)
        kept.append(pre[~pre["prefiltered_defer"]].drop(
            columns=["prefiltered_defer"]))
    kept_df = pd.concat(kept)
    again = admit_frame(kept_df, admit.rules_for, 2_000, True,
                        delay_for=admit.delay_for)
    assert set(again[again["admitted"]]["seq"]) == base_adm
    assert set(again[again["blocked"]]["seq"]) == base_blk
    # high-priority rows actually won the budget: the admitted set is
    # exactly the first-budget eligible priority-3 rows by seq
    from spider_ray.politeness import host_budget

    budget = host_budget(admit.delay_for("h0.test"), 2_000)
    elig_p3 = [i for i in range(n) if i % 3 == 1 and i % 5 != 0]
    assert len(base_adm) == min(budget, len(elig_p3))
    assert base_adm == set(elig_p3[:budget])


def test_sorted_set64_memory_and_semantics():
    """VERDICT r1 #6: the exact-confirm structure must hold millions of
    keys at ~8 B/key with identical membership semantics to a Python
    set (10^7-key shard under ~100 MB)."""
    import numpy as np

    from spider_ray.dedup import SortedSet64

    s = SortedSet64()
    rng = np.random.default_rng(9)
    chunks = []
    for i in range(10):
        # 50% overlap with the previous chunk exercises the dedup path
        chunk = rng.integers(0, 2**64, 1_000_000, dtype=np.uint64)
        if chunks:
            chunk[:500_000] = chunks[-1][:500_000]
        fresh = s.add_many(chunk)
        chunks.append(chunk)
        if i == 0:
            assert len(fresh) == len(np.unique(chunk))
    ref = np.unique(np.concatenate(chunks))
    assert len(s) == len(ref)
    # membership: present keys hit, absent keys miss (vectorized probe)
    sample = rng.choice(ref, size=10_000, replace=False)
    assert s.contains_many(sample).all()
    absent = rng.integers(0, 2**64, 10_000, dtype=np.uint64)
    absent = np.setdiff1d(absent, ref)
    assert not s.contains_many(absent).any()
    # memory: 10^7 keys => ~80 MB base + bounded recent overhead
    assert s.nbytes() < 100 * 1024 * 1024
    # snapshot/restore round-trip preserves the set exactly
    rt = SortedSet64.from_array(s.to_array())
    assert len(rt) == len(ref)
    assert rt.contains_many(sample).all()


def test_robots_rfc9309_semantics():
    """RFC 9309: Allow/Disallow longest-match precedence (Allow wins
    ties), * wildcards, $ end anchors, group selection by longest
    matching agent token, consecutive User-agent lines."""
    body = b"""
User-agent: *
Disallow: /private/
Allow: /private/listing/
Disallow: /*.pdf$
Disallow: /search*sort=
Crawl-delay: 0.5
"""
    r = parse_robots(body)
    assert r.crawl_delay_ms == 500
    assert not r.allows("/private/x")
    # Allow's longer pattern beats the shorter Disallow
    assert r.allows("/private/listing/42")
    # wildcard + anchor: only .pdf at the END is blocked
    assert not r.allows("/docs/brochure.pdf")
    assert r.allows("/docs/brochure.pdf.html")
    assert not r.allows("/search?page=2&sort=price")
    assert r.allows("/searching")  # 'sort=' never appears

    # tie between Allow and Disallow of equal length → Allow wins
    tie = parse_robots(b"User-agent: *\nDisallow: /a/\nAllow: /a/\n")
    assert tie.allows("/a/x")

    # group selection: the longest agent token prefixing ours governs
    body2 = b"""
User-agent: spider
User-agent: otherbot
Disallow: /spider-blocked/

User-agent: spider-ray
Disallow: /ray-blocked/

User-agent: *
Disallow: /
"""
    r2 = parse_robots(body2, agent="spider-ray")
    assert not r2.allows("/ray-blocked/x")
    assert r2.allows("/spider-blocked/x") and r2.allows("/anything")
    # an agent matching only the shorter token gets THAT group
    r3 = parse_robots(body2, agent="spiderling")
    assert not r3.allows("/spider-blocked/x") and r3.allows("/ray-blocked/x")
    # unknown agent falls back to *
    r4 = parse_robots(body2, agent="curl")
    assert not r4.allows("/anything")


def test_parse_sitemap_gzip():
    """sitemaps.org allows gzip-compressed documents (.xml.gz) — the
    dominant form for large sites; both kinds decompress and parse."""
    import gzip

    from spider_ray.extract import parse_sitemap

    urlset = (b'<?xml version="1.0"?><urlset><url><loc>http://h0.test/d/1'
              b'</loc></url><url><loc>http://h0.test/d/2</loc></url></urlset>')
    index = (b'<sitemapindex><sitemap><loc>http://h0.test/sm1.xml.gz</loc>'
             b'</sitemap></sitemapindex>')
    assert parse_sitemap(urlset) == (
        "urlset", ["http://h0.test/d/1", "http://h0.test/d/2"])
    assert parse_sitemap(gzip.compress(urlset)) == (
        "urlset", ["http://h0.test/d/1", "http://h0.test/d/2"])
    assert parse_sitemap(gzip.compress(index)) == (
        "index", ["http://h0.test/sm1.xml.gz"])


def test_decode_http_body():
    """fetch.decode_http_body: gzip, zlib-deflate and raw-deflate wire
    forms all decode to the identity bytes; unknown codings raise."""
    import gzip
    import zlib

    import pytest

    from spider_ray.fetch import decode_http_body

    data = b"<html><body>" + b"x" * 500 + b"</body></html>"
    assert decode_http_body(data, "") == data
    assert decode_http_body(gzip.compress(data, mtime=0), "gzip") == data
    assert decode_http_body(gzip.compress(data, mtime=0), "x-gzip") == data
    assert decode_http_body(zlib.compress(data), "deflate") == data
    # some servers send raw RFC 1951 streams under the deflate token
    raw = zlib.compressobj(wbits=-15)
    assert decode_http_body(raw.compress(data) + raw.flush(), "deflate") == data
    with pytest.raises(ValueError):
        decode_http_body(data, "br")


def test_detect_and_decode():
    """extract.detect_and_decode: BOM → header charset → meta charset
    → UTF-8 attempt → cp1252 fallback (w3lib html_to_unicode order)."""
    from spider_ray.extract import detect_and_decode

    s = "café — 80 m²"
    assert detect_and_decode(s.encode("utf-8")) == s
    assert detect_and_decode(b"\xef\xbb\xbf" + s.encode("utf-8")) == s
    # meta charset declaration wins over the utf-8 attempt
    page = f'<html><head><meta charset="windows-1252"></head><body>{s}</body></html>'
    assert s in detect_and_decode(page.encode("cp1252"))
    meta_http = (b'<meta http-equiv="Content-Type" '
                 b'content="text/html; charset=ISO-8859-1">caf\xe9')
    assert detect_and_decode(meta_http).endswith("caf\xe9")
    # header param wins without any meta tag
    assert detect_and_decode(s.encode("cp1252"),
                             "text/html; charset=windows-1252") == s
    # undeclared cp1252 bytes: utf-8 decode fails, fallback kicks in
    assert detect_and_decode("café".encode("cp1252")) == "café"
    # unknown label falls through to the content sniff
    assert detect_and_decode(b'<meta charset="bogus-999">ok').endswith("ok")


def test_encode_page_charset_world():
    """synth.encode_page: deterministic cp1252 share, lossless-only
    conversion, meta tag injected exactly when converted."""
    from spider_ray.synth import WorldConfig, encode_page

    cfg = WorldConfig(latin1_pct=100)
    html = "<html><head><title>x</title></head><body>café</body></html>"
    body, cs = encode_page(cfg, "http://h0.test/prop/1", html)
    assert cs == "windows-1252" and b'charset="windows-1252"' in body
    assert b"caf\xe9" in body  # really cp1252 on the wire
    again, _ = encode_page(cfg, "http://h0.test/prop/1", html)
    assert again == body
    # text outside cp1252 stays utf-8, no misleading meta tag
    body2, cs2 = encode_page(cfg, "http://h0.test/prop/2",
                             html.replace("café", "寿司"))
    assert cs2 == "utf-8" and b"charset=" not in body2
    # pct=0 worlds never convert
    b3, c3 = encode_page(WorldConfig(), "http://h0.test/prop/1", html)
    assert c3 == "utf-8" and b3 == html.encode()
