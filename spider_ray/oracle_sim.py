"""Oracle crawler — single-process reference simulator.

Lives in the package (not tests/) since round 2 so the driver-facing
queries can dump its output as DuckDB-readable parquet oracles for the
crawl/multimodal/verify queries (VERDICT r1 Next-round #5); the test
suite imports it via tests/oracle.py.

The reference repo has NO tests (SURVEY.md §5); its correctness oracle
was a remote validation API. The graft's stand-in is this tiny
sequential crawler: plain-Python dict seen-set, per-host FIFO +
crawl-delay budget, deterministic ordering — "the reference crawler's
output under the same seed list and politeness budget" that the north
rule compares against. It deliberately shares NO coordination code
with the engine (no Ray, no Arrow, no dedup/politeness modules): the
engine's sharded two-phase dedup, groupby politeness shuffle, actor
fetch pool and checkpointing must reproduce this loop's fetch log,
seen-set and sink rows exactly.

Shared with the engine on purpose: the synthetic World (the universe
being crawled IS the common input) and the leaf parse/normalize
functions (operator-level correctness is covered separately by unit
tests + the DuckDB oracle in __ray_entry__.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit

from spider_ray.canon import (
    canonicalize,
    host_of,
    request_fingerprint,
    url_is_from_any_domain,
)
from spider_ray.extract import (
    next_page_form_body,
    parse_detail_page,
    parse_listing_links,
    parse_pager_form,
)
from spider_ray.fetch import USER_AGENTS, decode_http_body
from spider_ray.hashing import xxh64
from spider_ray.imaging import decode, phash
from spider_ray.politeness import (
    autothrottle_delay_ms,
    host_budget,
    parse_robots,
)
from spider_ray.synth import TIMEOUT_EXC_STATUS, Page, World, WorldConfig

MAX_RETRIES = 3
_RE_CAPTION = __import__("re").compile(r"<p>(.*?)</p>", __import__("re").DOTALL)


@dataclass
class _Cand:
    url: str
    canonical: str
    host: str
    depth: int
    seq_parent: int
    seq_link: int
    callback: str
    caption: str | None = None
    retry_count: int = 0
    skip_dedup: bool = False
    form_body: bytes | None = None
    page: int = 1
    priority: int = 0
    seq: int = -1
    # RefererMiddleware mirror: the URL of the response this request
    # was discovered from (None for seeds) — engine's parent_url column
    referer: str | None = None

    @property
    def fingerprint(self) -> int:
        return request_fingerprint(self.canonical, self.form_body)


@dataclass
class OracleResult:
    fetch_log: list[tuple] = field(default_factory=list)  # (round, url, fingerprint)
    seen: set[int] = field(default_factory=set)  # url_hash values
    items: list[dict] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)
    rounds: int = 0
    pixels: dict[str, object] = field(default_factory=dict)  # image_id -> ndarray


class OracleCrawler:
    def __init__(self, cfg: WorldConfig, captions: list[str] | None = None,
                 obey_robots: bool = True, round_window_ms: int = 60_000,
                 max_rounds: int = 64, http_cache: dict | None = None):
        self.world = World(cfg, captions)
        self.obey = obey_robots
        self.window = round_window_ms
        self.max_rounds = max_rounds
        # HTTPCACHE_ENABLED mirror: fingerprint → (status, kind, body,
        # fmt, set_cookie), bodies post-decode. Pass the SAME dict to a
        # second OracleCrawler to model a warm-cache re-run. A same-
        # round store-then-lookup of one fingerprint can't happen (a
        # fingerprint is fetched at most once per round), so the plain
        # dict matches the engine's rounds-<r file visibility.
        self.http_cache = http_cache

    def _robots(self, host: str):
        page = self.world.resolve(f"http://{host}/robots.txt")
        return parse_robots(page.body)

    def crawl(self, seed_urls: list[str]) -> OracleResult:
        res = OracleResult()
        cfg_is_off = self.world.cfg.is_dedup_off_host

        def nofilter(c: _Cand) -> bool:
            """Scheduler-side dupe-filter bypass: the request's own
            dont_filter flag, OR the spider's DUPEFILTER_CLASS =
            BaseDupeFilter custom_setting (elliotoliver_co_uk.py:34 —
            a SCHEDULER property, so unlike dont_filter it does NOT
            exempt the request from the OffsiteMiddleware check, which
            reads request.dont_filter only)."""
            return c.skip_dedup or cfg_is_off(c.host)

        frontier = []
        for i, seed in enumerate(seed_urls):
            if isinstance(seed, str):
                url, form, page = seed, None, 1
            else:
                url = seed["url"]
                form = seed.get("form_body")
                page = (seed.get("meta") or {}).get("page", 1)
            cu = canonicalize(url)
            frontier.append(
                _Cand(url, cu, host_of(cu), 0, -1, i, "parse",
                      form_body=form, page=page)
            )
        robots_cache: dict[str, object] = {}
        hh_cache: dict[str, int] = {}
        # CookiesMiddleware jar: cookies learned DURING a round are
        # staged and merged at round end (the engine's parallel fetch
        # tasks cannot see each other's responses mid-round, so the
        # oracle must not either — round-aligned visibility)
        cookie_jar: dict[str, str] = {}
        cookie_staged: dict[str, str] = {}

        def hh(c: _Cand) -> int:
            v = hh_cache.get(c.host)
            if v is None:
                v = xxh64(c.host)
                hh_cache[c.host] = v
            return v

        r = 0
        while frontier and r < self.max_rounds:
            # deterministic order + dense seq — HOST-MAJOR key since
            # round 4 (must match frontier.assign_seq exactly): within
            # a host the order is unchanged, so admission and fetch
            # sets are identical to the old key; only seq numbering
            # (and item positions) are host-major
            frontier.sort(
                key=lambda c: (hh(c), c.seq_parent, c.seq_link, c.canonical)
            )
            for i, c in enumerate(frontier):
                c.seq = i
            # within-round first-wins + cross-round seen
            # (skip_dedup = retry re-injection, bypasses both checks)
            unique: list[_Cand] = []
            in_round: set[int] = set()
            for c in frontier:
                h = c.fingerprint
                if nofilter(c):
                    unique.append(c)
                    continue
                if h in res.seen or h in in_round:
                    continue
                in_round.add(h)
                unique.append(c)
            # politeness: per-host budget, first-k by seq; robots disallow
            # drops permanently (counts as seen); deferred rows stay
            # UNSEEN — they compete again next round
            admitted: list[_Cand] = []
            deferred: list[_Cand] = []
            by_host: dict[str, list[_Cand]] = {}
            for c in unique:
                by_host.setdefault(c.host, []).append(c)
            for host, cands in by_host.items():
                if host not in robots_cache:
                    robots_cache[host] = self._robots(host)
                rules = robots_cache[host]
                hs = self.world.cfg.host_settings(host)
                delay = (
                    max(rules.crawl_delay_ms, hs.download_delay_ms)
                    if self.obey
                    else autothrottle_delay_ms(self.world.cfg, host, r)
                )
                k = host_budget(delay, self.window, hs.concurrency)
                # priority queue: highest priority first, FIFO by seq
                # within a level (scheduler semantics, O1)
                taken = 0
                for c in sorted(cands, key=lambda c: (-c.priority, c.seq)):
                    # dont_filter requests are never fingerprinted into
                    # the seen set (Scrapy's scheduler skips the
                    # dupefilter for them — neither checked nor added)
                    if self.obey and not rules.allows(urlsplit(c.canonical).path):
                        if not nofilter(c):
                            res.seen.add(c.fingerprint)  # blocked
                        continue
                    if (self.http_cache is not None
                            and c.fingerprint in self.http_cache):
                        # cache hit: served without entering the
                        # downloader — no politeness budget slot
                        admitted.append(c)
                        if not nofilter(c):
                            res.seen.add(c.fingerprint)
                        continue
                    if taken < k:
                        taken += 1
                        admitted.append(c)
                        if not nofilter(c):
                            res.seen.add(c.fingerprint)
                    else:
                        deferred.append(c)
            # fetch + parse in seq order
            nxt: list[_Cand] = list(deferred)
            for c in admitted:
                res.fetch_log.append((r, c.canonical, c.fingerprint))
                jar_on = self.world.cfg.cookies_enabled
                hit = (self.http_cache.get(c.fingerprint)
                       if self.http_cache is not None else None)
                if hit is not None:
                    # HttpCacheMiddleware serve: stored response
                    # (identity body), no world resolve
                    st, kd, bd, fm, sc = hit
                    page = Page(c.canonical, st, kd, bd, fmt=fm,
                                set_cookie=sc)
                    if sc and jar_on:
                        cookie_staged[c.host] = sc
                else:
                    cfgw = self.world.cfg
                    page = self.world.resolve(
                        c.canonical,
                        attempt=c.retry_count,
                        form_body=c.form_body,
                        cookie=cookie_jar.get(c.host) if jar_on else None,
                        # client-stack mirror: Referer from the parent
                        # response (RefererMiddleware) + the spider's
                        # own headers= dict, both engine-identical
                        referer=c.referer if cfgw.referer_enabled else None,
                        headers=(cfgw.spider_headers(c.host) or None)
                        if cfgw.send_spider_headers else None,
                        # USER_AGENT custom_setting mirror: pinned for
                        # strict hosts, else the deterministic rotation
                        # (ST5) keyed on the request fingerprint — the
                        # engine's uas list in fetch._fetch_table
                        ua=cfgw.spider_user_agent(c.host)
                        or USER_AGENTS[c.fingerprint % len(USER_AGENTS)],
                    )
                    # DOWNLOAD_TIMEOUT gate mirror (fetch._fetch_table):
                    # a response slower than the spider's budget never
                    # arrives — no Set-Cookie learned, nothing cached.
                    if page.latency_ms > cfgw.host_download_timeout_ms(
                            c.host):
                        page = Page(c.canonical, TIMEOUT_EXC_STATUS,
                                    "timeout")
                    if page.set_cookie and jar_on:
                        cookie_staged[c.host] = page.set_cookie
                    # client-stack mirror: the engine's fetch stage
                    # decodes Content-Encoding before parsing
                    page.body = decode_http_body(page.body,
                                                 page.content_encoding)
                    if (self.http_cache is not None
                            and page.status != TIMEOUT_EXC_STATUS):
                        # DummyPolicy store: every download, errors too
                        self.http_cache[c.fingerprint] = (
                            page.status, page.kind, page.body, page.fmt,
                            page.set_cookie,
                        )
                dr_norefollow = False
                if page.status in (301, 302, 303, 307, 308):
                    if (self.world.cfg.dont_redirect_details
                            and c.callback == "populate_item"):
                        # dont_redirect meta mirror (aryes_be.py:80):
                        # detail-callback 3xx responses are never
                        # followed — but they still pass through the
                        # classification below with Scrapy's middleware
                        # precedence: RetryMiddleware first (a 3xx IN
                        # the retry list is retried to exhaustion —
                        # the engine's retry gate runs after the
                        # redirect exemption), then the request's own
                        # handle list routes the response to the parse
                        # dispatch (kind "redirect" matches no branch →
                        # dead listing, nothing emitted); anything
                        # else just dies.
                        dr_norefollow = True
                    else:
                        # redirect: the Location (body column) becomes
                        # a normal next-round link carrying the
                        # source's depth/callback — mirrors
                        # frontier._parse_fn
                        target = page.body.decode("utf-8", "replace")
                        # dont_filter survives the redirect (Scrapy's
                        # request.replace copies the flag)
                        nxt.append(self._child(c, target, c.callback,
                                               c.depth, 0, c.caption,
                                               skip_dedup=c.skip_dedup))
                        continue
                if page.status != 200:
                    if ((page.status in self.world.cfg.retry_http_codes
                         or page.status == TIMEOUT_EXC_STATUS)
                            and c.retry_count
                            < self.world.cfg.retry_times):
                        c.retry_count += 1
                        c.skip_dedup = True
                        nxt.append(c)
                        continue
                    # handle_httpstatus_list / HTTPERROR_ALLOWED_CODES
                    # mirror: a listed status reaches the parse
                    # dispatch below (retries first, like Scrapy's
                    # RetryMiddleware → HttpError order); the allow-
                    # list is per host (spider attribute ∪ the host's
                    # custom_setting). A dont_redirect request consults
                    # its OWN per-request handle list instead.
                    if dr_norefollow:
                        if (page.status
                                not in self.world.cfg.dont_redirect_handle):
                            continue
                    elif (page.status
                          not in self.world.cfg.host_httpstatus_list(
                              c.host)):
                        continue
                if page.kind == "api":
                    import json as _json

                    data = _json.loads(page.body)
                    for j, href in enumerate(data["results"]):
                        nxt.append(self._child(c, href, "populate_item",
                                               c.depth + 1, j))
                    if data["has_more"]:
                        nskip = data["skip"] + data["take"]
                        child = self._child(c, c.canonical, "parse", c.depth,
                                            len(data["results"]))
                        # __VIEWSTATE echo + host body dialect (JSON
                        # for json_api hosts), engine in lockstep via
                        # the shared cfg.api_body encoder
                        child.form_body = self.world.cfg.api_body(
                            c.host, nskip, data["take"],
                            data.get("viewstate"))
                        child.page = c.page + 1
                        nxt.append(child)
                elif page.kind == "sitemap":
                    from spider_ray.extract import parse_sitemap

                    sm_kind, locs = parse_sitemap(page.body)
                    cb = "parse" if sm_kind == "index" else "populate_item"
                    child_depth = c.depth if sm_kind == "index" else c.depth + 1
                    for j, href in enumerate(locs):
                        nxt.append(self._child(c, href, cb, child_depth, j))
                elif page.kind == "listing":
                    links, nxt_page, featured = parse_listing_links(page.body)
                    # FormRequest.from_response mirror: harvest the
                    # pager form's fields via the SAME extract helpers
                    # the engine kernel uses
                    pf = (parse_pager_form(page.body)
                          if self.world.cfg.form_pag_pct and not nxt_page
                          else None)
                    for j, href in enumerate(links):
                        nxt.append(self._child(c, href, "populate_item", c.depth + 1, j))
                    if nxt_page:
                        nxt.append(
                            self._child(c, nxt_page, "parse", c.depth, len(links))
                        )
                    elif pf:
                        action, fields = pf
                        child = self._child(c, action or c.canonical,
                                            "parse", c.depth, len(links))
                        child.form_body = next_page_form_body(fields)
                        nxt.append(child)
                    # featured strip → dont_filter requests (engine's
                    # _parse_fn in lockstep: same seq_link placement)
                    for j, href in enumerate(featured):
                        nxt.append(self._child(
                            c, href, "populate_item", c.depth + 1,
                            len(links) + (1 if (nxt_page or pf) else 0) + j,
                            skip_dedup=True,
                        ))
                elif page.kind == "detail":
                    raw = parse_detail_page(page.body)
                    m = _RE_CAPTION.search(raw.get("description_raw") or "")
                    caption = m.group(1) if m else None
                    res.items.append(
                        {"url": c.canonical, "host": c.host, **raw,
                         "caption": caption, "seq": c.seq}
                    )
                    for j, href in enumerate(raw["images"]):
                        nxt.append(
                            self._child(c, href, "image", c.depth + 1, j, caption)
                        )
                elif page.kind == "image":
                    px = decode(page.body, page.fmt)
                    image_id = f"{xxh64(c.canonical):016x}"
                    res.images.append(
                        {
                            "image_id": image_id,
                            "w": px.shape[1],
                            "h": px.shape[0],
                            "fmt": page.fmt,
                            "caption": c.caption,
                            "phash": phash(px),
                            "src_url": c.canonical,
                        }
                    )
                    res.pixels[image_id] = px
            # OffsiteMiddleware mirror: extracted links (incl. redirect
            # targets) to hosts outside allowed_domains are dropped and
            # never reach the dupefilter; retry re-injections
            # (dont_filter) bypass, like Scrapy's middleware does
            if self.world.cfg.allowed_domains:
                nxt = [
                    c for c in nxt
                    if c.skip_dedup
                    or url_is_from_any_domain(
                        c.host, self.world.cfg.allowed_domains)
                ]
            cookie_jar.update(cookie_staged)
            cookie_staged = {}
            frontier = nxt
            r += 1
        res.rounds = r
        return res

    def _child(self, parent: _Cand, href: str, callback: str, depth: int,
               seq_link: int, caption: str | None = None,
               skip_dedup: bool = False) -> _Cand:
        cu = canonicalize(href, parent.canonical)
        return _Cand(href, cu, host_of(cu), depth, parent.seq, seq_link,
                     callback, caption, skip_dedup=skip_dedup,
                     referer=parent.canonical)
