"""Deterministic synthetic web world — the fetch resolver's universe.

The reference crawls real rental-listing sites with a 3-level page
graph: seed → listing/pagination pages → detail pages (SURVEY.md §0;
templates/spiders/basic.tmpl:20-38), detail pages carrying ~40 raw
fields plus image URLs (python_spiders/items.py:25-27). This module
synthesizes an equivalent world as a **pure function of the URL**:
``resolve(url)`` returns the same page bytes on every call, on every
process, at every parallelism level — which is what lets a 10^10-URL
frontier exist without a stored corpus, and what makes the N-vs-4N
determinism check meaningful.

World shape per host ``h{i}.test``:
  /robots.txt              → crawl-delay + disallow rules (FIXTURES.md F6)
  /list?page=p             → HTML with detail links + next-page link;
                             the next link disappears on the last page —
                             the empty-expansion pagination terminator
                             (spiders/123wonen_nl.py:35-55 'seen' flag)
  /prop/{k}                → HTML detail page with raw listing fields
                             exercising the extract operators (M2-M27)
  /img/{k}_{j}.png|...     → deterministic image bytes (PNG/GIF lossless,
                             baseline JPEG + quantized-lossy stand-in;
                             spider_ray.imaging / .jpeg / .gif)

Captions come from an external corpus (the driver's ``documents``
table) broadcast once via ``ray.put`` — the canonical small-side
broadcast pattern (never re-shipped per batch).

Deterministic transient failures: a hash-derived subset of detail
pages returns a retryable status (python_spiders/settings.py:98-99)
on the first attempt and succeeds on retry — exercising ST4 retry
semantics in both engine and oracle.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

import numpy as np

from .gif import FMT_GIF, encode_gif
from .webp import FMT_WEBP, encode_webp
from .hashing import splitmix64, xxh64
from .imaging import (
    FMT_JPEG,
    FMT_PNG,
    FMT_QPNG,
    encode_jpeg,
    encode_png,
    encode_qpng,
)

_RE_SITEMAP_PAGE = _re.compile(r"^/sitemap-(\d+)\.xml$")

RETRY_HTTP_CODES = frozenset(
    [500, 503, 504, 400, 401, 403, 404, 405, 407, 408, 416, 456, 502, 429]
)
# codes that the fetcher retries (subset semantics of settings.py:98-99);
# in the synthetic world we only inject 503s (transient) and 404s (permanent)
TRANSIENT_CODE = 503
PERMANENT_CODE = 404
# sentinel status for a download the CLIENT aborted at its
# DOWNLOAD_TIMEOUT budget — Scrapy raises twisted TimeoutError (an
# exception, not a response): no status, no headers, no body ever
# arrives. RetryMiddleware retries exceptions like retryable statuses
# (EXCEPTIONS_TO_RETRY includes TimeoutError); an exhausted request
# simply dies — HttpErrorMiddleware / handle_httpstatus_list never see
# it because there is no response to allow through. Negative so it can
# never collide with an HTTP code nor match any allow/retry list.
TIMEOUT_EXC_STATUS = -1
# latency of a "slow endpoint" detail page (slow_pct) — long enough to
# trip the short spider-declared timeouts in _TIMEOUT_PALETTE (10 s /
# 25 s) while staying under every long one (60 s+) and Scrapy's 180 s
# default, so only spiders that tightened DOWNLOAD_TIMEOUT lose pages.
SLOW_LATENCY_MS = 45_000
# DOWNLOAD_TIMEOUT census over the reference corpus (the spider
# attribute, 17 spiders: download_timeout = 120×9 / 60×2 / 200×2 /
# 300×2 / 180×1, spiders/logerim_com.py:20, agenceatauxreduits_fr.py:32;
# plus the custom_settings form, 2 spiders: "DOWNLOAD_TIMEOUT": 10
# (WagnerHausverwaltung.py:19) and 25 (DH_Immobilienservice.py:22)).
# Weighted palette (weights sum to 100), values in ms:
_TIMEOUT_PALETTE: tuple[tuple[int, int], ...] = (
    (50, 120_000),
    (11, 60_000),
    (11, 200_000),
    (11, 300_000),
    (6, 180_000),
    (6, 25_000),
    (5, 10_000),
)


@dataclass(frozen=True)
class HostSettings:
    """The per-spider ``custom_settings`` politeness knobs, as a
    per-host record (one reference spider ≈ one host in the graft).
    Defaults are the reference's global settings.py values, so a host
    without custom settings behaves exactly as before this surface
    existed.

    Reference census over python_spiders/spiders/*.py custom_settings:
    DOWNLOAD_DELAY 129 spiders (109×1s, 9×3s, …),
    AUTOTHROTTLE_START/MAX_DELAY 120 (115×0.5s/2s),
    AUTOTHROTTLE_ENABLED 123 (3×False), CONCURRENT_REQUESTS 131
    (71×4, 46×2, 11×3, 2×1, 1×16).
    """

    download_delay_ms: int = 0        # DOWNLOAD_DELAY (global default 0)
    at_enabled: bool = True           # AUTOTHROTTLE_ENABLED (settings.py:75)
    at_start_ms: int = 100            # AUTOTHROTTLE_START_DELAY (settings.py:76)
    at_max_ms: int = 2000             # AUTOTHROTTLE_MAX_DELAY (settings.py:77)
    concurrency: int = 16             # per-spider CONCURRENT_REQUESTS cap
                                      # (≥ the per-domain 16 by default,
                                      # settings.py:31 — so default = no-op)


DEFAULT_HOST_SETTINGS = HostSettings()

# HTTPERROR_ALLOWED_CODES palette — shaped after the reference lists
# restricted to statuses this world actually serves: 401 (soft-401
# details) and 403 (session-gated details without the cookie). 404 /
# 3xx entries are omitted: 404s here are genuine dead ends with empty
# bodies and redirects are followed by RedirectMiddleware before
# HttpError ever sees them.
_HTTPERROR_PALETTE: tuple[tuple, ...] = ((401,), (401, 403), (403,))

# Weighted palette of the custom_settings profiles the reference
# spiders actually declare (weights ≈ census shares, summing to 100):
_POLITENESS_PROFILES: tuple[tuple[int, HostSettings], ...] = (
    # the dominant "gentle template": DD=1, AT .5/2, CONCURRENT=4
    (45, HostSettings(1000, True, 500, 2000, 4)),
    # same but CONCURRENT_REQUESTS=2
    (25, HostSettings(1000, True, 500, 2000, 2)),
    # the DD=3 heavy throttle group
    (10, HostSettings(3000, True, 500, 3000, 2)),
    # the fast group (.2 DD, .1/.3 AT band)
    (10, HostSettings(200, True, 100, 300, 16)),
    # AUTOTHROTTLE_ENABLED: False → fixed DOWNLOAD_DELAY pacing
    (10, HostSettings(1000, False, 100, 2000, 4)),
)

PROPERTY_TYPE_WORDS = [
    # multilingual raw values → property_type_lookup (helper.py:273-304)
    ("appartement", "apartment"),
    ("wohnung", "apartment"),
    ("apartment", "apartment"),
    ("flat", "apartment"),
    ("huis", "house"),
    ("haus", "house"),
    ("house", "house"),
    ("villa", "house"),
    ("kamer", "room"),
    ("zimmer", "room"),
    ("room", "room"),
    ("studio", "studio"),
]

CURRENCY_SYMBOLS = ["€", "£", "$", "₺", "CHF"]

AMENITY_WORDS = [
    "pets allowed",
    "furnished",
    "parking",
    "elevator",
    "balcony",
    "terrace",
    "swimming pool",
    "washing machine",
    "dishwasher",
]


@dataclass(frozen=True)
class WorldConfig:
    """Immutable world parameters; shipped inside fetch actors once."""

    num_hosts: int = 16
    max_pages_per_host: int = 4  # listing pages per host in [1, max]
    details_per_page: int = 8
    images_per_detail: int = 2
    lossy_pct: int = 50  # % of images lossy-encoded (jpeg or qpng)
    jpeg_pct: int = 34  # % OF THE LOSSY images that are real baseline JPEG
    # % OF THE JPEG images served as progressive (SOF2, libjpeg default
    # scan script — spider_ray.jpeg2). Same quantized coefficients as
    # the baseline layout ⇒ bit-identical decoded pixels, so the sink
    # PSNR/phash invariants are untouched; only the byte layout (and
    # the decoder path exercised) changes.
    jpeg_prog_pct: int = 20
    gif_pct: int = 25  # % OF THE LOSSLESS images that are palette-born GIF89a
    # % OF THE NON-GIF LOSSLESS images served as lossless WebP (VP8L,
    # spider_ray.webp — RFC 9649): palette-born like the GIFs (web
    # palette graphics are the dominant lossless-WebP population), so
    # the encode→decode round trip is exact and the sink invariant is
    # exact equality, like PNG/GIF.
    webp_pct: int = 20
    fail_pct: int = 5  # % of detail pages 503-ing on first attempt
    # % of 200 text responses (listing/detail/api/sitemap) served with
    # HTTP Content-Encoding (gzip 3/4, zlib-deflate 1/4) — the wire
    # form real servers send back for the reference spiders'
    # "Accept-Encoding: gzip, deflate, br" request header. Default 0
    # keeps long-stable crawl outputs byte-identical; the decode path
    # is equivalence-tested at nonzero pct in tests/test_frontier.py.
    gzip_pct: int = 0
    # % of detail pages served windows-1252-encoded with a declaring
    # <meta charset> tag (the web's dominant non-UTF-8 coding). Only
    # pages whose text round-trips losslessly through cp1252 convert —
    # others stay UTF-8 — so parsed content is identical either way;
    # the client-side sniffing lives in extract.detect_and_decode (the
    # Scrapy/w3lib html_to_unicode analog). Default 0 = byte-stable.
    latin1_pct: int = 0
    # % chance, per listing-page detail slot, of an ADDITIONAL external
    # link to an off-domain host (partner/ad/social hosts — what real
    # listing pages carry). The engine's OffsiteMiddleware analog must
    # drop these at link-extraction time: every reference spider
    # declares ``allowed_domains`` (spiders/wredevelopment.py:11) and
    # Scrapy filters extracted requests to any other host. Default 0 =
    # byte-stable crawl outputs.
    offsite_pct: int = 0
    # the spider's allowed_domains (OffsiteMiddleware config). Suffix
    # match per w3lib url_is_from_any_domain: every world host
    # h{i}.test matches ("test",), so the default changes nothing.
    allowed_domains: tuple = ("test",)
    # % of (non-private) detail links emitted as /go/{k} alias URLs
    # that 301-redirect to the canonical /prop/{k} — the Scrapy
    # RedirectMiddleware surface. Default 0 keeps the long-stable
    # crawl outputs byte-identical; engine+oracle support is
    # equivalence-tested at nonzero pct in tests/test_frontier.py.
    redirect_pct: int = 0
    notfound_pct: int = 2  # % of detail pages permanently 404
    private_pct: int = 10  # % of detail pages under the robots-disallowed path
    min_crawl_delay_ms: int = 100  # AutoThrottle band, settings.py:76-78
    max_crawl_delay_ms: int = 2000
    img_min_side: int = 24
    img_max_side: int = 64
    # % of hosts whose listings are served by a form-POST JSON search API
    # (FormRequest pagination with skip/take — 2,514 reference spiders,
    # spiders/31plusvastgoed_nl.py:19-24,36-40; S3/S4/O2/ST10)
    api_host_pct: int = 0
    # % of (non-API) hosts discovered through an XML sitemap (S5 —
    # SitemapSpider analog; sitemaps.org protocol: a /sitemap.xml index
    # pointing at per-page urlsets of detail URLs)
    sitemap_host_pct: int = 0
    # % of plain listing hosts that are SESSION-GATED: their listing
    # pages answer with a Set-Cookie session token and their detail
    # pages 403 unless the request presents it — the surface Scrapy's
    # CookiesMiddleware serves (on by default; reference settings.py:35
    # leaves COOKIES_ENABLED at its default True, and spiders routinely
    # pass cookies= on requests). The engine must LEARN the cookie from
    # the listing response and replay it on later same-host requests;
    # a crawler without a cookie jar loses every gated detail page.
    # Default 0 = byte-stable crawl outputs.
    cookie_host_pct: int = 0
    # COOKIES_ENABLED=False / dont_merge_cookies analog (13 reference
    # spiders disable cookies in custom_settings, 8 more suppress the
    # jar per request): when False the crawler neither learns nor
    # replays session cookies — a session-gated world then loses every
    # gated detail page, exactly like Scrapy with the middleware off.
    cookies_enabled: bool = True
    # RETRY_TIMES analog (settings.py:98 sets 3 globally; 54 reference
    # spiders override it per spider via custom_settings): how many
    # times a RETRY_HTTP_CODES response is re-fetched before it falls
    # through to fail — or to the parse callback when its status is in
    # handle_httpstatus_list.
    retry_times: int = 3
    # RETRY_HTTP_CODES analog (settings.py:99 globally; 20 reference
    # spiders override the list in custom_settings — typically adding
    # 307 and dropping 404). The retry gate consults THIS tuple, not
    # the module constant, so a world can reshape the retryable set.
    # (3xx still redirect first — Scrapy's RedirectMiddleware sits
    # closer to the spider than RetryMiddleware on the response path.)
    retry_http_codes: tuple = tuple(sorted(RETRY_HTTP_CODES))
    # DOWNLOAD_TIMEOUT analog, spider-wide form (Scrapy's global
    # default is 180 s; 17 reference spiders set the
    # ``download_timeout`` class attribute). The DOWNLOADER aborts any
    # response whose server latency exceeds this budget: the request
    # raises instead of returning a response — retried like a
    # retryable status (TimeoutError is in Scrapy's
    # EXCEPTIONS_TO_RETRY), then dropped; handle_httpstatus_list can't
    # rescue it because no response exists.
    download_timeout_ms: int = 180_000
    # % of hosts whose spider declares its own DOWNLOAD_TIMEOUT
    # (attribute or custom_setting — 19 reference spiders total),
    # drawn from the census-weighted _TIMEOUT_PALETTE. The palette's
    # short entries (10 s / 25 s — WagnerHausverwaltung.py:19,
    # DH_Immobilienservice.py:22) are the observable ones: such a
    # host TIMES OUT on slow_pct pages that every default-timeout
    # host crawls fine. Default 0 = byte-stable crawl outputs.
    timeout_host_pct: int = 0
    # % of detail pages served by a SLOW endpoint: latency
    # SLOW_LATENCY_MS (45 s) on every attempt — the real-web surface
    # the reference spiders tune download_timeout against. With all
    # timeouts at the 180 s default this only changes the latency_ms
    # lineage column (fetch/item/image outputs byte-identical);
    # combined with a short timeout the page is lost after retries.
    # Default 0 = byte-stable crawl outputs.
    slow_pct: int = 0
    # % of hosts whose spider declares custom politeness settings
    # (DOWNLOAD_DELAY / AUTOTHROTTLE_* / CONCURRENT_REQUESTS — the
    # reference's 2nd–5th most-used custom_settings keys, ~130 spiders
    # each). Profiles drawn from _POLITENESS_PROFILES, deterministic
    # per host. Default 0 = byte-stable crawl outputs.
    custom_politeness_pct: int = 0
    # % of API hosts whose /api/search demands a server-issued opaque
    # form token on every page after the first — the ASP.NET
    # __VIEWSTATE pattern (21 reference spiders extract the hidden
    # input and echo it in the next FormRequest, spiders/adams.py:91).
    # The crawler must harvest the token from each JSON response and
    # carry it in the next POST's form body (ST10 continuation state
    # that is SERVER-issued, unlike client-computed skip/take).
    # Default 0 = byte-stable crawl outputs.
    viewstate_pct: int = 0
    # % of PLAIN listing hosts (not API, not sitemap) that paginate by
    # HTML-form POSTBACK — the FormRequest.from_response surface
    # (spiders/immobiliarefaro_it.py:36-40, immobiliaretafy_com.py:40:
    # the spider harvests the response's <form> fields and re-POSTs
    # with formdata={'num_page': next}). Listing pages of such a host
    # carry no next-page anchor; pages ≥ 2 are reachable ONLY by
    # POSTing the harvested hidden fields (a server-issued __FTOK
    # token among them — ASP.NET-postback style) with num_page bumped.
    # A GET of page ≥ 2 404s, a POST with a wrong/missing token 403s.
    # Default 0 = byte-stable crawl outputs.
    form_pag_pct: int = 0
    # dont_filter surface (the reference's single most-used request
    # flag — 810 spiders pass dont_filter=True on requests they KNOW
    # repeat, e.g. re-yielding a unit's detail URL from every listing
    # page that showcases it, spiders/15walmer.py:112): % of listing
    # pages carrying an extra <a class="featured"> anchor to the
    # page's own slot-0 detail URL. The spider marks featured links
    # dont_filter (skip_dedup=True): the request bypasses the dupe
    # filter — fetched EVEN THOUGH the normal listing link to the same
    # URL also fetches — and is never fingerprinted into the seen set
    # (Scrapy's scheduler neither checks nor records dont_filter
    # requests). Default 0 = byte-stable crawl outputs.
    featured_pct: int = 0
    # % of detail pages served with HTTP status 401 but the FULL normal
    # body — the "content behind an auth-warning status" pattern the
    # reference spiders crawl through with handle_httpstatus_list
    # (spiders/njestates_co_uk.py:30 [401,403],
    # alexandergreens_co_uk.py:31 [401], allagents_co_uk.py:18 —
    # 17 spiders total). Default 0 = byte-stable crawl outputs.
    soft401_pct: int = 0
    # Scrapy's handle_httpstatus_list spider attribute: non-200
    # statuses in this tuple reach the parse callback instead of
    # becoming fail rows. Precedence mirrors Scrapy's middleware
    # order — RetryMiddleware still retries RETRY_HTTP_CODES first
    # (``self._retry(...) or response``: only the retries-exhausted
    # response continues to HttpErrorMiddleware, which then lets a
    # listed status through to the spider), and RedirectMiddleware
    # still follows 3xx. Empty = Scrapy's default (only 200 parses).
    handle_httpstatus_list: tuple = ()
    # HTTPERROR_ALLOWED_CODES custom_setting — the settings-level twin
    # of the handle_httpstatus_list attribute (12 reference spiders:
    # amsterdamwonen_nl.py:21 / locanto_ie.py:23 allow [403],
    # alliance_london_co_uk.py:23 [404], wilink_be.py:28
    # [301,302,400,401,406,403,503], …): % of hosts whose spider
    # declares a per-spider allow-list, drawn from a reference-shaped
    # palette. Scrapy's HttpErrorMiddleware consults the union of the
    # spider attribute and the setting — ``host_httpstatus_list``
    # mirrors that. Default 0 = byte-stable crawl outputs.
    httperror_allowed_pct: int = 0
    # DUPEFILTER_CLASS = scrapy.dupefilters.BaseDupeFilter analog
    # (spiders/elliotoliver_co_uk.py:34 — the one reference spider that
    # disables request dedup wholly): % of hosts whose spider turns the
    # dupe filter OFF. Every request to such a host behaves like
    # dont_filter — never checked against, registered in, or committed
    # to the seen set, so each OCCURRENCE of a URL downloads (Scrapy's
    # BaseDupeFilter.request_seen always returns False). Observable
    # only when the host's page graph repeats URLs — see related_pct.
    # Default 0 = byte-stable crawl outputs.
    dedup_off_pct: int = 0
    # % of listing pages (page ≥ 2) carrying a plain "related property"
    # anchor back to the host's page-1 slot-0 detail — a cross-page
    # repeated NORMAL link (no dont_filter, unlike the featured strip).
    # On a dedup-on host the dupe filter drops the repeat; on a
    # dedup_off host it re-downloads the detail and re-emits the item
    # at a new position, exactly like Scrapy running BaseDupeFilter.
    # Acyclic by construction (details are leaves), so the crawl stays
    # bounded. Default 0 = byte-stable crawl outputs.
    related_pct: int = 0
    # ------------------------------------------------ request headers
    # % of plain listing hosts that CONTENT-NEGOTIATE on the request's
    # Accept-Language header — the reference's single widest header
    # surface (295 spiders hardcode Accept-Language in their request
    # headers; 20 route it through a get_lang helper,
    # spiders/mioda_it.py / i30_de.py style). A request carrying the
    # host's language gets the real listing and detail pages with the
    # available date RENDERED IN THAT LANGUAGE's month names (the M13
    # multilingual-date surface, helper.py:206-266); a request without
    # it gets the language-chooser splash page real sites serve — zero
    # listing links, so a crawler whose spider forgot its headers
    # demonstrably loses the whole host. Default 0 = byte-stable.
    lang_host_pct: int = 0
    # % of hosts with hotlink-protected images: /img/* answers 403
    # unless the request's Referer header names the same host — the
    # surface Scrapy's RefererMiddleware (on by default) transparently
    # satisfies and 192 reference spiders additionally hardcode.
    # The engine sends Referer = the discovering page's URL on every
    # non-seed request, so its image fetches pass; a crawler with
    # REFERRER_POLICY disabled loses every protected image. Default 0.
    hotlink_pct: int = 0
    # % of API hosts whose /api/search answers 403 unless the request
    # carries "X-Requested-With: XMLHttpRequest" — the AJAX-endpoint
    # gate 49 reference spiders hardcode in headers
    # (spiders/vivenzi_it.py style). The spider author knows the site
    # needs it, so it rides in spider_headers(). Default 0.
    xhr_api_pct: int = 0
    # % of API hosts whose /api/search takes a JSON request body
    # ({"skip":N,"take":M}, Content-Type application/json — the
    # JsonRequest / body=json.dumps() form 69 reference spiders POST,
    # e.g. barnes (body=json.dumps(payload))) instead of
    # form-encoded. The endpoint REJECTS a form-encoded body with 400,
    # and the form endpoints keep their lenient parse_qs. The request
    # fingerprint already covers url+body bytes, so JSON-paged
    # requests are distinct frontier entries like form-paged ones.
    # Default 0 = byte-stable crawl outputs.
    json_api_pct: int = 0
    # REFERER_ENABLED analog (Scrapy's RefererMiddleware is on by
    # default): when False the client stack attaches no Referer —
    # hotlink-protected images then 403 to exhaustion, the observable
    # loss the middleware exists to prevent.
    referer_enabled: bool = True
    # when False the spider's own headers= dict (Accept-Language,
    # X-Requested-With) is not sent — the "author forgot the headers"
    # negative control for the lang/xhr gates.
    send_spider_headers: bool = True
    # % of hosts fronted by a User-Agent allow-list (the WAF check that
    # makes reference spiders pin a browser UA in custom_settings —
    # spiders/delattreimmobilier_com.py:34, bespoke_ie.py:30): every
    # non-robots request whose UA is not the host's required string
    # answers 403. The spider author knows the required UA, so it rides
    # in spider_user_agent() and replaces the default rotation for that
    # host (Scrapy's per-spider USER_AGENT custom_setting overrides the
    # project-wide rotation middleware). robots.txt is exempt: the
    # static edge serves it before the WAF, and blocking it would
    # conflate this surface with the politeness layer. Default 0.
    ua_strict_pct: int = 0
    # when False the pinned USER_AGENT custom_setting is not applied —
    # the "author forgot the UA" negative control: rotation hits a
    # strict host with the wrong UA on ~every request, which 403s, is
    # retried to exhaustion (403 ∈ RETRY_HTTP_CODES, the reference's
    # list) and loses the host's whole content tree.
    send_pinned_ua: bool = True
    # % of detail keys whose /prop/k answers "302 → /removed" — the
    # withdrawn-listing pattern real-estate portals use and the reason
    # spiders/aryes_be.py:80 sets meta={'dont_redirect': True,
    # 'handle_httpstatus_list': [302]} on its detail requests: the
    # callback detects the dead listing from the 302 itself instead of
    # downloading the junk landing page. Default 0 = byte-stable.
    dead_detail_pct: int = 0
    # the dont_redirect surface (aryes_be.py:80): when True, requests
    # with the DETAIL callback skip RedirectMiddleware — their 3xx
    # responses are never followed; statuses in dont_redirect_handle
    # (the request's own handle_httpstatus_list) reach the parse
    # callback, which treats them as dead listings and emits nothing;
    # any other 3xx just dies (no response continues). Applies to ALL
    # detail-callback requests, including /go/ aliases — exactly what
    # Scrapy does when the meta flag rides the request. Default False
    # (the flag is per-spider opt-in, like the reference's).
    dont_redirect_details: bool = False
    # the per-request handle_httpstatus_list that rides with
    # dont_redirect in the reference (aryes_be.py:80: [302]).
    dont_redirect_handle: tuple = (302,)
    seed: int = 42

    def host(self, i: int) -> str:
        return f"h{i}.test"

    def is_api_host(self, i: int) -> bool:
        return splitmix64(xxh64(f"api:{self.seed}:{i}")) % 100 < self.api_host_pct

    def is_sitemap_host(self, i: int) -> bool:
        return (
            not self.is_api_host(i)
            and splitmix64(xxh64(f"sitemap:{self.seed}:{i}")) % 100
            < self.sitemap_host_pct
        )

    def is_viewstate_host(self, i: int) -> bool:
        """API hosts whose search endpoint demands the server-issued
        form token (__VIEWSTATE analog) on every page after the first."""
        return (
            self.is_api_host(i)
            and splitmix64(xxh64(f"vshost:{self.seed}:{i}")) % 100
            < self.viewstate_pct
        )

    def viewstate_token(self, host: str, skip: int) -> str:
        """The opaque token the server issues for the page at ``skip``.
        Server-side knowledge: the crawler must harvest it from the
        previous response's JSON, never compute it."""
        return f"{splitmix64(xxh64(f'vs:{self.seed}:{host}:{skip}')):016x}"

    def host_i(self, host: str) -> int:
        """Index of a world host name (``h{i}.test``), -1 for foreign."""
        if not host or not host.startswith("h") or not host.endswith(".test"):
            return -1
        try:
            i = int(host[1 : -len(".test")])
        except ValueError:
            return -1
        return i if 0 <= i < self.num_hosts else -1

    def is_lang_host(self, i: int) -> bool:
        """Content-negotiating hosts: plain listing hosts only (API
        responses are JSON — nothing to localize — and sitemap-
        discovered details never pass a listing that could splash)."""
        return (
            not self.is_api_host(i)
            and not self.is_sitemap_host(i)
            and splitmix64(xxh64(f"langhost:{self.seed}:{i}")) % 100
            < self.lang_host_pct
        )

    def host_lang(self, i: int) -> str:
        """The language a lang host negotiates in — drawn from the
        reference's dateparser language set (helper.py:596
        languages=[en, es, fr, nl, tr] plus the de month dict)."""
        langs = ("es", "tr", "de", "nl", "fr")
        return langs[splitmix64(xxh64(f"lang:{self.seed}:{i}")) % len(langs)]

    def is_form_pag_host(self, i: int) -> bool:
        """Plain listing hosts that paginate by HTML-form postback
        (FormRequest.from_response — immobiliarefaro_it.py:36)."""
        return (
            not self.is_api_host(i)
            and not self.is_sitemap_host(i)
            and splitmix64(xxh64(f"formpag:{self.seed}:{i}")) % 100
            < self.form_pag_pct
        )

    def form_token(self, host: str, page: int) -> str:
        """The opaque token the pager form on listing page ``page``
        carries (its __FTOK hidden input). Server state: the crawler
        must harvest it from the page — the POST for page P+1 is valid
        only with page P's token."""
        return f"{splitmix64(xxh64(f'ftok:{self.seed}:{host}:{page}')):016x}"

    def is_hotlink_host(self, i: int) -> bool:
        """Hosts whose /img/* URLs demand a same-host Referer."""
        return (
            splitmix64(xxh64(f"hotlink:{self.seed}:{i}")) % 100
            < self.hotlink_pct
        )

    def is_xhr_api_host(self, i: int) -> bool:
        """API hosts whose search endpoint demands X-Requested-With."""
        return (
            self.is_api_host(i)
            and splitmix64(xxh64(f"xhrhost:{self.seed}:{i}")) % 100
            < self.xhr_api_pct
        )

    def is_json_api_host(self, i: int) -> bool:
        """API hosts whose search endpoint takes a JSON request body."""
        return (
            self.is_api_host(i)
            and splitmix64(xxh64(f"jsonapi:{self.seed}:{i}")) % 100
            < self.json_api_pct
        )

    def spider_headers(self, host: str) -> dict:
        """The per-spider request ``headers=`` dict — spider-authored
        CLIENT config, a pure function of host exactly like
        ``host_settings`` (the reference hardcodes the dict per spider;
        one spider = one host here). The fetch stage and the oracle
        simulator both attach it to every request when
        ``send_spider_headers`` is on."""
        i = self.host_i(host)
        h: dict = {}
        if i >= 0:
            if self.is_lang_host(i):
                h["Accept-Language"] = self.host_lang(i)
            if self.is_xhr_api_host(i):
                h["X-Requested-With"] = "XMLHttpRequest"
        return h

    def is_ua_strict_host(self, i: int) -> bool:
        """Hosts whose non-robots endpoints demand one exact UA."""
        return (
            splitmix64(xxh64(f"uastrict:{self.seed}:{i}")) % 100
            < self.ua_strict_pct
        )

    def required_ua(self, host: str) -> str:
        """The one User-Agent a strict host's WAF allow-list accepts —
        server-side truth, a pure function of (seed, host) like every
        other world parameter (synthetic browser-shaped string; the
        reference pins real Firefox UAs, delattreimmobilier_com.py:34)."""
        v = splitmix64(xxh64(f"pinua:{self.seed}:{host}")) % 8
        return f"Mozilla/5.0 (compatible; rv:{90 + v}.0) pinned/{v}"

    def spider_user_agent(self, host: str) -> str | None:
        """The per-spider USER_AGENT custom_setting (2 reference
        spiders pin one): the author discovered the strict host's
        required UA, so the client sends exactly it there and keeps
        the default rotation everywhere else. None = rotate."""
        i = self.host_i(host)
        if (self.send_pinned_ua and i >= 0
                and self.is_ua_strict_host(i)):
            return self.required_ua(host)
        return None

    def api_body(self, host: str, skip: int, take: int,
                 viewstate: str | None = None) -> bytes:
        """Encode the next search-POST body in the host's dialect —
        JSON for json_api hosts (body=json.dumps, 69 reference
        spiders), form-encoded otherwise. ONE encoder shared by
        seeds(), the engine's parse kernel and the oracle simulator so
        the three can't drift."""
        if self.is_json_api_host(self.host_i(host)):
            import json as _json

            doc: dict = {"skip": skip, "take": take}
            if viewstate:
                doc["viewstate"] = viewstate
            return _json.dumps(doc, separators=(",", ":")).encode()
        fb = f"skip={skip}&take={take}"
        if viewstate:
            fb += f"&viewstate={viewstate}"
        return fb.encode()

    def is_cookie_host(self, i: int) -> bool:
        """Session-gated hosts: plain listing hosts only. API hosts
        carry their session in the form body (ST10 meta) and
        sitemap-discovered details never pass through a listing page
        that could set the cookie, so both are excluded."""
        return (
            not self.is_api_host(i)
            and not self.is_sitemap_host(i)
            and splitmix64(xxh64(f"cookiehost:{self.seed}:{i}")) % 100
            < self.cookie_host_pct
        )

    def session_cookie(self, host: str) -> str:
        """The deterministic session token the host's listing pages
        set. Server-side knowledge: the crawler must never compute
        this — it has to learn it from the Set-Cookie response field."""
        return f"sess={splitmix64(xxh64(f'cookie:{self.seed}:{host}')):016x}"

    def seeds(self) -> list:
        """Seed list. Plain hosts seed a GET listing URL (str); API hosts
        seed a POST search request (dict with form_body + paging meta);
        sitemap hosts seed their sitemap index."""
        out = []
        for i in range(self.num_hosts):
            if self.is_api_host(i):
                out.append(
                    {
                        "url": f"http://{self.host(i)}/api/search",
                        "form_body": self.api_body(
                            self.host(i), 0, self.details_per_page),
                        "meta": {"page": 1, "skip": 0, "take": self.details_per_page},
                    }
                )
            elif self.is_sitemap_host(i):
                out.append(f"http://{self.host(i)}/sitemap.xml")
            else:
                out.append(f"http://{self.host(i)}/list?page=1")
        return out

    def pages_for_host(self, i: int) -> int:
        return 1 + splitmix64(xxh64(f"pages:{self.seed}:{i}")) % self.max_pages_per_host

    def crawl_delay_ms(self, host: str) -> int:
        span = self.max_crawl_delay_ms - self.min_crawl_delay_ms
        return self.min_crawl_delay_ms + splitmix64(
            xxh64(f"delay:{self.seed}:{host}")
        ) % max(span, 1)

    def host_latency_ms(self, host: str) -> int:
        """Deterministic per-host response latency (the value the
        resolver reports and AutoThrottle adapts to — ST3)."""
        return 20 + splitmix64(xxh64(f"{self.seed}:lat:{host}")) % 200

    def host_settings(self, host: str) -> HostSettings:
        """The host's spider-authored politeness custom_settings
        (DOWNLOAD_DELAY / AUTOTHROTTLE_ENABLED / AUTOTHROTTLE_START_
        DELAY / AUTOTHROTTLE_MAX_DELAY / CONCURRENT_REQUESTS —
        spiders/*.py custom_settings, ~130 spiders each). Pure
        function of (seed, host): engine and oracle compute it
        identically at any parallelism."""
        if not self.custom_politeness_pct:
            return DEFAULT_HOST_SETTINGS
        if (splitmix64(xxh64(f"polite:{self.seed}:{host}")) % 100
                >= self.custom_politeness_pct):
            return DEFAULT_HOST_SETTINGS
        u = splitmix64(xxh64(f"politeprofile:{self.seed}:{host}")) % 100
        acc = 0
        for w, hs in _POLITENESS_PROFILES:
            acc += w
            if u < acc:
                return hs
        return _POLITENESS_PROFILES[-1][1]

    def host_httpstatus_list(self, host: str) -> tuple:
        """Statuses allowed through to this host's parse callback: the
        spider-wide ``handle_httpstatus_list`` attribute unioned with
        the host's HTTPERROR_ALLOWED_CODES custom_setting (if its
        spider drew one) — Scrapy's HttpErrorMiddleware consults both.
        Pure function of (seed, host): engine, streaming mode and the
        sequential oracle compute it identically at any parallelism."""
        base = self.handle_httpstatus_list
        if not self.httperror_allowed_pct:
            return base
        if (splitmix64(xxh64(f"httperr:{self.seed}:{host}")) % 100
                >= self.httperror_allowed_pct):
            return base
        pal = _HTTPERROR_PALETTE[
            splitmix64(xxh64(f"httperrpal:{self.seed}:{host}"))
            % len(_HTTPERROR_PALETTE)
        ]
        return tuple(sorted(set(base) | set(pal)))

    def host_download_timeout_ms(self, host: str) -> int:
        """This host's spider's DOWNLOAD_TIMEOUT budget in ms: the
        census-weighted palette draw if the spider declared one
        (timeout_host_pct), else the spider-wide ``download_timeout_ms``
        (Scrapy's 180 s default). CLIENT config — consulted by the
        fetch stage and the sequential oracle, never by the server-side
        resolver. Pure function of (seed, host)."""
        if not self.timeout_host_pct:
            return self.download_timeout_ms
        if (splitmix64(xxh64(f"tohost:{self.seed}:{host}")) % 100
                >= self.timeout_host_pct):
            return self.download_timeout_ms
        u = splitmix64(xxh64(f"topal:{self.seed}:{host}")) % 100
        acc = 0
        for w, ms in _TIMEOUT_PALETTE:
            acc += w
            if u < acc:
                return ms
        return _TIMEOUT_PALETTE[-1][1]

    def is_dedup_off_host(self, host: str) -> bool:
        """Hosts whose spider sets DUPEFILTER_CLASS = BaseDupeFilter
        (elliotoliver_co_uk.py:34): the dupe filter is OFF for every
        request to this host."""
        if not self.dedup_off_pct:
            return False
        return (splitmix64(xxh64(f"dedupoff:{self.seed}:{host}")) % 100
                < self.dedup_off_pct)


@dataclass
class Page:
    """Resolved page. ``body`` is what the fetcher returns as bytes."""

    url: str
    status: int
    kind: str  # 'robots' | 'listing' | 'detail' | 'image' | 'missing'
    body: bytes = b""
    content_type: str = "text/html"
    latency_ms: int = 0
    fmt: str = ""  # image pages only
    content_encoding: str = ""  # "" | "gzip" | "deflate" (wire coding)
    set_cookie: str = ""  # Set-Cookie response header (session gating)


def _h(cfg: WorldConfig, *parts) -> int:
    return splitmix64(xxh64(":".join(str(p) for p in (cfg.seed, *parts))))


# ------------------------------------------------------------------ images
def _palette_pixels(k: int, w: int, h: int) -> np.ndarray:
    """Palette-born pixels for GIF keys: a ≤64-color blocky pattern.

    GIF is an indexed-color format and :func:`spider_ray.gif.encode_gif`
    refuses >256 distinct colors, so gif-fmt world images are genuinely
    palette media (as listing-site GIFs — logos, floor plans — are);
    their encode→decode round trip is exact, like PNG."""
    ncolors = 4 + ((k >> 44) & 0x3F) % 61  # 4..64 palette entries
    r = splitmix64(k ^ 0x9E3779B97F4A7C15)
    pal = np.empty((ncolors, 3), dtype=np.uint8)
    for i in range(ncolors):
        r = splitmix64(r)
        pal[i] = ((r >> 16) & 0xFF, (r >> 8) & 0xFF, r & 0xFF)
    bs = 2 + ((k >> 50) & 7)  # block size 2..9 → structured LZW matches
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    idx = ((xx // bs) * 3 + (yy // bs) * 5 + (xx + yy) // (2 * bs)) % ncolors
    return pal[idx]


def image_pixels(cfg: WorldConfig, image_key: str) -> np.ndarray:
    """Deterministic structured RGB pixels for one image URL.

    GIF-fmt keys get palette-born pixels (≤256 colors); all other keys
    keep the full-RGB gradient pattern — so adding gif to the fmt mix
    perturbs ONLY the keys that became gif, nothing else."""
    k = _h(cfg, "img", image_key)
    w = cfg.img_min_side + (k & 0xFFFF) % (cfg.img_max_side - cfg.img_min_side + 1)
    h = cfg.img_min_side + ((k >> 16) & 0xFFFF) % (
        cfg.img_max_side - cfg.img_min_side + 1
    )
    if image_fmt(cfg, image_key) in (FMT_GIF, FMT_WEBP):
        return _palette_pixels(k, w, h)
    fx = 1 + ((k >> 32) & 7)
    fy = 1 + ((k >> 36) & 7)
    ph = (k >> 40) & 0xFF
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    r = (xx * fx + ph) % 256
    g = (yy * fy + (ph >> 1)) % 256
    b = ((xx + yy) * ((fx + fy) % 5 + 1)) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def image_fmt(cfg: WorldConfig, image_key: str) -> str:
    if _h(cfg, "imgfmt", image_key) % 100 >= cfg.lossy_pct:
        if _h(cfg, "imggif", image_key) % 100 < cfg.gif_pct:
            return FMT_GIF
        if _h(cfg, "imgwebp", image_key) % 100 < cfg.webp_pct:
            return FMT_WEBP
        return FMT_PNG
    return (
        FMT_JPEG
        if _h(cfg, "imgjpeg", image_key) % 100 < cfg.jpeg_pct
        else FMT_QPNG
    )


def image_bytes(cfg: WorldConfig, image_key: str) -> tuple[bytes, str, int, int]:
    px = image_pixels(cfg, image_key)
    fmt = image_fmt(cfg, image_key)
    # level 2: the encode simulates the remote web SERVER producing the
    # bytes — deterministic at any level, and the engine-side work
    # (decode/phash/verify) is unaffected. JPEG quality 96: measured
    # round-trip PSNR ≥ 43.6 dB over 2,500 synthetic images (the sink
    # invariant requires ≥ 40), with ~15% fewer Huffman symbols to
    # decode than q98 — the scan loop is the whole decode cost.
    if fmt == FMT_JPEG:
        if _h(cfg, "imgprog", image_key) % 100 < cfg.jpeg_prog_pct:
            from .jpeg2 import encode_jpeg_progressive

            # spectral-selection-only script: the cheap common form;
            # the full SA script is exercised by tests/test_jpeg2.py
            data = encode_jpeg_progressive(px, quality=96,
                                           script="spectral")
        else:
            data = encode_jpeg(px, quality=96)
    elif fmt == FMT_GIF:
        data = encode_gif(px)  # palette-born pixels → lossless round trip
    elif fmt == FMT_WEBP:
        data = encode_webp(px)  # palette path: indexed + packed + LZ77
    elif fmt == FMT_QPNG:
        data = encode_qpng(px, level=2)
    else:
        data = encode_png(px, level=2)
    return data, fmt, px.shape[1], px.shape[0]


# ------------------------------------------------------------------ detail fields

def detail_href(cfg: WorldConfig, k: int) -> str:
    """The href a listing/API/sitemap emits for detail ``k``: the
    /private prefix when robots-gated, else possibly a /go/{k} alias
    that 301-redirects to the canonical /prop/{k} (redirect_pct)."""
    if _h(cfg, "priv", k) % 100 < cfg.private_pct:
        return f"/private/prop/{k}"
    if cfg.redirect_pct and _h(cfg, "redir", k) % 100 < cfg.redirect_pct:
        return f"/go/{k}"
    return f"/prop/{k}"


def detail_key(host_index: int, page: int, slot: int, cfg: WorldConfig) -> int:
    """Global detail ordinal, unique across the world."""
    return (
        host_index * (cfg.max_pages_per_host * cfg.details_per_page)
        + (page - 1) * cfg.details_per_page
        + slot
    )


def host_separators(cfg: WorldConfig, host: str) -> tuple[str, str]:
    """(thousand_separator, scale_separator) — per-host crawl config, the
    analog of the reference's per-spider class attrs
    (spiders/31plusvastgoed_nl.py:18, helper.py:310-317)."""
    eu = _h(cfg, "sep", host) % 2 == 1
    return (".", ",") if eu else (",", ".")


# Server-side month-name rendering tables for content-negotiating
# hosts (lang_host_pct). Each name round-trips through the client's
# multilingual month dict (extract._MONTHS — the helper.py:206-266
# languages), which is the whole point of the surface: the reference
# spiders request a language their parsing tables can read.
LOCALIZED_MONTHS = {
    "es": ("Enero", "Febrero", "Marzo", "Abril", "Mayo", "Junio", "Julio",
           "Agosto", "Septiembre", "Octubre", "Noviembre", "Diciembre"),
    "tr": ("Ocak", "Şubat", "Mart", "Nisan", "Mayıs", "Haziran", "Temmuz",
           "Ağustos", "Eylül", "Ekim", "Kasım", "Aralık"),
    "de": ("Januar", "Februar", "März", "April", "Mai", "Juni", "Juli",
           "August", "September", "Oktober", "November", "Dezember"),
    "nl": ("Januari", "Februari", "Maart", "April", "Mei", "Juni", "Juli",
           "Augustus", "September", "Oktober", "November", "December"),
    "fr": ("Janvier", "Février", "Mars", "Avril", "Mai", "Juin", "Juillet",
           "Août", "Septembre", "Octobre", "Novembre", "Décembre"),
}


def detail_raw_fields(cfg: WorldConfig, host: str, k: int, caption: str,
                      lang: str | None = None) -> dict:
    """Raw (pre-normalization) listing fields for detail ordinal ``k``.

    Deliberately messy in the ways helper.py has to handle: dual
    thousand separators, sqft vs m², past dates needing the year bump
    (helper.py:593-605), numeric energy values for binning
    (helper.py:185-201), currency symbols with the $→AUD-iff-australia
    rule (helper.py:140-169), multilingual property-type words, HTML
    tags + contact tails in descriptions, duplicate image URLs
    (pipelines.py:128).
    """
    r = _h(cfg, "detail", k)

    def take(bits):
        nonlocal r
        v = r & ((1 << bits) - 1)
        r = splitmix64(r)
        return v

    rent = 400 + take(16) % 39600  # keep inside the (0, 40000] gate mostly
    if take(8) % 25 == 0:
        rent = 40001 + take(12)  # some violate the rent gate (basic.tmpl:44-46)
    take(1)  # (reserved bit, keeps downstream draws stable)
    tsep, _ssep = host_separators(cfg, host)
    rent_string = f"{rent:,}".replace(",", tsep)
    symbol = CURRENCY_SYMBOLS[take(8) % len(CURRENCY_SYMBOLS)]
    ptype_raw, _ = PROPERTY_TYPE_WORDS[take(8) % len(PROPERTY_TYPE_WORDS)]
    sqm = 18 + take(8)
    use_sqft = take(8) % 5 == 0
    area_str = f"{int(sqm * 10.764)} sq ft" if use_sqft else f"{sqm} m²"
    rooms = 1 + take(8) % 6
    baths = 1 + take(8) % 3
    # available date: %d/%m/%Y, some in the past (year bump semantics)
    day = 1 + take(8) % 28
    month = 1 + take(8) % 12
    year = 2025 + take(8) % 3  # 2025 dates are "past" vs REF_TODAY → bump
    energy_kwh = 1 + take(8) % 120
    amen_mask = take(9)
    amenities = [w for j, w in enumerate(AMENITY_WORDS) if amen_mask >> j & 1]
    # content negotiation: same drawn date, rendered in the negotiated
    # language's month names ("07 Enero 2026" — the M13 form) when the
    # request carried the host's Accept-Language; numeric %d/%m/%Y (the
    # default locale) otherwise. Draw stream identical either way.
    date_raw = (
        f"{day:02d} {LOCALIZED_MONTHS[lang][month - 1]} {year}"
        if lang
        else f"{day:02d}/{month:02d}/{year}"
    )
    n_img = 1 + take(8) % cfg.images_per_detail
    images = [f"http://{host}/img/{k}_{j}.png" for j in range(n_img)]
    if take(8) % 4 == 0 and images:
        images.append(images[0])  # duplicate image URL (pipelines.py:128)
    desc_bits = ", ".join(amenities) if amenities else "simple unit"
    description = (
        f"<p>{caption}</p> <b>Features:</b> {desc_bits}. "
        f"Contact us at info@{host} or +31 20 123 {1000 + take(12) % 9000}."
    )
    return {
        "external_id": str(k),
        "title": f"{ptype_raw.title()} {rooms} rooms in sector {k % 97}",
        "description": description,
        "address": f"{1 + take(8) % 200} Main Street, Sector {k % 97}",
        "property_type_raw": ptype_raw,
        "area_raw": area_str,
        "room_count": rooms,
        "bathroom_count": baths,
        "rent_raw": f"{symbol} {rent_string} per month",
        "available_date_raw": date_raw,
        "energy_kwh": energy_kwh,
        "latitude": f"{50 + (take(16) % 1000) / 100.0:.2f}",
        "longitude": f"{3 + (take(16) % 400) / 100.0:.2f}",
        "zipcode": f"{1000 + k % 9000}",
        "city": f"City{k % 53}",
        "images": images,
        "caption": caption,
        "rent_expected": rent,
    }


def detail_html(cfg: WorldConfig, host: str, k: int, caption: str,
                lang: str | None = None) -> str:
    f = detail_raw_fields(cfg, host, k, caption, lang)
    imgs = "\n".join(f'<img class="photo" src="{u}">' for u in f["images"])
    return f"""<html><head><title>{f['title']}</title>
<script type="application/ld+json">{{"geo": {{"latitude": {f['latitude']}, "longitude": {f['longitude']}}}}}</script>
</head><body>
<h1 class="title">{f['title']}</h1>
<div class="type">{f['property_type_raw']}</div>
<div class="price">{f['rent_raw']}</div>
<div class="area">{f['area_raw']}</div>
<div class="rooms">{f['room_count']} rooms</div>
<div class="baths">{f['bathroom_count']} baths</div>
<div class="address">{f['address']}, {f['zipcode']} {f['city']}</div>
<div class="date">Available: {f['available_date_raw']}</div>
<div class="energy">Energy: {f['energy_kwh']} kWh</div>
<div class="desc">{f['description']}</div>
<div class="eid">ID {f['external_id']}</div>
{imgs}
</body></html>"""


def encode_page(cfg: WorldConfig, url: str, html: str) -> tuple[bytes, str]:
    """Server-side charset selection: a ``latin1_pct`` share of pages
    goes out windows-1252 with a declaring ``<meta charset>`` tag
    (skipped when the text doesn't fit cp1252 — real servers don't
    mojibake their own content); everything else is UTF-8."""
    if cfg.latin1_pct and _h(cfg, "charset", url) % 100 < cfg.latin1_pct:
        tagged = html.replace(
            "<head>", '<head><meta charset="windows-1252">', 1)
        try:
            return tagged.encode("cp1252"), "windows-1252"
        except UnicodeEncodeError:
            pass
    return html.encode("utf-8"), "utf-8"


# ------------------------------------------------------------------ resolver
class World:
    """Pure-function URL → Page resolver.

    ``captions`` is the external caption corpus (list[str]); detail
    ordinal ``k`` maps to ``captions[k % len(captions)]``. Held once
    per fetch actor (broadcast via ``ray.put``).
    """

    def __init__(self, cfg: WorldConfig, captions: list[str] | None = None):
        self.cfg = cfg
        self.captions = captions or ["synthetic caption"]

    def caption_for(self, k: int) -> str:
        return self.captions[k % len(self.captions)]

    def _host_index(self, host: str) -> int:
        if not host.startswith("h") or not host.endswith(".test"):
            return -1
        try:
            i = int(host[1 : -len(".test")])
        except ValueError:
            return -1
        return i if 0 <= i < self.cfg.num_hosts else -1

    def resolve(self, url: str, attempt: int = 0,
                form_body: bytes | None = None,
                cookie: str | None = None,
                referer: str | None = None,
                headers: dict | None = None,
                ua: str | None = None) -> Page:
        """Server-side resolution + HTTP content coding: when
        ``cfg.gzip_pct`` > 0, that share of 200 text responses goes
        out gzip- (3/4) or zlib-deflate- (1/4) compressed with
        ``content_encoding`` set, exactly like real servers answering
        the reference spiders' ``Accept-Encoding: gzip, deflate``
        headers (e.g. spiders/stonebridgelondon_co_uk.py:23). The
        client side — transparent decode before parsing — lives in
        :func:`spider_ray.fetch.decode_http_body` (the Scrapy
        HttpCompressionMiddleware analog)."""
        page = self._resolve_plain(url, attempt, form_body, cookie,
                                   referer, headers, ua)
        cfg = self.cfg
        if (
            cfg.gzip_pct
            # soft-401 detail bodies compress too: real servers apply
            # Content-Encoding to error-status bodies as well, and the
            # client decode is status-blind on both sides
            and page.status in (200, 401)
            and page.kind in ("listing", "detail", "api", "sitemap")
        ):
            roll = _h(cfg, "enc", page.url)
            if roll % 100 < cfg.gzip_pct:
                import gzip as _gzip
                import zlib as _zlib

                if (roll >> 7) % 4 == 0:
                    page.body = _zlib.compress(page.body)
                    page.content_encoding = "deflate"
                else:
                    # mtime=0 keeps the member header deterministic
                    page.body = _gzip.compress(page.body, mtime=0)
                    page.content_encoding = "gzip"
        return page

    def _resolve_plain(self, url: str, attempt: int = 0,
                       form_body: bytes | None = None,
                       cookie: str | None = None,
                       referer: str | None = None,
                       headers: dict | None = None,
                       ua: str | None = None) -> Page:
        cfg = self.cfg
        from urllib.parse import parse_qs, urlsplit

        parts = urlsplit(url)
        host = parts.netloc.lower()
        i = self._host_index(host)
        latency = cfg.host_latency_ms(host)
        if i < 0:
            return Page(url, 404, "missing", latency_ms=latency)
        path = parts.path

        if (cfg.ua_strict_pct and path != "/robots.txt"
                and cfg.is_ua_strict_host(i)
                and ua != cfg.required_ua(host)):
            # UA allow-list WAF: every content endpoint 403s a request
            # whose User-Agent is not the host's required string. The
            # static edge serves robots.txt before the WAF (and tying
            # robots into this surface would conflate it with the
            # politeness layer). 403 ∈ RETRY_HTTP_CODES, so a
            # wrong-UA client retries to exhaustion, like Scrapy with
            # the reference's retry list.
            return Page(url, 403, "blocked", latency_ms=latency)

        if path == "/api/search":
            # form-POST JSON search API (S3/S4): skip/take pagination,
            # has_more=False is the empty-expansion terminator (O2)
            if not cfg.is_api_host(i) or form_body is None:
                return Page(url, 404, "missing", latency_ms=latency)
            import json as _json

            # AJAX gate: 49 reference spiders hardcode
            # "X-Requested-With: XMLHttpRequest" because the endpoint
            # 403s plain POSTs. Checked before body parsing, like the
            # frameworks that implement it (is_ajax middleware).
            if cfg.is_xhr_api_host(i) and (headers or {}).get(
                    "X-Requested-With") != "XMLHttpRequest":
                return Page(url, 403, "api", latency_ms=latency)
            raw_body = form_body.decode("utf-8", "replace")
            if cfg.is_json_api_host(i):
                # JSON-body endpoint (body=json.dumps — 69 reference
                # spiders): a non-JSON body is a client error, not a
                # lenient parse. The form endpoints below keep their
                # parse_qs tolerance.
                try:
                    p = _json.loads(raw_body)
                    if not isinstance(p, dict):
                        raise ValueError
                except ValueError:
                    return Page(url, 400, "api", latency_ms=latency)
                skip = int(p.get("skip", 0))
                take = max(1, int(p.get("take", 8)))
                vs_sent = str(p.get("viewstate", ""))
            else:
                params = parse_qs(raw_body)
                skip = int(params.get("skip", ["0"])[0])
                take = max(1, int(params.get("take", ["8"])[0]))
                vs_sent = params.get("viewstate", [""])[0]
            total = cfg.pages_for_host(i) * cfg.details_per_page
            base_k = i * (cfg.max_pages_per_host * cfg.details_per_page)
            # __VIEWSTATE analog (21 reference spiders harvest ASP.NET
            # hidden form tokens and echo them via FormRequest —
            # spiders/adams.py:91-92, amberandco_co_uk.py:39-47): a
            # token host demands, on every page after the first, the
            # opaque server token its PREVIOUS response issued; a
            # missing/wrong token is rejected. The token is server
            # state the client can only learn from the page.
            if cfg.is_viewstate_host(i):
                if skip > 0 and vs_sent != cfg.viewstate_token(host, skip):
                    return Page(url, 403, "api", latency_ms=latency)
                nxt_vs = cfg.viewstate_token(host, skip + take)
            else:
                nxt_vs = None
            results = []
            for off in range(skip, min(skip + take, total)):
                k = base_k + off
                results.append(detail_href(cfg, k))
            doc = {"results": results, "skip": skip, "take": take,
                   "has_more": skip + take < total}
            if nxt_vs is not None and doc["has_more"]:
                doc["viewstate"] = nxt_vs
            body = _json.dumps(doc).encode()
            return Page(url, 200, "api", body, "application/json", latency)

        if path == "/sitemap.xml":
            # sitemaps.org index: one child urlset per listing page
            if not cfg.is_sitemap_host(i):
                return Page(url, 404, "missing", latency_ms=latency)
            subs = "\n".join(
                f"  <sitemap><loc>http://{host}/sitemap-{p}.xml</loc></sitemap>"
                for p in range(1, cfg.pages_for_host(i) + 1)
            )
            body = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                f"{subs}\n</sitemapindex>"
            ).encode()
            return Page(url, 200, "sitemap", body, "application/xml", latency)

        m_sm = _RE_SITEMAP_PAGE.match(path)
        if m_sm:
            if not cfg.is_sitemap_host(i):
                return Page(url, 404, "missing", latency_ms=latency)
            page = int(m_sm.group(1))
            if page < 1 or page > cfg.pages_for_host(i):
                return Page(url, 404, "missing", latency_ms=latency)
            urls = []
            for slot in range(cfg.details_per_page):
                k = detail_key(i, page, slot, cfg)
                urls.append(
                    f"  <url><loc>http://{host}{detail_href(cfg, k)}</loc></url>")
            body = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                + "\n".join(urls)
                + "\n</urlset>"
            ).encode()
            return Page(url, 200, "sitemap", body, "application/xml", latency)

        if path == "/robots.txt":
            delay = cfg.crawl_delay_ms(host)
            body = (
                f"User-agent: *\nCrawl-delay: {delay / 1000.0:g}\n"
                f"Disallow: /private/\n"
            ).encode()
            return Page(url, 200, "robots", body, "text/plain", latency)

        if path == "/list":
            npages = cfg.pages_for_host(i)
            if form_body is not None and cfg.is_form_pag_host(i):
                # form-postback pagination (FormRequest.from_response):
                # the POST must echo the PREVIOUS page's harvested
                # hidden fields — static dept plus the server-issued
                # __FTOK token — with num_page bumped by the spider.
                params = parse_qs(form_body.decode("utf-8", "replace"))
                try:
                    page = int(params.get("num_page", ["0"])[0])
                except ValueError:
                    page = 0
                if (page < 2 or page > npages
                        or params.get("dept", [""])[0] != "lettings"
                        or params.get("__FTOK", [""])[0]
                        != cfg.form_token(host, page - 1)):
                    return Page(url, 403, "listing", latency_ms=latency)
            else:
                page = int(parse_qs(parts.query).get("page", ["1"])[0])
                if page < 1 or page > npages:
                    return Page(url, 404, "missing", latency_ms=latency)
                if cfg.is_form_pag_host(i) and page != 1:
                    # postback-only site: deeper pages have no GET form
                    return Page(url, 404, "missing", latency_ms=latency)
            if cfg.is_lang_host(i) and (headers or {}).get(
                    "Accept-Language") != cfg.host_lang(i):
                # content negotiation: without the site's language the
                # server answers its language-chooser splash — a real
                # 200 page with zero listing anchors. No session cookie
                # either (the splash is pre-session). The reference
                # spiders hardcode Accept-Language precisely to skip
                # this page (295 of them).
                body = (
                    "<html><body><div class=\"lang-picker\">"
                    "Choose your language / Elija su idioma"
                    "</div></body></html>"
                ).encode()
                return Page(url, 200, "listing", body, "text/html", latency)
            links = []
            for slot in range(cfg.details_per_page):
                k = detail_key(i, page, slot, cfg)
                links.append(detail_href(cfg, k))
            if cfg.offsite_pct:
                # external partner/ad links, same anchor class so the
                # link extractor (which, like Scrapy's LinkExtractor,
                # knows nothing about domains) picks them up; dropping
                # them is the offsite filter's job
                for slot in range(cfg.details_per_page):
                    k = detail_key(i, page, slot, cfg)
                    if _h(cfg, "offsite", host, page, slot) % 100 < cfg.offsite_pct:
                        links.append(f"http://partner{slot}.example/promo/{k}")
            if (page >= 2 and cfg.related_pct
                    and _h(cfg, "related", host, page) % 100
                    < cfg.related_pct):
                # cross-page repeat: a plain "related property" anchor
                # back to page 1's slot-0 detail (same anchor class, so
                # the link extractor treats it as any other listing
                # link). Dropped by the dupe filter on dedup-on hosts;
                # re-downloaded on DUPEFILTER-off hosts (dedup_off_pct).
                links.append(detail_href(cfg, detail_key(i, 1, 0, cfg)))
            body_links = "\n".join(
                f'<a class="listing" href="{u}">listing</a>' for u in links
            )
            nxt = (
                f'<a class="next" href="/list?page={page + 1}">next</a>'
                if page < npages
                else ""
            )
            if cfg.is_form_pag_host(i):
                # no next anchor — the only route to page+1 is the
                # postback form below (hidden fields in DOM order; the
                # spider harvests ALL of them, from_response-style)
                nxt = (
                    '<form class="pager" action="/list" method="post">\n'
                    f'<input type="hidden" name="__FTOK" '
                    f'value="{cfg.form_token(host, page)}"/>\n'
                    '<input type="hidden" name="dept" value="lettings"/>\n'
                    f'<input type="hidden" name="num_page" value="{page}"/>\n'
                    "</form>"
                    if page < npages
                    else ""
                )
            feat = ""
            if (cfg.featured_pct
                    and _h(cfg, "featured", host, page) % 100
                    < cfg.featured_pct):
                # the page's own slot-0 detail, repeated as a featured
                # strip — the dont_filter surface (see WorldConfig)
                k0 = detail_key(i, page, 0, cfg)
                feat = (f'\n<a class="featured" '
                        f'href="{detail_href(cfg, k0)}">featured</a>')
            body = f"<html><body>{body_links}\n{nxt}{feat}</body></html>".encode()
            page_out = Page(url, 200, "listing", body, "text/html", latency)
            if cfg.is_cookie_host(i):
                # session-gated host: every listing response (re)sets
                # the session cookie its detail pages will demand
                page_out.set_cookie = cfg.session_cookie(host)
            return page_out

        if path.startswith("/go/"):
            # alias URL: 301 to the canonical detail; the Location
            # value travels in the body column (no schema change)
            try:
                k = int(path.rpartition("/")[2])
            except ValueError:
                return Page(url, 404, "missing", latency_ms=latency)
            target = f"http://{host}/prop/{k}"
            return Page(url, 301, "redirect", target.encode(),
                        "text/plain", latency)

        if path.startswith("/prop/") or path.startswith("/private/prop/"):
            k_str = path.rpartition("/")[2]
            try:
                k = int(k_str)
            except ValueError:
                return Page(url, 404, "missing", latency_ms=latency)
            # slow endpoint (slow_pct): the server stalls for
            # SLOW_LATENCY_MS on EVERY attempt, whatever it would have
            # answered — the client's DOWNLOAD_TIMEOUT gate (fetch /
            # oracle side) decides whether the response ever arrives.
            if cfg.slow_pct and _h(cfg, "slow", k) % 100 < cfg.slow_pct:
                latency = SLOW_LATENCY_MS
            if _h(cfg, "gone", k) % 100 < cfg.notfound_pct:
                return Page(url, PERMANENT_CODE, "missing", latency_ms=latency)
            if (cfg.dead_detail_pct
                    and _h(cfg, "dead", k) % 100 < cfg.dead_detail_pct):
                # withdrawn listing: the portal 302s its detail page to
                # a shared "listing removed" landing page, on every
                # attempt, session or not — the pattern aryes_be.py:80
                # detects with dont_redirect + handle_httpstatus_list.
                return Page(url, 302, "redirect",
                            f"http://{host}/removed".encode(),
                            "text/plain", latency)
            if cfg.is_cookie_host(i) and cookie != cfg.session_cookie(host):
                # session gate: details demand the listing's cookie
                return Page(url, 403, "detail", latency_ms=latency)
            if attempt == 0 and _h(cfg, "flaky", k) % 100 < cfg.fail_pct:
                return Page(url, TRANSIENT_CODE, "detail", latency_ms=latency)
            # content negotiation on details: a matching Accept-Language
            # gets the date rendered in that language's month names
            # (the M13 multilingual surface); anything else gets the
            # default numeric locale. Same fields either way.
            lang = (
                cfg.host_lang(i)
                if cfg.is_lang_host(i)
                and (headers or {}).get("Accept-Language") == cfg.host_lang(i)
                else None
            )
            body, cs = encode_page(
                cfg, url, detail_html(cfg, host, k, self.caption_for(k), lang))
            # soft-401: full parseable body behind an auth-warning
            # status, on EVERY attempt (deterministic, not transient) —
            # the handle_httpstatus_list surface. 401 ∈ RETRY_HTTP_CODES
            # (the reference's settings.py:99 list), so the crawler
            # retries it to exhaustion before the handled parse.
            status = (
                401
                if cfg.soft401_pct and _h(cfg, "soft401", k) % 100 < cfg.soft401_pct
                else 200
            )
            return Page(url, status, "detail", body,
                        f"text/html; charset={cs}", latency)

        if path == "/removed":
            # the shared withdrawn-listing landing page: a real 200
            # document with no anchors and no item fields. kind
            # "removed" matches no parse branch on either side, so a
            # crawler that follows the 302 here (dont_redirect off)
            # downloads it once per host (the seen set dedups later
            # arrivals) and extracts nothing — exactly the junk fetch
            # the aryes_be pattern exists to avoid.
            body = ("<html><body><p>This listing has been removed."
                    "</p></body></html>").encode()
            return Page(url, 200, "removed", body, "text/html", latency)

        if path.startswith("/img/"):
            if cfg.is_hotlink_host(i):
                # hotlink protection: the image endpoint demands a
                # same-host Referer (the check real CDNs run). Scrapy's
                # RefererMiddleware — on by default — satisfies it
                # transparently; a referer-less client 403s.
                from urllib.parse import urlsplit as _us

                if not referer or _us(referer).netloc.lower() != host:
                    return Page(url, 403, "image", latency_ms=latency)
            key = path.rpartition("/")[2]
            data, fmt, _w, _hh = image_bytes(cfg, key.split(".")[0])
            return Page(url, 200, "image", data, f"image/{fmt}", latency, fmt=fmt)

        return Page(url, 404, "missing", latency_ms=latency)


def load_captions_from_documents(documents_parquet: str, limit: int = 5000) -> list[str]:
    """Caption corpus from the driver's documents table (first 160 chars)."""
    import pyarrow.parquet as pq

    t = pq.read_table(documents_parquet, columns=["text"])
    texts = t.column("text").to_pylist()[:limit]
    return [(s or "")[:160] for s in texts] or ["synthetic caption"]
