"""URL canonicalization + frontier key derivation.

The reference resolves relative links with ``response.urljoin`` (2,553
spiders; python_spiders/loaders.py:64, spiders/123wonen_nl.py:37) and
dedups on Scrapy's request fingerprint, which canonicalizes the URL
(sorted query, no fragment) before hashing. This module re-expresses
that as pure functions over string batches:

    canonicalize(url)  → scheme/host lowercased, default port dropped,
                         dot-segments resolved, query keys sorted
                         (stable), fragment stripped, empty path → "/"
    url_hash           = xxh64(canonical_url)      (north-rule dedup key)
    host_hash          = xxh64(host)               (politeness shuffle key)

All batch entry points are plain-function ``map_batches`` bodies
(stateless; no actor needed).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

from .hashing import xxh64, xxh64_many

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str, base: str | None = None) -> str:
    """Canonical absolute URL (Scrapy-fingerprint-style semantics)."""
    if base:
        url = urljoin(base, url)
    scheme, netloc, path, query, _frag = urlsplit(url.strip())
    scheme = scheme.lower()
    netloc = netloc.lower()
    if "@" in netloc:
        creds, _, hostport = netloc.rpartition("@")
        netloc = hostport if not creds else creds + "@" + hostport
    host, _, port = netloc.partition(":")
    if port and _DEFAULT_PORTS.get(scheme) == port:
        netloc = host
    # resolve dot segments (RFC 3986 §5.2.4)
    if path:
        segs: list[str] = []
        for seg in path.split("/"):
            if seg == "..":
                if len(segs) > 1:
                    segs.pop()
            elif seg != ".":
                segs.append(seg)
        path = "/".join(segs)
    if not path:
        path = "/"
    if query:
        query = urlencode(sorted(parse_qsl(query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    netloc = urlsplit(url).netloc.lower()
    host = netloc.rpartition("@")[2].partition(":")[0]
    return host


def canonicalize_batch(
    urls, bases=None
) -> tuple[list[str], list[str], np.ndarray, np.ndarray]:
    """Canonicalize a batch → (canonical, host, url_hash u64, host_hash u64).

    Host hashes are computed once per distinct host in the batch
    (crawl batches are host-clustered, so this is ~free).
    """
    if bases is None:
        canon = [canonicalize(u) for u in urls]
    else:
        canon = [canonicalize(u, b) for u, b in zip(urls, bases)]
    hosts = [host_of(u) for u in canon]
    url_hash = xxh64_many(canon)
    uniq: dict[str, int] = {}
    for h in hosts:
        if h not in uniq:
            uniq[h] = 0
    uniq_hashes = xxh64_many(list(uniq.keys()))
    for k, v in zip(uniq.keys(), uniq_hashes):
        uniq[k] = int(v)
    host_hash = np.fromiter((uniq[h] for h in hosts), dtype=np.uint64, count=len(hosts))
    return canon, hosts, url_hash, host_hash


def request_fingerprint(canonical_url: str, form_body: bytes | None = None) -> int:
    """Dedup key: xxh64 over the canonical URL, extended with the POST
    body when present — Scrapy's request fingerprint hashes
    method+URL+body (SURVEY.md ST1), so two POSTs to the same URL with
    different form data are distinct frontier entries."""
    if form_body:
        return xxh64(canonical_url.encode("utf-8") + b"\x00" + form_body)
    return xxh64(canonical_url)


def add_frontier_keys(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """map_batches body: append canonical_url/host/url_hash/host_hash columns."""
    urls = batch[url_col].to_pylist()
    canon, hosts, uh, hh = canonicalize_batch(urls)
    cols = dict(zip(batch.column_names, batch.columns))
    cols["canonical_url"] = pa.array(canon, pa.string())
    cols["host"] = pa.array(hosts, pa.string())
    cols["url_hash"] = pa.array(uh, pa.uint64())
    cols["host_hash"] = pa.array(hh, pa.uint64())
    return pa.table(cols)


def url_is_from_any_domain(host: str, domains) -> bool:
    """Scrapy OffsiteMiddleware host check (w3lib url_is_from_any_domain
    semantics): the host matches when it equals a domain or is a
    subdomain of one (dot-suffix match). Reference spiders declare
    ``allowed_domains`` per spider (e.g. spiders/wredevelopment.py:11);
    the middleware drops extracted links to any other host."""
    h = (host or "").lower()
    for d in domains:
        d = d.lower()
        if h == d or h.endswith("." + d):
            return True
    return False
