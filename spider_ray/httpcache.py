"""Scrapy HttpCacheMiddleware analog — ``HTTPCACHE_ENABLED``, the
single most-used ``custom_settings`` key in the reference corpus
(175 spiders set it, e.g. spiders/venturi.py:24-30). DummyPolicy
semantics with never-expire storage (``HTTPCACHE_EXPIRATION_SECS=0``,
the Scrapy default):

- EVERY downloaded response is stored by request fingerprint —
  including error statuses (DummyPolicy caches a 503 too unless
  ``HTTPCACHE_IGNORE_HTTP_CODES`` is set, which the reference spiders
  never do; a retry therefore hits the cache and re-sees the stored
  failure instead of re-downloading).
- A request whose fingerprint is cached is served the stored response
  WITHOUT touching the downloader: Scrapy's download slots and
  delays live in the downloader, which a cached response never
  enters. In this engine that means cache hits bypass the per-host
  politeness budget — they are admitted for free (``free`` rows in
  :func:`spider_ray.politeness.admit_masks`) and consume no fetch
  latency.
- ROUND-ALIGNED VISIBILITY: a lookup during round ``r`` reads only
  entries stored in rounds ``< r`` (encoded in the file name).
  Within a round a fingerprint is fetched by exactly one task (dedup
  winner + host-aligned blocks), so same-round entries are never
  needed — and cross-block directory-listing races therefore cannot
  make output depend on task timing.

Ray-first layout: append-only parquet under
``cache_dir/bucket=BBB/round_RRRR_<unique>.parquet`` with
``bucket = host_hash % nbuckets`` — the SAME partitioning key as the
crawl's host-aligned blocks, so a fused round task touches only its
own hosts' buckets. Hit probes read just the ``url_hash`` column;
bodies are read only for actual hits. Files go tmp-then-rename, so a
crashed task never leaves a readable partial file, and a resumed run
re-serves every completed download from cache instead of re-fetching.

Stored bodies are the post-``decode_http_body`` identity form (the
parse stages always see identity bytes; re-serving re-compressed wire
bytes would only re-pay the decode).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Process-level memo of url_hash columns keyed by file path: cache
# files are immutable once renamed into place (append-only layout), so
# a worker process reused across tasks/rounds never re-reads a file's
# hash column. Bodies are NOT memoized (too big); compaction removes
# files, leaving only never-again-read stale keys.
_HASHCOL_CACHE: dict[str, np.ndarray] = {}


def _hash_column(path: str) -> np.ndarray:
    col = _HASHCOL_CACHE.get(path)
    if col is None:
        col = pq.read_table(path, columns=["url_hash"])["url_hash"].to_numpy(
            zero_copy_only=False
        )
        _HASHCOL_CACHE[path] = col
    return col


CACHE_SCHEMA = pa.schema(
    [
        ("url_hash", pa.uint64()),
        ("host_hash", pa.uint64()),
        ("status", pa.int32()),
        ("kind", pa.string()),
        ("body", pa.large_binary()),
        ("fmt", pa.string()),
        ("set_cookie", pa.string()),
    ]
)


class HttpCache:
    """Filesystem response cache keyed by request fingerprint
    (``url_hash`` — already the url+POST-body fingerprint, ST1).
    Cheap to serialize into task ``fn_kwargs``: holds only the
    directory path and bucket count."""

    def __init__(self, cache_dir: str, nbuckets: int = 64):
        self.cache_dir = cache_dir
        self.nbuckets = int(nbuckets)
        # Task-local write buffer (each Ray task deserializes its own
        # HttpCache copy): the fused round kernel turns it on so a
        # block's per-slice stores become ONE file write per touched
        # bucket per block instead of one per fetch slice.
        self._buffering = False
        self._buf: list[pa.Table] = []
        # Run epoch: entries from PRIOR runs (epoch < ours) are always
        # visible; entries from THIS run only for rounds < the lookup
        # round. Without the epoch, a warm re-run (round counter back
        # at 0) would see an empty cache. Chosen once per crawler —
        # concurrent writers against one cache dir are not supported
        # (neither are they in Scrapy's filesystem storage).
        self.epoch = self._next_epoch()

    def _next_epoch(self) -> int:
        mx = -1
        if os.path.isdir(self.cache_dir):
            for b in os.listdir(self.cache_dir):
                d = os.path.join(self.cache_dir, b)
                if not (b.startswith("bucket=") and os.path.isdir(d)):
                    continue
                for name in os.listdir(d):
                    parsed = self._parse_name(name)
                    if parsed is not None:
                        mx = max(mx, parsed[0])
        return mx + 1

    @staticmethod
    def _parse_name(name: str) -> tuple[int, int] | None:
        """file name → (epoch, round) or None."""
        if not name.endswith(".parquet") or not name.startswith("e"):
            return None
        try:
            parts = name.split("_")
            return int(parts[0][1:]), int(parts[2])
        except (IndexError, ValueError):
            return None

    @staticmethod
    def fingerprints(cache_dir: str) -> set[int]:
        """Every stored fingerprint in ``cache_dir`` regardless of
        epoch/round stamps — the compaction-proof accounting primitive
        for partial-hit assertions (compaction restamps merged files
        with the bucket-minimum epoch, so filename epochs cannot
        attribute entries to runs; set difference over snapshots can).
        One store happens per download, so |set| = downloads ever."""
        out: set[int] = set()
        if not os.path.isdir(cache_dir):
            return out
        for b in sorted(os.listdir(cache_dir)):
            d = os.path.join(cache_dir, b)
            if not (b.startswith("bucket=") and os.path.isdir(d)):
                continue
            for name in sorted(os.listdir(d)):
                if HttpCache._parse_name(name) is None:
                    continue
                col = pq.read_table(
                    os.path.join(d, name), columns=["url_hash"]
                )["url_hash"].to_numpy(zero_copy_only=False)
                out.update(int(x) for x in col)
        return out

    # ---------------- read side
    def _bucket_files(self, bucket: int, before_round: int) -> list[str]:
        d = os.path.join(self.cache_dir, f"bucket={bucket:03d}")
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            parsed = self._parse_name(name)
            if parsed is None:
                continue
            e, r = parsed
            if e < self.epoch or (e == self.epoch and r < before_round):
                out.append(os.path.join(d, name))
        return out

    def _buckets_for(self, host_hashes: np.ndarray) -> list[int]:
        return np.unique(
            host_hashes.astype(np.uint64) % np.uint64(self.nbuckets)
        ).tolist()

    @staticmethod
    def _file_overlaps(path: str, lo: int, hi: int) -> bool:
        """Parquet-footer prune: False when the file's url_hash min/max
        range (rows are stored SORTED by url_hash, so row-group stats
        are tight) cannot overlap [lo, hi]. Footer-only read."""
        try:
            md = pq.ParquetFile(path).metadata
            col_idx = md.schema.to_arrow_schema().get_field_index("url_hash")
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                if st is None or not st.has_min_max:
                    return True  # no stats → must read
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
            return fmin is not None and not (fmax < lo or fmin > hi)
        except Exception:
            return True  # unparsable footer → fall back to reading

    def hit_mask(self, url_hashes: np.ndarray, host_hashes: np.ndarray,
                 before_round: int) -> np.ndarray:
        """Membership probe for the admission kernel: True where the
        fingerprint has a cached response. Reads only url_hash columns
        of footer-overlapping files."""
        want = np.asarray(url_hashes, dtype=np.uint64)
        mask = np.zeros(len(want), dtype=bool)
        if not len(want):
            return mask
        lo, hi = int(want.min()), int(want.max())
        for b in self._buckets_for(np.asarray(host_hashes)):
            for f in self._bucket_files(int(b), before_round):
                if not self._file_overlaps(f, lo, hi):
                    continue
                mask |= np.isin(want, _hash_column(f))
        return mask

    def lookup(self, url_hashes: np.ndarray, host_hashes: np.ndarray,
               before_round: int) -> dict[int, tuple]:
        """fingerprint → (status, kind, body, fmt, set_cookie) for every
        cached row among ``url_hashes``. Full rows are read only from
        files that actually contain a requested fingerprint. Files are
        scanned in sorted name order; fingerprints are unique across a
        cache (one store per download), so order is cosmetic."""
        want = np.asarray(url_hashes, dtype=np.uint64)
        out: dict[int, tuple] = {}
        if not len(want):
            return out
        lo, hi = int(want.min()), int(want.max())
        for b in self._buckets_for(np.asarray(host_hashes)):
            for f in self._bucket_files(int(b), before_round):
                if not self._file_overlaps(f, lo, hi):
                    continue
                stored = _hash_column(f)
                hit = np.isin(stored, want)
                if not hit.any():
                    continue
                t = pq.read_table(f).filter(pa.array(hit))
                for fp, st, kd, bd, fm, sc in zip(
                    t["url_hash"].to_pylist(),
                    t["status"].to_pylist(),
                    t["kind"].to_pylist(),
                    t["body"].to_pylist(),
                    t["fmt"].to_pylist(),
                    t["set_cookie"].to_pylist(),
                ):
                    out.setdefault(int(fp), (st, kd, bd, fm, sc))
        return out

    # ---------------- write side
    def store(self, rows: pa.Table, round_no: int) -> None:
        """Append downloaded responses (CACHE_SCHEMA columns). One file
        per touched bucket per call, rows sorted by url_hash (tight
        parquet row-group stats for the footer prune), tmp-then-rename
        atomic."""
        if not rows.num_rows:
            return
        rows = rows.select(CACHE_SCHEMA.names).cast(CACHE_SCHEMA)
        if self._buffering:
            self._buf.append(rows)
            return
        self._write(rows, round_no)

    def begin_buffer(self) -> None:
        """Defer writes until :meth:`flush` (fused-kernel use: one file
        per touched bucket per BLOCK, not per fetch slice)."""
        self._buffering = True
        self._buf = []

    def flush(self, round_no: int) -> None:
        self._buffering = False
        if self._buf:
            self._write(pa.concat_tables(self._buf), round_no)
        self._buf = []

    def _write(self, rows: pa.Table, round_no: int) -> None:
        rows = rows.take(
            np.argsort(
                rows["url_hash"].to_numpy(zero_copy_only=False),
                kind="stable",
            )
        )
        hh = rows["host_hash"].to_numpy(zero_copy_only=False)
        buckets = hh.astype(np.uint64) % np.uint64(self.nbuckets)
        for b in np.unique(buckets):
            part = rows.filter(pa.array(buckets == b))
            d = os.path.join(self.cache_dir, f"bucket={int(b):03d}")
            os.makedirs(d, exist_ok=True)
            name = (f"e{self.epoch:04d}_round_{round_no:04d}_"
                    f"{uuid.uuid4().hex[:12]}.parquet")
            tmp = os.path.join(d, name + ".tmp")
            # bodies are jpeg/png/gzip-era payloads — already entropy
            # coded; parquet recompression only burns CPU on the crawl
            # hot path
            pq.write_table(part, tmp, compression="none")
            os.rename(tmp, os.path.join(d, name))

    # ---------------- maintenance
    def compact(self, max_files_per_bucket: int = 16) -> int:
        """Merge each over-threshold bucket's files into one sorted
        file so probe cost stays O(1) files per bucket instead of
        O(rounds × blocks). Driver-side only, BETWEEN rounds/runs (a
        task reading a merged-away file mid-compaction would miss
        entries). The merged file is stamped (epoch, round) = the
        bucket's MINIMUM so visibility never widens: entries already
        visible stay visible, and in-flight-round entries are never
        pulled forward (compaction input is everything on disk, which
        by the between-rounds contract is all < the next lookup round).
        Fingerprints are unique across a cache (one store per
        download), so merging never has to resolve duplicates.
        Returns the number of buckets compacted."""
        done = 0
        if not os.path.isdir(self.cache_dir):
            return done
        for b in sorted(os.listdir(self.cache_dir)):
            d = os.path.join(self.cache_dir, b)
            if not (b.startswith("bucket=") and os.path.isdir(d)):
                continue
            names = [n for n in sorted(os.listdir(d))
                     if self._parse_name(n) is not None]
            if len(names) <= max_files_per_bucket:
                continue
            parsed = [self._parse_name(n) for n in names]
            e_min = min(p[0] for p in parsed)
            r_min = min(p[1] for p in parsed if p[0] == e_min)
            merged = pa.concat_tables(
                [pq.read_table(os.path.join(d, n)) for n in names]
            )
            merged = merged.take(
                np.argsort(
                    merged["url_hash"].to_numpy(zero_copy_only=False),
                    kind="stable",
                )
            )
            name = (f"e{e_min:04d}_round_{r_min:04d}_"
                    f"{uuid.uuid4().hex[:12]}.parquet")
            tmp = os.path.join(d, name + ".tmp")
            pq.write_table(merged, tmp, compression="none")
            os.rename(tmp, os.path.join(d, name))
            for n in names:
                os.remove(os.path.join(d, n))
            done += 1
        return done
