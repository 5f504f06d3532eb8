"""URL-seen set — sharded cuckoo-filter actors keyed by xxh64(canonical_url).

Reference semantics: Scrapy's default ``RFPDupeFilter`` — an exact
in-memory set of request fingerprints, per spider process
(SURVEY.md ST1; settings.py has no override). 810 spiders bypass it
per-request via ``dont_filter=True`` (spiders/15walmer.py:112) — the
graft carries that as the ``skip_dedup`` frontier column.

Graft design (north rule):
  * ``url_hash % num_shards`` routes each candidate to one
    ``DedupShard`` actor;
  * each shard holds a **cuckoo filter** (numpy bucket array, 4-slot
    buckets, 16-bit fingerprints — the standard partial-key cuckoo
    layout of Fan et al., "Cuckoo Filter: Practically Better Than
    Bloom", CoNEXT'14) plus an **exact overflow side-table** so
    inserts never fail and membership never yields a false negative;
  * false *positives* would wrongly drop URLs and break the exact
    seen-set match the north rule demands, so every cuckoo hit is
    confirmed against a per-shard exact structure — ``SortedSet64``,
    a sorted uint64 array probed by vectorized binary search with a
    bounded recent-inserts set merged in periodically (8 B/key; a
    Python ``set`` at 10^10 URLs would cost ~70 B/key fleet-wide).
    The cuckoo array is the fast-path reject (the overwhelmingly
    common case at 10^10 scale: most candidates are NEW, and a cuckoo
    miss proves novelty without touching the exact structure).
    ``mode='exact'`` skips the filter entirely for oracle-equality
    tests.

Within-round first-wins is resolved by a **two-phase protocol** (no
shuffle): phase 1 registers every candidate's minimal
``(seq_parent, seq_link)`` per shard; phase 2 queries the winners and
atomically commits them to the seen set. Batches may arrive in any
order in either phase — the result is order-independent, which is what
makes an 8-CPU and a 32-CPU run produce identical frontiers.

Checkpoint: ``snapshot()`` returns the shard's seen hashes as a
uint64 array; ``restore()`` reloads them (spider_ray/frontier.py
writes/reads these per round).
"""

from __future__ import annotations

import numpy as np
import ray

_FP_BITS = 16
_SLOTS = 4


class CuckooFilter:
    """Partial-key cuckoo filter: numpy (nbuckets, 4) uint16 table.

    Fingerprints are 16-bit, 0 reserved for "empty". Alternate bucket
    index i2 = i1 XOR (fp * 0x5bd1e995) masked — the standard trick so
    either bucket is derivable from (other bucket, fp).
    """

    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nb = 1
        while nb * _SLOTS < capacity:
            nb <<= 1
        self.nbuckets = nb
        self.mask = nb - 1
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.stash: set[int] = set()  # overflow — keeps inserts lossless
        self.count = 0

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.mask)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        alt = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(self.mask)
        return (i1.astype(np.uint64) ^ alt).astype(np.int64)

    def contains_many(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership probe (may false-positive, never
        false-negative w.r.t. inserted keys)."""
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        t = self.table
        hit = (t[i1] == fp[:, None]).any(axis=1) | (t[i2] == fp[:, None]).any(axis=1)
        if self.stash:
            for j in np.nonzero(~hit)[0]:
                if int(h[j]) in self.stash:
                    hit[j] = True
        return hit

    def insert_many(self, h: np.ndarray) -> None:
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        t = self.table
        for j in range(len(h)):
            f = fp[j]
            a, b = i1[j], i2[j]
            row = t[a]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = f
                self.count += 1
                continue
            row = t[b]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = f
                self.count += 1
                continue
            # evict loop
            cur_i, cur_f = b, f
            placed = False
            for _ in range(self.MAX_KICKS):
                slot = int(cur_f) % _SLOTS
                cur_f, t[cur_i, slot] = t[cur_i, slot], cur_f
                alt = (int(cur_f) * 0x5BD1E995) & self.mask
                cur_i = cur_i ^ alt
                row = t[cur_i]
                free = np.nonzero(row == 0)[0]
                if len(free):
                    row[free[0]] = cur_f
                    placed = True
                    break
            if not placed:
                self.stash.add(int(h[j]))  # lossless overflow
            self.count += 1


class SortedSet64:
    """Exact uint64 membership at 8 bytes/key: a sorted numpy base
    array probed by binary search, plus a small recent-inserts Python
    set that merges into the base once it crosses a threshold.

    At the north rule's 10^10-URL scale a per-shard Python ``set``
    costs ~70 B/key fleet-wide (VERDICT r1 What's-wrong #8); this
    structure holds the same exact semantics at numpy array cost, with
    O(log n) vectorized probes and amortized-linear inserts.
    """

    MERGE_THRESHOLD = 1 << 16

    def __init__(self):
        self.base = np.empty(0, dtype=np.uint64)
        self.recent: set[int] = set()

    def __len__(self) -> int:
        return len(self.base) + len(self.recent)

    def nbytes(self) -> int:
        """Approximate resident bytes (base array + recent-set overhead)."""
        return int(self.base.nbytes) + len(self.recent) * 90

    def contains_many(self, h: np.ndarray) -> np.ndarray:
        out = np.zeros(len(h), dtype=bool)
        if len(h) == 0:
            return out
        if len(self.base):
            idx = np.clip(np.searchsorted(self.base, h), 0, len(self.base) - 1)
            out = self.base[idx] == h
        if self.recent:
            miss = np.nonzero(~out)[0]
            rec = self.recent
            for j in miss:
                if int(h[j]) in rec:
                    out[j] = True
        return out

    def add_many(self, h: np.ndarray) -> np.ndarray:
        """Insert; returns the subset of ``h`` that was actually new
        (unique, order unspecified)."""
        if len(h) == 0:
            return h
        fresh = np.unique(h[~self.contains_many(h)])
        self.recent.update(int(x) for x in fresh)
        if len(self.recent) >= self.MERGE_THRESHOLD:
            self._merge()
        return fresh

    def _merge(self) -> None:
        if not self.recent:
            return
        rec = np.fromiter(self.recent, dtype=np.uint64, count=len(self.recent))
        self.base = np.union1d(self.base, rec)
        self.recent = set()

    def to_array(self) -> np.ndarray:
        self._merge()
        return self.base.copy()

    @classmethod
    def from_array(cls, h: np.ndarray) -> "SortedSet64":
        s = cls()
        s.base = np.unique(np.asarray(h, dtype=np.uint64))
        return s


class _ShardState:
    """One shard's state — plain object, wrapped by the Ray actor below
    (kept separate so the oracle/tests can drive it without Ray)."""

    def __init__(self, capacity: int = 1 << 16, mode: str = "cuckoo"):
        self.mode = mode
        self.exact = SortedSet64()
        self.filter = CuckooFilter(capacity) if mode == "cuckoo" else None
        # round-keyed candidate registries: round -> {url_hash: min key}.
        # Keyed by round so round r's parse tasks can pre-register round
        # r+1's links while r's registry is still live.
        self.pending: dict[int, dict[int, tuple[int, int]]] = {}
        # round -> hash arrays committed DURING that round by in-task
        # push_commit. Round r's winner query exempts these from the
        # seen mask so a Ray-retried fused task reproduces its original
        # admit set instead of seeing its first attempt's commits and
        # silently dropping the block's URLs (ADVICE r3 medium). Safe:
        # every hash pushed in round r passed `win & ~seen`, i.e. was
        # unseen before round r, so the exemption can only restore the
        # pre-round state. Dropped with the registry in clear_pending.
        self.round_commits: dict[int, list[np.ndarray]] = {}

    # ---- cross-round membership
    def seen_mask(self, hashes: np.ndarray) -> np.ndarray:
        if self.filter is not None:
            maybe = self.filter.contains_many(hashes)
            out = np.zeros(len(hashes), dtype=bool)
            idx = np.nonzero(maybe)[0]
            if len(idx):
                # confirm cuckoo hits against the exact structure: no
                # false drops, and misses (the common case at scale)
                # never touch it
                out[idx] = self.exact.contains_many(hashes[idx])
            return out
        return self.exact.contains_many(np.asarray(hashes, dtype=np.uint64))

    # ---- two-phase within-round first-wins
    def register(self, hashes: np.ndarray, seq_parent: np.ndarray,
                 seq_link: np.ndarray, round_no: int):
        pend = self.pending.setdefault(round_no, {})
        for x, sp, sl in zip(hashes, seq_parent, seq_link):
            k = int(x)
            key = (int(sp), int(sl))
            old = pend.get(k)
            if old is None or key < old:
                pend[k] = key

    def commit_hashes(self, hashes: np.ndarray, round_no: int | None = None) -> int:
        """Mark these URLs seen (admitted-for-fetch or robots-blocked).
        NOT every round candidate: deferred rows must stay unseen so they
        can compete again next round. Returns number newly seen.

        ``round_no`` (passed by the in-task push path) records the
        commit in that round's exemption set — see ``round_commits``."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        if round_no is not None and len(hashes):
            self.round_commits.setdefault(int(round_no), []).append(hashes)
        fresh = self.exact.add_many(hashes)
        if self.filter is not None and len(fresh):
            self.filter.insert_many(fresh)
        return len(fresh)

    def committed_this_round(self, hashes: np.ndarray, round_no: int) -> np.ndarray:
        chunks = self.round_commits.get(int(round_no))
        if not chunks:
            return np.zeros(len(hashes), dtype=bool)
        return np.isin(
            np.asarray(hashes, dtype=np.uint64), np.concatenate(chunks)
        )

    def clear_pending(self, round_no: int) -> None:
        self.pending.pop(round_no, None)
        self.round_commits.pop(round_no, None)

    def winners(self, hashes: np.ndarray, seq_parent: np.ndarray,
                seq_link: np.ndarray, round_no: int) -> np.ndarray:
        """Phase-2 query: True where this row's (seq_parent, seq_link)
        equals the registered minimum for its URL in this round's
        registry. Callers AND this with ``~seen_mask`` (earlier-round
        membership) — see ``DedupShard.winners_and_seen``. Must run
        before commit clears the round's registry."""
        out = np.zeros(len(hashes), dtype=bool)
        pend = self.pending.get(round_no, {})
        for j, (x, sp, sl) in enumerate(zip(hashes, seq_parent, seq_link)):
            k = int(x)
            best = pend.get(k)
            if best is not None and best == (int(sp), int(sl)):
                out[j] = True
        return out

    def snapshot(self) -> np.ndarray:
        return self.exact.to_array()

    def restore(self, hashes: np.ndarray) -> None:
        self.exact = SortedSet64.from_array(hashes)
        if self.filter is not None and len(hashes):
            self.filter.insert_many(np.asarray(hashes, dtype=np.uint64))

    def size(self) -> int:
        return len(self.exact)


@ray.remote(num_cpus=0, scheduling_strategy="SPREAD")
class DedupShard:
    """Ray actor owning one seen-set shard (shard = url_hash % num_shards).

    ``num_cpus=0``: shard work is microseconds per call and the actor
    must never reserve scheduler capacity away from num_cpus=1
    fetch/parse tasks. This is not theoretical — at 4 CPUs, three
    crawls in one session (bench warm-up + measured passes) leaked
    24 × 0.1-CPU shard reservations, leaving <1 CPU available and
    starving every map task: a hard wedge, diagnosed from the raylet's
    "available: 0.8 CPU" debug state. ``SPREAD`` keeps the shards
    distributed across nodes on a real cluster now that no CPU
    resource does it implicitly. Explicit release is still available
    via :meth:`ShardedDedup.shutdown`.
    """

    def __init__(self, capacity: int = 1 << 16, mode: str = "cuckoo"):
        self.state = _ShardState(capacity, mode)

    def seen_mask(self, hashes):
        return self.state.seen_mask(np.asarray(hashes, dtype=np.uint64))

    def register(self, hashes, seq_parent, seq_link, round_no):
        self.state.register(
            np.asarray(hashes, dtype=np.uint64),
            np.asarray(seq_parent),
            np.asarray(seq_link),
            int(round_no),
        )
        return True

    def commit_hashes(self, hashes, round_no=None):
        return self.state.commit_hashes(
            np.asarray(hashes, dtype=np.uint64),
            None if round_no is None else int(round_no),
        )

    def clear_pending(self, round_no):
        self.state.clear_pending(int(round_no))
        return True

    def winners_and_seen(self, hashes, seq_parent, seq_link, round_no):
        h = np.asarray(hashes, dtype=np.uint64)
        win = self.state.winners(
            h, np.asarray(seq_parent), np.asarray(seq_link), int(round_no)
        )
        # commits made DURING this round don't count as seen for this
        # round's query, so a Ray-retried fused task that already
        # committed its admit set reproduces the same winner mask
        # instead of admitting zero rows (ADVICE r3 medium)
        seen = self.state.seen_mask(h) & ~self.state.committed_this_round(
            h, int(round_no)
        )
        return win & ~seen

    def snapshot(self):
        return self.state.snapshot()

    def restore(self, hashes):
        self.state.restore(np.asarray(hashes, dtype=np.uint64))
        return True

    def size(self):
        return self.state.size()


class ShardedDedup:
    """Driver-side facade over the shard actors.

    Round protocol (all batch-parallel, order-independent):
      1. ``register_batches(ds)`` — every candidate row registers its
         (url_hash → min seq) with its shard  (map_batches consume).
      2. ``winner_mask(batch)`` — per batch, rows ask their shards
         "am I the round winner and previously unseen?".
      3. ``commit(hashes)`` — the admitted/blocked subset enters the
         seen set (deferred rows stay unseen); registries clear.
    """

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 16,
                 mode: str = "cuckoo"):
        self.num_shards = num_shards
        self.shards = [
            DedupShard.remote(capacity_per_shard, mode) for _ in range(num_shards)
        ]

    def _route(self, url_hash: np.ndarray) -> np.ndarray:
        return (url_hash % np.uint64(self.num_shards)).astype(np.int64)

    def register_arrays(self, url_hash, seq_parent, seq_link, round_no) -> None:
        sid = self._route(url_hash)
        refs = []
        for s in range(self.num_shards):
            m = sid == s
            if m.any():
                refs.append(
                    self.shards[s].register.remote(
                        url_hash[m], seq_parent[m], seq_link[m], round_no
                    )
                )
        ray.get(refs)

    def winner_mask_arrays(self, url_hash, seq_parent, seq_link, round_no) -> np.ndarray:
        sid = self._route(url_hash)
        out = np.zeros(len(url_hash), dtype=bool)
        refs, idxs = [], []
        for s in range(self.num_shards):
            m = np.nonzero(sid == s)[0]
            if len(m):
                refs.append(
                    self.shards[s].winners_and_seen.remote(
                        url_hash[m], seq_parent[m], seq_link[m], round_no
                    )
                )
                idxs.append(m)
        for m, r in zip(idxs, ray.get(refs)):
            out[m] = r
        return out

    def push_commit(self, url_hash: np.ndarray, round_no: int | None = None) -> int:
        """Mark URLs seen WITHOUT clearing a registry — safe to call from
        parallel tasks (set insert is order-independent). The round's
        registry is dropped separately via :meth:`clear_round` once every
        push has completed. Pass ``round_no`` from in-task pushes so a
        Ray task retry reproduces its winner mask (round-aware seen)."""
        url_hash = np.asarray(url_hash, dtype=np.uint64)
        sid = self._route(url_hash)
        refs = []
        for s in range(self.num_shards):
            m = sid == s
            if m.any():
                refs.append(
                    self.shards[s].commit_hashes.remote(url_hash[m], round_no)
                )
        return int(sum(ray.get(refs))) if refs else 0

    def clear_round(self, round_no: int) -> None:
        ray.get([s.clear_pending.remote(round_no) for s in self.shards])

    def commit(self, url_hash: np.ndarray, round_no: int) -> int:
        """Mark fetched/blocked URLs seen and drop the round's registry."""
        n = self.push_commit(url_hash)
        self.clear_round(round_no)
        return n

    def seen_mask_arrays(self, url_hash: np.ndarray) -> np.ndarray:
        sid = self._route(url_hash)
        out = np.zeros(len(url_hash), dtype=bool)
        refs, idxs = [], []
        for s in range(self.num_shards):
            m = np.nonzero(sid == s)[0]
            if len(m):
                refs.append(self.shards[s].seen_mask.remote(url_hash[m]))
                idxs.append(m)
        for m, r in zip(idxs, ray.get(refs)):
            out[m] = r
        return out

    def snapshot(self) -> list[np.ndarray]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list[np.ndarray]) -> None:
        ray.get([s.restore.remote(h) for s, h in zip(self.shards, snaps)])

    def total_seen(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self.shards])))

    def shutdown(self) -> None:
        """Release the shard actors now rather than whenever the last
        pickled handle (task lineage, stats, driver locals) is
        garbage-collected — repeated crawls in one session otherwise
        accumulate idle shard processes. Idempotent."""
        for s in self.shards:
            try:
                ray.kill(s, no_restart=True)
            except Exception:
                pass
        self.shards = []
