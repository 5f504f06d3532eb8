"""StreamingCrawler — the 10^10-frontier execution mode.

`frontier.Crawler` holds each round's (thin) frontier table on the
driver: correct and fast up to ~10^7-10^8 rows/round, but at the north
rule's 10^10-URL scale a round can exceed driver memory. This variant
keeps EVERYTHING off the driver:

  * the frontier travels between rounds as materialized object-store
    blocks (``self._carry``); the per-round parquet partition
    directories (``work_dir/frontier/round_XXXX/``) are CHECKPOINTS,
    written by async per-block tasks off the critical path and only
    ever read back at resume;
  * working sets (winner/admit output, parse output) are
    ``materialize()``-d Datasets — blocks in the object store, spilled
    to disk under pressure, never concatenated on the driver;
  * items and images stream to per-round parquet partitions from
    inside the parse tasks;
  * the driver touches only: lineage counters (tiny aggregates), dedup
    shard snapshots, and checkpoint bookkeeping.

Politeness is SHUFFLE-FREE in the round loop (round 4): the
deterministic order key is host-major, so the next-frontier seq sort
doubles as the host-aligning partitioner — carry blocks are cut only
at host boundaries, every block holds whole hosts, and admission runs
the fused driver-mode kernel one task per block. The per-round
``groupby(host_hash)`` all-to-all (the streaming mode's 1.89× premium
over the fused driver path in round 3) is gone; the seq sort is the
round loop's only all-to-all.

Dense-seq assignment without a driver sort: ``Dataset.sort`` by the
host-major deterministic key, then per-block rank offsets computed
from block metadata (row counts) and stamped by one remote task per
block — the zipWithIndex the Dataset API lacks, expressed in ~15 lines
of raw Ray (SURVEY.md §2: raw tasks only where the Dataset API
genuinely can't).

Semantics are IDENTICAL to `frontier.Crawler` — asserted by
tests/test_streaming.py on shared worlds (same seen-set, same per-round
admitted counts, same item/image outputs).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .dedup import ShardedDedup
from .fetch import fetch_batch
from .frontier import (
    _parse_fn,
    _register_table,
    dataset_from_refs,
    from_local_tables,
    make_seed_frontier,
    parse_rows_to_frontier,
)
from .schema import FRONTIER_SCHEMA
from .synth import WorldConfig


@ray.remote
def _stamp_block(base_seq: int, round_no: int, dedup: ShardedDedup | None,
                 off: int, length: int, *blocks: pa.Table):
    """One carry-block's worth of the sorted next frontier: concat
    consecutive small sort-output blocks, or SLICE ``[off, off+length)``
    out of one oversized block (the caller re-blocks the sort output to
    ~4-blocks-per-CPU — both directions matter, see the caller), stamp
    dense seq (base + row offset) + round, and pre-register with round
    ``round_no``'s dedup registries (registration is min-merging and
    idempotent, so overlapping with the parse tasks' link registration
    is safe). Deterministic: block order and contents come from the
    deterministic distributed sort. The ``ray.get`` barrier on these
    tasks guarantees registration completes before the round runs; the
    parquet CHECKPOINT write is a separate task (:func:`_write_part`)
    kept OFF the round's critical path."""
    block = (
        pa.concat_tables(blocks, promote_options="default")
        if len(blocks) > 1 else blocks[0]
    )
    if off or length < block.num_rows:
        block = block.slice(off, length).combine_chunks()
    n = block.num_rows
    t = block.set_column(
        block.schema.get_field_index("seq"),
        "seq",
        pa.array(np.arange(base_seq, base_seq + n, dtype=np.int64), pa.int64()),
    )
    t = t.set_column(
        t.schema.get_field_index("round"),
        "round",
        pa.array(np.full(n, round_no, dtype=np.int32), pa.int32()),
    )
    t = t.cast(FRONTIER_SCHEMA)
    if dedup is not None:
        _register_table(dedup, t, round_no)
    # second output: block metadata, so the driver can assemble the
    # next round's carry Dataset without per-block metadata tasks
    # (frontier.dataset_from_refs) and barrier on ~100-byte refs
    # instead of pulling every stamped table into driver heap
    from ray.data.block import BlockExecStats, BlockMetadataWithSchema

    meta = BlockMetadataWithSchema.from_block(
        t, stats=BlockExecStats.builder().build()
    )
    return t, meta


@ray.remote
def _write_part(t: pa.Table, out_path: str) -> int:
    pq.write_table(t, out_path)
    return t.num_rows


@ray.remote
def _host_bounds(block: pa.Table) -> tuple[int, int, np.ndarray]:
    """Per sort-output block: (first host_hash, last host_hash, local
    row offsets where the host changes). Tiny outputs — the driver uses
    them to choose carry-block cut points that fall ONLY on host
    boundaries, so every carry block holds whole hosts and the next
    round's admission runs shuffle-free per block."""
    hh = block["host_hash"].to_numpy(zero_copy_only=False)
    ch = (np.nonzero(np.diff(hh))[0] + 1).astype(np.int64)
    return int(hh[0]), int(hh[-1]), ch


@ray.remote
def _finalize_round(seen_snaps: list, seen_dir: str, lineage_path: str,
                    lineage_row: dict, *write_results) -> bool:
    """Durability tail of a round, off the critical path: runs only
    after every next-frontier parquet part landed (``write_results``
    are the :func:`_write_part` outputs — Ray resolves them before
    scheduling this task), then writes the seen snapshot + lineage
    json. The seen-snapshot directory is the round-complete marker, so
    the resume invariant — marker present ⇒ next frontier durable — is
    preserved exactly even though the crawl loop never blocks on
    checkpoint IO."""
    del write_results  # dependency barrier only
    os.makedirs(os.path.dirname(lineage_path), exist_ok=True)
    os.makedirs(seen_dir, exist_ok=True)
    for s, snap in enumerate(seen_snaps):
        np.save(os.path.join(seen_dir, f"shard_{s:03d}.npy"), snap)
    with open(lineage_path, "w") as f:
        json.dump(lineage_row, f)
    return True


@ray.remote(num_cpus=0)
class _RoundStats:
    """Order-independent per-round counter sink: pipeline tasks push
    their batch counts here instead of the driver running an extra
    count execution per round (the launch overheads were the streaming
    mode's fixed-cost premium). Tasks ``ray.get`` their add() so the
    execution barrier implies delivery. ``token`` makes adds
    idempotent under Ray task retries (a re-executed batch pushes the
    same token and is ignored) — without it a retried task would
    double-count its batch."""

    def __init__(self):
        self.rounds: dict[int, dict[str, int]] = {}
        self.seen: set = set()
        self.cookies: dict[int, dict[str, str]] = {}

    def add(self, round_no: int, counts: dict, token=None) -> bool:
        if token is not None:
            key = (int(round_no), token)
            if key in self.seen:
                return True
            self.seen.add(key)
        d = self.rounds.setdefault(int(round_no), {})
        for k, v in counts.items():
            d[k] = d.get(k, 0) + int(v)
        return True

    def add_cookies(self, round_no: int, pairs: list, token=None) -> bool:
        """CookiesMiddleware harvest sink: (host, Set-Cookie) pairs
        discovered by parse tasks. Last-write-wins per host is safe —
        a host's session value is deterministic, so every task that
        sees it pushes the same pair (idempotent by construction; the
        token guard still dedups retried batches)."""
        if token is not None:
            key = (int(round_no), "ck", token)
            if key in self.seen:
                return True
            self.seen.add(key)
        self.cookies.setdefault(int(round_no), {}).update(dict(pairs))
        return True

    def get(self, round_no: int) -> dict:
        return dict(self.rounds.get(int(round_no), {}))

    def get_cookies(self, round_no: int) -> dict:
        return dict(self.cookies.get(int(round_no), {}))

    def clear(self, round_no: int) -> bool:
        """Drop a completed round's counters + tokens (bounds actor
        memory over a long crawl — the stats analog of
        ``dedup.clear_round``)."""
        r = int(round_no)
        self.rounds.pop(r, None)
        self.cookies.pop(r, None)
        self.seen = {k for k in self.seen if k[0] != r}
        return True


def _batch_token(stage: str, batch) -> tuple | None:
    """Retry-stable batch identity: stage + first key + row count
    (batch contents are deterministic per pipeline position)."""
    n = batch.num_rows if hasattr(batch, "num_rows") else len(batch)
    if n == 0:
        return None
    if hasattr(batch, "column_names"):
        first = batch["url_hash"][0].as_py() if "url_hash" in batch.column_names \
            else batch[batch.column_names[0]][0].as_py()
    else:
        first = int(batch["url_hash"].iloc[0]) if "url_hash" in batch.columns \
            else None
    return (stage, int(first) if first is not None else -1, int(n))


def _parse_count_fn(batch: pa.Table, *, stats, round_no: int, **kw) -> pa.Table:
    """_parse_fn + rowtype tallies pushed to the stats actor (replaces
    the driver's per-round counts execution) + in-task conversion of
    the link/retry rows to next-frontier rows (r4: the conversion used
    to be a second execution mapping over the materialized parse
    output; items/images already stream to parquet in-task and counts
    ride the stats actor, so the parse output's ONLY consumer is the
    next frontier — return it directly and the round is ONE execution,
    the same shape as the fused driver mode)."""
    out = _parse_fn(batch, round_no=round_no, **kw)
    rt = out["rowtype"].to_pylist()
    counts: dict[str, int] = {}
    for v in rt:
        counts[v] = counts.get(v, 0) + 1
    tok = _batch_token("parse", batch)
    if tok is not None and counts:
        ray.get(stats.add.remote(round_no, counts, tok))
    if counts.get("cookie"):
        # harvested Set-Cookie pairs ride the stats actor to the
        # driver's jar (tiny per-host metadata, like the counters)
        ck = out.filter(pc.equal(out["rowtype"], "cookie"))
        ray.get(stats.add_cookies.remote(
            round_no,
            list(zip(ck["host"].to_pylist(),
                     ck["cookie_value"].to_pylist())),
            tok,
        ))
    return _to_frontier_rows(out, cfg=kw.get("cfg"))


def _stash_deferred(tbl: pa.Table, stage_dir: str) -> None:
    """Write deferred frontier rows to the round's staging partition
    from inside a task (they rejoin the next frontier's union). The
    filename is derived from the batch's url_hash content, so a RETRIED
    task overwrites its own part instead of duplicating rows (duplicate
    frontier rows would share the dedup min-key and could double-admit)."""
    from .hashing import xxh64

    os.makedirs(stage_dir, exist_ok=True)
    t = tbl.select(FRONTIER_SCHEMA.names).cast(FRONTIER_SCHEMA)
    name = xxh64(
        np.sort(t["url_hash"].to_numpy(zero_copy_only=False)).tobytes()
    )
    pq.write_table(t, os.path.join(stage_dir, f"part-{name:016x}.parquet"))


def _fused_admit_fn(batch: pa.Table, *, dedup: ShardedDedup, cfg, stats,
                    round_window_ms: int, obey_robots: bool, round_no: int,
                    stage_dir: str, cache=None) -> pa.Table:
    """Shuffle-free admission over ONE host-aligned carry block: sort
    (host_hash, seq) in-task (defensive — carry blocks arrive already
    in that order), fused winner+admit (the driver-mode kernel), then
    commit/stash/count. Because every carry block holds whole hosts
    (host-major seq sort + host-boundary cuts in the stamp), this
    replaces the per-round groupby(host_hash) all-to-all that was the
    streaming mode's 1.89× premium over the fused driver path
    (VERDICT r3 Next-round #1)."""
    from .frontier import _winner_admit_fn

    order = pc.sort_indices(
        batch, sort_keys=[("host_hash", "ascending"), ("seq", "ascending")]
    )
    out = _winner_admit_fn(
        batch.take(order), dedup=dedup, cfg=cfg,
        round_window_ms=round_window_ms, obey_robots=obey_robots,
        round_no=round_no, cache=cache,
    )
    tok = _batch_token("win", batch)
    if tok is not None:
        ray.get(stats.add.remote(round_no, {"winner_rows": out.num_rows}, tok))
    return _commit_stash_fn(out, dedup=dedup, stats=stats, round_no=round_no,
                            stage_dir=stage_dir)


def _commit_stash_fn(batch: pa.Table, *, dedup: ShardedDedup, stats,
                     round_no: int, stage_dir: str) -> pa.Table:
    """Post-admission stage, fused in-pipeline: commit admitted|blocked
    to the seen set, stash politeness-deferred rows to staging, push
    tallies, and pass ONLY the admitted rows on to fetch+parse."""
    adm = batch["admitted"]
    blk = batch["blocked"]
    # dont_filter rows are never fingerprinted as seen (driver-mode
    # kernel does the same — Scrapy skips the dupefilter entirely)
    hashes = batch.filter(
        pc.and_(pc.or_(adm, blk), pc.invert(batch["skip_dedup"]))
    )["url_hash"].to_numpy(zero_copy_only=False)
    if len(hashes):
        dedup.push_commit(hashes, round_no)
    deferred = batch.filter(pc.and_(pc.invert(adm), pc.invert(blk)))
    if deferred.num_rows:
        _stash_deferred(deferred.drop_columns(["admitted", "blocked"]), stage_dir)
    tok = _batch_token("commit", batch)
    if tok is not None:
        ray.get(
            stats.add.remote(
                round_no,
                {
                    "admitted": int(pc.sum(adm).as_py() or 0),
                    "blocked": int(pc.sum(blk).as_py() or 0),
                    "deferred": deferred.num_rows,
                },
                tok,
            )
        )
    return batch.filter(adm).drop_columns(["admitted", "blocked"])


def _to_frontier_rows(batch: pa.Table, cfg=None) -> pa.Table:
    """Parse-output batch → next-frontier rows: links and retries in
    ONE pass over the block (round 2 ran two filter+map chains over the
    materialized parse output and unioned them — twice the block
    reads for the same rows)."""
    links = parse_rows_to_frontier(
        batch.filter(pc.equal(batch["rowtype"], "link")), is_retry=False,
        cfg=cfg,
    )
    retries = parse_rows_to_frontier(
        batch.filter(pc.equal(batch["rowtype"], "retry")), is_retry=True,
        cfg=cfg,
    )
    if retries.num_rows == 0:
        return links
    if links.num_rows == 0:
        return retries
    return pa.concat_tables([links, retries])


class StreamingCrawler:
    def __init__(
        self,
        cfg: WorldConfig,
        captions: list[str] | None = None,
        *,
        work_dir: str,
        num_dedup_shards: int = 8,
        dedup_mode: str = "cuckoo",
        obey_robots: bool = True,
        round_window_ms: int = 60_000,
        fetch_batch_size: int = 512,
        max_rounds: int = 64,
        small_round_threshold: int = 100_000,
        http_cache_dir: str | None = None,
    ):
        self.cfg = cfg
        self.captions = captions or ["synthetic caption"]
        self.captions_ref = ray.put(self.captions)
        self.work_dir = work_dir
        self.frontier_root = os.path.join(work_dir, "frontier")
        self.images_out_dir = os.path.join(work_dir, "images")
        self.items_out_dir = os.path.join(work_dir, "items")
        self.seen_dir = os.path.join(work_dir, "seen")
        os.makedirs(self.frontier_root, exist_ok=True)
        self.dedup = ShardedDedup(num_dedup_shards, mode=dedup_mode)
        self.obey_robots = obey_robots
        self.round_window_ms = round_window_ms
        self.fetch_batch_size = fetch_batch_size
        self.max_rounds = max_rounds
        # below this many expected next-frontier rows, skip the
        # distributed sort (driver Arrow sort, one part) — the
        # streaming mode's small-round fast path
        self.small_round_threshold = small_round_threshold
        self.lineage: list[dict] = []
        # HTTPCACHE_ENABLED analog (see spider_ray.httpcache)
        if http_cache_dir:
            from .httpcache import HttpCache

            self.http_cache: "HttpCache | None" = HttpCache(http_cache_dir)
        else:
            self.http_cache = None
        # CookiesMiddleware jar (see frontier.Crawler.cookie_jar)
        self.cookie_jar: dict[str, str] = {}
        self._stats = _RoundStats.remote()
        # next round's frontier carried as materialized object-store
        # blocks — the parquet partition is only the CHECKPOINT (written
        # async by _write_part/_finalize_round), never re-read on the
        # round's critical path except at resume
        self._carry: rd.Dataset | None = None
        self._carry_rows = 0
        self._pending_finalize: list = []

    # ---------------- paths
    def _frontier_dir(self, r: int) -> str:
        return os.path.join(self.frontier_root, f"round_{r:04d}")

    def _jar(self) -> dict | None:
        """See frontier.Crawler._jar (COOKIES_ENABLED=False analog)."""
        if not self.cfg.cookies_enabled:
            return None
        return dict(self.cookie_jar) or None

    # ---------------- resume
    def resume(self) -> int | None:
        """Restore from the newest completed round's seen snapshot and
        continue from its already-written next-frontier partition.
        Returns the resume round number, or None when there is no state.
        A round is complete iff its seen snapshot exists (written last);
        a later, partially-written frontier partition is rewritten by
        the deterministic per-block stamping on re-run."""
        if not os.path.isdir(self.seen_dir):
            return None
        done = sorted(
            d for d in os.listdir(self.seen_dir) if d.startswith("round_")
        )
        if not done:
            return None
        last = int(done[-1].split("_")[1])
        snap_dir = os.path.join(self.seen_dir, done[-1])
        snaps = [
            np.load(os.path.join(snap_dir, f))
            for f in sorted(os.listdir(snap_dir))
        ]
        self.dedup.restore(snaps)
        for d in done:
            lp = os.path.join(self.work_dir, "lineage", d + ".json")
            if os.path.exists(lp):
                with open(lp) as f:
                    row = json.load(f)
                self.lineage.append(row)
                if self.cfg.cookies_enabled:
                    self.cookie_jar.update(row.get("cookies_learned") or {})
        return last + 1

    def close(self) -> None:
        """Release the dedup shard actors (see Crawler.close)."""
        self.dedup.shutdown()

    # ---------------- loop
    def crawl(self, seeds: list) -> dict:
        start = self.resume()
        if start is None:
            # seed frontier enters through the same stamping path as
            # every later round: host-aligned carry + checkpoint write
            # + round-0 dedup registration, all in one place
            seed_tbl = make_seed_frontier(seeds, cfg=self.cfg)
            if seed_tbl.num_rows:
                _, wrefs = self._stamp_next_frontier(
                    from_local_tables(seed_tbl), 0, seed_tbl.num_rows
                )
                ray.get(wrefs)
            start = 0
        # on resume the round's carry is rebuilt from its checkpoint
        # inside _run_round (fresh shard actors re-register there)
        r = start
        total_fetched = total_items = total_images = 0
        for row in self.lineage:  # restored rounds' contributions
            total_fetched += row["rows_admitted"]
            total_items += row["items_emitted"]
            total_images += row["images_written"]
        while r < self.max_rounds:
            if self._carry is None:
                fdir = self._frontier_dir(r)
                if not os.path.isdir(fdir) or not any(
                    f.endswith(".parquet") for f in os.listdir(fdir)
                ):
                    break  # exhausted frontier (resume of a finished crawl)
            stats = self._run_round(r)
            total_fetched += stats["rows_admitted"]
            total_items += stats["items_emitted"]
            total_images += stats["images_written"]
            r += 1
            if stats["next_rows"] == 0:
                break
        if self._pending_finalize:
            ray.get(self._pending_finalize)  # checkpoints durable on return
            self._pending_finalize = []
        if self.http_cache is not None:
            self.http_cache.compact()  # no tasks in flight past here
        return {
            "rounds": r,
            "fetched": total_fetched,
            "seen": self.dedup.total_seen(),
            "items": total_items,
            "images": total_images,
        }

    def _run_round(self, r: int) -> dict:
        if self._carry is not None:
            # frontier carried as host-aligned materialized blocks from
            # the previous round's stamp — no parquet round-trip, row
            # count known exactly
            ds, rows_in = self._carry, self._carry_rows
            self._carry = None
        else:
            # resume (or a checkpoint-only entry): rebuild the
            # host-aligned carry from the checkpoint partition via the
            # stamping path — re-sorts, re-stamps identical seq values
            # (seq is a pure rank of the host-major key), re-registers
            # the fresh shard actors' round-r registries, and re-writes
            # the same checkpoint. All idempotent.
            src = rd.read_parquet(self._frontier_dir(r)).materialize()
            rows_in, wrefs = self._stamp_next_frontier(src, r, src.count())
            ray.get(wrefs)
            if self._carry is None:  # empty checkpoint partition
                self._carry = from_local_tables(FRONTIER_SCHEMA.empty_table())
            ds, self._carry = self._carry, None

        # THE round execution, shuffle-free: every carry block holds
        # whole hosts (host-major seq sort + host-boundary cuts), so
        # fused winner→admit→commit→stash runs as ONE task per block,
        # then fetch+parse pipeline behind it — one execution per
        # round with NO all-to-all (the only shuffle left in the round
        # loop is the next-frontier seq sort). Round 1 ran four
        # executions with three materialize barriers and a politeness
        # groupby shuffle; rounds 2-3 fused the stages but kept the
        # groupby. All lineage counters ride to the stats actor from
        # inside the tasks.
        stage_dir = os.path.join(self.work_dir, "deferred", f"round_{r:04d}")
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)  # incomplete prior attempt
        for d in (self.images_out_dir, self.items_out_dir):
            part = os.path.join(d, f"round_{r:04d}")
            if os.path.exists(part):
                shutil.rmtree(part)
        admitted_ds = ds.map_batches(
            _fused_admit_fn,
            fn_kwargs={"dedup": self.dedup, "cfg": self.cfg,
                       "stats": self._stats,
                       "round_window_ms": self.round_window_ms,
                       "obey_robots": self.obey_robots,
                       "round_no": r, "stage_dir": stage_dir,
                       "cache": self.http_cache},
            batch_format="pyarrow",
            batch_size=None,  # one call per host-aligned carry block
        )
        parse_mat = (
            admitted_ds.map_batches(
                fetch_batch,
                fn_kwargs={"cfg": self.cfg, "captions_ref": self.captions_ref,
                           "cookies": self._jar(),
                           "cache": self.http_cache, "round_no": r},
                batch_format="pyarrow",
                batch_size=self.fetch_batch_size,
            )
            .map_batches(
                _parse_count_fn,
                fn_kwargs={
                    "cfg": self.cfg,
                    "images_out_dir": self.images_out_dir,
                    "items_out_dir": self.items_out_dir,
                    "round_no": r,
                    "dedup": self.dedup,
                    "stats": self._stats,
                },
                batch_format="pyarrow",
                batch_size=self.fetch_batch_size,
            )
            .materialize()
        )
        if os.environ.get("SPIDER_RAY_STATS") == "1":
            print(parse_mat.stats())
        self.dedup.clear_round(r)
        counts = ray.get(self._stats.get.remote(r))
        new_cookies = ray.get(self._stats.get_cookies.remote(r))
        if self.cfg.cookies_enabled:
            self.cookie_jar.update(new_cookies)
        rows_admitted = int(counts.get("admitted", 0))
        blocked_n = int(counts.get("blocked", 0))
        rows_unique = int(counts.get("winner_rows", 0))
        deferred_n = int(counts.get("deferred", 0))

        # next frontier: the parse tasks already emitted frontier rows
        # (links+retries converted in-task); union the admission-
        # deferred stash and stamp. The parquet partition is written
        # asynchronously.
        nxt = parse_mat
        if os.path.isdir(stage_dir) and any(
            f.endswith(".parquet") for f in os.listdir(stage_dir)
        ):
            # deferred rows stashed in-task by admission
            nxt = nxt.union(rd.read_parquet(stage_dir))
        expected_next = (
            int(counts.get("link", 0)) + int(counts.get("retry", 0)) + deferred_n
        )
        next_rows, write_refs = self._stamp_next_frontier(nxt, r + 1, expected_next)
        # deferred/retry rows re-register for round r+1 inside the
        # stamping (stamp tasks / driver fast path); links were already
        # registered by the parse tasks — both idempotent

        row = {
            "round": r,
            "rows_in": int(rows_in),
            "rows_deduped": int(rows_in - rows_unique),
            "rows_admitted": rows_admitted,
            "rows_deferred": int(deferred_n),
            "rows_fetched": rows_admitted,
            "rows_failed": int(counts.get("fail", 0)) + blocked_n,
            "items_emitted": int(counts.get("item", 0)),
            "images_written": int(counts.get("image", 0)),
            "rows_offsite": int(counts.get("offsite", 0)),
            "cookies_learned": dict(new_cookies),
            "next_rows": int(next_rows),
            "checkpoint_path": self._frontier_dir(r + 1),
        }
        self.lineage.append(row)
        # durability tail runs async: parquet parts → seen snapshot
        # (the round-complete marker) → lineage json, in that order,
        # none of it on the next round's critical path. The snapshot
        # CONTENT is taken now (end-of-round dedup state); only the
        # file IO is deferred.
        fin = _finalize_round.remote(
            self.dedup.snapshot(),
            os.path.join(self.seen_dir, f"round_{r:04d}"),
            os.path.join(self.work_dir, "lineage", f"round_{r:04d}.json"),
            row,
            *write_refs,
        )
        self._pending_finalize.append(fin)
        if len(self._pending_finalize) > 2:  # bound outstanding checkpoints
            ray.get(self._pending_finalize.pop(0))
        ray.get(self._stats.clear.remote(r))  # bound actor memory
        return row

    def _stamp_next_frontier(
        self, nxt: rd.Dataset, round_no: int,
        expected_rows: int | None = None,
    ) -> tuple[int, list]:
        """Dense seq + round-(r+1) dedup registration over the next
        frontier; the stamped blocks are CARRIED in the object store as
        ``self._carry`` for the next round, and the parquet partition
        write returns as pending refs (the caller chains them into the
        async round finalizer — checkpoint IO never blocks the loop).
        Two paths:

        * small round (≤ ``small_round_threshold`` expected rows): the
          distributed sort's fixed barrier cost dwarfs the work —
          collect the thin frontier, Arrow-sort on the driver
          (identical key), register driver-side, carry one block.
          Bounded by the threshold, so driver memory stays capped.
        * large round: distributed sort by the deterministic key, then
          per-block rank offsets from block metadata + one stamping
          task per block (each task also registers its rows; the
          ``ray.get`` barrier is what orders registration before the
          next round's winner filter)."""
        out_dir = self._frontier_dir(round_no)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        self._carry, self._carry_rows = None, 0
        if expected_rows is not None and expected_rows <= self.small_round_threshold:
            from ray.data.dataset import MaterializedDataset

            from .frontier import assign_seq

            # the parse output arrives already materialized (frontier
            # rows are emitted in-task); only a stash union needs an
            # execution here
            mat = (
                nxt if isinstance(nxt, MaterializedDataset)
                else nxt.materialize()
            )
            tbl = pa.concat_tables(
                ray.get(mat.to_arrow_refs()), promote_options="default"
            )
            if tbl.num_rows == 0:
                return 0, []
            t = assign_seq(tbl.cast(FRONTIER_SCHEMA), round_no)
            _register_table(self.dedup, t, round_no)
            # carry in ~TARGET-row HOST-ALIGNED slices (cut only at host
            # boundaries — assign_seq's host-major sort already placed
            # each host contiguously): every carry block holds whole
            # hosts, so the next round's winner+admit runs as one
            # shuffle-free task per block. Multiple slices, not one
            # block: a small round feeding a big one (seeds → listing
            # fan-out) must not hand the next round a 1-block frontier.
            from .frontier import _host_aligned_slices

            ncpu = int(ray.cluster_resources().get("CPU", 32))
            # ~4 waves: host-aligned blocks have data-dependent work
            # (image-format mix varies by host); 2 waves left a
            # straggler tail (same measurement as Crawler.max_parallel_blocks)
            tgt = int(np.clip(t.num_rows // (4 * ncpu) + 1, 256, 65_536))
            self._carry = from_local_tables(
                _host_aligned_slices(t, max(1, -(-t.num_rows // tgt)))
            )
            self._carry_rows = t.num_rows
            wref = _write_part.remote(
                t, os.path.join(out_dir, "part-000000000000.parquet")
            )
            return t.num_rows, [wref]
        sorted_mat = nxt.sort(
            ["host_hash", "seq_parent", "seq_link", "canonical_url"]
        ).materialize()
        bundles = list(sorted_mat.iter_internal_ref_bundles())
        blocks = [
            (ref, meta) for b in bundles for ref, meta in b.blocks
            if meta.num_rows
        ]
        # re-block the sort output into ~TARGET-row stamp groups whose
        # cuts fall ONLY on host boundaries (the host-major sort key
        # placed each host contiguously): every carry block then holds
        # whole hosts, so the next round's winner+admit runs as one
        # shuffle-free task per block — the per-round
        # groupby(host_hash) is gone and the seq sort is the round
        # loop's only all-to-all (VERDICT r3 Next-round #1). The
        # re-block works in BOTH directions: coalesce consecutive
        # small blocks (a micro-block carry turns every downstream map
        # stage into a micro-task storm) AND split oversized ones
        # (a 1-block frontier would run the next round serially, and
        # the collapse is self-perpetuating round over round). A host
        # larger than TARGET stays whole — the politeness budget
        # bounds its admitted rows regardless, and its block cost is
        # its pending-row count, same as the driver mode's
        # host-aligned slices. Target ≈ 4 blocks per CPU, capped at
        # 64k rows/block.
        nrows_list = [meta.num_rows for _, meta in blocks]
        total = int(sum(nrows_list))
        if total == 0:
            return 0, []
        ncpu = int(ray.cluster_resources().get("CPU", 32))
        # ~4 waves (see the small-path comment above)
        TARGET = int(np.clip(total // (4 * ncpu) + 1, 256, 65_536))
        # host boundaries as global row offsets (one tiny task per sort
        # block: first/last host + local change offsets)
        binfo = ray.get([_host_bounds.remote(ref) for ref, _ in blocks])
        gb: list[int] = []
        gstart = 0
        prev_last = None
        for (first, last, ch), n in zip(binfo, nrows_list):
            if prev_last is not None and first != prev_last:
                gb.append(gstart)
            if len(ch):
                gb.extend((np.int64(gstart) + ch).tolist())
            gstart += n
            prev_last = last
        bounds = np.unique(np.asarray(gb, dtype=np.int64))
        nparts = max(1, -(-total // TARGET))
        cuts: list[int] = []
        if len(bounds) and nparts > 1:
            targets = np.linspace(0, total, nparts + 1)[1:-1]
            cuts = sorted(
                {
                    int(bounds[min(np.searchsorted(bounds, x), len(bounds) - 1)])
                    for x in targets
                }
            )
            cuts = [c for c in cuts if 0 < c < total]
        block_starts = np.cumsum([0] + nrows_list)
        stamped, stamped_meta, write_refs = [], [], []
        base = 0
        for part_idx, (s, e) in enumerate(
            zip([0] + cuts, cuts + [total])
        ):
            # sort blocks covering [s, e): _stamp_block concats them and
            # slices the range out (global offsets are concat offsets)
            i = int(np.searchsorted(block_starts, s, side="right") - 1)
            j = int(np.searchsorted(block_starts, e, side="left"))
            refs = [blocks[b][0] for b in range(i, j)]
            sref, mref = _stamp_block.options(num_returns=2).remote(
                base, round_no, self.dedup,
                s - int(block_starts[i]), e - s, *refs
            )
            stamped.append(sref)
            stamped_meta.append(mref)
            write_refs.append(
                _write_part.remote(
                    sref, os.path.join(out_dir, f"part-{part_idx:06d}.parquet")
                )
            )
            base += e - s
        if stamped:
            # registration barrier for round_no: the metadata outputs
            # complete with the tasks, so getting THEM (tiny) proves
            # registration without pulling the stamped tables to the
            # driver — and hands dataset_from_refs its metadata for
            # free (no per-block metadata tasks, no from_arrow_refs)
            metas = ray.get(stamped_meta)
            self._carry = dataset_from_refs(stamped, metas)
            self._carry_rows = base
        return base, write_refs

    # ---------------- outputs
    def images_dataset(self) -> rd.Dataset:
        return rd.read_parquet(self.images_out_dir)

    def items_dataset(self) -> rd.Dataset:
        return rd.read_parquet(self.items_out_dir)

    def seen_set(self) -> set[int]:
        return {int(x) for snap in self.dedup.snapshot() for x in snap}
