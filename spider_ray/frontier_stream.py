"""StreamingCrawler — the 10^10-frontier execution mode.

`frontier.Crawler` holds each round's (thin) frontier table on the
driver: correct and fast up to ~10^7-10^8 rows/round, but at the north
rule's 10^10-URL scale a round can exceed driver memory. This variant
keeps EVERYTHING off the driver:

  * the frontier lives as per-round parquet partition directories
    (``work_dir/frontier/round_XXXX/``) — read with ``read_parquet``,
    written back with per-block remote tasks;
  * working sets (winner/admit output, parse output) are
    ``materialize()``-d Datasets — blocks in the object store, spilled
    to disk under pressure, never concatenated on the driver;
  * items and images stream to per-round parquet partitions from
    inside the parse tasks;
  * the driver touches only: lineage counters (tiny aggregates), dedup
    shard snapshots, and checkpoint bookkeeping.

Politeness always takes the ``groupby(host_hash)`` shuffle route here
(the host-aligned driver sort is unavailable by construction), guarded
by the per-batch top-k skew prefilter.

Dense-seq assignment without a driver sort: ``Dataset.sort`` by the
deterministic key, then per-block rank offsets computed from block
metadata (row counts) and stamped by one remote task per block — the
zipWithIndex the Dataset API lacks, expressed in ~15 lines of raw Ray
(SURVEY.md §2: raw tasks only where the Dataset API genuinely can't).

Semantics are IDENTICAL to `frontier.Crawler` — asserted by
tests/test_streaming.py on shared worlds (same seen-set, same per-round
admitted counts, same item/image outputs).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
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
    _winner_fn,
    make_seed_frontier,
    parse_rows_to_frontier,
)
from .politeness import PolitenessAdmit, host_budget, prefilter_topk_per_host
from .schema import FRONTIER_SCHEMA
from .synth import WorldConfig


@ray.remote
def _stamp_and_write(block: pa.Table, base_seq: int, round_no: int,
                     out_path: str) -> int:
    """Stamp dense seq (base + row offset) + round, write one frontier
    parquet part. Deterministic: block order and contents come from the
    deterministic distributed sort."""
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
    pq.write_table(t.cast(FRONTIER_SCHEMA), out_path)
    return n


def _register_stream_fn(batch: pa.Table, *, dedup: ShardedDedup,
                        round_no: int) -> pa.Table:
    _register_table(dedup, batch, round_no)
    return batch.select(["url_hash"])


def _commit_fn(batch: pa.Table, *, dedup: ShardedDedup) -> pa.Table:
    """Push admitted|blocked hashes to the shards from inside tasks
    (set-insert is order-independent; registry cleared by the driver
    after the execution barrier)."""
    mask = pc.or_(batch["admitted"], batch["blocked"])
    hashes = batch.filter(mask)["url_hash"].to_numpy(zero_copy_only=False)
    if len(hashes):
        dedup.push_commit(hashes)
    return batch.select(["url_hash"])


def _filter_rowtype(batch: pa.Table, *, value: str) -> pa.Table:
    return batch.filter(pc.equal(batch["rowtype"], value))


def _to_frontier_links(batch: pa.Table) -> pa.Table:
    return parse_rows_to_frontier(batch, is_retry=False)


def _to_frontier_retries(batch: pa.Table) -> pa.Table:
    return parse_rows_to_frontier(batch, is_retry=True)


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
        self.lineage: list[dict] = []

    # ---------------- paths
    def _frontier_dir(self, r: int) -> str:
        return os.path.join(self.frontier_root, f"round_{r:04d}")

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
                    self.lineage.append(json.load(f))
        return last + 1

    # ---------------- loop
    def crawl(self, seeds: list) -> dict:
        from .frontier import assign_seq

        start = self.resume()
        if start is None:
            seed_dir = self._frontier_dir(0)
            os.makedirs(seed_dir, exist_ok=True)
            pq.write_table(
                assign_seq(make_seed_frontier(seeds), 0),
                os.path.join(seed_dir, "part-000000000000.parquet"),
            )
            start = 0
        r = start
        total_fetched = total_items = total_images = 0
        for row in self.lineage:  # restored rounds' contributions
            total_fetched += row["rows_admitted"]
            total_items += row["items_emitted"]
            total_images += row["images_written"]
        while r < self.max_rounds:
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
        return {
            "rounds": r,
            "fetched": total_fetched,
            "seen": self.dedup.total_seen(),
            "items": total_items,
            "images": total_images,
        }

    def _run_round(self, r: int) -> dict:
        ds = rd.read_parquet(self._frontier_dir(r))
        rows_in = ds.count()

        # execution 1: dedup phase-1 registration (barrier; idempotent)
        ds.map_batches(
            _register_stream_fn,
            fn_kwargs={"dedup": self.dedup, "round_no": r},
            batch_format="pyarrow",
        ).count()

        # execution 2: winner filter + skew prefilter (materialized in the
        # object store, reused by the splits below without recompute)
        max_k = host_budget(
            self.cfg.min_crawl_delay_ms if self.obey_robots else 100,
            self.round_window_ms,
        )
        pre_mat = (
            ds.map_batches(
                _winner_fn, fn_kwargs={"dedup": self.dedup, "round_no": r},
                batch_format="pyarrow",
            )
            .map_batches(
                prefilter_topk_per_host,
                fn_kwargs={"max_k": max_k, "cfg": self.cfg,
                           "obey_robots": self.obey_robots},
                batch_format="pandas",
            )
            .materialize()
        )
        contenders = pre_mat.map_batches(
            lambda b: b.filter(pc.invert(b["prefiltered_defer"])).drop_columns(
                ["prefiltered_defer"]
            ),
            batch_format="pyarrow",
        )
        admit = PolitenessAdmit(self.cfg, self.round_window_ms,
                                self.obey_robots, round_no=r)

        def admit_group(g: pd.DataFrame) -> pd.DataFrame:
            return admit(g)

        admit_mat = (
            contenders.groupby("host_hash")
            .map_groups(admit_group, batch_format="pandas")
            .materialize()
        )

        # execution 3: commit admitted|blocked (from tasks), then clear
        admit_mat.map_batches(
            _commit_fn, fn_kwargs={"dedup": self.dedup}, batch_format="pyarrow"
        ).count()
        self.dedup.clear_round(r)

        # counts for lineage (tiny aggregates)
        stats_df = (
            admit_mat.map_batches(
                lambda b: pa.table(
                    {
                        "admitted": [int(pc.sum(b["admitted"]).as_py() or 0)],
                        "blocked": [int(pc.sum(b["blocked"]).as_py() or 0)],
                        "rows": [b.num_rows],
                    }
                ),
                batch_format="pyarrow",
            ).to_pandas()
        )
        rows_admitted = int(stats_df["admitted"].sum())
        blocked_n = int(stats_df["blocked"].sum())
        rows_unique = pre_mat.count()  # winner survivors (incl. deferred)
        deferred_n = rows_unique - rows_admitted - blocked_n

        # execution 4: fetch + parse over admitted rows; items/images
        # stream to per-round partitions from inside the tasks
        for d in (self.images_out_dir, self.items_out_dir):
            part = os.path.join(d, f"round_{r:04d}")
            if os.path.exists(part):
                shutil.rmtree(part)  # incomplete prior attempt
        admitted_ds = admit_mat.map_batches(
            lambda b: b.filter(b["admitted"]).drop_columns(["admitted", "blocked"]),
            batch_format="pyarrow",
        )
        parse_mat = (
            admitted_ds.map_batches(
                fetch_batch,
                fn_kwargs={"cfg": self.cfg, "captions_ref": self.captions_ref},
                batch_format="pyarrow",
                batch_size=self.fetch_batch_size,
            )
            .map_batches(
                _parse_fn,
                fn_kwargs={
                    "cfg": self.cfg,
                    "images_out_dir": self.images_out_dir,
                    "items_out_dir": self.items_out_dir,
                    "round_no": r,
                    "dedup": None,  # registration runs in execution 1
                },
                batch_format="pyarrow",
                batch_size=self.fetch_batch_size,
            )
            .materialize()
        )
        counts = (
            parse_mat.map_batches(
                lambda b: pa.Table.from_pandas(
                    pd.DataFrame({"rowtype": b["rowtype"].to_pylist()})
                    .value_counts()
                    .rename("n")
                    .reset_index(),
                    preserve_index=False,
                ),
                batch_format="pyarrow",
            )
            .to_pandas()
            .groupby("rowtype")["n"]
            .sum()
            .to_dict()
        )

        # next frontier: links + retries + deferred → distributed sort +
        # per-block seq stamping → parquet partition
        links_ds = parse_mat.map_batches(
            _filter_rowtype, fn_kwargs={"value": "link"}, batch_format="pyarrow"
        ).map_batches(_to_frontier_links, batch_format="pyarrow")
        retry_ds = parse_mat.map_batches(
            _filter_rowtype, fn_kwargs={"value": "retry"}, batch_format="pyarrow"
        ).map_batches(_to_frontier_retries, batch_format="pyarrow")
        defer_pre_ds = pre_mat.map_batches(
            lambda b: b.filter(b["prefiltered_defer"])
            .drop_columns(["prefiltered_defer"])
            .select(FRONTIER_SCHEMA.names)
            .cast(FRONTIER_SCHEMA),
            batch_format="pyarrow",
        )
        defer_grp_ds = admit_mat.map_batches(
            lambda b: b.filter(
                pc.and_(pc.invert(b["admitted"]), pc.invert(b["blocked"]))
            )
            .drop_columns(["admitted", "blocked"])
            .select(FRONTIER_SCHEMA.names)
            .cast(FRONTIER_SCHEMA),
            batch_format="pyarrow",
        )
        nxt = links_ds.union(retry_ds).union(defer_pre_ds).union(defer_grp_ds)
        next_rows = self._write_next_frontier(nxt, r + 1)
        # deferred rows re-register in round r+1's execution 1 (their
        # round-r registry entries were cleared after commit)

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
            "next_rows": int(next_rows),
            "checkpoint_path": self._frontier_dir(r + 1),
        }
        self.lineage.append(row)
        os.makedirs(os.path.join(self.work_dir, "lineage"), exist_ok=True)
        with open(os.path.join(self.work_dir, "lineage",
                               f"round_{r:04d}.json"), "w") as f:
            json.dump(row, f)
        self._checkpoint_seen(r)  # written LAST = round-complete marker
        return row

    def _write_next_frontier(self, nxt: rd.Dataset, round_no: int) -> int:
        """Distributed sort by the deterministic key, then per-block rank
        offsets from block metadata + one stamping task per block."""
        out_dir = self._frontier_dir(round_no)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        sorted_mat = nxt.sort(["seq_parent", "seq_link", "canonical_url"]).materialize()
        bundles = list(sorted_mat.iter_internal_ref_bundles())
        blocks = [(ref, meta) for b in bundles for ref, meta in b.blocks]
        refs = []
        base = 0
        for i, (block_ref, meta) in enumerate(blocks):
            n = meta.num_rows
            if n == 0:
                continue
            refs.append(
                _stamp_and_write.remote(
                    block_ref, base, round_no,
                    os.path.join(out_dir, f"part-{i:06d}.parquet"),
                )
            )
            base += n
        if refs:
            ray.get(refs)
        return base

    # ---------------- state
    def _checkpoint_seen(self, r: int) -> None:
        d = os.path.join(self.seen_dir, f"round_{r:04d}")
        os.makedirs(d, exist_ok=True)
        for s, snap in enumerate(self.dedup.snapshot()):
            np.save(os.path.join(d, f"shard_{s:03d}.npy"), snap)

    # ---------------- outputs
    def images_dataset(self) -> rd.Dataset:
        return rd.read_parquet(self.images_out_dir)

    def items_dataset(self) -> rd.Dataset:
        return rd.read_parquet(self.items_out_dir)

    def seen_set(self) -> set[int]:
        return {int(x) for snap in self.dedup.snapshot() for x in snap}
