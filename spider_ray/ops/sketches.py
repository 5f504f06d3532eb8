"""Mergeable sketches for crawl-scale statistics (SURVEY.md A4: the
seen-set cardinality at 10^10 URLs is tracked per shard exactly, but
fleet-wide distinct counts over arbitrary keys need a sketch).

HyperLogLog (Flajolet et al. 2007, with the standard bias corrections)
over xxh64 hashes: one sketch per batch inside ``map_batches``, merged
associatively in a tiny reduce — the mergeable-sketch shape from the
ray_guide 'Aggregation at scale' section.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import xxh64_many


class HyperLogLog:
    """HLL with 2^p registers (p in [4, 18]); ~1.04/sqrt(m) rel. error."""

    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | (np.uint64(1) << np.uint64(self.p - 1))
        # rank = leading zeros of the remaining bits + 1 (the or-ed guard
        # bit bounds the count, as in the reference algorithm)
        lz = np.zeros(len(h), dtype=np.uint8)
        cur = rest.copy()
        mask_high = np.uint64(1) << np.uint64(63)
        active = np.ones(len(h), dtype=bool)
        for _ in range(64 - self.p + 1):
            top = (cur & mask_high) != 0
            done = active & top
            active &= ~top
            if not active.any():
                break
            lz[active] += 1
            cur[active] = cur[active] << np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add_values(self, values) -> None:
        self.add_hashes(xxh64_many([str(v) for v in values]))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv_sum = np.sum(np.exp2(-self.registers.astype(np.float64)))
        e = alpha * m * m / inv_sum
        if e <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        h = cls(data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


def hll_sketch_batch(batch: pa.Table, column: str, p: int = 12) -> pa.Table:
    """map_batches body: one serialized HLL per batch — the per-batch
    combiner; merge downstream with :func:`merge_hll_tables`."""
    h = HyperLogLog(p)
    h.add_values(batch[column].to_pylist())
    return pa.table({"hll": pa.array([h.serialize()], pa.binary())})


def merge_hll_tables(tbl: pa.Table) -> HyperLogLog:
    sketches = [HyperLogLog.deserialize(b) for b in tbl["hll"].to_pylist()]
    out = sketches[0]
    for s in sketches[1:]:
        out = out.merge(s)
    return out


def distinct_count_approx(ds, column: str, p: int = 12) -> float:
    """Approximate distinct count of a Dataset column: per-batch HLLs →
    tiny merge on the driver. One pass, no shuffle."""
    parts = ds.map_batches(
        hll_sketch_batch, fn_kwargs={"column": column, "p": p},
        batch_format="pyarrow",
    ).to_pandas()
    tbl = pa.table({"hll": pa.array(list(parts["hll"]), pa.binary())})
    return merge_hll_tables(tbl).estimate()
