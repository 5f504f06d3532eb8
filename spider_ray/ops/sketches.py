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

from ..hashing import xxh64_many, xxh64_u64_many


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
        """Add raw column values. Integer arrays hash natively as their
        8-byte LE encoding (vectorized :func:`xxh64_u64_many` — no
        per-row ``str()``); everything else goes through the string
        path. The two encodings define distinct-value identity per
        dtype, which is all a cardinality sketch needs."""
        arr = np.asarray(values) if not isinstance(values, np.ndarray) else values
        if arr.dtype.kind in "iu" and arr.dtype.itemsize == 8:
            self.add_hashes(xxh64_u64_many(arr))
        elif arr.dtype.kind in "iu":
            self.add_hashes(xxh64_u64_many(arr.astype(np.int64)))
        else:
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
    col = batch[column]
    if pa.types.is_integer(col.type):
        h.add_values(col.to_numpy(zero_copy_only=False))
    else:
        h.add_values(col.to_pylist())
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


# ------------------------------------------------------------------ DDSketch
class DDSketch:
    """Relative-error quantile sketch (the DDSketch algorithm of
    Masson, Rim & Lee, VLDB 2019 — public): values bucket by
    ``ceil(log_gamma(x))`` with gamma = (1+alpha)/(1-alpha), giving
    every quantile estimate a guaranteed relative error ≤ alpha.
    Deterministic (no RNG) and mergeable by bucket-count addition —
    the quantile analog of the HLL shape above: one sketch per batch
    inside ``map_batches``, tiny associative merge downstream.

    Positive values only (token counts, latencies, prices, byte
    sizes — the pipeline-statistics use cases); zeros tracked exactly.
    """

    def __init__(self, alpha: float = 0.01):
        assert 0 < alpha < 1
        self.alpha = alpha
        self.gamma = (1 + alpha) / (1 - alpha)
        self._lg = np.log(self.gamma)
        self.buckets: dict[int, int] = {}
        self.n_zero = 0
        self.count = 0

    def add_values(self, values: np.ndarray) -> None:
        x = np.asarray(values, dtype=np.float64)
        x = x[~np.isnan(x)]
        if (x < 0).any():
            raise ValueError("DDSketch tracks non-negative values")
        self.count += len(x)
        self.n_zero += int((x == 0).sum())
        pos = x[x > 0]
        if not len(pos):
            return
        keys = np.ceil(np.log(pos) / self._lg).astype(np.int64)
        uk, cnt = np.unique(keys, return_counts=True)
        for k, c in zip(uk, cnt):
            self.buckets[int(k)] = self.buckets.get(int(k), 0) + int(c)

    def merge(self, other: "DDSketch") -> "DDSketch":
        assert abs(self.alpha - other.alpha) < 1e-12
        out = DDSketch(self.alpha)
        out.buckets = dict(self.buckets)
        for k, c in other.buckets.items():
            out.buckets[k] = out.buckets.get(k, 0) + c
        out.n_zero = self.n_zero + other.n_zero
        out.count = self.count + other.count
        return out

    def quantile(self, q: float) -> float:
        """Value v with rank ≈ q·n and |v - true|/true ≤ alpha."""
        if not self.count:
            return float("nan")
        rank = q * (self.count - 1)
        if rank < self.n_zero:
            return 0.0
        seen = self.n_zero
        for k in sorted(self.buckets):
            seen += self.buckets[k]
            if seen > rank:
                # bucket midpoint in log space: 2*gamma^k/(gamma+1)
                return float(2 * self.gamma ** k / (self.gamma + 1))
        k = max(self.buckets)
        return float(2 * self.gamma ** k / (self.gamma + 1))

    def serialize(self) -> bytes:
        import struct

        ks = sorted(self.buckets)
        head = struct.pack("<dqqq", self.alpha, self.n_zero, self.count, len(ks))
        body = b"".join(struct.pack("<qq", k, self.buckets[k]) for k in ks)
        return head + body

    @classmethod
    def deserialize(cls, data: bytes) -> "DDSketch":
        import struct

        alpha, n_zero, count, nk = struct.unpack_from("<dqqq", data)
        s = cls(alpha)
        s.n_zero, s.count = n_zero, count
        off = struct.calcsize("<dqqq")
        for _ in range(nk):
            k, c = struct.unpack_from("<qq", data, off)
            off += struct.calcsize("<qq")
            s.buckets[k] = c
        return s


def dd_sketch_batch(batch: pa.Table, column: str, alpha: float = 0.01) -> pa.Table:
    s = DDSketch(alpha)
    s.add_values(batch[column].to_numpy(zero_copy_only=False))
    return pa.table({"dd": pa.array([s.serialize()], pa.binary())})


def quantiles_approx(ds, column: str, qs: list[float],
                     alpha: float = 0.01) -> dict[float, float]:
    """Approximate quantiles of a Dataset column: per-batch DDSketches →
    tiny merge on the driver. One pass, no shuffle, relative error ≤
    alpha at any scale."""
    parts = ds.map_batches(
        dd_sketch_batch, fn_kwargs={"column": column, "alpha": alpha},
        batch_format="pyarrow",
    ).to_pandas()
    out = DDSketch.deserialize(parts["dd"].iloc[0])
    for b in parts["dd"].iloc[1:]:
        out = out.merge(DDSketch.deserialize(b))
    return {q: out.quantile(q) for q in qs}
