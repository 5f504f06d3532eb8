"""xxHash64 — pure-Python implementation of the public XXH64 spec.

The north rule keys the URL-seen set by ``xxhash64(canonical_url)``.
The ``xxhash`` C extension is not available in this container, so this
module implements the algorithm from the published specification
(github.com/Cyan4973/xxHash, doc/xxhash_spec.md — public domain /
BSD-2). Verified against the spec's published test vectors in
``tests/test_hashing.py``.

Scale note: at 10^10-URL scale you would swap ``xxh64`` for the
``xxhash`` wheel (same output bits, ~50× faster). Every call site goes
through :func:`xxh64` / :func:`xxh64_many` so the swap is one line
(see ``_IMPL`` below — the C library is picked up automatically when
importable).
"""

from __future__ import annotations

import struct

import numpy as np

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

_U64 = struct.Struct("<Q")
_U32 = struct.Struct("<I")


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _MASK, 31) * _P1) & _MASK


def _merge(acc: int, v: int) -> int:
    acc ^= _round(0, v)
    return ((acc * _P1) + _P4) & _MASK


def _xxh64_py(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        limit = n - 32
        u = _U64.unpack_from
        while i <= limit:
            v1 = _round(v1, u(data, i)[0])
            v2 = _round(v2, u(data, i + 8)[0])
            v3 = _round(v3, u(data, i + 16)[0])
            v4 = _round(v4, u(data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, _U64.unpack_from(data, i)[0])
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (_U32.unpack_from(data, i)[0] * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


try:  # pragma: no cover - not present in this container
    import xxhash as _xxhash_c

    def _xxh64_impl(data: bytes, seed: int = 0) -> int:
        return _xxhash_c.xxh64_intdigest(data, seed)

    _IMPL = "c"
except ImportError:
    _xxh64_impl = _xxh64_py
    _IMPL = "py"


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """XXH64 of ``data`` → unsigned 64-bit int. Strings are UTF-8 encoded."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return _xxh64_impl(data, seed)


def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _gather_le(flat: np.ndarray, pos: np.ndarray, nbytes: int) -> np.ndarray:
    """Little-endian integer of ``nbytes`` at each (unaligned) byte
    position ``pos`` of ``flat`` → uint64 array."""
    out = flat[pos].astype(np.uint64)
    for k in range(1, nbytes):
        out |= flat[pos + k].astype(np.uint64) << np.uint64(8 * k)
    return out


def xxh64_many(values, seed: int = 0) -> np.ndarray:
    """Hash an iterable of str/bytes → ``np.uint64`` array.

    Vectorized across the batch (round 4; previously a per-value
    Python loop — the one remaining documented scalar trade-off):
    inputs are packed into one flat byte buffer and the XXH64 state
    recurrence runs as numpy uint64 ops over every input at once —
    stripe ``s`` of every still-active input per iteration, inputs
    sorted by stripe count so the active set is a shrinking contiguous
    slice. A handful of extreme-length outliers (longer than the
    16th-longest input) would serialize the stripe loop on tiny
    slices, so they take the scalar path instead. Bit-identical to
    :func:`xxh64` (property-tested, spec vectors). With the C wheel
    present the per-value C call wins and is used instead.
    """
    vals = [v if isinstance(v, bytes) else v.encode("utf-8") for v in values]
    n = len(vals)
    if _IMPL == "c":  # pragma: no cover — wheel not in this container
        return np.fromiter((_xxh64_impl(v, seed) for v in vals),
                           dtype=np.uint64, count=n)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in vals), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(vals), dtype=np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    P1, P2, P3, P4, P5 = (np.uint64(p) for p in (_P1, _P2, _P3, _P4, _P5))
    h = np.full(n, np.uint64((seed + _P5) & _MASK))
    scalar_idx: np.ndarray | None = None
    with np.errstate(over="ignore"):
        big = np.nonzero(lens >= 32)[0]
        if big.size:
            ns = lens[big] // 32
            order = np.argsort(ns, kind="stable")
            big = big[order]
            ns = ns[order]
            m = big.size
            # extreme-length outliers → scalar path (see docstring)
            smax = int(ns[-1]) if m <= 16 else int(ns[m - 16])
            long = np.nonzero(ns > smax)[0]
            if long.size:
                scalar_idx = big[long]
                keep = np.nonzero(ns <= smax)[0]
                big, ns, m = big[keep], ns[keep], keep.size
        if big.size:
            o = offs[big]
            v1 = np.full(m, np.uint64((seed + _P1 + _P2) & _MASK))
            v2 = np.full(m, np.uint64((seed + _P2) & _MASK))
            v3 = np.full(m, np.uint64(seed & _MASK))
            v4 = np.full(m, np.uint64((seed - _P1) & _MASK))
            for s in range(int(ns[-1])):
                a = int(np.searchsorted(ns, s, side="right"))
                pos = o[a:] + 32 * s
                for lane_off, vv in ((0, v1), (8, v2), (16, v3), (24, v4)):
                    acc = vv[a:] + _gather_le(flat, pos + lane_off, 8) * P2
                    vv[a:] = _vrotl(acc, 31) * P1
            hh = _vrotl(v1, 1) + _vrotl(v2, 7) + _vrotl(v3, 12) + _vrotl(v4, 18)
            for vv in (v1, v2, v3, v4):
                hh = (hh ^ (_vrotl(vv * P2, 31) * P1)) * P1 + P4
            h[big] = hh
        h += lens.astype(np.uint64)
        rem = lens % 32
        toff = offs + lens - rem
        for c in range(3):  # up to three 8-byte tail chunks
            act = np.nonzero(rem >= 8 * (c + 1))[0]
            if act.size == 0:
                break
            k1 = _vrotl(_gather_le(flat, toff[act] + 8 * c, 8) * P2, 31) * P1
            h[act] = _vrotl(h[act] ^ k1, 27) * P1 + P4
        r8 = rem % 8
        off4 = toff + (rem // 8) * 8
        act = np.nonzero(r8 >= 4)[0]
        if act.size:
            h[act] = (
                _vrotl(h[act] ^ (_gather_le(flat, off4[act], 4) * P1), 23) * P2 + P3
            )
        offb = off4 + (r8 // 4) * 4
        rb = r8 % 4
        for c in range(3):  # up to three tail bytes
            act = np.nonzero(rb > c)[0]
            if act.size == 0:
                break
            h[act] = _vrotl(
                h[act] ^ (flat[offb[act] + c].astype(np.uint64) * P5), 11
            ) * P1
        h ^= h >> np.uint64(33)
        h *= P2
        h ^= h >> np.uint64(29)
        h *= P3
        h ^= h >> np.uint64(32)
    if scalar_idx is not None:
        for i in scalar_idx:
            h[i] = _xxh64_py(vals[i], seed)
    return h


def xxh64_u64_many(x: np.ndarray | list, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 of many 8-byte little-endian values.

    Bit-identical to ``xxh64(struct.pack('<Q', v), seed)`` for every
    element (the spec's ``len == 8`` path: one tail round + avalanche),
    but computed with numpy uint64 ops — the fast path for hashing
    numeric columns (HLL sketches, key derivation) without per-row
    ``str()``/``bytes()`` round-trips. Signed int64 inputs are hashed
    as their two's-complement LE bytes (``.view(np.uint64)``).
    """
    v = np.asarray(x)
    if v.dtype == np.int64:
        v = v.view(np.uint64)
    v = v.astype(np.uint64, copy=False)
    P1 = np.uint64(_P1)
    P2 = np.uint64(_P2)
    P3 = np.uint64(_P3)
    P4 = np.uint64(_P4)
    with np.errstate(over="ignore"):
        lane = v * P2
        lane = ((lane << np.uint64(31)) | (lane >> np.uint64(33))) * P1
        h = np.full_like(v, (seed + _P5 + 8) & _MASK)
        h ^= lane
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * P1 + P4
        h ^= h >> np.uint64(33)
        h *= P2
        h ^= h >> np.uint64(29)
        h *= P3
        h ^= h >> np.uint64(32)
    return h


def splitmix64(x: np.ndarray | int):
    """SplitMix64 finalizer — cheap vectorizable mixer for derived keys.

    Used to derive synthetic-world attributes from a uint64 key
    (NOT for the URL-seen set, which is spec xxh64 per the north rule).
    Public algorithm (Steele et al., "Fast splittable pseudorandom
    number generators").
    """
    scalar = not isinstance(x, np.ndarray)
    z = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return int(z) if scalar else z
