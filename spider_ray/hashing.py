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


def xxh64_many(values, seed: int = 0) -> np.ndarray:
    """Hash an iterable of str/bytes → ``np.uint64`` array.

    Per-batch helper used inside ``map_batches`` stages; the Python
    loop here is the documented trade-off of the pure-Python fallback
    (see module docstring).
    """
    f = _xxh64_impl
    out = np.fromiter(
        (f(v if isinstance(v, bytes) else v.encode("utf-8"), seed) for v in values),
        dtype=np.uint64,
        count=len(values) if hasattr(values, "__len__") else -1,
    )
    return out


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
