"""Image codec + perceptual-hash + PSNR kernels (numpy/zlib only).

The graft sink is an image+caption table (BASELINE.json input_hint)
whose rows must satisfy a decode invariant: decoded-pixel allclose
(PSNR ≥ 40 dB for lossy re-encodes, exact for lossless) plus a phash
recompute match. The container has no image codec library (no PIL /
cv2 / imagehash), so this module implements from public specs:

  * a minimal PNG encoder/decoder (RFC 2083 / W3C PNG spec): 8-bit RGB,
    filter type 0, zlib-compressed IDAT — enough for a deterministic,
    lossless round-trip of synthetic pixels;
  * a "lossy" re-encode stand-in ``FMT_QPNG``: uniform quantization to
    step 4 (PSNR ≥ 42.1 dB worst-case) then PNG-stored;
  * real baseline JPEG (round 3): :mod:`spider_ray.jpeg` implements
    the ITU-T T.81 baseline process (DCT + Annex K tables + Huffman)
    from the public spec — ``FMT_JPEG`` rows are encoded and decoded
    by it, no codec library needed.
  * pHash (DCT perceptual hash, the algorithm of the public pHash /
    imagehash projects): 32×32 grayscale → 2-D DCT-II → top-left 8×8
    (skipping DC) → median threshold → 64-bit hash.
  * PSNR over uint8 RGB.

All functions are pure and deterministic (no wall clock, no RNG).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FMT_PNG = "png"
FMT_QPNG = "qpng"  # quantized-lossy stand-in (kept alongside real jpeg)
FMT_JPEG = "jpeg"

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# step 4: worst-case per-pixel error 2 → MSE ≤ 4 → PSNR ≥ 42.1 dB for
# ANY pixel distribution. (Step 8 gives 40.9 dB only on AVERAGE; images
# whose values cluster at quantizer cell edges dip to ~36 dB — found
# the moment the sink validation became falsifiable in round 2.)
_QUANT_STEP = 4


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """(H, W, 3) uint8 → PNG bytes (color type 2, bit depth 8, filter 0).

    ``level`` is the zlib effort — any level yields a valid, losslessly
    round-tripping PNG; the synthetic world uses a low level (its encode
    cost simulates the SERVER, not the engine)."""
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.dtype == np.uint8
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes (as produced by :func:`encode_png`) → (H, W, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, _inter = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNGs supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if not (raw[:, 0] == 0).all():
        raise NotImplementedError("only filter type 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_qpng(pixels: np.ndarray, level: int = 6) -> bytes:
    """Lossy stand-in encode: quantize (mid-rise, ``_QUANT_STEP``) then
    PNG-store."""
    q = (pixels.astype(np.uint16) // _QUANT_STEP) * _QUANT_STEP + _QUANT_STEP // 2
    return encode_png(np.minimum(q, 255).astype(np.uint8), level)


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Real baseline JPEG encode (ITU-T T.81, implemented from the
    public spec in :mod:`spider_ray.jpeg` — round 3; rounds 1-2 stubbed
    this behind a PIL import-try)."""
    from .jpeg import encode_jpeg as _enc

    return _enc(pixels, quality=quality)


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt in (FMT_PNG, FMT_QPNG):
        return decode_png(data)
    if fmt == FMT_JPEG:
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    if fmt == "gif":  # spider_ray.gif.FMT_GIF (GIF89a codec, round 4)
        from .gif import decode_gif

        return decode_gif(data)
    raise NotImplementedError(f"no decoder for fmt={fmt!r} in this container")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ---------------------------------------------------------------- phash
_PH_SIZE = 32
_PH_LOW = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi / n * (i + 0.5) * k)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


_DCT32 = _dct_matrix(_PH_SIZE)


def _resize_mean(gray: np.ndarray, size: int) -> np.ndarray:
    """Box-mean resize to (size, size) — deterministic, codec-free."""
    h, w = gray.shape
    ys = (np.arange(size + 1) * h) // size
    xs = (np.arange(size + 1) * w) // size
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = gray.astype(np.float64).cumsum(0).cumsum(1)
    out = (
        csum[ys[1:, None], xs[None, 1:]]
        - csum[ys[:-1, None], xs[None, 1:]]
        - csum[ys[1:, None], xs[None, :-1]]
        + csum[ys[:-1, None], xs[None, :-1]]
    )
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    return out / np.maximum(area, 1)


def phash(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an (H, W, 3) uint8 image → int64.

    Algorithm per the public pHash design: luma → 32×32 box resize →
    DCT-II → 8×8 low-frequency block → compare to median (DC excluded
    from the median) → row-major bits, MSB first. Returned as a
    *signed* int64 to match the sink column type (input_hint
    ``phash:int64``); two's-complement of the unsigned bit string.
    """
    gray = (
        0.299 * pixels[..., 0] + 0.587 * pixels[..., 1] + 0.114 * pixels[..., 2]
    )
    small = _resize_mean(gray, _PH_SIZE)
    coef = _DCT32 @ small @ _DCT32.T
    low = coef[:_PH_LOW, :_PH_LOW].copy()
    flat = low.flatten()
    med = np.median(flat[1:])  # exclude DC term
    bits = flat > med
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    return bin((a & (1 << 64) - 1) ^ (b & (1 << 64) - 1)).count("1")
