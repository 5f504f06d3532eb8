"""GIF89a codec (encoder + decoder) — numpy + pure Python, from the
public GIF89a specification (CompuServe, 1990; also W3C archive) and
the LZW variable-width coding it mandates (Welch 1984, as profiled by
the GIF spec's Appendix F).

Scope (honest, contract-tested):

  * encode: single-frame GIF89a, global color table only, no interlace,
    no transparency/animation extensions. The input must be palette
    media — an (H, W, 3) uint8 image with ≤ 256 distinct colors —
    else ``ValueError``; GIF is an indexed-color format and quantizing
    arbitrary RGB is a separate (lossy) choice this module refuses to
    make silently.
  * decode: the first (and for our encoder, only) image of a GIF87a or
    GIF89a stream; global or local color table; extensions are skipped
    per spec block structure. Interlaced images and animated streams
    (a second image descriptor) raise ``NotImplementedError`` —
    rejected, never mis-decoded.

The encode→decode round trip is bit-exact on the pixel array (GIF is
lossless over indexed color), which is how the sink invariant treats
``fmt='gif'`` rows (exact compare, like PNG).

Reference parity note: the reference crawls listing sites whose image
sets routinely include GIFs (items.py:25-27 collects image URLs
verbatim, any format); its decoding was delegated to PIL downstream.
Here the codec is in-engine because the container has no image
library.

All functions are pure and deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

FMT_GIF = "gif"

_GIF89 = b"GIF89a"
_GIF87 = b"GIF87a"
_MAX_CODE = 1 << 12  # LZW code values are at most 12 bits wide (spec)


# ---------------------------------------------------------------- palette
def _palettize(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(H, W, 3) uint8 → (palette [n,3] uint8, indices [H,W] uint8).

    Raises ValueError if the image has more than 256 distinct colors —
    the caller owns any quantization decision."""
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.dtype == np.uint8
    packed = (
        pixels[..., 0].astype(np.uint32) << 16
        | pixels[..., 1].astype(np.uint32) << 8
        | pixels[..., 2].astype(np.uint32)
    )
    colors, inverse = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF is indexed-color: {len(colors)} distinct colors > 256 "
            "(quantize first)"
        )
    palette = np.stack(
        [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF], axis=-1
    ).astype(np.uint8)
    return palette, inverse.reshape(packed.shape).astype(np.uint8)


# ------------------------------------------------------------------- LZW
def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-flavor LZW over a flat uint8 index array: variable code width
    starting at min_code+1, Clear/EOI codes, dictionary reset at 4096
    entries, LSB-first bit packing (spec Appendix F)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0  # bit accumulator, LSB-first
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code + 1
    emit(clear, width)
    it = iter(indices.tolist())
    cur = next(it)
    for sym in it:
        key = (cur, sym)
        entry = table.get(key)
        if entry is not None:
            cur = entry
            continue
        emit(cur, width)
        table[key] = next_code
        next_code += 1
        # grow the code width once the next assignable code would not
        # fit (emitted codes may be as large as next_code - 1)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == _MAX_CODE:  # table full: reset per spec
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code + 1
        cur = sym
    emit(cur, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode` → uint8 index array of length
    ``n_expected`` (stops there; trailing EOI/padding tolerated)."""
    clear = 1 << min_code
    eoi = clear + 1
    roots = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    width = min_code + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    next_code = eoi + 1
    pos = 0
    n_data = len(data)
    while len(out) < n_expected:
        while nbits < width:
            if pos >= n_data:
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table.clear()
            width = min_code + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < clear:
            entry = roots[code]
        elif code - eoi - 1 < len(table):
            entry = table[code - eoi - 1]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case (spec Appendix F)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out += entry
        if prev is not None and next_code < _MAX_CODE:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError("LZW stream ended before raster complete")
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


# ------------------------------------------------------------ encode/decode
def encode_gif(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 with ≤256 distinct colors → single-frame GIF89a."""
    palette, indices = _palettize(pixels)
    h, w = indices.shape
    # global color table size: power of two ≥ len(palette), minimum 2
    bits = 1
    while (1 << bits) < len(palette):
        bits += 1
    gct = np.zeros(((1 << bits), 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    min_code = max(2, bits)  # LZW minimum code size (spec: ≥ 2)
    packed_lsd = 0x80 | ((bits - 1) & 0x07) << 4 | ((bits - 1) & 0x07)
    out = bytearray()
    out += _GIF89
    out += struct.pack("<HHBBB", w, h, packed_lsd, 0, 0)
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out.append(min_code)
    lzw = _lzw_encode(indices.reshape(-1), min_code)
    for i in range(0, len(lzw), 255):  # data sub-blocks, ≤255 bytes each
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 (first image; see module docstring
    for the rejected-not-misdecoded scope)."""
    if data[:6] not in (_GIF89, _GIF87):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks until 0
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            ct = gct
            if ipacked & 0x80:  # local color table wins
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image without any color table")
            if (left, top, w, h) != (0, 0, sw, sh):
                raise NotImplementedError(
                    "sub-rectangle GIF frames not supported"
                )
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            # walk the remaining blocks: another image descriptor means
            # an animated stream — reject, never mis-decode (first-frame
            # reads hide the animation silently)
            while pos < len(data):
                blk = data[pos]
                pos += 1
                if blk == 0x3B:
                    break
                if blk == 0x2C:
                    raise NotImplementedError("animated GIF not supported")
                if blk == 0x21:
                    pos += 1
                    while data[pos]:
                        pos += 1 + data[pos]
                    pos += 1
                else:
                    raise ValueError(f"unknown GIF block 0x{blk:02x}")
            indices = _lzw_decode(bytes(lzw), min_code, w * h)
            if indices.max(initial=0) >= len(ct):
                raise ValueError("palette index out of range")
            return ct[indices].reshape(h, w, 3).copy()
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")
