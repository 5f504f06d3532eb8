"""Full-PNG-decoder conformance tests (W3C PNG spec §8/§9/§11):
foreign PNGs are built by hand in the test — forward-filtering
scanlines per spec — and must decode to exact sample equality."""

import struct
import zlib

import numpy as np
import pytest

from spider_ray.imaging import _PNG_SIG, _chunk, decode_png, encode_png

_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _filter_line(line, prev, bpp, f):
    """Forward filter (spec §9) — the encoder side, test-local."""
    out = np.empty_like(line)
    for i in range(len(line)):
        a = int(line[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        x = int(line[i])
        if f == 0:
            out[i] = x
        elif f == 1:
            out[i] = (x - a) & 0xFF
        elif f == 2:
            out[i] = (x - b) & 0xFF
        elif f == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (x - pred) & 0xFF
    return out


def _pack_rows(samples, depth):
    """(h, w) uint8 sample values → packed scanline bytes at depth."""
    h, w = samples.shape
    if depth == 8:
        return samples
    per_byte = 8 // depth
    wpad = (w + per_byte - 1) // per_byte * per_byte
    padded = np.zeros((h, wpad), dtype=np.uint8)
    padded[:, :w] = samples
    out = np.zeros((h, wpad // per_byte), dtype=np.uint8)
    for k in range(per_byte):
        out = (out << depth) | padded[:, k::per_byte]
    return out


def _build_png(pixels, ctype, depth=8, filters=None, plte=None,
               interlace=0, extra_chunks=()):
    """pixels: (h, w, channels) samples (or (h, w) palette indices /
    gray). Builds a conformant PNG with the given per-row filters."""
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, nch = pixels.shape
    assert nch == _CH[ctype]

    def rect_bytes(px):
        rh, rw = px.shape[:2]
        rows = _pack_rows(px.reshape(rh, rw * nch) if depth == 8
                          else px.reshape(rh, rw), depth)
        bpp = max(1, nch * depth // 8)
        raw = bytearray()
        prev = np.zeros(rows.shape[1], dtype=np.uint8)
        for y in range(rh):
            f = (filters[y % len(filters)] if filters else 0)
            raw.append(f)
            raw += _filter_line(rows[y], prev, bpp, f).tobytes()
            prev = rows[y]
        return bytes(raw)

    if interlace == 0:
        payload = rect_bytes(pixels)
    else:  # Adam7 pass split (spec §8.2)
        payload = b""
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            sub = pixels[y0::dy, x0::dx]
            if sub.size:
                payload += rect_bytes(sub)
    out = bytearray(_PNG_SIG)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype,
                                       0, 0, interlace))
    if plte is not None:
        out += _chunk(b"PLTE", plte.tobytes())
    for tag, pl in extra_chunks:
        out += _chunk(tag, pl)
    out += _chunk(b"IDAT", zlib.compress(payload))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def test_png_all_filters_rgb():
    rng = np.random.default_rng(41)
    px = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _build_png(px, ctype=2, filters=filters)
        assert (decode_png(data) == px).all(), filters


def test_png_grayscale_depths():
    rng = np.random.default_rng(43)
    for depth in (1, 2, 4, 8):
        maxv = (1 << depth) - 1
        g = rng.integers(0, maxv + 1, (7, 11), dtype=np.uint8)
        data = _build_png(g, ctype=0, depth=depth, filters=[0, 2])
        want = (g.astype(np.uint16) * 255 // maxv).astype(np.uint8)
        out = decode_png(data)
        assert (out == want[..., None]).all(), depth


def test_png_palette_depths():
    rng = np.random.default_rng(47)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    for depth in (1, 2, 4, 8):
        n = min(16, 1 << depth)
        idx = rng.integers(0, n, (6, 10), dtype=np.uint8)
        data = _build_png(idx, ctype=3, depth=depth, plte=plte,
                          filters=[0, 1])
        assert (decode_png(data) == plte[idx]).all(), depth


def test_png_alpha_dropped_not_composited():
    rng = np.random.default_rng(53)
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    out = decode_png(_build_png(rgba, ctype=6, filters=[4]))
    assert (out == rgba[..., :3]).all()
    ga = rng.integers(0, 256, (8, 8, 2), dtype=np.uint8)
    out = decode_png(_build_png(ga, ctype=4, filters=[3]))
    assert (out == np.repeat(ga[..., :1], 3, axis=2)).all()


def test_png_adam7_interlace():
    rng = np.random.default_rng(59)
    # sizes straddling the 8x8 pass grid, incl. passes that vanish
    for h, w in ((16, 16), (9, 13), (3, 5), (1, 1), (2, 9)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = _build_png(px, ctype=2, filters=[0, 1, 2, 3, 4],
                          interlace=1)
        assert (decode_png(data) == px).all(), (h, w)


def test_png_ancillary_chunks_skipped_and_contracts():
    rng = np.random.default_rng(61)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    data = _build_png(px, ctype=2, filters=[0],
                      extra_chunks=((b"gAMA", struct.pack(">I", 45455)),
                                    (b"tEXt", b"Comment\x00hi")))
    assert (decode_png(data) == px).all()
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_png(_build_png(px, ctype=2, filters=[0])
                   .replace(struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0),
                            struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0), 1))
    # our own encoder still round-trips through the widened decoder
    assert (decode_png(encode_png(px)) == px).all()
