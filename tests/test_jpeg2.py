"""General JPEG paths (spider_ray.jpeg2): progressive DCT, subsampled
components, restart intervals, grayscale, non-interleaved sequential.

The load-bearing invariant: progressive / multi-scan / restart layouts
carry the SAME quantized coefficients as the baseline layout, so their
decode must equal the baseline fast-path decode BIT-EXACTLY. A
hand-woven stream (assembled symbol by symbol from the spec text, not
via our encoder) pins the EOB-run and refinement semantics against
self-consistency bugs."""

import struct

import numpy as np
import pytest

from spider_ray.imaging import psnr
from spider_ray.jpeg import decode_jpeg, encode_jpeg, jpeg_dims
from spider_ray.jpeg2 import (
    _PROG_AC_BITS,
    _PROG_AC_VALS,
    _BitWriter,
    _build_codes,
    _sos,
    decode_jpeg_general,
    encode_jpeg_gray,
    encode_jpeg_noninterleaved,
    encode_jpeg_progressive,
    encode_jpeg_seq,
)


def _image(h=56, w=40):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 3 + yy * 2) % 256, (255 - xx * 4) % 256, (xx * yy // 8) % 256],
        -1,
    ).astype(np.uint8)


def test_progressive_equals_baseline_exactly():
    """The progressive layout codes the same quantized coefficients,
    so decode must match the baseline fast path bit-exactly — for
    several sizes and qualities (exercises DC first/refine, AC first
    with EOB runs, AC refinement with correction bits)."""
    for h, w, q in [(56, 40, 90), (16, 16, 75), (17, 19, 92), (8, 8, 50),
                    (64, 48, 96)]:
        px = _image(h, w)
        base = decode_jpeg(encode_jpeg(px, quality=q))
        for script in ("full", "spectral"):
            data = encode_jpeg_progressive(px, quality=q, script=script)
            assert data[3] == 0xE0 and b"\xff\xc2" in data  # SOF2 present
            prog = decode_jpeg(data)  # fast path delegates to jpeg2
            assert (prog == base).all(), (h, w, q, script)
            assert jpeg_dims(data) == (w, h)


def test_noninterleaved_and_restarts_equal_baseline():
    px = _image()
    base = decode_jpeg(encode_jpeg(px, quality=90))
    ni = decode_jpeg(encode_jpeg_noninterleaved(px, quality=90))
    assert (ni == base).all()
    for ri in (1, 2, 7):
        rst = encode_jpeg_seq(px, quality=90, restart_interval=ri)
        assert b"\xff\xdd" in rst and b"\xff\xd0" in rst  # DRI + RST0
        assert (decode_jpeg(rst) == base).all(), ri


def test_subsampled_decode():
    """4:2:0 / 4:2:2 with odd dimensions (MCU padding edges) and
    restart markers; smooth-chroma content keeps PSNR high."""
    for h, w in [(17, 19), (24, 31), (8, 8), (9, 8), (16, 17), (33, 47)]:
        p = np.broadcast_to((np.arange(w) * 7) % 256, (h, w))
        px = np.stack([p, p[::-1], p // 2], -1).astype(np.uint8)
        for sub in ("4:2:0", "4:2:2"):
            d = decode_jpeg(encode_jpeg_seq(px, 90, sub, restart_interval=2))
            assert d.shape == px.shape
            assert psnr(d, px) > 32, (h, w, sub)  # chroma ramps at 4:2:0


def test_grayscale_decode():
    xx, yy = np.meshgrid(np.arange(40), np.arange(56))
    g = ((xx * 5 + yy * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_gray(g, quality=92))
    assert out.shape == (56, 40, 3)
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 0] == out[..., 2]).all()
    assert psnr(out, np.repeat(g[..., None], 3, axis=2)) > 40


def _hand_headers(h, w, progressive):
    from spider_ray.jpeg import ZIGZAG, quant_tables

    ql, _ = quant_tables(90)
    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xdb" + struct.pack(">HB", 67, 0)
            + bytes(int(x) for x in ql[ZIGZAG]))
    sof = 0xC2 if progressive else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    out += (b"\xff\xc4" + struct.pack(">HB", 19 + len(_PROG_AC_VALS), 0x10)
            + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS))
    return out


def test_hand_woven_progressive_vectors():
    """A 8x24 one-component progressive stream assembled symbol by
    symbol from T.81 §G.2's text — NOT via our encoder — must decode
    to the exact coefficient-implied pixels. Pins EOBn run arithmetic
    and the successive-approximation correction-bit protocol against
    mutually-consistent encoder/decoder bugs."""
    from spider_ray.jpeg import ZIGZAG, idct_channel, quant_tables

    tbl = _build_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def sym(bw, s):
        bw.put(int(tbl[0][s]), int(tbl[1][s]))

    out = _hand_headers(8, 24, progressive=True)
    # scan 1: AC first, band 1..5, Al=1 — block0 gets +1 at k=1 (scaled
    # by 2^1), then EOB1+ext=1 ⇒ eobrun = (1<<1)-1+1 = 2 ⇒ blocks 1,2
    # band-skipped entirely
    out += _sos([(1, 0, 0)], 1, 5, 0, 1)
    bw = _BitWriter()
    sym(bw, 0x01)   # run 0, size 1
    bw.put(1, 1)    # magnitude bit → +1
    sym(bw, 0x10)   # EOB1
    bw.put(1, 1)    # extension bit
    out += bw.bytes()
    # scan 2: AC refinement Ah=1→Al=0 — block0: correction bit 1 for
    # k=1 (history: 2→3), new -1 at k=3 (one zero-history coeff k=2
    # between), then EOBn for run of 3 (block0 tail + blocks 1, 2)
    out += _sos([(1, 0, 0)], 1, 5, 1, 0)
    bw = _BitWriter()
    sym(bw, 0x11)   # run 1 (zero-history k=2), size 1
    bw.put(0, 1)    # sign bit → −1 at k=3
    bw.put(1, 1)    # correction bit for k=1 (read during the advance)
    sym(bw, 0x10)   # EOB1 …
    bw.put(1, 1)    # … +ext 1 ⇒ eobrun = 2+1 = 3
    out += bw.bytes()
    out += b"\xff\xd9"

    got = decode_jpeg_general(bytes(out))
    # expected: zigzag coef k=1 → +3, k=3 → −1 in block 0 only
    q = quant_tables(90)[0].astype(np.float64)
    coefs = np.zeros((3, 64), dtype=np.int32)
    coefs[0, 1] = 3
    coefs[0, 3] = -1
    plane = idct_channel(coefs, q, 8, 24)
    want = np.clip(np.round(plane), 0, 255).astype(np.uint8)
    assert (got[..., 0] == want).all()


def test_corruption_rejected():
    px = _image(24, 24)
    data = bytearray(encode_jpeg_progressive(px, quality=90))
    # flip a byte inside the last scan's entropy data
    data[-20] ^= 0x55
    try:
        out = decode_jpeg(bytes(data))
        assert out.shape == (24, 24, 3)  # a silent decode must not crash
    except (ValueError, NotImplementedError):
        pass  # rejected: fine
    with pytest.raises(ValueError):
        decode_jpeg_general(b"\xff\xd8\xff\xd9")  # no frame

    # restart markers without DRI are structurally invalid
    seq = bytearray(encode_jpeg_seq(px, 90, restart_interval=2))
    dri = seq.index(b"\xff\xdd")
    del seq[dri : dri + 6]
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(bytes(seq))


def test_fast_path_still_fast_path():
    """Baseline 4:4:4 single-scan must NOT route through jpeg2 (the
    synth world's hot path)."""
    import unittest.mock as mock

    px = _image(16, 16)
    data = encode_jpeg(px, quality=90)
    with mock.patch("spider_ray.jpeg2.decode_jpeg_general",
                    side_effect=AssertionError("fast path delegated")):
        out = decode_jpeg(data)
    assert out.shape == (16, 16, 3)


def test_fill_bytes_and_per_scan_dri():
    """Spec-legal oddities: 0xFF fill bytes before markers (B.1.1.2)
    and a DRI that changes between scans must not desynchronize the
    parse — the restart interval is snapshotted per scan."""
    px = _image(24, 24)
    base = decode_jpeg(encode_jpeg(px, quality=90))
    data = encode_jpeg_seq(px, quality=90, restart_interval=2)
    # splice fill bytes before the DHT and SOS markers
    for marker in (b"\xff\xc4", b"\xff\xda"):
        i = data.index(marker)
        data = data[:i] + b"\xff\xff" + data[i:]
    assert (decode_jpeg(data) == base).all()
    # a second DRI after the scan (value 0) must not retroactively
    # apply to the first scan's restart markers
    eoi = data.rindex(b"\xff\xd9")
    data2 = data[:eoi] + b"\xff\xdd" + struct.pack(">HH", 4, 0) + data[eoi:]
    assert (decode_jpeg(data2) == base).all()


def test_exif_orientation():
    """EXIF orientation parse (APP1/TIFF IFD0 tag 0x0112, both byte
    orders) + the 8 upright mappings; absent/garbage EXIF → 1."""
    from spider_ray.jpeg import (apply_exif_orientation, encode_jpeg,
                                 jpeg_exif_orientation)

    px = _image(10, 8)
    data = encode_jpeg(px, quality=90)
    assert jpeg_exif_orientation(data) == 1  # no EXIF emitted

    def with_exif(orientation, end):
        # TIFF: header + one-entry IFD0
        if end == "<":
            tiff = (b"II*\x00" + struct.pack("<I", 8)
                    + struct.pack("<H", 1)
                    + struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
                    + struct.pack("<I", 0))
        else:
            tiff = (b"MM\x00*" + struct.pack(">I", 8)
                    + struct.pack(">H", 1)
                    + struct.pack(">HHIHH", 0x0112, 3, 1, orientation, 0)
                    + struct.pack(">I", 0))
        app1 = b"Exif\x00\x00" + tiff
        seg = b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1
        return data[:2] + seg + data[2:]

    for o in range(1, 9):
        assert jpeg_exif_orientation(with_exif(o, "<")) == o
        assert jpeg_exif_orientation(with_exif(o, ">")) == o

    # mappings: round-tripping through the inverse pairs restores px
    for o, inv in [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 8),
                   (7, 7), (8, 6)]:
        up = apply_exif_orientation(px, o)
        assert (apply_exif_orientation(up, inv) == px).all(), o
    # rotations change shape; mirrors don't
    assert apply_exif_orientation(px, 6).shape == (8, 10, 3)
    assert apply_exif_orientation(px, 2).shape == px.shape
    # malformed EXIF never raises
    broken = data[:2] + b"\xff\xe1\x00\x08Exif\x00\x00" + data[2:]
    assert jpeg_exif_orientation(broken) == 1
