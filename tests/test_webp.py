"""VP8L (lossless WebP) codec tests — spider_ray.webp.

Round trips over adversarial images (every encoder path), decoder
behavior on malformed / unsupported streams, hand-assembled streams
for the header machinery, and the spec's structural invariants
(distance map, prefix-code completeness, packing widths)."""

import numpy as np
import pytest

from spider_ray.webp import (
    _DIST_MAP,
    FMT_WEBP,
    WebPError,
    _BitReader,
    _BitWriter,
    _prefix_encode,
    _prefix_value,
    decode_webp,
    encode_webp,
)

rng = np.random.RandomState(1234)


def _blocky(w, h, nc, bs, seed=0):
    r = np.random.RandomState(seed)
    pal = r.randint(0, 255, (nc, 3), dtype=np.uint8)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    idx = ((xx // bs) * 3 + (yy // bs) * 5 + (xx + yy) // (2 * bs)) % nc
    return pal[idx]


def test_palette_roundtrip_all_packings():
    # ≤2 colors → 8 px/byte, ≤4 → 4, ≤16 → 2, >16 → unpacked
    for nc in (2, 3, 4, 5, 16, 17, 64, 256):
        px = _blocky(37, 23, nc, 3, seed=nc)  # odd width exercises padding
        out = decode_webp(encode_webp(px))
        assert np.array_equal(out, px), f"nc={nc}"


def test_truecolor_roundtrip():
    px = rng.randint(0, 256, (41, 53, 3), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp(px)), px)


def test_tiny_and_degenerate_shapes():
    for shape in [(1, 1), (1, 9), (9, 1), (2, 2), (3, 16384 // 512)]:
        px = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp(px)), px), shape


def test_solid_color_image():
    px = np.full((20, 30, 3), 137, dtype=np.uint8)
    data = encode_webp(px)
    assert np.array_equal(decode_webp(data), px)
    assert len(data) < 120  # LZ77 collapses it


def test_all_predictor_modes_roundtrip():
    for mode in range(14):
        px = rng.randint(0, 256, (19, 27, 3), dtype=np.uint8)
        data = encode_webp(px, predictor_mode=mode)
        assert np.array_equal(decode_webp(data), px), f"mode {mode}"


def test_color_cache_roundtrip():
    for bits in (1, 4, 8, 11):
        px = _blocky(30, 22, 12, 3, seed=bits)
        data = encode_webp(px, cache_bits=bits)
        assert np.array_equal(decode_webp(data), px), f"cache {bits}"
    # cache on a true-color image too
    px = rng.randint(0, 4, (25, 25, 3), dtype=np.uint8) * 80
    px[0, 0] = (1, 2, 3)  # force >256? no — keep palette small but cached
    data = encode_webp(px.astype(np.uint8), cache_bits=6)
    assert np.array_equal(decode_webp(data), px)


def test_prefix_value_encode_inverse():
    for v in list(range(1, 70)) + [127, 128, 1000, 3072, 4095, 4096]:
        code, ev, eb = _prefix_encode(v)
        bw = _BitWriter()
        bw.write(ev, eb)
        br = _BitReader(bw.finish())
        assert _prefix_value(code, br) == v, v


def test_distance_map_structure():
    # the spec's published properties of the short-distance table
    assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120
    prev = 0
    for dx, dy in _DIST_MAP:
        assert 0 <= dy <= 7 and -8 <= dx <= 8
        assert dy > 0 or dx > 0  # strictly before the current pixel
        d2 = dx * dx + dy * dy
        assert d2 >= prev
        prev = d2


def test_container_and_signature_errors():
    px = rng.randint(0, 256, (5, 5, 3), dtype=np.uint8)
    good = encode_webp(px)
    with pytest.raises(WebPError):
        decode_webp(b"nope")
    with pytest.raises(WebPError):
        decode_webp(good[:10])
    # corrupt the VP8L signature byte
    bad = bytearray(good)
    idx = bad.index(b"VP8L"[0:4][0], 12)  # find 'V' of VP8L tag
    sig_pos = bad.find(b"VP8L") + 8
    bad[sig_pos] ^= 0xFF
    with pytest.raises(WebPError):
        decode_webp(bytes(bad))


def test_lossy_vp8_rejected_not_misdecoded():
    fake = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (
        4
    ).to_bytes(4, "little") + b"\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError):
        decode_webp(fake)


def test_truncated_stream_detected():
    px = _blocky(40, 40, 16, 4)
    good = encode_webp(px)
    with pytest.raises((WebPError, IndexError, ValueError)):
        decode_webp(good[: len(good) // 2])


def test_bit_flip_never_misdecodes_silently():
    """Flipping a payload bit must either raise or change the pixels —
    a silent identical decode would mean dead bits in the stream. Some
    flips legally decode to DIFFERENT pixels (entropy payload); they
    must never decode to the SAME pixels."""
    px = _blocky(24, 18, 8, 3, seed=9)
    good = encode_webp(px)
    start = good.find(b"VP8L") + 9  # past tag+size+signature
    flips = 0
    # +4: skip the 29-bit w/h/alpha-hint header — the alpha-hint bit
    # is advisory and legally decodes to the same pixels either way
    for byte_off in range(start + 4, min(start + 40, len(good))):
        bad = bytearray(good)
        bad[byte_off] ^= 0x10
        try:
            out = decode_webp(bytes(bad))
        except (WebPError, NotImplementedError, ValueError, IndexError):
            flips += 1
            continue
        if out.shape == px.shape and np.array_equal(out, px):
            raise AssertionError(f"silent identical decode at {byte_off}")
        flips += 1
    assert flips > 0


def test_header_dimensions():
    px = rng.randint(0, 256, (3, 300, 3), dtype=np.uint8)
    out = decode_webp(encode_webp(px))
    assert out.shape == (3, 300, 3)


def test_world_webp_images_roundtrip_exactly():
    """The synthetic world's webp images are palette-born: server
    encode → engine decode must be pixel-exact (the sink invariant for
    lossless formats)."""
    from spider_ray.imaging import decode
    from spider_ray.synth import WorldConfig, image_bytes, image_fmt, image_pixels

    cfg = WorldConfig(num_hosts=4, webp_pct=100, gif_pct=0, lossy_pct=0)
    n = 0
    for k in range(40):
        key = f"{k}_0"
        if image_fmt(cfg, key) != FMT_WEBP:
            continue
        data, fmt, w, h = image_bytes(cfg, key)
        assert fmt == FMT_WEBP
        px = decode(data, fmt)
        assert px.shape == (h, w, 3)
        assert np.array_equal(px, image_pixels(cfg, key))
        n += 1
    assert n == 40  # webp_pct=100, lossy_pct=0 ⇒ every image is webp


def test_simple_code_two_symbol_transmission_order():
    """2-symbol simple codes map bit 0 to the FIRST transmitted symbol
    (not canonically by value) — assemble a stream by hand: palette of
    2 colors written with symbols in descending order must still
    round-trip through the public API (the encoder emits ascending, so
    build the descending form manually with the bit writer)."""
    from spider_ray.webp import _read_prefix_code

    bw = _BitWriter()
    bw.write(1, 1)   # simple
    bw.write(1, 1)   # two symbols
    bw.write(1, 1)   # 8-bit first symbol
    bw.write(200, 8)  # first symbol = 200
    bw.write(3, 8)    # second symbol = 3
    bw.write(0b10, 2)  # payload: bit0=0 → 200, bit1=1 → 3
    br = _BitReader(bw.finish())
    code = _read_prefix_code(br, 256)
    assert code.decode(br) == 200
    assert code.decode(br) == 3
