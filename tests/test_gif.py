"""GIF89a codec tests (spider_ray.gif) — round-trip exactness over
palette media, spec-structure checks, corruption/scope contracts, and
the synth-world integration (gif-fmt images are palette-born, so the
sink invariant treats them as lossless like PNG)."""

import struct

import numpy as np
import pytest

from spider_ray.gif import (
    FMT_GIF,
    FMT_GIF_ANIM,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
)


def _palette_image(rng: np.random.Generator, h: int, w: int, ncolors: int):
    palette = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=(h, w))
    return palette[idx]


def test_round_trip_exact():
    rng = np.random.default_rng(7)
    for h, w, nc in [(1, 1, 1), (5, 3, 2), (64, 64, 16), (33, 71, 256),
                     (128, 128, 256)]:
        px = _palette_image(rng, h, w, nc)
        data = encode_gif(px)
        assert data[:6] == b"GIF89a" and data[-1] == 0x3B
        out = decode_gif(data)
        assert out.shape == px.shape
        assert (out == px).all()


def test_gradient_structured_image():
    # structured (non-random) content exercises long LZW matches
    xx, yy = np.meshgrid(np.arange(96), np.arange(80))
    px = np.stack([(xx // 8 * 32) % 256, (yy // 8 * 32) % 256,
                   ((xx + yy) // 16 * 64) % 256], axis=-1).astype(np.uint8)
    out = decode_gif(encode_gif(px))
    assert (out == px).all()


def test_lzw_table_reset_path():
    # enough distinct 2-grams to push the dictionary past 4096 entries
    # → the encoder's mid-stream Clear path runs and still round-trips
    rng = np.random.default_rng(11)
    px = _palette_image(rng, 160, 160, 256)  # 25.6k random pixels
    out = decode_gif(encode_gif(px))
    assert (out == px).all()


def test_lzw_kwkwk_case():
    # 'aaaa...' streams hit the code==next_code (KwKwK) decoder branch
    idx = np.zeros(64, dtype=np.uint8)
    enc = _lzw_encode(idx, 2)
    assert (_lzw_decode(enc, 2, 64) == idx).all()
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    assert (decode_gif(encode_gif(px)) == px).all()


def test_too_many_colors_rejected():
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    px = np.stack([xx % 256, yy % 256, (xx * 7 + yy * 3) % 256],
                  axis=-1).astype(np.uint8)  # thousands of colors
    with pytest.raises(ValueError, match="distinct colors"):
        encode_gif(px)


def test_corruption_rejected_not_misdecoded():
    rng = np.random.default_rng(3)
    px = _palette_image(rng, 48, 48, 64)
    data = bytearray(encode_gif(px))
    data[len(data) // 2] ^= 0xFF  # flip a byte inside the LZW stream
    try:
        out = decode_gif(bytes(data))
    except (ValueError, NotImplementedError, IndexError, struct.error):
        return  # rejected: fine
    # a silent decode must at least not crash; equality would mean the
    # flip landed in padding (possible but the pixel count must hold)
    assert out.shape == px.shape


def test_scope_contracts():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG........")


def test_interlaced_decode():
    """A GIF whose raster is transmitted in the spec's 4-pass interlace
    order decodes back to display order (Appendix E)."""
    from spider_ray.gif import _interlace_order

    rng = np.random.default_rng(5)
    for h in (1, 2, 7, 8, 9, 33):
        px = _palette_image(rng, h, 12, 8)
        order = _interlace_order(h)
        assert sorted(order.tolist()) == list(range(h))  # a permutation
        transmitted = px[order]  # rows in transmission order
        data = bytearray(encode_gif(transmitted))
        pos = 13 + 3 * (2 << (data[10] & 0x07))  # header + global color table
        assert data[pos] == 0x2C  # image descriptor
        data[pos + 9] |= 0x40  # set the interlace flag
        assert (decode_gif(bytes(data)) == px).all()


def test_gif87a_and_extensions_accepted():
    rng = np.random.default_rng(9)
    px = _palette_image(rng, 12, 10, 8)
    data = bytearray(encode_gif(px))
    # GIF87a signature variant
    d87 = bytes(data).replace(b"GIF89a", b"GIF87a", 1)
    assert (decode_gif(d87) == px).all()
    # splice a Graphic Control Extension before the image descriptor
    pos = 13 + 3 * (2 << (data[10] & 0x07))
    assert data[pos] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = bytes(data[:pos]) + gce + bytes(data[pos:])
    assert (decode_gif(spliced) == px).all()


def test_animation_round_trip_exact():
    rng = np.random.default_rng(21)
    frames = [_palette_image(rng, 24, 30, 16) for _ in range(7)]
    data = encode_gif_animation(frames, delay_cs=4)
    out = decode_gif_frames(data)
    assert len(out) == 7
    for a, b in zip(frames, out):
        assert (a == b).all()
    # the single-image API must reject the animation, not first-frame it
    with pytest.raises(NotImplementedError, match="animated"):
        decode_gif(data)


def test_still_gif_through_frames_api():
    rng = np.random.default_rng(23)
    px = _palette_image(rng, 9, 14, 5)
    frames = decode_gif_frames(encode_gif(px))
    assert len(frames) == 1 and (frames[0] == px).all()


def test_animation_contracts():
    rng = np.random.default_rng(25)
    with pytest.raises(ValueError, match="at least one frame"):
        encode_gif_animation([])
    a = _palette_image(rng, 8, 8, 4)
    b = _palette_image(rng, 8, 9, 4)  # mismatched (H, W)
    with pytest.raises(ValueError, match="share"):
        encode_gif_animation([a, b])
    # a frame rectangle reaching outside the logical screen is corrupt
    data = bytearray(encode_gif_animation([a, a]))
    pos = data.index(b"\x2c")  # first image descriptor
    data[pos + 1 : pos + 3] = struct.pack("<H", 5)  # left=5 → 5+8 > 8
    with pytest.raises(ValueError, match="outside logical screen"):
        decode_gif_frames(bytes(data))


def _moving_square_clip(n=9, h=24, w=32):
    bg = np.array([10, 200, 30], np.uint8)
    frames = []
    for i in range(n):
        f = np.broadcast_to(bg, (h, w, 3)).copy()
        y, x = (3 * i) % (h - 4), (5 * i) % (w - 4)
        f[y : y + 4, x : x + 4] = [
            (37 + 11 * i) % 256, (53 + 7 * i) % 256, (29 + 13 * i) % 256]
        frames.append(f)
    return frames


def test_delta_animation_round_trip():
    """delta=True emits sub-rectangle frames with transparent unchanged
    pixels; compositing reconstructs every frame exactly and the stream
    is smaller than the full-frame form."""
    frames = _moving_square_clip()
    d_delta = encode_gif_animation(frames, delta=True)
    d_full = encode_gif_animation(frames, delta=False)
    for enc in (d_delta, d_full):
        out = decode_gif_frames(enc)
        assert len(out) == len(frames)
        for a, b in zip(frames, out):
            assert (a == b).all()
    assert len(d_delta) < len(d_full)
    # the delta stream really contains sub-rectangle transparent frames
    assert b"\x21\xf9\x04\x05" in d_delta  # GCE: disposal=1 + transparency


def test_delta_identical_frames():
    """An unchanged frame becomes a 1×1 fully-transparent raster that
    still snapshots the full canvas."""
    rng = np.random.default_rng(31)
    a = _palette_image(rng, 8, 8, 4)
    out = decode_gif_frames(encode_gif_animation([a, a, a], delta=True))
    assert len(out) == 3
    for f in out:
        assert (f == a).all()


def test_delta_256_color_fallback():
    """A delta frame whose changed region holds 256 distinct colors has
    no palette slot left for transparency → full opaque frame."""
    big0 = np.zeros((16, 16, 3), np.uint8)
    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    big1 = np.stack([v, v[::-1], np.full((16, 16), 7, np.uint8)], -1)
    assert len(np.unique(big1.reshape(-1, 3), axis=0)) == 256
    out = decode_gif_frames(encode_gif_animation([big0, big1], delta=True))
    assert (out[0] == big0).all() and (out[1] == big1).all()


def test_disposal_restore_background_and_previous():
    """Hand-built streams exercise disposal methods 2 (restore to
    background) and 3 (restore to previous) — the sprite-over-backdrop
    forms real GIFs use."""
    from spider_ray.gif import _emit_frame, _GIF89

    bgidx = 1
    gct = np.array([[0, 0, 255], [200, 50, 25]], np.uint8)  # bg = index 1
    sprite = np.array([[77, 88, 99]], np.uint8)

    def build(disposal):
        out = bytearray()
        out += _GIF89
        # 6×4 screen, 2-entry global color table, background index 1
        out += struct.pack("<HHBBB", 6, 4, 0x80, bgidx, 0)
        out += gct.tobytes()  # exactly the 2 declared entries
        # frame 0: full screen of color 0
        _emit_frame(out, np.zeros((4, 6), np.uint8), gct[:1], 0, 0, 5, None)
        # patch its GCE disposal bits to the requested method
        pos = out.index(b"\x21\xf9\x04")
        out[pos + 3] = (out[pos + 3] & ~0x1C) | (disposal << 2)
        # frame 1: 2×2 sprite at (1,1) leaving the rest untouched
        _emit_frame(out, np.zeros((2, 2), np.uint8),
                    sprite, 1, 1, 5, None)
        out += b"\x3b"
        return bytes(out)

    # disposal 2: after frame 0 is shown, its region restores to the
    # background color → frame 1 = bg everywhere except the sprite
    f = decode_gif_frames(build(2))
    assert (f[0] == [0, 0, 255]).all()
    want = np.broadcast_to(gct[bgidx], (4, 6, 3)).copy()
    want[1:3, 1:3] = sprite[0]
    assert (f[1] == want).all()

    # disposal 3: restore to previous = the pre-frame canvas (bg color,
    # since frame 0 is the first) → same composite here, via the other path
    f3 = decode_gif_frames(build(3))
    assert (f3[1] == want).all()


def test_still_gif_transparency_and_subrect():
    """A still GIF that is a sub-rectangle of its logical screen (or
    carries transparency) composites over the spec's background color."""
    from spider_ray.gif import _emit_frame, _GIF89

    out = bytearray()
    out += _GIF89
    out += struct.pack("<HHBBB", 8, 6, 0x80, 0, 0)  # bg = index 0
    gct = np.array([[9, 9, 9], [250, 1, 2]], np.uint8)
    out += gct.tobytes()
    # 3×2 raster at (2,1): index 1 opaque, index 0 transparent
    idx = np.array([[1, 0, 1], [0, 1, 0]], np.uint8)
    _emit_frame(out, idx, gct, 2, 1, 0, 0)
    out += b"\x3b"
    px = decode_gif(bytes(out))
    want = np.broadcast_to(gct[0], (6, 8, 3)).copy()
    for (r, c), v in np.ndenumerate(idx):
        if v == 1:
            want[1 + r, 2 + c] = gct[1]
    assert (px == want).all()


def test_frame_sample_gif_animation():
    """FrameSample samples every Nth animation frame and re-emits each
    as a lossless single-frame GIF."""
    import pyarrow as pa

    from spider_ray.imaging import decode
    from spider_ray.ops.multimodal import FrameSample

    rng = np.random.default_rng(27)
    frames = [_palette_image(rng, 16, 16, 8) for _ in range(8)]
    batch = pa.table(
        {
            "video_id": pa.array(["g0"], pa.string()),
            "bytes": pa.array([encode_gif_animation(frames)], pa.binary()),
            "fmt": pa.array([FMT_GIF_ANIM], pa.string()),
        }
    )
    out = FrameSample(every_n_frames=3)(batch)
    assert out["frame_idx"].to_pylist() == [0, 3, 6]
    assert out["fmt"].to_pylist() == [FMT_GIF] * 3
    for idx, blob in zip(out["frame_idx"].to_pylist(), out["bytes"].to_pylist()):
        assert (decode(blob, FMT_GIF) == frames[idx]).all()


def test_synth_world_gif_images():
    """gif-fmt world images are palette-born → exact round trip; the
    fmt mix includes gif; decode-dispatch handles it."""
    from spider_ray.imaging import decode, phash
    from spider_ray.synth import WorldConfig, image_bytes, image_fmt, image_pixels

    cfg = WorldConfig(num_hosts=4)
    fmts = {image_fmt(cfg, f"{k}_0") for k in range(300)}
    assert FMT_GIF in fmts and "png" in fmts
    checked = 0
    for k in range(300):
        key = f"{k}_0"
        if image_fmt(cfg, key) != FMT_GIF:
            continue
        data, fmt, w, h = image_bytes(cfg, key)
        assert fmt == FMT_GIF
        px = decode(data, fmt)
        gt = image_pixels(cfg, key)
        assert (px == gt).all()  # palette-born → lossless like PNG
        assert px.shape == (h, w, 3)
        n_colors = len(np.unique(px.reshape(-1, 3), axis=0))
        assert n_colors <= 256
        assert phash(px) == phash(gt)
        checked += 1
    assert checked >= 10
