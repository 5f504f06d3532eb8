"""Baseline JPEG codec (spider_ray.jpeg, ITU-T T.81 subset) — pure
numpy tests, no Ray needed."""

import numpy as np
import pytest

from spider_ray.imaging import FMT_JPEG, decode, phash, psnr
from spider_ray.jpeg import decode_jpeg, encode_jpeg, quant_tables
from spider_ray.synth import WorldConfig, image_bytes, image_fmt, image_pixels

RNG = np.random.RandomState(20260817)


def _cases():
    grad = np.clip(
        np.add.outer(np.arange(100), np.arange(120))[..., None]
        * np.array([1.0, 0.7, 0.3]),
        0, 255,
    ).astype(np.uint8)
    noise = RNG.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    checker = (np.indices((96, 80)).sum(0) % 2 * 255).astype(np.uint8)[
        ..., None
    ].repeat(3, -1)
    flat = np.full((40, 56, 3), 130, np.uint8)
    odd = RNG.randint(0, 256, (33, 47, 3), dtype=np.uint8)  # non-multiple-of-8
    tiny = RNG.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    return {"grad": grad, "noise": noise, "checker": checker,
            "flat": flat, "odd": odd, "tiny": tiny}


def test_roundtrip_psnr_at_sink_quality():
    # quality 98 is what the synthetic world uses: the sink invariant
    # needs >= 40 dB on ANY content — including pure noise (the worst
    # case for DCT quantization)
    for name, px in _cases().items():
        out = decode_jpeg(encode_jpeg(px, quality=98))
        assert out.shape == px.shape, name
        assert psnr(px, out) >= 41.0, (name, psnr(px, out))


def test_quality_monotone_and_compression_real():
    px = _cases()["grad"]
    sizes = [len(encode_jpeg(px, quality=q)) for q in (50, 75, 90, 98)]
    assert sizes == sorted(sizes)  # higher quality, more bytes
    assert sizes[-1] < px.nbytes  # still a real compressor at q98
    p50 = psnr(px, decode_jpeg(encode_jpeg(px, quality=50)))
    p98 = psnr(px, decode_jpeg(encode_jpeg(px, quality=98)))
    assert p50 < p98


def test_deterministic_bytes():
    px = _cases()["noise"]
    assert encode_jpeg(px, 95) == encode_jpeg(px, 95)


def test_jfif_marker_structure():
    data = encode_jpeg(_cases()["tiny"], 90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data


def test_corruption_flips_validation():
    """The decode/PSNR invariant must be falsifiable on real JPEG
    bytes: corrupting the entropy stream must either fail the decode
    or visibly damage the pixels (Huffman streams have no redundancy,
    so a mid-scan bit error cannot round-trip cleanly)."""
    px = _cases()["grad"]
    clean = encode_jpeg(px, quality=98)
    ref = decode_jpeg(clean)
    sos = clean.find(b"\xff\xda")
    start = sos + 14 + (len(clean) - sos) // 3  # inside the scan

    # single-byte flip: may stay symbol-aligned (it can land entirely in
    # one coefficient's magnitude bits) but the output must CHANGE —
    # Huffman streams carry no redundancy that could absorb it
    one = bytearray(clean)
    if one[start] in (0xFF, 0x00) or one[start - 1] == 0xFF:
        start += 2  # don't fabricate/destroy a marker byte-stuffing
    one[start] ^= 0x55
    try:
        out1 = decode_jpeg(bytes(one))
        assert not np.array_equal(out1, ref)
    except (ValueError, NotImplementedError):
        pass

    # multi-byte corruption: desyncs the symbol stream — the sink
    # invariant (PSNR >= 40 vs re-synthesized truth) must flip
    many = bytearray(clean)
    for off in range(5):
        if many[start + off] not in (0xFF, 0x00) and many[start + off - 1] != 0xFF:
            many[start + off] ^= 0x55
    try:
        out = decode_jpeg(bytes(many))
    except (ValueError, NotImplementedError):
        return  # decode failure = validation flip, good
    assert out.shape != px.shape or psnr(px, out) < 40.0


def test_rejects_unsupported_subsets():
    # progressive/subsampled streams now route to the general decoder
    # (spider_ray.jpeg2, tests/test_jpeg2.py); what remains rejected is
    # arithmetic coding, lossless/hierarchical SOFs and 12-bit samples
    data = bytearray(encode_jpeg(_cases()["tiny"], 90))
    sof = bytes(data).find(b"\xff\xc0")
    arith = bytearray(data)
    arith[sof + 1] = 0xC9  # arithmetic-coded sequential
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(arith))
    deep = bytearray(data)
    deep[sof + 1] = 0xC2   # progressive general path...
    deep[sof + 4] = 12     # ...but 12-bit precision
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(deep))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_quant_tables_ijg_scaling():
    ql50, _ = quant_tables(50)
    assert ql50[0] == 16  # Annex K.1 verbatim at q=50
    ql98, qc98 = quant_tables(98)
    assert ql98.max() <= 5 and ql98.min() >= 1
    assert qc98.max() <= 4


def test_synth_world_emits_and_roundtrips_jpeg():
    cfg = WorldConfig(num_hosts=4)
    keys = [f"img_{i}" for i in range(200)]
    fmts = {k: image_fmt(cfg, k) for k in keys}
    n_jpeg = sum(1 for f in fmts.values() if f == FMT_JPEG)
    # jpeg_pct=34% of lossy_pct=50% ≈ 17% of all images
    assert 10 <= n_jpeg <= 60
    checked = 0
    for k, f in fmts.items():
        if f != FMT_JPEG or checked >= 5:
            continue
        data, fmt, w, h = image_bytes(cfg, k)
        px = decode(data, fmt)
        truth = image_pixels(cfg, k)
        assert px.shape == truth.shape == (h, w, 3)
        assert psnr(px, truth) >= 40.0
        assert isinstance(phash(px), int)
        checked += 1
    assert checked == 5
