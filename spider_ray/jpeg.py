"""Baseline JPEG codec (ITU-T T.81) in numpy — no codec libraries.

Implements the baseline sequential DCT process from the public JPEG
spec (ITU-T Recommendation T.81 / ISO 10918-1) plus the JFIF container
(ITU-T T.871): 8-bit samples, Huffman entropy coding, the example
quantization matrices of Annex K.1/K.2, the example Huffman tables of
Annex K.3, and the libjpeg/IJG quality→scale-factor convention (a
public de-facto standard). Scope is the subset the engine needs:

  * encoder: 3-component YCbCr, 4:4:4 (no subsampling), one
    interleaved scan, no restart markers (the vectorized fast form;
    :mod:`spider_ray.jpeg2` adds progressive / 4:2:0 / 4:2:2 /
    grayscale / restart-interval encoders);
  * decoder: a vectorized fast path for exactly that subset; streams
    needing more — progressive SOF2, extended-sequential SOF1,
    subsampled components, restart intervals, grayscale, multi-scan
    sequential — DELEGATE to the general decoder in
    :mod:`spider_ray.jpeg2` (late r4). Lossless/hierarchical/
    arithmetic SOFs and 12-bit precision remain rejected, never
    mis-decoded.

Everything heavy is vectorized: the FDCT/quantization/zigzag and the
run-length symbol construction are whole-image numpy (the entropy
BITSTREAM is assembled by one packbits over all symbols, not a
per-symbol loop); the decoder's Huffman stage is a table-driven
16-bit-peek loop (one list lookup per symbol — Huffman decoding is
inherently sequential) feeding vectorized dequantize/IDCT/color.

Mirrors reference behavior: the reference stores crawled JPEGs via
Scrapy's ImagesPipeline (pyspiders-master items.py:25-27, relying on
PIL); here the codec itself is part of the engine so the sink's
decode/PSNR invariant (verify.py) runs against real JPEG bytes.

Pure and deterministic: no wall clock, no RNG.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------
# Tables from ITU-T T.81 Annex K (public spec).

# K.1 — luminance quantization, natural (row-major) order
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# K.2 — chrominance quantization
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Zigzag scan order (T.81 Figure 5): ZIGZAG[k] = natural index of the
# k-th coefficient in zigzag order.
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

# K.3 example Huffman tables as (BITS[1..16], HUFFVAL) pairs.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Canonical Huffman code assignment per T.81 Annex C: returns
    (code, length) arrays indexed by SYMBOL (0..255)."""
    code_arr = np.zeros(256, dtype=np.uint32)
    len_arr = np.zeros(256, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            code_arr[sym] = code
            len_arr[sym] = length
            code += 1
            k += 1
        code <<= 1
    return code_arr, len_arr


_ENC_DC_L = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
_ENC_DC_C = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
_ENC_AC_L = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
_ENC_AC_C = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)


_LUT_CACHE: dict = {}


def _build_decode_lut(bits: list[int], vals: list[int]) -> list[int]:
    """16-bit-peek decode LUT: LUT[next16bits] → (symbol << 5) | length,
    −1 for unassigned codes. ONE packed Python list — a single list
    index per symbol is measurably cheaper in the scan hot loop than
    separate (symbol, length) lookups. Cached by table content —
    building 65536 entries costs ~10 ms, which would otherwise dominate
    small-image decodes."""
    ck = (tuple(bits), tuple(vals))
    hit = _LUT_CACHE.get(ck)
    if hit is not None:
        return hit
    lut = [-1] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            packed = (vals[k] << 5) | length
            for x in range(1 << (16 - length)):
                lut[base + x] = packed
            code += 1
            k += 1
        code <<= 1
    _LUT_CACHE[ck] = lut
    return lut


_DEC_DC_L = _build_decode_lut(_DC_LUMA_BITS, _DC_LUMA_VALS)
_DEC_DC_C = _build_decode_lut(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
_DEC_AC_L = _build_decode_lut(_AC_LUMA_BITS, _AC_LUMA_VALS)
_DEC_AC_C = _build_decode_lut(_AC_CHROMA_BITS, _AC_CHROMA_VALS)


def _dct8() -> np.ndarray:
    k = np.arange(8)[:, None]
    i = np.arange(8)[None, :]
    m = np.cos(np.pi / 8 * (i + 0.5) * k)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / 8)


_D8 = _dct8()


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the IJG quality convention (libjpeg
    ``jpeg_quality_scaling``): scale = 5000/q below 50, 200-2q above;
    entries clamped to [1, 255] (baseline requires 8-bit tables)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_Q_CHROMA * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


# ---------------------------------------------------------------------
# encoder


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB → (3, H, W) float64 YCbCr (JFIF / T.871)."""
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr])


def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """(H8, W8) → (nb, 8, 8) in raster block order."""
    h, w = chan.shape
    return (
        chan.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    nby, nbx = h8 // 8, w8 // 8
    return (
        blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(h8, w8)
    )


def _bit_size(v: np.ndarray) -> np.ndarray:
    """JPEG magnitude category: number of bits of |v| (0 for v == 0)."""
    return np.frexp(np.abs(v).astype(np.float64))[1].astype(np.int64)


def _pack_records(codes: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate variable-length bit records (value ``codes[i]`` in
    its low ``lens[i]`` bits) MSB-first, 1-pad to a byte boundary (T.81
    F.1.2.3), and byte-stuff 0xFF with a following 0x00 — all
    vectorized (one boolean scatter + packbits for the whole scan)."""
    lens = lens.astype(np.int64)
    total = int(lens.sum())
    ends = np.cumsum(lens)
    starts = ends - lens
    nbits_out = (total + 7) & ~7
    bitvec = np.ones(nbits_out, dtype=np.uint8)  # 1-fill padding
    # records are tightly packed, so global bit j belongs to record i
    # with starts[i] <= j < ends[i]; MSB-first within the record
    shift = np.repeat(ends, lens) - 1 - np.arange(total, dtype=np.int64)
    vals = (np.repeat(codes.astype(np.uint64), lens) >> shift.astype(np.uint64)) & 1
    bitvec[:total] = vals.astype(np.uint8)
    del starts
    by = np.packbits(bitvec)
    # byte stuffing: every 0xFF in the entropy stream is followed by 0x00
    ff = by == 0xFF
    if ff.any():
        out = np.zeros(len(by) + int(ff.sum()), dtype=np.uint8)
        idx = np.arange(len(by)) + np.cumsum(ff) - ff  # shift past stuffed 0x00s
        out[idx] = by
        by = out
    return by.tobytes()


def _component_symbols(qcoef: np.ndarray, comp: int) -> tuple[np.ndarray, ...]:
    """Quantized zigzag coefficients (nb, 64) for one component →
    (sort_key, huffbits, hufflens) symbol arrays. ``comp`` orders the
    interleaved MCU stream (Y=0, Cb=1, Cr=2, 4:4:4 ⇒ one block per
    component per MCU)."""
    nb = qcoef.shape[0]
    enc_dc = _ENC_DC_L if comp == 0 else _ENC_DC_C
    enc_ac = _ENC_AC_L if comp == 0 else _ENC_AC_C
    KEY = 65 * 8  # per-block key space: (pos 0..64, 64 = EOB) × (sub 0..7)

    def key(b, pos, sub):
        return (b * 3 + comp) * KEY + pos * 8 + sub

    # DC: difference vs previous block of the SAME component
    dc = qcoef[:, 0]
    diff = np.diff(dc, prepend=0)
    dsize = _bit_size(diff)
    dvalbits = np.where(diff < 0, diff + (1 << dsize) - 1, diff).astype(np.int64)
    dcode = enc_dc[0][dsize].astype(np.int64)
    dlen = enc_dc[1][dsize].astype(np.int64)
    dc_bits = (dcode << dsize) | dvalbits
    dc_lens = dlen + dsize
    dc_keys = key(np.arange(nb, dtype=np.int64), 0, 0)

    # AC: run-length coding over zigzag positions 1..63
    ac = qcoef[:, 1:]
    b_idx, p_idx = np.nonzero(ac != 0)
    v = ac[b_idx, p_idx].astype(np.int64)
    if len(b_idx):
        first = np.empty(len(b_idx), dtype=bool)
        first[0] = True
        first[1:] = b_idx[1:] != b_idx[:-1]
        shifted = np.empty_like(p_idx)
        shifted[0] = -1
        shifted[1:] = p_idx[:-1]
        run = p_idx - np.where(first, -1, shifted) - 1
    else:
        run = np.zeros(0, dtype=np.int64)
    nzrl = run >> 4  # ZRL (0xF0) symbols needed before this coefficient
    rem = run & 15
    size = _bit_size(v)
    valbits = np.where(v < 0, v + (1 << size) - 1, v).astype(np.int64)
    sym = (rem << 4) | size
    a_code = enc_ac[0][sym].astype(np.int64)
    a_len = enc_ac[1][sym].astype(np.int64)
    ac_bits = (a_code << size) | valbits
    ac_lens = a_len + size
    ac_keys = key(b_idx.astype(np.int64), p_idx + 1, 7)

    # ZRL fill symbols, keyed just before their coefficient
    tot_z = int(nzrl.sum())
    if tot_z:
        zb = np.repeat(b_idx, nzrl).astype(np.int64)
        zp = np.repeat(p_idx, nzrl).astype(np.int64)
        sub = np.arange(tot_z, dtype=np.int64) - np.repeat(
            np.cumsum(nzrl) - nzrl, nzrl
        )
        z_keys = key(zb, zp + 1, sub)  # sub < 4 < 7 ⇒ before the coeff
        z_bits = np.full(tot_z, int(enc_ac[0][0xF0]), dtype=np.int64)
        z_lens = np.full(tot_z, int(enc_ac[1][0xF0]), dtype=np.int64)
    else:
        z_keys = z_bits = z_lens = np.zeros(0, dtype=np.int64)

    # EOB for blocks whose last nonzero AC is before position 63
    last_nz = np.full(nb, -1, dtype=np.int64)
    if len(b_idx):
        last_nz[b_idx] = p_idx  # nonzeros are block-ordered; last wins
    eob_blocks = np.nonzero(last_nz < 62)[0]
    e_keys = key(eob_blocks, 64, 0)
    e_bits = np.full(len(eob_blocks), int(enc_ac[0][0x00]), dtype=np.int64)
    e_lens = np.full(len(eob_blocks), int(enc_ac[1][0x00]), dtype=np.int64)

    keys = np.concatenate([dc_keys, z_keys, ac_keys, e_keys])
    bits = np.concatenate([dc_bits, z_bits, ac_bits, e_bits])
    lens = np.concatenate([dc_lens, z_lens, ac_lens, e_lens])
    return keys, bits, lens


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (4:4:4, Annex K
    Huffman tables, IJG quality scaling)."""
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.dtype == np.uint8
    h, w, _ = pixels.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad image dimensions")
    ql, qc = quant_tables(quality)
    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    ycc = _rgb_to_ycbcr(pixels) - 128.0
    if h8 != h or w8 != w:  # edge-replicate pad to block multiples
        ycc = np.pad(ycc, ((0, 0), (0, h8 - h), (0, w8 - w)), mode="edge")

    all_keys, all_bits, all_lens = [], [], []
    for comp in range(3):
        blocks = _to_blocks(ycc[comp])
        # D8 @ block @ D8.T per block — chained matmul beats einsum here
        # (einsum re-runs its path search per call on small operands)
        coef = np.matmul(np.matmul(_D8, blocks), _D8.T)
        q = (ql if comp == 0 else qc).reshape(8, 8)
        qcoef = np.round(coef / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
        k, b, ln = _component_symbols(qcoef, comp)
        all_keys.append(k)
        all_bits.append(b)
        all_lens.append(ln)
    keys = np.concatenate(all_keys)
    order = np.argsort(keys, kind="stable")
    scan = _pack_records(
        np.concatenate(all_bits)[order], np.concatenate(all_lens)[order]
    )

    out = [b"\xff\xd8"]  # SOI
    out.append(  # APP0 / JFIF 1.01, no thumbnail
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tid, tbl in ((0, ql), (1, qc)):
        out.append(
            b"\xff\xdb" + struct.pack(">HB", 67, tid)
            + bytes(int(x) for x in tbl[ZIGZAG])  # stored in zigzag order
        )
    out.append(  # SOF0: 8-bit, 3 components, all 1×1 sampling
        b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    for cls_id, (bits, vals) in (
        (0x00, (_DC_LUMA_BITS, _DC_LUMA_VALS)),
        (0x10, (_AC_LUMA_BITS, _AC_LUMA_VALS)),
        (0x01, (_DC_CHROMA_BITS, _DC_CHROMA_VALS)),
        (0x11, (_AC_CHROMA_BITS, _AC_CHROMA_VALS)),
    ):
        out.append(
            b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), cls_id)
            + bytes(bits) + bytes(vals)
        )
    out.append(  # SOS
        b"\xff\xda" + struct.pack(">HB", 12, 3)
        + bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the SOF header alone — no entropy decode
    (frame samplers need dimensions without paying for pixels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes before a marker (B.1.1.2)
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _prec, h, w = struct.unpack_from(">BHH", data, pos + 4)
            return w, h
        pos += 2 + seglen
    raise ValueError("no SOF marker found")


def jpeg_exif_orientation(data: bytes) -> int:
    """EXIF orientation (1-8) from the APP1 segment's TIFF IFD0 (tag
    0x0112, SHORT) — the field real crawled photos carry and image
    pipelines must honor. Returns 1 (upright) when absent/malformed;
    never raises on tag soup."""
    pos = 2
    try:
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return 1
            while pos + 1 < len(data) and data[pos + 1] == 0xFF:
                pos += 1
            marker = data[pos + 1]
            if marker in (0xD8, 0xD9, 0xDA) or 0xD0 <= marker <= 0xD7:
                if marker == 0xDA:
                    return 1  # entropy data: no APP1 follows
                pos += 2
                continue
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
                tiff = data[pos + 10 : pos + 2 + seglen]
                if tiff[:2] == b"II":
                    end = "<"
                elif tiff[:2] == b"MM":
                    end = ">"
                else:
                    return 1
                (ifd0,) = struct.unpack_from(end + "I", tiff, 4)
                (nent,) = struct.unpack_from(end + "H", tiff, ifd0)
                for i in range(nent):
                    off = ifd0 + 2 + 12 * i
                    tag, typ, _cnt = struct.unpack_from(end + "HHI", tiff, off)
                    if tag == 0x0112 and typ == 3:  # SHORT
                        (o,) = struct.unpack_from(end + "H", tiff, off + 8)
                        return o if 1 <= o <= 8 else 1
                return 1
            pos += 2 + seglen
    except (struct.error, IndexError):
        return 1
    return 1


def apply_exif_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Map decoded pixels to upright display per the EXIF orientation
    values (TIFF 6.0 §Image orientation): 1 identity, 2 mirror-H,
    3 rotate 180, 4 mirror-V, 5 transpose, 6 rotate 90 CW,
    7 transverse, 8 rotate 90 CCW."""
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1]
    if orientation == 5:
        return px.transpose(1, 0, 2)
    if orientation == 6:
        return px.transpose(1, 0, 2)[:, ::-1]
    if orientation == 7:
        return px.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:
        return px.transpose(1, 0, 2)[::-1]
    return px


# ---------------------------------------------------------------------
# decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) uint8 RGB. Supports the subset
    :func:`encode_jpeg` emits (baseline sequential, 8-bit, 3-component
    4:4:4, Huffman, no restart intervals) and rejects everything else
    explicitly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, tuple[list[int], list[int]]] = {}
    h = w = 0
    comp_q: list[int] = []
    comp_dc_ac: list[tuple[int, int]] = []
    scan = b""
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes before a marker (B.1.1.2)
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg, dtype=np.uint8, count=64, offset=sp + 1)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = zz
                qtabs[tq] = tbl
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc_th = seg[sp]
                bits = list(seg[sp + 1 : sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + n])
                htabs[tc_th] = _build_decode_lut(bits, vals)
                sp += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if nc == 1:  # grayscale → general decoder
                from .jpeg2 import decode_jpeg_general

                return decode_jpeg_general(data)
            if prec != 8 or nc != 3:
                raise NotImplementedError("only 8-bit 3-component baseline")
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c - 0], seg[7 + 3 * c], seg[8 + 3 * c]
                del cid
                if samp != 0x11:  # subsampled → general decoder
                    from .jpeg2 import decode_jpeg_general

                    return decode_jpeg_general(data)
                comp_q.append(tq)
        elif marker in (0xC1, 0xC2):  # extended seq / progressive
            from .jpeg2 import decode_jpeg_general

            return decode_jpeg_general(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("lossless/hierarchical/arithmetic SOF")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", seg, 0)
            if ri:  # restart intervals → general decoder
                from .jpeg2 import decode_jpeg_general

                return decode_jpeg_general(data)
        elif marker == 0xDA:  # SOS — entropy data follows until EOI
            ns = seg[0]
            if ns != 3:  # non-interleaved sequential → general decoder
                from .jpeg2 import decode_jpeg_general

                return decode_jpeg_general(data)
            for c in range(ns):
                tsel = seg[2 + 2 * c]
                comp_dc_ac.append((tsel >> 4, tsel & 15))
            end = data.rfind(b"\xff\xd9")
            if end < 0:
                raise ValueError("missing EOI")
            scan = data[pos:end]
            pos = end
        # APPn/COM and others: skipped via seglen
    if not scan or not h:
        raise ValueError("incomplete JPEG")

    # un-stuff: drop the 0x00 after each 0xFF
    raw = np.frombuffer(scan, dtype=np.uint8)
    stuffed = np.zeros(len(raw), dtype=bool)
    stuffed[1:] = (raw[:-1] == 0xFF) & (raw[1:] == 0x00)
    byts = raw[~stuffed].tobytes()

    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    nb = (h8 // 8) * (w8 // 8)
    coefs = [np.zeros((nb, 64), dtype=np.int32) for _ in range(3)]
    luts = []
    for c in range(3):
        dci, aci = comp_dc_ac[c]
        try:
            luts.append((htabs[0x00 | dci], htabs[0x10 | aci]))
        except KeyError as exc:
            raise ValueError("missing Huffman table") from exc

    # sequential Huffman scan — the one inherently serial stage.
    # Hot-loop shape (this is ~60% of a small-image decode wall):
    #   * one ≤58-bit window refilled 32 bits per gulp (a Huffman code
    #     ≤16 bits plus its magnitude bits ≤11 is ≤27, so a window
    #     holding ≥27 bits always covers a full symbol — no inner
    #     refill loops between code and magnitude reads);
    #   * magnitude bits are pulled from the SAME window position as
    #     the code (one shift+mask instead of a second refill cycle);
    #   * coefficients buffer into flat Python lists and scatter into
    #     the numpy arrays once per image (a numpy scalar store per
    #     coefficient is ~10× a list append).
    # 0xFF padding mirrors the previous bi>=blen → 0xFF fill; any walk
    # into padding hits an all-ones peek, which no JPEG Huffman table
    # assigns, and raises "invalid Huffman code".
    byts += b"\xff" * 64
    preds = [0, 0, 0]
    idx_out: list[list[int]] = [[], [], []]
    val_out: list[list[int]] = [[], [], []]
    from_bytes = int.from_bytes
    buf = 0
    nbits = 0
    bi = 0
    for b in range(nb):
        base = b << 6
        for c in range(3):
            dc_tab, ac_tab = luts[c]
            oi = idx_out[c]
            ov = val_out[c]
            if nbits < 27:
                buf = ((buf & ((1 << nbits) - 1)) << 32) | from_bytes(
                    byts[bi : bi + 4], "big"
                )
                bi += 4
                nbits += 32
            e = dc_tab[(buf >> (nbits - 16)) & 0xFFFF]
            if e < 0:
                raise ValueError("invalid Huffman code")
            s = e >> 5
            if s:
                ln = (e & 31) + s
                bits = (buf >> (nbits - ln)) & ((1 << s) - 1)
                nbits -= ln
                preds[c] += bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1
            else:
                nbits -= e & 31
            oi.append(base)
            ov.append(preds[c])
            k = 1
            while k < 64:
                if nbits < 27:
                    buf = ((buf & ((1 << nbits) - 1)) << 32) | from_bytes(
                        byts[bi : bi + 4], "big"
                    )
                    bi += 4
                    nbits += 32
                e = ac_tab[(buf >> (nbits - 16)) & 0xFFFF]
                if e < 32:  # packed (rs=0)<<5|len is EOB; −1 is invalid
                    if e < 0:
                        raise ValueError("invalid Huffman code")
                    nbits -= e & 31  # EOB
                    break
                rs = e >> 5
                s = rs & 15
                k += rs >> 4
                if s == 0:
                    if rs != 0xF0:
                        raise ValueError("bad AC symbol")
                    nbits -= e & 31
                    k += 1  # ZRL = 16 zeros
                    continue
                if k > 63:
                    raise ValueError("AC index overflow")
                ln = (e & 31) + s
                bits = (buf >> (nbits - ln)) & ((1 << s) - 1)
                nbits -= ln
                oi.append(base + k)
                ov.append(bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1)
                k += 1
    for c in range(3):
        if idx_out[c]:
            coefs[c].ravel()[np.asarray(idx_out[c], dtype=np.int64)] = val_out[c]

    # vectorized reconstruction
    chans = []
    for c in range(3):
        try:
            q = qtabs[comp_q[c]].astype(np.float64)
        except KeyError as exc:
            raise ValueError("missing quant table") from exc
        chans.append(idct_channel(coefs[c], q, h8, w8)[:h, :w])
    return ycbcr_to_rgb(*chans)


def idct_channel(zz_coefs: np.ndarray, qtab: np.ndarray,
                 h8: int, w8: int) -> np.ndarray:
    """(nb, 64) zigzag-order quantized coefficients + natural-order
    quant table → (h8, w8) float64 spatial samples (level-shifted to
    0..255). Shared by the baseline fast path and the general
    (progressive/subsampled) decoder in :mod:`spider_ray.jpeg2`."""
    deq = zz_coefs.astype(np.float64) * qtab[ZIGZAG][np.newaxis, :]
    nat = np.zeros_like(deq)
    nat[:, ZIGZAG] = deq  # zigzag order → natural order
    blocks = nat.reshape(-1, 8, 8)
    spat = np.matmul(np.matmul(_D8.T, blocks), _D8)
    return _from_blocks(spat, h8, w8) + 128.0


def ycbcr_to_rgb(y: np.ndarray, cb_: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF/T.871 inverse color transform over float64 planes."""
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb_ - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb_ - 128.0)
    rgb = np.stack([r, g, bch], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
