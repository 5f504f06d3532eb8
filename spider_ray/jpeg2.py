"""General JPEG decode paths (ITU-T T.81) — progressive DCT,
subsampled components, restart intervals, grayscale, non-interleaved
sequential scans — plus the matching encoders used to exercise them.

:mod:`spider_ray.jpeg` keeps the vectorized fast path for the subset
the synthetic world emits (baseline 4:4:4 single-scan); its
``decode_jpeg`` delegates here the moment a stream needs more. This
module is correctness-first: per-MCU Python loops drive the entropy
stage (Huffman decoding is inherently serial), while dequantization /
IDCT / upsampling / color reuse the vectorized kernels of jpeg.py.

Implemented from the public spec:
  * §A.2 MCU structure and sampling-factor geometry (hmax/vmax MCU
    grids, per-component true vs padded block dims);
  * §B.2.3 multi-scan parsing, DRI/RSTn restart intervals (entropy
    data pre-split at restart markers; predictors and EOB runs reset);
  * §F.2 sequential Huffman decode (interleaved and single-component);
  * §G.1/G.2 progressive encode/decode: DC first + refinement, AC
    spectral-selection first scans with EOB runs, and AC successive-
    approximation refinement with correction bits;
  * JFIF chroma upsampling by sample replication (the spec leaves the
    filter open; replication is deterministic and codec-free).

Out of scope (explicit ``NotImplementedError``): 12-bit precision,
arithmetic coding, lossless/hierarchical SOFs, 16-bit quant tables.

The progressive/420 ENCODERS here are deliberately simple per-block
loops — they exist so the decoder is testable end-to-end (and so the
synthetic world can serve real progressive bytes); coefficient
equality between a progressive round trip and the baseline path is
asserted in tests, which pins both directions to the same spec.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .jpeg import (
    ZIGZAG,
    _AC_CHROMA_BITS,
    _AC_CHROMA_VALS,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_CHROMA_BITS,
    _DC_CHROMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    _D8,
    _build_codes,
    _build_decode_lut,
    _rgb_to_ycbcr,
    _to_blocks,
    idct_channel,
    quant_tables,
    ycbcr_to_rgb,
)

# --------------------------------------------------------------- parse
@dataclass
class _Comp:
    cid: int
    hs: int
    vs: int
    tq: int
    # block grid dims: true (scan coverage for non-interleaved scans)
    # and padded (MCU coverage for interleaved scans)
    tbw: int = 0
    tbh: int = 0
    bw: int = 0
    bh: int = 0
    # coefficients as plain Python lists during entropy decode (numpy
    # scalar indexing costs ~10x a list op in the per-coefficient
    # loops); converted to one int32 array after the last scan
    coef: list | None = None  # bh*bw lists of 64 ints, zigzag order
    pred: int = 0  # DC predictor (reset per scan/restart)
    eobrun: int = 0


@dataclass
class _Scan:
    comps: list  # [(comp_index, dc_table_id, ac_table_id)]
    ss: int
    se: int
    ah: int
    al: int
    ri: int = 0  # restart interval in force AT THIS SCAN (DRI may
    # legally change between scans — snapshotted at SOS time)
    segments: list = field(default_factory=list)  # entropy bytes split at RSTn


@dataclass
class _Frame:
    progressive: bool = False
    h: int = 0
    w: int = 0
    comps: list = field(default_factory=list)
    qtabs: dict = field(default_factory=dict)
    htabs: dict = field(default_factory=dict)  # (class<<4|id) → lut
    scans: list = field(default_factory=list)
    ri: int = 0  # restart interval (MCUs / blocks)


def _split_entropy(data: bytes, pos: int) -> tuple[list, int]:
    """Entropy-coded bytes from ``pos`` → (segments split at RSTn
    markers, position of the terminating marker's 0xFF)."""
    segments = []
    start = pos
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:
            pos += 2
            continue
        if 0xD0 <= nxt <= 0xD7:  # restart marker: segment boundary
            segments.append(data[start:pos])
            pos += 2
            start = pos
            continue
        break  # any other marker terminates the scan
    segments.append(data[start:pos])
    return segments, pos


def _parse(data: bytes) -> _Frame:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    f = _Frame()
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes before a marker (B.1.1.2)
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg, np.uint8, count=64, offset=sp + 1)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = zz
                f.qtabs[tq] = tbl
                sp += 65
        elif marker == 0xC4:
            sp = 0
            while sp < len(seg):
                tc_th = seg[sp]
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                f.htabs[tc_th] = _build_decode_lut(bits, vals)
                sp += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):
            f.progressive = marker == 0xC2
            prec, f.h, f.w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG")
            for c in range(nc):
                cid = seg[6 + 3 * c]
                samp = seg[7 + 3 * c]
                f.comps.append(_Comp(cid, samp >> 4, samp & 15,
                                     seg[8 + 3 * c]))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("lossless/hierarchical/arithmetic SOF")
        elif marker == 0xDD:
            (f.ri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            ns = seg[0]
            scomps = []
            by_id = {c.cid: i for i, c in enumerate(f.comps)}
            for c in range(ns):
                cs, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in by_id:
                    raise ValueError("scan names unknown component")
                scomps.append((by_id[cs], tsel >> 4, tsel & 15))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            scan = _Scan(scomps, ss, se, a >> 4, a & 15, ri=f.ri)
            scan.segments, pos = _split_entropy(data, pos)
            f.scans.append(scan)
        # APPn/COM skipped
    if not f.comps or not f.scans:
        raise ValueError("incomplete JPEG")
    hmax = max(c.hs for c in f.comps)
    vmax = max(c.vs for c in f.comps)
    mcux = -(-f.w // (8 * hmax))
    mcuy = -(-f.h // (8 * vmax))
    for c in f.comps:
        cw = -(-f.w * c.hs // hmax)
        ch = -(-f.h * c.vs // vmax)
        c.tbw, c.tbh = -(-cw // 8), -(-ch // 8)
        c.bw, c.bh = mcux * c.hs, mcuy * c.vs
        c.coef = [[0] * 64 for _ in range(c.bh * c.bw)]
    f.hmax, f.vmax, f.mcux, f.mcuy = hmax, vmax, mcux, mcuy  # type: ignore
    return f


# ----------------------------------------------------------- bit reader
class _BitReader:
    """MSB-first bit reader over one entropy segment (stuffed 0xFF00
    already means literal 0xFF; segments never contain markers). Reads
    past the end see 1-bits — a decoder overrun then hits an
    all-ones Huffman peek, which no table assigns, and raises."""

    __slots__ = ("d", "p", "buf", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.p = 0
        self.buf = 0
        self.n = 0

    def _fill(self) -> None:
        d, p, n = self.d, self.p, len(self.d)
        buf, nb = self.buf & ((1 << self.n) - 1), self.n  # drop dead bits
        while nb < 25:
            if p < n:
                b = d[p]
                p += 1
                if b == 0xFF:
                    p += 1  # skip the stuffed 0x00
            else:
                b = 0xFF
            buf = (buf << 8) | b
            nb += 8
        self.p, self.buf, self.n = p, buf, nb

    def bit(self) -> int:
        if self.n < 1:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, s: int) -> int:
        if s == 0:
            return 0
        if self.n < s:
            self._fill()
        self.n -= s
        return (self.buf >> self.n) & ((1 << s) - 1)

    def decode(self, lut: list) -> int:
        if self.n < 16:
            self._fill()
        e = lut[(self.buf >> (self.n - 16)) & 0xFFFF]
        if e < 0:
            raise ValueError("invalid Huffman code")
        self.n -= e & 31
        return e >> 5


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ------------------------------------------------------------ decoding
def _scan_block_order(f: _Frame, scan: _Scan):
    """Yield (comp_index, flat_block_index, unit_ordinal) in stream
    order; ``unit_ordinal`` counts MCUs (interleaved) or blocks
    (single-component) for restart accounting."""
    if len(scan.comps) > 1:  # interleaved: MCU raster (§A.2.3)
        for my in range(f.mcuy):
            for mx in range(f.mcux):
                unit = my * f.mcux + mx
                for ci, _, _ in scan.comps:
                    c = f.comps[ci]
                    for v in range(c.vs):
                        for u in range(c.hs):
                            row, col = my * c.vs + v, mx * c.hs + u
                            yield ci, row * c.bw + col, unit
    else:  # non-interleaved: the component's TRUE block grid (§A.2.2)
        ci = scan.comps[0][0]
        c = f.comps[ci]
        unit = 0
        for row in range(c.tbh):
            for col in range(c.tbw):
                yield ci, row * c.bw + col, unit
                unit += 1


def _decode_scan(f: _Frame, scan: _Scan) -> None:
    seq = not f.progressive
    is_dc = scan.ss == 0
    if seq:
        ss, se, ah, al = 0, 63, 0, 0
    else:
        ss, se, ah, al = scan.ss, scan.se, scan.ah, scan.al
        if is_dc and se != 0:
            raise ValueError("progressive scan mixes DC and AC")
    luts = {}
    for ci, dci, aci in scan.comps:
        dc_lut = f.htabs.get(0x00 | dci)
        ac_lut = f.htabs.get(0x10 | aci)
        if (is_dc and ah == 0 and dc_lut is None) or (
            (seq or not is_dc) and se > 0 and ac_lut is None
        ):
            raise ValueError("missing Huffman table")
        luts[ci] = (dc_lut, ac_lut)

    blocks = list(_scan_block_order(f, scan))
    if len(scan.segments) > 1 and not scan.ri:
        raise ValueError("restart markers present but DRI is zero")
    seg_iter = iter(scan.segments)
    r = _BitReader(next(seg_iter))
    for c in f.comps:
        c.pred = 0
        c.eobrun = 0
    ri = scan.ri
    prev_unit = 0
    units_done = 0
    for ci, bi, unit in blocks:
        if unit != prev_unit:
            units_done += 1
            prev_unit = unit
            if ri and units_done % ri == 0:
                r = _BitReader(next(seg_iter, b""))  # restart: new segment
                for c in f.comps:
                    c.pred = 0
                    c.eobrun = 0
        comp = f.comps[ci]
        coef = comp.coef[bi]
        dc_lut, ac_lut = luts[ci]
        if seq:
            s = r.decode(dc_lut)
            if s:
                comp.pred += _extend(r.receive(s), s)
            coef[0] = comp.pred
            k = 1
            while k < 64:
                rs = r.decode(ac_lut)
                rr, s = rs >> 4, rs & 15
                if s == 0:
                    if rr == 15:
                        k += 16
                        continue
                    break  # EOB
                k += rr
                if k > 63:
                    raise ValueError("AC index overflow")
                coef[k] = _extend(r.receive(s), s)
                k += 1
        elif is_dc:
            if ah == 0:  # DC first (§G.2.1)
                s = r.decode(dc_lut)
                if s:
                    comp.pred += _extend(r.receive(s), s)
                coef[0] = comp.pred << al
            else:  # DC refinement: one bit per block
                if r.bit():
                    coef[0] |= 1 << al
        elif ah == 0:  # AC first scan for the band (§G.2.2)
            if comp.eobrun:
                comp.eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = r.decode(ac_lut)
                rr, s = rs >> 4, rs & 15
                if s == 0:
                    if rr != 15:
                        comp.eobrun = (1 << rr) - 1
                        if rr:
                            comp.eobrun += r.receive(rr)
                        break
                    k += 16  # ZRL
                    continue
                k += rr
                if k > se:
                    raise ValueError("AC index overflow")
                coef[k] = _extend(r.receive(s), s) << al
                k += 1
        else:  # AC refinement (§G.2.2 successive approximation)
            p1, m1 = 1 << al, -1 << al
            k = ss
            if comp.eobrun == 0:
                while k <= se:
                    rs = r.decode(ac_lut)
                    rr, s = rs >> 4, rs & 15
                    val = 0
                    if s == 0:
                        if rr != 15:
                            comp.eobrun = 1 << rr
                            if rr:
                                comp.eobrun += r.receive(rr)
                            break
                        # ZRL: advance over 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError("refinement size must be 1")
                        val = p1 if r.bit() else m1
                    while k <= se:
                        if coef[k] != 0:
                            if r.bit() and (coef[k] & p1) == 0:
                                coef[k] += p1 if coef[k] >= 0 else m1
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if val and k <= se:
                        coef[k] = val
                    k += 1
            if comp.eobrun > 0:
                while k <= se:
                    if coef[k] != 0:
                        if r.bit() and (coef[k] & p1) == 0:
                            coef[k] += p1 if coef[k] >= 0 else m1
                    k += 1
                comp.eobrun -= 1


def decode_jpeg_general(data: bytes) -> np.ndarray:
    """Progressive / subsampled / restart-interval / grayscale /
    multi-scan-sequential JPEG → (H, W, 3) uint8 RGB."""
    f = _parse(data)
    for scan in f.scans:
        _decode_scan(f, scan)
    chans = []
    for c in f.comps:
        try:
            q = f.qtabs[c.tq].astype(np.float64)
        except KeyError as exc:
            raise ValueError("missing quant table") from exc
        coefs = np.array(c.coef, dtype=np.int32)
        plane = idct_channel(coefs, q, c.bh * 8, c.bw * 8)
        cw = -(-f.w * c.hs // f.hmax)
        ch = -(-f.h * c.vs // f.vmax)
        plane = plane[:ch, :cw]
        ry, rx = f.vmax // c.vs, f.hmax // c.hs
        if ry > 1 or rx > 1:  # replication upsample (JFIF-open choice)
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        chans.append(plane[: f.h, : f.w])
    if len(chans) == 1:  # grayscale
        g = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    return ycbcr_to_rgb(*chans)


# ------------------------------------------------------------ encoders
class _BitWriter:
    """MSB-first bit assembler with 0xFF byte stuffing; ``restart``
    1-pads to a byte boundary and emits the cycling RSTn marker."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0
        self.rst = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)

    def restart(self) -> None:
        self.align()
        self.out += bytes([0xFF, 0xD0 + self.rst])
        self.rst = (self.rst + 1) & 7

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


_ENC_TABLES = {
    0x00: _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
    0x01: _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    0x10: _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
    0x11: _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
}

# Progressive AC table: the K.3 sequential tables carry no EOBn (n>0)
# symbols and are Kraft-full, so progressive scans declare their own
# table in the DHT — a uniform 8-bit canonical code over every symbol
# a progressive AC scan can emit: EOB0..EOB14, ZRL, and (run<<4)|size
# for run 0..15, size 1..10. 176 codes at length 8 (Kraft 176/256),
# all-ones 8-bit code left unassigned per the JPEG convention.
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = (
    [r << 4 for r in range(15)]  # EOB0..EOB14 (0x00 is also seq EOB)
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_ENC = _build_codes(_PROG_AC_BITS, _PROG_AC_VALS)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _put_sym(w: _BitWriter, tbl, sym: int) -> None:
    code, ln = int(tbl[0][sym]), int(tbl[1][sym])
    w.put(code, ln)


def _quantized_components(
    pixels: np.ndarray, quality: int, hv: list
) -> tuple[list, list, int, int]:
    """→ (per-comp (bh*bw, 64) zigzag coefs on the PADDED MCU grid,
    per-comp quant-table ids, mcux, mcuy). ``hv`` = [(hs, vs)] * 3."""
    h, w, _ = pixels.shape
    ql, qc = quant_tables(quality)
    hmax = max(a for a, _ in hv)
    vmax = max(b for _, b in hv)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    ycc = _rgb_to_ycbcr(pixels)
    comps = []
    for ci, (hs, vs) in enumerate(hv):
        plane = ycc[ci]
        if hs != hmax or vs != vmax:  # box-mean downsample
            ry, rx = vmax // vs, hmax // hs
            ph = -(-h // ry) * ry
            pw = -(-w // rx) * rx
            pl = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = pl.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th, tw = plane.shape
        bh, bw_ = mcuy * vs, mcux * hs
        pl = np.pad(plane, ((0, bh * 8 - th), (0, bw_ * 8 - tw)), mode="edge")
        blocks = _to_blocks(pl - 128.0)
        coef = np.matmul(np.matmul(_D8, blocks), _D8.T)
        q = (ql if ci == 0 else qc).reshape(8, 8)
        comps.append(np.round(coef / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG])
    return comps, [0, 1, 1], mcux, mcuy


def _headers(h, w, quality, hv, progressive) -> bytearray:
    ql, qc = quant_tables(quality)
    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tid, tbl in ((0, ql), (1, qc)):
        out += (b"\xff\xdb" + struct.pack(">HB", 67, tid)
                + bytes(int(x) for x in tbl[ZIGZAG]))
    sof = 0xC2 if progressive else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for i, (hs, vs) in enumerate(hv):
        out += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    ac_l = (_PROG_AC_BITS, _PROG_AC_VALS) if progressive else (
        _AC_LUMA_BITS, _AC_LUMA_VALS)
    ac_c = (_PROG_AC_BITS, _PROG_AC_VALS) if progressive else (
        _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    for cls_id, (bits, vals) in (
        (0x00, (_DC_LUMA_BITS, _DC_LUMA_VALS)),
        (0x10, ac_l),
        (0x01, (_DC_CHROMA_BITS, _DC_CHROMA_VALS)),
        (0x11, ac_c),
    ):
        out += (b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), cls_id)
                + bytes(bits) + bytes(vals))
    return out


def _sos(comps_sel: list, ss: int, se: int, ah: int, al: int) -> bytes:
    """comps_sel = [(component_id_1based, dc_id, ac_id)]"""
    ns = len(comps_sel)
    body = bytes([ns])
    for cid, dci, aci in comps_sel:
        body += bytes([cid, (dci << 4) | aci])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg_seq(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """General baseline-sequential encoder: 4:4:4 / 4:2:2 / 4:2:0, one
    interleaved scan, optional DRI/RSTn restart markers. Slower than
    :func:`spider_ray.jpeg.encode_jpeg` (per-block loop) — the shapes
    the fast encoder does not emit."""
    hv = {"4:4:4": [(1, 1)] * 3,
          "4:2:2": [(2, 1), (1, 1), (1, 1)],
          "4:2:0": [(2, 2), (1, 1), (1, 1)]}[subsampling]
    h, w, _ = pixels.shape
    comps, _tq, mcux, mcuy = _quantized_components(pixels, quality, hv)
    out = _headers(h, w, quality, hv, progressive=False)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += _sos([(1, 0, 0), (2, 1, 1), (3, 1, 1)], 0, 63, 0, 0)
    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.restart()
                preds = [0, 0, 0]
            mcu_n += 1
            for ci, (hs, vs) in enumerate(hv):
                dct = _ENC_TABLES[0x00 if ci == 0 else 0x01]
                act = _ENC_TABLES[0x10 if ci == 0 else 0x11]
                cbw = mcux * hs
                for v in range(vs):
                    for u in range(hs):
                        blk = comps[ci][(my * vs + v) * cbw + mx * hs + u]
                        preds[ci] = _encode_block(bw, blk, dct, act,
                                                  preds[ci])
    out += bw.bytes()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Single-component (grayscale) baseline JPEG — the other common
    web shape. ``pixels`` is (H, W) uint8 luma."""
    assert pixels.ndim == 2 and pixels.dtype == np.uint8
    h, w = pixels.shape
    ql, _ = quant_tables(quality)
    bh, bw_ = -(-h // 8), -(-w // 8)
    pl = np.pad(pixels.astype(np.float64), ((0, bh * 8 - h), (0, bw_ * 8 - w)),
                mode="edge")
    blocks = _to_blocks(pl - 128.0)
    coef = np.matmul(np.matmul(_D8, blocks), _D8.T)
    qc_ = np.round(coef / ql.reshape(8, 8)).astype(np.int32).reshape(-1, 64)[
        :, ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += (b"\xff\xdb" + struct.pack(">HB", 67, 0)
            + bytes(int(x) for x in ql[ZIGZAG]))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes(
        [1, 0x11, 0])
    for cls_id, (bits, vals) in (
        (0x00, (_DC_LUMA_BITS, _DC_LUMA_VALS)),
        (0x10, (_AC_LUMA_BITS, _AC_LUMA_VALS)),
    ):
        out += (b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), cls_id)
                + bytes(bits) + bytes(vals))
    out += _sos([(1, 0, 0)], 0, 63, 0, 0)
    bw = _BitWriter()
    _encode_blocks_seq(bw, qc_, 0, range(qc_.shape[0]))
    out += bw.bytes()
    out += b"\xff\xd9"
    return bytes(out)


def _encode_block(bw: _BitWriter, blk, dct, act, pred: int) -> int:
    """Sequential-encode one block (DC diff + RLE AC); returns the new
    DC predictor. The single shared emission body for every
    sequential-encode caller."""
    diff = int(blk[0]) - pred
    pred = int(blk[0])
    s = _csize(diff)
    _put_sym(bw, dct, s)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and blk[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v_ = int(blk[k])
        if v_ == 0:
            run += 1
            continue
        while run > 15:
            _put_sym(bw, act, 0xF0)
            run -= 16
        s = _csize(v_)
        _put_sym(bw, act, (run << 4) | s)
        bw.put(v_ if v_ >= 0 else v_ + (1 << s) - 1, s)
        run = 0
    if last < 63:
        _put_sym(bw, act, 0x00)
    return pred


def _encode_blocks_seq(bw: _BitWriter, coefs: np.ndarray, ci: int,
                       order, pred_start: int = 0) -> int:
    """Sequential-encode blocks of one component in the given order;
    returns the final DC predictor."""
    dct = _ENC_TABLES[0x00 if ci == 0 else 0x01]
    act = _ENC_TABLES[0x10 if ci == 0 else 0x11]
    pred = pred_start
    for b in order:
        pred = _encode_block(bw, coefs[b], dct, act, pred)
    return pred


def encode_jpeg_noninterleaved(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Baseline SOF0 with THREE single-component scans (a legal and
    occasionally-seen sequential layout; exercises the ns=1 scan path
    and the fast-path delegation)."""
    h, w, _ = pixels.shape
    hv = [(1, 1)] * 3
    comps, _tq, _mx, _my = _quantized_components(pixels, quality, hv)
    out = _headers(h, w, quality, hv, progressive=False)
    for ci in range(3):
        out += _sos([(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1)],
                    0, 63, 0, 0)
        bw = _BitWriter()
        _encode_blocks_seq(bw, comps[ci], ci, range(comps[ci].shape[0]))
        out += bw.bytes()
    out += b"\xff\xd9"
    return bytes(out)


# progression scripts: [(comp_indices, Ss, Se, Ah, Al)].
# "full" is the libjpeg default for YCbCr (successive approximation +
# spectral selection — the hardest decode path); "spectral" is the
# equally-legal spectral-selection-only form (4 scans, no SA) that
# many encoders emit — cheaper on both sides, so the synthetic world
# serves it while tests drive the full script.
_PROG_SCRIPTS = {
    "full": [
        ((0, 1, 2), 0, 0, 0, 1),
        ((0,), 1, 5, 0, 2),
        ((2,), 1, 63, 0, 1),
        ((1,), 1, 63, 0, 1),
        ((0,), 6, 63, 0, 2),
        ((0,), 1, 63, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((2,), 1, 63, 1, 0),
        ((1,), 1, 63, 1, 0),
        ((0,), 1, 63, 1, 0),
    ],
    "spectral": [
        ((0, 1, 2), 0, 0, 0, 0),
        ((0,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((1,), 1, 63, 0, 0),
    ],
}


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 90, script: str = "full"
) -> bytes:
    """Progressive DCT encoder (4:4:4): DC first/refine, AC
    spectral-selection first scans with EOB runs, AC successive-
    approximation refinement with buffered correction bits (T.81
    §G.1). ``script`` picks the progression (see _PROG_SCRIPTS)."""
    h, w, _ = pixels.shape
    hv = [(1, 1)] * 3
    comps, _tq, mcux, mcuy = _quantized_components(pixels, quality, hv)
    out = _headers(h, w, quality, hv, progressive=True)
    for comp_idx, ss, se, ah, al in _PROG_SCRIPTS[script]:
        sel = [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1)
               for ci in comp_idx]
        out += _sos(sel, ss, se, ah, al)
        bw = _BitWriter()
        if ss == 0:
            _enc_dc_scan(bw, comps, comp_idx, mcux, mcuy, ah, al)
        else:
            ci = comp_idx[0]
            act = _PROG_AC_ENC
            if ah == 0:
                _enc_ac_first(bw, comps[ci], act, ss, se, al)
            else:
                _enc_ac_refine(bw, comps[ci], act, ss, se, al)
        out += bw.bytes()
    out += b"\xff\xd9"
    return bytes(out)


def _enc_dc_scan(bw, comps, comp_idx, mcux, mcuy, ah, al) -> None:
    preds = {ci: 0 for ci in comp_idx}
    for b in range(mcuy * mcux):
        for ci in comp_idx:
            dc = int(comps[ci][b][0])
            if ah == 0:  # first: code (DC >> Al) differences — the DC
                # point transform is an ARITHMETIC shift (G.1.2.1),
                # unlike AC's sign-magnitude shift
                v = dc >> al
                diff = v - preds[ci]
                preds[ci] = v
                s = _csize(diff)
                _put_sym(bw, _ENC_TABLES[0x00 if ci == 0 else 0x01], s)
                if s:
                    bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            else:  # refinement: the Al bit of the two's-complement DC
                bw.put((dc >> al) & 1, 1)


class _EobState:
    __slots__ = ("run", "pend")

    def __init__(self):
        self.run = 0
        self.pend: list[int] = []


def _flush_eobrun(bw, act, st: _EobState) -> None:
    if st.run > 0:
        nbits = st.run.bit_length() - 1
        _put_sym(bw, act, nbits << 4)
        if nbits:
            bw.put(st.run - (1 << nbits), nbits)
        st.run = 0
    for bit in st.pend:
        bw.put(bit, 1)
    st.pend = []


def _enc_ac_first(bw, coefs, act, ss, se, al) -> None:
    st = _EobState()
    for b in range(coefs.shape[0]):
        blk = coefs[b]
        run = 0
        wrote = False
        for k in range(ss, se + 1):
            c = int(blk[k])
            v = c >> al if c >= 0 else -((-c) >> al)
            if v == 0:
                run += 1
                continue
            if st.run:
                _flush_eobrun(bw, act, st)
            while run > 15:
                _put_sym(bw, act, 0xF0)
                run -= 16
            s = _csize(v)
            _put_sym(bw, act, (run << 4) | s)
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
            wrote = True
        if run > 0 or not wrote:
            st.run += 1
            if st.run == 0x7FFF:
                _flush_eobrun(bw, act, st)
    _flush_eobrun(bw, act, st)


def _enc_ac_refine(bw, coefs, act, ss, se, al) -> None:
    """One-pass walk mirroring the decoder's consumption order: ZRLs
    are emitted the moment a run can no longer fold into the block's
    EOB, and each emitted symbol flushes exactly the correction bits
    of the history coefficients its run traversed (G.1.2.3)."""
    st = _EobState()
    for b in range(coefs.shape[0]):
        blk = coefs[b]
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eob = -1  # index of the LAST newly-significant coefficient
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        run = 0
        pend: list[int] = []  # correction bits since the last symbol
        for i, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            while run > 15 and i <= eob:  # can't fold into EOB → ZRL
                _flush_eobrun(bw, act, st)
                _put_sym(bw, act, 0xF0)
                run -= 16
                for bit in pend:
                    bw.put(bit, 1)
                pend = []
            if t > 1:  # history coefficient → buffered correction bit
                pend.append(t & 1)
                continue
            # newly significant (t == 1)
            _flush_eobrun(bw, act, st)
            _put_sym(bw, act, (run << 4) | 1)
            bw.put(1 if int(blk[ss + i]) >= 0 else 0, 1)
            for bit in pend:
                bw.put(bit, 1)
            pend = []
            run = 0
        if run > 0 or pend:  # block ends in an EOB (with its tail bits)
            st.run += 1
            st.pend.extend(pend)
            if st.run == 0x7FFF:
                _flush_eobrun(bw, act, st)
    _flush_eobrun(bw, act, st)
