"""Minimal FLAC codec (mono 16-bit) — numpy/struct/hashlib only.

Rounds 1-2 stubbed compressed audio behind "no codec in the
container". FLAC (xiph.org "FLAC format" specification / RFC 9639,
public) needs none: the stream is `fLaC` + metadata blocks
(STREAMINFO carries sample rate / channels / bps / total samples /
MD5 of the raw PCM) followed by independently-decodable frames, each
a CRC-8-checked header, one subframe per channel, and a CRC-16
footer. Subframes use CONSTANT / VERBATIM / FIXED-predictor / LPC
coding with Rice-coded residuals.

Scope (same honest-subset pattern as the JPEG, PNG, WAV and AVI
codecs in this repo):

  * encoder — mono, 16-bit, fixed 4096-sample blocks, FIXED
    predictors order 0-2 (chosen per block by residual magnitude),
    single-partition Rice residuals with per-block parameter search,
    escape-to-raw when Rice loses. Output is a conformant stream any
    FLAC decoder plays.
  * decoder — mono, 16-bit; subframe types CONSTANT, VERBATIM,
    FIXED order 0-4 AND LPC (any order), Rice methods 0 and 1, any
    partition order, wasted-bits, CRC-8 + CRC-16 verified, MD5
    verified against STREAMINFO. Multi-channel / other bit depths
    raise ``NotImplementedError`` rather than mis-decoding.

Mirrors the reference's media surface (pyspiders-master
items.py:25-27 stores media via Scrapy pipelines). Pure and
deterministic: no wall clock, no RNG.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FMT_FLAC = "flac"

_BLOCK = 4096

# CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame-header CRC
_CRC8_TBL = np.zeros(256, dtype=np.uint8)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07 if _c & 0x80 else _c << 1) & 0xFF
    _CRC8_TBL[_i] = _c

# CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frame CRC
_CRC16_TBL = np.zeros(256, dtype=np.uint16)
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005 if _c & 0x8000 else _c << 1) & 0xFFFF
    _CRC16_TBL[_i] = _c


def _crc8(data: bytes) -> int:
    c = 0
    t = _CRC8_TBL
    for b in data:
        c = int(t[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    t = _CRC16_TBL
    for b in data:
        c = int(t[(c >> 8) ^ b]) ^ ((c << 8) & 0xFFFF)
    return c


def _utf8_frame_number(n: int) -> bytes:
    """FLAC frame numbers use the UTF-8 variable-length pattern
    extended to 36 bits (RFC 9639 §9.1.5)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF00 >> nbytes) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        return bytes(self.out)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def encode_flac(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono PCM → conformant FLAC bytes."""
    x = np.asarray(samples, dtype=np.int16)
    n_total = len(x)
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()

    frames = bytearray()
    for fi, start in enumerate(range(0, max(n_total, 1), _BLOCK)):
        blk = x[start : start + _BLOCK]
        bs = len(blk)
        if bs == 0:
            break
        hdr = bytearray()
        # sync(14)=0x3FFE, reserved(1)=0, blocking(1)=0 → 0xFFF8
        hdr += b"\xff\xf8"
        # blocksize code: 12 means 256*2^(12-8)=4096; short last block
        # uses code 0b0111 (16-bit blocksize-1 follows)
        bs_code = 0b1100 if bs == 4096 else 0b0111
        # sample rate from STREAMINFO (code 0), mono (0), bps 16 (0b100)
        hdr.append((bs_code << 4) | 0)
        hdr.append((0 << 4) | (0b100 << 1))
        hdr += _utf8_frame_number(fi)
        if bs_code == 0b0111:
            hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))

        w = _BitWriter()
        const = bs > 0 and bool(np.all(blk == blk[0]))
        if const:
            w.write(0b000000 << 1, 8)  # pad(1)+type(6)+wasted(1)
            w.write(int(blk[0]) & 0xFFFF, 16)
        else:
            # pick the FIXED order 0-2 with the smallest |residual| sum
            best_order, best_res, best_cost = 0, None, None
            for order in range(0, min(3, bs)):
                res = _fixed_residual(blk, order)
                cost = int(np.sum(np.abs(res)))
                if best_cost is None or cost < best_cost:
                    best_order, best_res, best_cost = order, res, cost
            res = best_res
            w.write((0b001000 | best_order) << 1, 8)
            for warm in blk[:best_order]:
                w.write(int(warm) & 0xFFFF, 16)
            # residual: method 0 (4-bit Rice), partition order 0
            w.write(0, 2)
            w.write(0, 4)
            zz = (np.abs(res.astype(np.int64)) * 2
                  - (res < 0).astype(np.int64)).astype(np.uint64)
            # best Rice parameter by exact bit cost
            best_p, best_bits = 15, None  # 15 = escape
            for p in range(15):
                bits = int(np.sum(zz >> np.uint64(p))) + (1 + p) * len(zz)
                if best_bits is None or bits < best_bits:
                    best_p, best_bits = p, bits
            # raw width covers the widest residual as two's complement
            # (an order-2 residual of int16 can reach ±4·2^15 → 18 bits)
            max_abs = int(np.max(np.abs(res))) if len(res) else 0
            rawn = max(1, max_abs.bit_length() + 1)
            raw_bits = rawn * len(zz) + 5
            if best_bits is None or raw_bits < best_bits:
                w.write(0b1111, 4)  # escape: raw residuals
                w.write(rawn, 5)
                for v in res:
                    w.write(int(v) & ((1 << rawn) - 1), rawn)
            else:
                w.write(best_p, 4)
                p64 = np.uint64(best_p)
                for v in zz:
                    w.write_unary(int(v >> p64))
                    if best_p:
                        w.write(int(v) & ((1 << best_p) - 1), best_p)
        w.align()
        frame = bytes(hdr) + w.bytes()
        frames += frame + struct.pack(">H", _crc16(frame))

    si = _BitWriter()
    si.write(_BLOCK, 16)  # min blocksize
    si.write(_BLOCK, 16)  # max blocksize
    si.write(0, 24)  # min framesize unknown
    si.write(0, 24)  # max framesize unknown
    si.write(sample_rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bps - 1
    si.write(n_total, 36)
    streaminfo = si.bytes() + md5
    meta = bytes([0x80, 0, 0, len(streaminfo)]) + streaminfo  # last-block flag
    return b"fLaC" + meta + bytes(frames)


class _BitReader:
    """MSB-first bit reader with the same ≤58-bit window discipline as
    the JPEG scan loop (jpeg.py): 32-bit gulps, code+value from one
    window."""

    def __init__(self, data: bytes):
        self.data = data + b"\x00" * 8
        self.n = len(data)
        self.bi = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            self.buf = ((self.buf & ((1 << self.nbits) - 1)) << 32) | int.from_bytes(
                self.data[self.bi : self.bi + 4], "big"
            )
            self.bi += 4
            self.nbits += 32

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        v = (self.buf >> (self.nbits - nbits)) & ((1 << nbits) - 1)
        self.nbits -= nbits
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            self._fill(1)
            chunk = self.buf & ((1 << self.nbits) - 1)
            if chunk == 0:
                q += self.nbits
                self.nbits = 0
                if self.byte_pos() > self.n:
                    raise ValueError("unterminated unary code")
                continue
            top = chunk.bit_length()
            q += self.nbits - top
            self.nbits = top - 1
            return q

    def align(self) -> None:
        self.nbits -= self.nbits % 8

    def byte_pos(self) -> int:
        return self.bi - (self.nbits // 8)


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 frame number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_BLOCKSIZE_TBL = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                  8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                  13: 8192, 14: 16384, 15: 32768}


def _decode_residual(r: _BitReader, bs: int, pred_order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if bs % nparts:
        raise ValueError("partition order does not divide blocksize")
    if (bs >> po) - pred_order < 0:
        raise ValueError("first partition smaller than predictor order")
    out = np.empty(bs - pred_order, dtype=np.int64)
    pos = 0
    for part in range(nparts):
        cnt = (bs >> po) - (pred_order if part == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for i in range(cnt):
                out[pos + i] = r.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                q = r.read_unary()
                v = (q << param) | r.read(param)
                out[pos + i] = (v >> 1) ^ -(v & 1)
        pos += cnt
    return out


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (int16 mono samples, sample_rate). CRC-8, CRC-16
    and the STREAMINFO MD5 are all verified."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    sample_rate = None
    n_total = None
    md5_expect = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)
            br.read(24)
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            n_total = br.read(36)
            md5_expect = body[18:34]
            if channels != 1 or bps != 16:
                raise NotImplementedError("only 16-bit mono FLAC supported")
        if last:
            break
    if sample_rate is None:
        raise ValueError("missing STREAMINFO")

    out = np.empty(n_total, dtype=np.int16) if n_total else None
    chunks = []
    got = 0
    while pos < len(data) and (n_total == 0 or got < n_total):
        r = _BitReader(data[pos:])
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost frame sync")
        if r.read(1):
            raise ValueError("reserved bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved bit set")
        if chan != 0:
            raise NotImplementedError("only mono frames supported")
        if ss_code not in (0, 0b100):
            raise NotImplementedError("only 16-bit frames supported")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _BLOCKSIZE_TBL[bs_code]
        if sr_code in (12, 13, 14):
            r.read(8 if sr_code == 12 else 16)
        hdr_len = r.byte_pos()
        if _crc8(data[pos : pos + hdr_len]) != r.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        # --- one mono subframe
        if r.read(1):
            raise ValueError("subframe padding bit set")
        sft = r.read(6)
        wasted = 0
        if r.read(1):
            wasted = 1 + r.read_unary()
        bps_eff = 16 - wasted
        if sft == 0:  # CONSTANT
            blk = np.full(bs, r.read_signed(bps_eff), dtype=np.int64)
        elif sft == 1:  # VERBATIM
            blk = np.array([r.read_signed(bps_eff) for _ in range(bs)],
                           dtype=np.int64)
        elif 8 <= sft <= 12:  # FIXED order 0-4
            order = sft - 8
            warm = np.array([r.read_signed(bps_eff) for _ in range(order)],
                            dtype=np.int64)
            res = _decode_residual(r, bs, order)
            if order == 0:
                blk = res.copy()
            else:
                # residual is the order-th finite difference — invert
                # by `order` cumulative sums, seeding each level with
                # the warmup samples' difference chain (vectorized;
                # the naive per-sample dot loop is 50× slower)
                arr = res
                for j in range(order, 0, -1):
                    seed = np.diff(warm, n=j - 1)[-1] if j > 1 else warm[-1]
                    arr = seed + np.cumsum(arr)
                blk = np.concatenate([warm, arr])
        elif sft >= 32:  # LPC order 1-32
            order = sft - 31
            warm = [r.read_signed(bps_eff) for _ in range(order)]
            prec = r.read(4) + 1
            if prec == 16:
                raise ValueError("invalid LPC precision")
            shift = r.read_signed(5)
            if shift < 0:
                raise ValueError("negative LPC shift")
            coef = np.array([r.read_signed(prec) for _ in range(order)],
                            dtype=np.int64)
            res = _decode_residual(r, bs, order)
            blk = np.empty(bs, dtype=np.int64)
            blk[:order] = warm
            for i in range(order, bs):
                blk[i] = res[i - order] + (
                    int(np.dot(coef, blk[i - order:i][::-1])) >> shift
                )
        else:
            raise ValueError("reserved subframe type")
        if wasted:
            blk = blk << wasted
        r.align()
        flen = r.byte_pos()
        crc_got = r.read(16)
        if _crc16(data[pos : pos + flen]) != crc_got:
            raise ValueError("frame CRC-16 mismatch")
        pos += flen + 2
        if np.any(blk > 32767) or np.any(blk < -32768):
            raise ValueError("sample out of int16 range")
        s16 = blk.astype(np.int16)
        if out is not None:
            out[got : got + bs] = s16[: max(0, min(bs, n_total - got))]
        else:
            chunks.append(s16)
        got += bs

    samples = out if out is not None else (
        np.concatenate(chunks) if chunks else np.empty(0, np.int16)
    )
    if n_total and got < n_total:
        raise ValueError("truncated FLAC stream")
    if md5_expect and md5_expect != b"\x00" * 16:
        if hashlib.md5(samples.astype("<i2").tobytes()).digest() != md5_expect:
            raise ValueError("MD5 mismatch (decoded PCM differs)")
    return samples, sample_rate
