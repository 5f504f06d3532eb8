"""VP8L (lossless WebP) codec — from the public WebP Lossless
Bitstream Specification (RFC 9649 §3, a.k.a. the "WebP Lossless
Bitstream Specification", Google 2012-2023). No codec library is
available in this container, so — like the PNG/JPEG/GIF/FLAC modules —
this is a from-scratch implementation of the published format:

Decoder (full VP8L bitstream):
  * RIFF/WEBP container with a VP8L chunk (RFC 9649 §2);
  * canonical prefix codes: the "simple" 1/2-symbol form and the
    normal form with code-length codes incl. the 16/17/18 repeat
    codes and the optional max_symbol limit field (§3.5.2);
  * meta prefix codes (entropy image selecting per-tile code groups,
    §3.5.3) and the color cache (§3.4, multiplicative hash 0x1e35a7bd);
  * LZ77 backward references with the length/distance prefix coding
    and the 120-entry short-distance neighborhood map (§3.2.3);
  * all four transforms, applied in reverse reading order (§3.3):
    predictor (14 modes incl. Select / ClampAddSubtractFull / Half),
    cross-channel color transform (signed 3.5 fixed-point deltas),
    subtract-green, and color indexing incl. sub-byte index packing
    (8/4/2 pixels per byte for palettes of ≤2/≤4/≤16 colors).

Encoder (spec-conformant subset, deterministic):
  * palette path for ≤256-color images: delta-coded palette sub-image,
    packed indices, greedy LZ77 over the packed green stream
    (previous-row and run matches), single prefix-code group;
  * subtract-green + per-channel literal path for true-color images;
  * optional predictor mode (uniform tile image) and color cache, used
    by the tests to exercise the decoder's paths;
  * prefix codes written canonically (deflate-style reversed-bit
    lookup), the trivial single-symbol codes as "simple" codes.

Interop caveat (honest): the container ships no reference WebP
implementation, so cross-validation against libwebp output is not
possible here; the encoder and decoder are verified against each other
(exact round trips on adversarial images), against hand-assembled
streams for the header/code-length machinery, and against the spec's
stated invariants. The short-distance map below is transcribed from
the spec table and self-checked for its published structural
properties (120 unique in-window offsets in non-decreasing distance
order) — a transcription slip would affect only foreign streams that
use codes ≤ 120, never our own round trips.

Bit order: VP8L streams are read least-significant-bit first
(§3.5.1); prefix codes use the deflate convention (canonical codes,
bit-reversed for LSB-first table lookup).
"""

from __future__ import annotations

import struct

import numpy as np

FMT_WEBP = "webp"

# ---------------------------------------------------------------- constants
_SIGNATURE = 0x2F  # §3.1 one-byte signature of the VP8L stream
_NUM_LITERAL = 256
_NUM_LENGTH = 24
_NUM_DISTANCE = 40
_MAX_CODE_LEN = 15

# code-length-code symbol transmission order (§3.5.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

_T_PREDICTOR = 0
_T_COLOR = 1
_T_SUBTRACT_GREEN = 2
_T_COLOR_INDEXING = 3

# §3.2.3: distance codes 1..120 address a close 2-D neighborhood of
# the current pixel, in non-decreasing Euclidean distance; codes >120
# are literal distances minus 120. Transcribed from the spec's table
# ((dx, dy) with dy ≥ 0); structural self-check in _check_dist_map().
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _check_dist_map() -> None:
    assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120
    prev = 0
    for dx, dy in _DIST_MAP:
        assert 0 <= dy <= 7 and -8 <= dx <= 8 and (dy > 0 or dx > 0)
        d2 = dx * dx + dy * dy
        assert d2 >= prev, "distance map not sorted"
        prev = d2


_check_dist_map()


class WebPError(ValueError):
    pass


# ---------------------------------------------------------------- bit IO
class _BitReader:
    """LSB-first bit reader (§3.5.1). The source is zero-padded so
    prefix-code PEEKS near the stream end never raise; actual
    over-consumption is detected by the caller via bounds checks."""

    __slots__ = ("d", "n", "pos", "buf", "bits")

    def __init__(self, data: bytes):
        self.d = data + b"\x00" * 8
        self.n = len(data)
        self.pos = 0
        self.buf = 0
        self.bits = 0

    def read(self, n: int) -> int:
        buf, bits, pos, d = self.buf, self.bits, self.pos, self.d
        while bits < n:
            buf |= d[pos] << bits
            pos += 1
            bits += 8
        self.buf = buf >> n
        self.bits = bits - n
        self.pos = pos
        return buf & ((1 << n) - 1)

    def _fill(self, n: int) -> None:
        while self.bits < n:
            self.buf |= self.d[self.pos] << self.bits
            self.pos += 1
            self.bits += 8

    def overrun(self) -> bool:
        return self.pos - (self.bits + 7) // 8 > self.n


class _BitWriter:
    """LSB-first bit writer; values are appended low bit first."""

    __slots__ = ("buf", "bits", "out")

    def __init__(self):
        self.buf = 0
        self.bits = 0
        self.out = bytearray()

    def write(self, value: int, n: int) -> None:
        self.buf |= (value & ((1 << n) - 1)) << self.bits
        self.bits += n
        while self.bits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.bits -= 8

    def finish(self) -> bytes:
        if self.bits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.bits = 0
        return bytes(self.out)


def _reverse_bits(v: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


# ---------------------------------------------------------------- prefix codes
class _PrefixCode:
    """Canonical prefix code → flat LSB-first lookup table.

    ``lengths[sym]`` = code length (0 = absent). A single-symbol code
    has length 0 for that symbol too (it consumes no bits) — the spec's
    degenerate case, used heavily by palette images (the red/blue/alpha
    and distance codes each collapse to one symbol)."""

    __slots__ = ("table_sym", "table_len", "max_len", "single")

    def __init__(self, lengths):
        lengths = list(lengths)
        present = [s for s, l in enumerate(lengths) if l > 0]
        if len(present) == 0:
            raise WebPError("empty prefix code")
        if len(present) == 1:
            self.single = present[0]
            self.max_len = 0
            self.table_sym = None
            self.table_len = None
            return
        self.single = -1
        max_len = max(lengths)
        if max_len > _MAX_CODE_LEN:
            raise WebPError("code length > 15")
        # Kraft check (complete codes only; §3.5 requires completeness)
        kraft = sum(1 << (max_len - l) for l in lengths if l > 0)
        if kraft != 1 << max_len:
            raise WebPError("incomplete or oversubscribed prefix code")
        # canonical codes in (length, symbol) order, deflate-style
        bl_count = [0] * (max_len + 1)
        for l in lengths:
            if l:
                bl_count[l] += 1
        next_code = [0] * (max_len + 2)
        code = 0
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        size = 1 << max_len
        tsym = np.zeros(size, dtype=np.int32)
        tlen = np.zeros(size, dtype=np.uint8)
        for sym, l in enumerate(lengths):
            if not l:
                continue
            c = next_code[l]
            next_code[l] += 1
            rc = _reverse_bits(c, l)
            step = 1 << l
            tsym[rc::step] = sym
            tlen[rc::step] = l
        self.table_sym = tsym
        self.table_len = tlen
        self.max_len = max_len

    def decode(self, br: _BitReader) -> int:
        if self.single >= 0:
            return self.single
        br._fill(self.max_len)
        idx = br.buf & ((1 << self.max_len) - 1)
        l = int(self.table_len[idx])
        br.buf >>= l
        br.bits -= l
        return int(self.table_sym[idx])


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """§3.5.2: simple form (1-2 symbols) or normal form."""
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise WebPError("simple-code symbol out of range")
            # codes follow TRANSMISSION order: first symbol ↔ bit 0,
            # second ↔ bit 1 (not canonical-by-value)
            return _TwoSymbol(sym0, sym1)
        if sym0 >= alphabet_size:
            raise WebPError("simple-code symbol out of range")
        return _SingleSymbol(sym0)
    # normal form: code lengths coded with the code-length code
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _prefix_or_single(clc_lengths)
    max_symbol = alphabet_size
    if br.read(1):  # use max_symbol (§3.5.2.2 use_length field)
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise WebPError("max_symbol exceeds alphabet")
    lengths = [0] * alphabet_size
    prev_nonzero = 8
    sym = 0
    while sym < max_symbol:
        code = clc.decode(br)
        if code < 16:
            lengths[sym] = code
            sym += 1
            if code:
                prev_nonzero = code
        elif code == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet_size:
                raise WebPError("repeat overruns alphabet")
            for _ in range(rep):
                lengths[sym] = prev_nonzero
                sym += 1
        elif code == 17:
            sym += 3 + br.read(3)
        elif code == 18:
            sym += 11 + br.read(7)
        else:  # pragma: no cover
            raise WebPError("bad code-length code")
    if sym > alphabet_size:
        raise WebPError("code lengths overrun alphabet")
    return _prefix_or_single(lengths)


class _SingleSymbol:
    __slots__ = ("single", "max_len")

    def __init__(self, sym: int):
        self.single = sym
        self.max_len = 0

    def decode(self, br: _BitReader) -> int:
        return self.single


class _TwoSymbol:
    __slots__ = ("s0", "s1", "single", "max_len")

    def __init__(self, s0: int, s1: int):
        self.s0 = s0
        self.s1 = s1
        self.single = -1
        self.max_len = 1

    def decode(self, br: _BitReader) -> int:
        return self.s1 if br.read(1) else self.s0


def _prefix_or_single(lengths) -> "_PrefixCode | _SingleSymbol":
    present = [s for s, l in enumerate(lengths) if l > 0]
    if len(present) == 1:
        return _SingleSymbol(present[0])
    return _PrefixCode(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """§3.2.3 length/distance prefix coding: code → value."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """value → (code, extra_bits_value, extra_bits_count); inverse of
    :func:`_prefix_value`."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, v & ((1 << extra) - 1), extra


# ---------------------------------------------------------------- color cache
_CACHE_MULT = 0x1E35A7BD


def _cache_index(argb: int, bits: int) -> int:
    return ((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------- decoder
def _read_entropy_image(br: _BitReader, w: int, h: int,
                        allow_meta: bool) -> np.ndarray:
    """Decode one (sub-)image stream → uint32 ARGB array of shape
    (h, w). ``allow_meta`` is True only for the main spatially-coded
    image (§3.5.3: meta prefix codes appear only in the ARGB role)."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebPError("bad color cache bits")
        cache = np.zeros(1 << cache_bits, dtype=np.uint32)

    meta_img = None
    prefix_bits = 0
    num_groups = 1
    if allow_meta and br.read(1):
        prefix_bits = 2 + br.read(3)
        mw = _subsample(w, prefix_bits)
        mh = _subsample(h, prefix_bits)
        meta_img = _read_entropy_image(br, mw, mh, False)
        # meta group index lives in (red << 8) | green (§3.5.3)
        meta_idx = (((meta_img >> 8) & 0xFFFF)).astype(np.int32)
        num_groups = int(meta_idx.max()) + 1
    else:
        meta_idx = None

    groups = []
    lit_size = _NUM_LITERAL + _NUM_LENGTH + (1 << cache_bits if cache_bits else 0)
    for _ in range(num_groups):
        g = (
            _read_prefix_code(br, lit_size),
            _read_prefix_code(br, _NUM_LITERAL),
            _read_prefix_code(br, _NUM_LITERAL),
            _read_prefix_code(br, _NUM_LITERAL),
            _read_prefix_code(br, _NUM_DISTANCE),
        )
        groups.append(g)

    out: list = []  # plain ints — numpy scalar stores cost 3x more
    pos = 0
    total = w * h
    x = 0
    y = 0
    cur = groups[0]
    tile_row = -1
    tile_col = -1
    # fast path: when red/blue/alpha codes are all single-symbol (the
    # palette-image shape), a literal pixel is base | (green << 8)
    def _base(g):
        if (
            getattr(g[1], "single", -1) >= 0
            and getattr(g[2], "single", -1) >= 0
            and getattr(g[3], "single", -1) >= 0
        ):
            return (g[3].single << 24) | (g[1].single << 16) | g[2].single
        return None

    base = _base(cur)
    while pos < total:
        if meta_idx is not None:
            tc = x >> prefix_bits
            tr = y >> prefix_bits
            if tc != tile_col or tr != tile_row:
                cur = groups[int(meta_idx[tr * _subsample(w, prefix_bits) + tc])]
                tile_col, tile_row = tc, tr
                base = _base(cur)
        g0, g1, g2, g3, g4 = cur
        s = g0.decode(br)
        if s < _NUM_LITERAL:  # literal: green, red, blue, alpha
            if base is not None:
                px = base | (s << 8)
            else:
                red = g1.decode(br)
                blue = g2.decode(br)
                alpha = g3.decode(br)
                px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out.append(px)
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < _NUM_LITERAL + _NUM_LENGTH:  # backward reference
            length = _prefix_value(s - _NUM_LITERAL, br)
            dcode = _prefix_value(g4.decode(br), br)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise WebPError("backward reference out of range")
            if dist >= length:
                out.extend(out[pos - dist:pos - dist + length])
            else:  # overlapping copy
                for i in range(length):
                    out.append(out[pos + i - dist])
            if cache is not None:
                seg = np.array(out[pos:pos + length], dtype=np.uint32)
                idx = ((_CACHE_MULT * seg) & 0xFFFFFFFF) >> (32 - cache_bits)
                cache[idx] = seg
            pos += length
            x = pos % w
            y = pos // w
        else:  # color cache hit
            if cache is None:
                raise WebPError("cache symbol without color cache")
            out.append(int(cache[s - _NUM_LITERAL - _NUM_LENGTH]))
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        if br.overrun():
            raise WebPError("truncated VP8L stream")
    return np.array(out, dtype=np.uint32).reshape(h, w)


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ----- transform inverses (§3.3), vectorized over rows where possible
def _avg2(a, b):
    return (a + b) // 2


def _inv_predictor(argb: np.ndarray, tiles: np.ndarray, bits: int) -> np.ndarray:
    """Inverse predictor transform: residuals + per-channel prediction
    mod 256, scan order. Per §3.3.1 the top row effectively predicts
    from L, the left column from T, and (0,0) from opaque black; the
    top-right pixel of the rightmost column is the first pixel of the
    current row (continuous-buffer addressing)."""
    h, w = argb.shape
    ch = _split(argb)  # (h, w, 4) uint16: a, r, g, b
    out = np.zeros((h, w, 4), dtype=np.uint16)
    tw = tiles.shape[1]
    modes_row = np.zeros(w, dtype=np.int32)
    for y in range(h):
        trow = tiles[y >> bits]
        for tx in range(tw):
            lo = tx << bits
            modes_row[lo:min(lo + (1 << bits), w)] = (trow[tx] >> 8) & 0xFF
        for x in range(w):
            if y == 0 and x == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = out[0, x - 1].astype(np.int32)
            elif x == 0:
                pred = out[y - 1, 0].astype(np.int32)
            else:
                mode = int(modes_row[x])
                L = out[y, x - 1].astype(np.int32)
                T = out[y - 1, x].astype(np.int32)
                TL = out[y - 1, x - 1].astype(np.int32)
                TR = (out[y - 1, x + 1] if x + 1 < w else out[y, 0]).astype(
                    np.int32
                )
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:  # Select
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:  # ClampAddSubtractHalf
                    ave = _avg2(L, T)
                    pred = np.clip(ave + (ave - TL) // 2, 0, 255)
                else:
                    raise WebPError(f"bad predictor mode {mode}")
            out[y, x] = (ch[y, x].astype(np.int32) + pred) & 0xFF
    return _join(out)


def _inv_color(argb: np.ndarray, tiles: np.ndarray, bits: int) -> np.ndarray:
    """Inverse cross-channel color transform (§3.3.2): deltas are
    signed 3.5 fixed-point (int8 * int8 >> 5), element bytes
    green_to_red = blue byte, green_to_blue = green byte,
    red_to_blue = red byte of the transform pixel."""
    h, w = argb.shape
    a = (argb >> 24) & 0xFF
    r = ((argb >> 16) & 0xFF).astype(np.int32)
    g = ((argb >> 8) & 0xFF).astype(np.int32)
    b = (argb & 0xFF).astype(np.int32)
    # expand per-pixel transform elements from tiles
    ty = np.arange(h) >> bits
    tx = np.arange(w) >> bits
    t = tiles[np.ix_(ty, tx)]
    g2r = _s8(t & 0xFF)
    g2b = _s8((t >> 8) & 0xFF)
    r2b = _s8((t >> 16) & 0xFF)
    gs = _s8v(g)
    r = (r + ((g2r * gs) >> 5)) & 0xFF
    rs = _s8v(r)
    b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return (a << 24) | (r.astype(np.uint32) << 16) | (
        g.astype(np.uint32) << 8
    ) | b.astype(np.uint32)


def _s8(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int32)
    return np.where(v >= 128, v - 256, v)


def _s8v(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 128, v - 256, v)


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    return (argb & 0xFF00FF00) | (r << 16) | b


def _inv_color_indexing(packed: np.ndarray, palette: np.ndarray,
                        w: int) -> np.ndarray:
    """Unpack sub-byte indices (green channel) and map through the
    palette (§3.3.3). ``packed`` has the reduced width."""
    n = len(palette)
    if n <= 2:
        wbits = 3
    elif n <= 4:
        wbits = 2
    elif n <= 16:
        wbits = 1
    else:
        wbits = 0
    g = ((packed >> 8) & 0xFF).astype(np.uint32)
    if wbits:
        per = 1 << wbits  # pixels per byte
        depth = 8 >> wbits  # bits per index
        shifts = (np.arange(per, dtype=np.uint32) * depth)[None, None, :]
        idx = (g[:, :, None] >> shifts) & ((1 << depth) - 1)
        idx = idx.reshape(g.shape[0], -1)[:, :w]
    else:
        idx = g
    if int(idx.max(initial=0)) >= n:
        raise WebPError("palette index out of range")
    return palette[idx.astype(np.intp)]


# ----- container + top level
def decode_webp(data: bytes) -> np.ndarray:
    """WebP (VP8L) bytes → (H, W, 3) uint8 RGB. Alpha, if present, is
    dropped after verification that decode produced a well-formed
    image (the crawl world is RGB; a real deployment would return
    RGBA)."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebPError("not a WebP RIFF container")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            payload = body
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy VP8 / extended WebP not implemented (VP8L only)"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise WebPError("no VP8L chunk")
    if not payload or payload[0] != _SIGNATURE:
        raise WebPError("bad VP8L signature")
    br = _BitReader(bytes(payload[1:]))
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise WebPError("unknown VP8L version")

    # transforms, in reading order (§3.3); color indexing reduces the
    # effective width of everything decoded after it
    transforms = []
    eff_w = w
    seen_types = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen_types:
            raise WebPError("duplicate transform")
        seen_types.add(ttype)
        if ttype == _T_PREDICTOR or ttype == _T_COLOR:
            bits = br.read(3) + 2
            tw = _subsample(eff_w, bits)
            th = _subsample(h, bits)
            timg = _read_entropy_image(br, tw, th, False)
            transforms.append((ttype, bits, timg))
        elif ttype == _T_SUBTRACT_GREEN:
            transforms.append((ttype, None, None))
        else:  # color indexing
            psize = br.read(8) + 1
            praw = _read_entropy_image(br, psize, 1, False)[0]
            # palette entries are component-wise deltas (§3.3.3)
            pal = np.zeros(psize, dtype=np.uint32)
            acc = np.zeros(4, dtype=np.uint32)
            for i in range(psize):
                v = int(praw[i])
                acc = (acc + np.array(
                    [(v >> 24) & 0xFF, (v >> 16) & 0xFF,
                     (v >> 8) & 0xFF, v & 0xFF], dtype=np.uint32)) & 0xFF
                pal[i] = (int(acc[0]) << 24) | (int(acc[1]) << 16) | (
                    int(acc[2]) << 8) | int(acc[3])
            transforms.append((ttype, None, pal))
            if psize <= 2:
                eff_w = _subsample(w, 3)
            elif psize <= 4:
                eff_w = _subsample(w, 2)
            elif psize <= 16:
                eff_w = _subsample(w, 1)

    argb = _read_entropy_image(br, eff_w, h, True)

    for ttype, bits, tdata in reversed(transforms):
        if ttype == _T_COLOR_INDEXING:
            argb = _inv_color_indexing(argb, tdata, w)
        elif ttype == _T_SUBTRACT_GREEN:
            argb = _inv_subtract_green(argb)
        elif ttype == _T_COLOR:
            argb = _inv_color(argb, tdata, bits)
        else:
            argb = _inv_predictor(argb, tdata, bits)

    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def _split(argb: np.ndarray) -> np.ndarray:
    return np.stack(
        [(argb >> 24) & 0xFF, (argb >> 16) & 0xFF, (argb >> 8) & 0xFF,
         argb & 0xFF], axis=-1
    ).astype(np.uint16)


def _join(ch: np.ndarray) -> np.ndarray:
    c = ch.astype(np.uint32)
    return (c[..., 0] << 24) | (c[..., 1] << 16) | (c[..., 2] << 8) | c[..., 3]


# ---------------------------------------------------------------- encoder
def _huffman_lengths(freqs, max_len: int = _MAX_CODE_LEN):
    """Code lengths from symbol frequencies, clamped to ``max_len``
    with a Kraft fix-up (deepen cheapest overlong, then re-balance)."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    n = len(syms)
    lengths = [0] * len(freqs)
    if n == 0:
        raise WebPError("no symbols")
    if n == 1:
        return lengths, syms  # single symbol → zero-length code
    import heapq

    heap = [(freqs[s], i, (s,)) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    uid = n
    depth = {s: 0 for s in syms}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, uid, g1 + g2))
        uid += 1
    for s, d in depth.items():
        lengths[s] = min(d, max_len)
    # Kraft fix-up after clamping
    def kraft():
        return sum(1 << (max_len - l) for l in lengths if l)

    while kraft() > (1 << max_len):
        # deepen the shallowest clampable code
        cand = min((s for s in syms if lengths[s] < max_len),
                   key=lambda s: (lengths[s], s))
        lengths[cand] += 1
    # (under-full codes are legal per Kraft but §3.5 wants complete
    # codes: shorten deepest codes while completeness allows)
    while True:
        k = kraft()
        if k == (1 << max_len):
            break
        # find a symbol whose code can be shortened without oversubscribing
        for s in sorted(syms, key=lambda s: -lengths[s]):
            if lengths[s] > 1 and k + (1 << (max_len - lengths[s])) <= (
                1 << max_len
            ):
                lengths[s] -= 1
                break
        else:
            raise WebPError("cannot complete code")
    return lengths, syms


def _canonical_codes(lengths):
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    codes = [0] * len(lengths)
    for s, l in enumerate(lengths):
        if l:
            codes[s] = _reverse_bits(next_code[l], l)
            next_code[l] += 1
    return codes


class _CodeWriter:
    """One prefix code on the wire + its encode tables."""

    def __init__(self, freqs):
        self.lengths, self.syms = _huffman_lengths(freqs)
        self.codes = _canonical_codes(self.lengths)
        self.single = self.syms[0] if len(self.syms) == 1 else -1

    def write_header(self, bw: _BitWriter, alphabet_size: int) -> None:
        present = [s for s in range(len(self.lengths)) if self.lengths[s]]
        if self.single >= 0:
            present = [self.single]
        if len(present) <= 2 and all(p < 256 for p in present):
            # simple code
            bw.write(1, 1)
            bw.write(len(present) - 1, 1)
            if present[0] <= 1 and len(present) == 1:
                bw.write(0, 1)  # 1-bit first symbol
                bw.write(present[0], 1)
            else:
                bw.write(1, 1)
                bw.write(present[0], 8)
            if len(present) == 2:
                bw.write(present[1], 8)
            return
        bw.write(0, 1)  # normal form
        # code-length-code: lengths of lengths with zero-run codes
        tokens = []  # (clc_symbol, extra_value, extra_bits)
        i = 0
        L = self.lengths
        n = len(L)
        # trim trailing zeros via max_symbol field
        last = max(s for s in range(n) if L[s]) + 1
        while i < last:
            if L[i] == 0:
                run = 0
                while i + run < last and L[i + run] == 0:
                    run += 1
                while run >= 11:
                    r = min(run, 138)
                    tokens.append((18, r - 11, 7))
                    run -= r
                    i += r
                while run >= 3:
                    r = min(run, 10)
                    tokens.append((17, r - 3, 3))
                    run -= r
                    i += r
                for _ in range(run):
                    tokens.append((0, 0, 0))
                    i += 1
            else:
                tokens.append((L[i], 0, 0))
                i += 1
        clc_freq = [0] * 19
        for t, _, _ in tokens:
            clc_freq[t] += 1
        clc_len, clc_syms = _huffman_lengths(clc_freq, max_len=7)
        if len(clc_syms) == 1:
            # degenerate code-length code: give the lone symbol length 1
            # plus a dummy partner so the code stays complete
            lone = clc_syms[0]
            partner = 0 if lone != 0 else 1
            clc_len[lone] = 1
            clc_len[partner] = 1
        clc_codes = _canonical_codes(clc_len)
        # emit in _CLC_ORDER, trimming trailing zeros (min 4 entries)
        order_lengths = [clc_len[s] for s in _CLC_ORDER]
        num = 19
        while num > 4 and order_lengths[num - 1] == 0:
            num -= 1
        bw.write(num - 4, 4)
        for i2 in range(num):
            bw.write(order_lengths[i2], 3)
        # max_symbol field
        if last < n:
            bw.write(1, 1)
            nbits_choice = 0
            while (1 << (2 + 2 * nbits_choice)) < max(last - 2 + 1, 1):
                nbits_choice += 1
            if nbits_choice > 7:
                raise WebPError("max_symbol too large")
            bw.write(nbits_choice, 3)
            bw.write(last - 2, 2 + 2 * nbits_choice)
        else:
            bw.write(0, 1)
        for t, ev, eb in tokens:
            bw.write(clc_codes[t], clc_len[t])
            if eb:
                bw.write(ev, eb)

    def emit(self, bw: _BitWriter, sym: int) -> None:
        l = self.lengths[sym]
        if l == 0:
            if sym != self.single:
                raise WebPError("symbol has no code")
            return
        bw.write(self.codes[sym], l)


def _lz77_greedy(seq: np.ndarray, row_dist: int, max_len: int = 4064):
    """Greedy LZ77 over a 1-D uint32 pixel/byte sequence: previous-row
    copies (distance=row_dist) and run copies (distance=1), the two
    shapes that dominate structured web graphics. Returns a list of
    ops: ('lit', value) or ('copy', length, distance)."""
    n = len(seq)
    # match lengths for distance 1 and row_dist at each position
    eq1 = np.zeros(n, dtype=bool)
    eq1[1:] = seq[1:] == seq[:-1]
    eqr = np.zeros(n, dtype=bool)
    if row_dist < n:
        eqr[row_dist:] = seq[row_dist:] == seq[:-row_dist]
    ops = []
    i = 0
    while i < n:
        # run-length at i for both distances
        l1 = 0
        if i >= 1 and eq1[i]:
            j = i
            while j < n and eq1[j] and l1 < max_len:
                l1 += 1
                j += 1
        lr = 0
        if i >= row_dist and eqr[i]:
            j = i
            while j < n and eqr[j] and lr < max_len:
                lr += 1
                j += 1
        if max(l1, lr) >= 4:
            if lr >= l1:
                ops.append(("copy", lr, row_dist))
                i += lr
            else:
                ops.append(("copy", l1, 1))
                i += l1
        else:
            ops.append(("lit", int(seq[i])))
            i += 1
    return ops


def _write_entropy_image(bw: _BitWriter, argb: np.ndarray, w: int,
                         use_lz77: bool, row_dist: int,
                         cache_bits: int = 0,
                         main_role: bool = False) -> None:
    """Encode one image stream: color-cache flag, (main role only: the
    meta-prefix bit, always 0 here), 4 prefix codes + distance code,
    then literals/copies/cache hits."""
    flat = argb.reshape(-1)
    cache = None
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
        cache = np.zeros(1 << cache_bits, dtype=np.uint32)
    else:
        bw.write(0, 1)
    ops = (
        _lz77_greedy(flat, row_dist)
        if use_lz77
        else [("lit", int(v)) for v in flat]
    )
    # resolve cache hits (after LZ77: literals may become cache refs)
    if cache is not None:
        sim = np.zeros(1 << cache_bits, dtype=np.uint32)
        have = np.zeros(1 << cache_bits, dtype=bool)
        resolved = []
        pos = 0
        for op in ops:
            if op[0] == "lit":
                px = op[1]
                ci = _cache_index(px, cache_bits)
                if have[ci] and int(sim[ci]) == px:
                    resolved.append(("cache", ci))
                else:
                    resolved.append(op)
                sim[ci] = px
                have[ci] = True
                pos += 1
            else:
                _, length, dist = op
                seg = flat[pos:pos + length]
                idx = ((_CACHE_MULT * seg) & 0xFFFFFFFF) >> (32 - cache_bits)
                sim[idx] = seg
                have[idx] = True
                resolved.append(op)
                pos += length
        ops = resolved
    cache_size = (1 << cache_bits) if cache_bits else 0
    f_g = [0] * (_NUM_LITERAL + _NUM_LENGTH + cache_size)
    f_r = [0] * _NUM_LITERAL
    f_b = [0] * _NUM_LITERAL
    f_a = [0] * _NUM_LITERAL
    f_d = [0] * _NUM_DISTANCE
    for op in ops:
        if op[0] == "lit":
            px = op[1]
            f_g[(px >> 8) & 0xFF] += 1
            f_r[(px >> 16) & 0xFF] += 1
            f_b[px & 0xFF] += 1
            f_a[(px >> 24) & 0xFF] += 1
        elif op[0] == "cache":
            f_g[_NUM_LITERAL + _NUM_LENGTH + op[1]] += 1
        else:
            lc, _, _ = _prefix_encode(op[1])
            f_g[_NUM_LITERAL + lc] += 1
            dc, _, _ = _prefix_encode(op[2] + 120)
            f_d[dc] += 1
    if not any(f_d):
        f_d[0] = 1  # distance code must exist even when unused
    for f in (f_r, f_b, f_a):
        if not any(f):
            f[0] = 1
    if main_role:
        bw.write(0, 1)  # no meta prefix (spatially-coded role only)
    cg = _CodeWriter(f_g)
    cr = _CodeWriter(f_r)
    cb = _CodeWriter(f_b)
    ca = _CodeWriter(f_a)
    cd = _CodeWriter(f_d)
    cg.write_header(bw, len(f_g))
    cr.write_header(bw, _NUM_LITERAL)
    cb.write_header(bw, _NUM_LITERAL)
    ca.write_header(bw, _NUM_LITERAL)
    cd.write_header(bw, _NUM_DISTANCE)
    for op in ops:
        if op[0] == "lit":
            px = op[1]
            cg.emit(bw, (px >> 8) & 0xFF)
            cr.emit(bw, (px >> 16) & 0xFF)
            cb.emit(bw, px & 0xFF)
            ca.emit(bw, (px >> 24) & 0xFF)
        elif op[0] == "cache":
            cg.emit(bw, _NUM_LITERAL + _NUM_LENGTH + op[1])
        else:
            _, length, dist = op
            lc, lev, leb = _prefix_encode(length)
            cg.emit(bw, _NUM_LITERAL + lc)
            if leb:
                bw.write(lev, leb)
            dc, dev, deb = _prefix_encode(dist + 120)
            cd.emit(bw, dc)
            if deb:
                bw.write(dev, deb)


def _write_main_stream(bw: _BitWriter, argb: np.ndarray, w: int,
                       use_lz77: bool, row_dist: int,
                       cache_bits: int = 0) -> None:
    """Main spatially-coded image: the entropy-image layout plus the
    meta-prefix bit (we never use meta codes, so it is written 0)."""
    _write_entropy_image(bw, argb, w, use_lz77, row_dist, cache_bits,
                         main_role=True)


def encode_webp(pixels: np.ndarray, *, predictor_mode: int | None = None,
                cache_bits: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB → lossless WebP (VP8L) bytes.

    Palette images (≤256 distinct colors) use the color-indexing
    transform with sub-byte packing and greedy LZ77 over the packed
    stream — the form web palette graphics actually take. True-color
    images use subtract-green + per-channel literals. ``predictor_mode``
    (0..13, uniform tiles) and ``cache_bits`` exist to exercise the
    decoder's predictor / color-cache paths in tests."""
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.dtype == np.uint8
    h, w, _ = pixels.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise WebPError("dimensions out of VP8L range")
    argb = (
        np.uint32(0xFF000000)
        | (pixels[:, :, 0].astype(np.uint32) << 16)
        | (pixels[:, :, 1].astype(np.uint32) << 8)
        | pixels[:, :, 2].astype(np.uint32)
    )
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version

    colors, inv = np.unique(argb.reshape(-1), return_inverse=True)
    if predictor_mode is not None:
        # predictor transform with one uniform mode (test path)
        bw.write(1, 1)
        bw.write(_T_PREDICTOR, 2)
        bits = 4
        bw.write(bits - 2, 3)
        tw = _subsample(w, bits)
        th = _subsample(h, bits)
        tile = np.full((th, tw), np.uint32(0xFF000000) |
                       np.uint32(predictor_mode << 8), dtype=np.uint32)
        _write_entropy_image(bw, tile, tw, False, tw)
        bw.write(0, 1)  # no more transforms
        resid = _forward_predictor(argb, predictor_mode)
        _write_main_stream(bw, resid, w, True, w, cache_bits)
    elif len(colors) <= 256:
        # color-indexing path
        bw.write(1, 1)
        bw.write(_T_COLOR_INDEXING, 2)
        bw.write(len(colors) - 1, 8)
        deltas = np.zeros(len(colors), dtype=np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            c = int(c)
            d = 0
            for shift in (24, 16, 8, 0):
                d |= (((c >> shift) - (prev >> shift)) & 0xFF) << shift
            deltas[i] = d
            prev = c
        _write_entropy_image(bw, deltas.reshape(1, -1), len(colors),
                             False, len(colors))
        bw.write(0, 1)  # no more transforms
        idx = inv.reshape(h, w).astype(np.uint32)
        n = len(colors)
        if n <= 2:
            depth, per = 1, 8
        elif n <= 4:
            depth, per = 2, 4
        elif n <= 16:
            depth, per = 4, 2
        else:
            depth, per = 8, 1
        if per > 1:
            pw = (w + per - 1) // per
            pad = pw * per - w
            if pad:
                idx = np.pad(idx, ((0, 0), (0, pad)))
            shifts = (np.arange(per, dtype=np.uint32) * depth)[None, None, :]
            packed = (idx.reshape(h, pw, per) << shifts).sum(
                axis=2, dtype=np.uint32
            )
        else:
            pw = w
            packed = idx
        green_img = np.uint32(0xFF000000) | (packed << 8)
        _write_main_stream(bw, green_img, pw, True, pw, cache_bits)
    else:
        # subtract-green + literals
        bw.write(1, 1)
        bw.write(_T_SUBTRACT_GREEN, 2)
        bw.write(0, 1)  # no more transforms
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        resid = (argb & 0xFF00FF00) | (r << 16) | b
        _write_main_stream(bw, resid, w, True, w, cache_bits)

    payload = bytes([_SIGNATURE]) + bw.finish()
    if len(payload) & 1:
        chunk = payload + b"\x00"
    else:
        chunk = payload
    riff = (
        b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + chunk
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _forward_predictor(argb: np.ndarray, mode: int) -> np.ndarray:
    """Forward predictor (encoder side): residual = pixel - prediction
    per channel mod 256, scan order over the ORIGINAL pixels (the
    decoder reconstructs incrementally, which matches because every
    prediction input is already reconstructed exactly)."""
    h, w = argb.shape
    ch = _split(argb).astype(np.int32)
    resid = np.zeros_like(ch)
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = ch[0, x - 1]
            elif x == 0:
                pred = ch[y - 1, 0]
            else:
                L = ch[y, x - 1]
                T = ch[y - 1, x]
                TL = ch[y - 1, x - 1]
                TR = ch[y - 1, x + 1] if x + 1 < w else ch[y, 0]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    ave = _avg2(L, T)
                    pred = np.clip(ave + (ave - TL) // 2, 0, 255)
                else:
                    raise WebPError(f"bad predictor mode {mode}")
            resid[y, x] = (ch[y, x] - pred) & 0xFF
    return _join(resid)
