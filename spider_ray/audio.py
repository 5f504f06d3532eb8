"""Minimal WAV codec + IMA ADPCM + audio feature kernels (numpy/struct).

The multimodal contract treats audio as an opaque ``binary`` column
with typed metadata. This container has no audio libraries (no
soundfile/librosa/pydub), but PCM WAV needs none: the RIFF/WAVE
format (Microsoft/IBM spec, public) is a chunked header around raw
PCM samples. This module implements 16-bit mono PCM encode/decode
from the spec — the real path — plus **IMA ADPCM** (round 4): the
4-bit adaptive-differential codec of the public IMA "Recommended
Practices for Enhancing Digital Audio Compatibility" rev 3.00 (1992;
the same algorithm RFC 3551 §4.5.1 registers as DVI4), carried in
the standard WAVE container as format tag 17 with block-aligned
frames — a REAL lossy compressed-audio path (4:1 vs PCM16). FLAC
(lossless) is real since round 3 (:mod:`spider_ray.flac`, RFC 9639);
mp3/ogg remain honest stubs behind import-tries (see ops.multimodal
``AudioFeatures``): psychoacoustic decoders from scratch are out of
scope.

All functions are pure and deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

FMT_WAV = "wav"
FMT_ADPCM = "adpcm"  # IMA ADPCM in a RIFF/WAVE container (format tag 0x11)
FMT_ULAW = "ulaw"  # ITU-T G.711 µ-law in a RIFF/WAVE container (tag 7)
FMT_ALAW = "alaw"  # ITU-T G.711 A-law in a RIFF/WAVE container (tag 6)

# IMA ADPCM tables (IMA rec. practices rev 3.00; RFC 3551 §4.5.1)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int32
)
_IMA_STEP = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32
)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes (fmt chunk 16, PCM tag 1)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    data_sz = len(pcm)
    riff_sz = 4 + (8 + len(fmt)) + (8 + data_sz)
    return (
        b"RIFF" + struct.pack("<I", riff_sz) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_sz) + pcm
    )


# ----------------------------------------------------------- IMA ADPCM
def _ima_decode_sample(code: int, pred: int, index: int) -> tuple[int, int]:
    """One 4-bit code → (new predictor, new step index) — the exact
    integer reconstruction of the IMA spec (also RFC 3551 §4.5.1)."""
    step = int(_IMA_STEP[index])
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX[code])))
    return pred, index


def _ima_encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """Quantize one sample difference → (code, new predictor, new index).
    The predictor update MIRRORS the decoder so encoder and decoder
    track the same state (the codec's core invariant)."""
    step = int(_IMA_STEP[index])
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    pred, index = _ima_decode_sample(code, pred, index)
    return code, pred, index


def encode_adpcm_wav(samples: np.ndarray, sample_rate: int = 8000,
                     block_align: int = 256) -> bytes:
    """int16 mono → IMA ADPCM in a RIFF/WAVE container (format tag 17).

    Standard block layout (mono): a 4-byte header — predictor:int16
    (which IS the block's first sample), step index:uint8, reserved —
    then ``block_align - 4`` bytes of 4-bit codes, low nibble first.
    Each block is independently decodable from its own header (the
    format's seekability property). A ``fact`` chunk records the true
    sample count (required for compressed WAVE per the spec); the final
    partial block is padded with codes that hold the predictor still."""
    x = np.asarray(samples, dtype=np.int16).astype(np.int32)
    n = len(x)
    if n == 0:
        raise ValueError("empty signal")
    spb = (block_align - 4) * 2 + 1  # samples per block, mono
    index = 0
    blocks = bytearray()
    pos = 0
    while pos < n:
        chunk = x[pos : pos + spb]
        cur = int(chunk[0])
        blocks += struct.pack("<hBB", cur, index, 0)
        nibbles = bytearray()
        for s in chunk[1:].tolist():
            code, cur, index = _ima_encode_sample(s, cur, index)
            nibbles.append(code)
        while len(nibbles) < (block_align - 4) * 2:  # pad the tail block
            code, cur, index = _ima_encode_sample(cur, cur, index)
            nibbles.append(code)
        blocks += bytes(
            nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
        )
        pos += spb
    avg_bps = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, avg_bps, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", n)
    riff_sz = 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(blocks))
    return (
        b"RIFF" + struct.pack("<I", riff_sz) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + blocks
    )


# ------------------------------------------------------------ G.711
# ITU-T G.711 companding (µ-law §4.1 Table 2a/2b, A-law Table 1a/1b),
# in the common 16-bit-PCM convention (13/14-bit code values scaled
# by 4/8 — what WAVE tags 6/7 carry). Encode is vectorized bit math;
# decode is a 256-entry table built from the scalar formulas.

_G711_CLIP = 32635
_ULAW_BIAS = 0x84  # 132


def _ulaw_encode_scalar(s: int) -> int:
    sign = 0x80 if s < 0 else 0
    if s < 0:
        s = -s
    s = min(s, _G711_CLIP) + _ULAW_BIAS
    exponent = s.bit_length() - 8  # MSB position above the 7-bit floor
    mantissa = (s >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def _ulaw_decode_scalar(u: int) -> int:
    u = ~u & 0xFF
    exponent = (u >> 4) & 0x7
    s = (((u & 0x0F) << 3) + _ULAW_BIAS) << exponent
    s -= _ULAW_BIAS
    return -s if u & 0x80 else s


def _alaw_encode_scalar(s: int) -> int:
    mask = 0xD5 if s >= 0 else 0x55
    if s < 0:
        s = -s
    s = min(s, _G711_CLIP)
    if s >= 256:
        exponent = (s >> 8).bit_length()  # segment 1..7
        mantissa = (s >> (exponent + 3)) & 0x0F
        code = (exponent << 4) | mantissa
    else:
        code = s >> 4
    return code ^ mask


def _alaw_decode_scalar(a: int) -> int:
    a ^= 0x55
    t = ((a & 0x0F) << 4) + 8  # mid-tread reconstruction (+half step)
    seg = (a & 0x70) >> 4
    if seg:
        t = (t + 0x100) << (seg - 1)
    return t if a & 0x80 else -t


_ULAW_DECODE_TABLE = np.array(
    [_ulaw_decode_scalar(u) for u in range(256)], np.int16
)
_ALAW_DECODE_TABLE = np.array(
    [_alaw_decode_scalar(a) for a in range(256)], np.int16
)


def g711_encode(samples: np.ndarray, law: str = "mu") -> bytes:
    """int16 → 8-bit G.711 codes, vectorized (one pass of bit math)."""
    x = np.asarray(samples, np.int64)
    neg = x < 0
    mag = np.minimum(np.abs(x), _G711_CLIP)
    if law == "mu":
        m = mag + _ULAW_BIAS
        hi = m >> 7  # in [1, 255] → exponent = bit_length(hi) - 1
        exponent = np.zeros_like(m)
        for b in range(1, 8):
            exponent = np.where(hi >= (1 << b), b, exponent)
        mantissa = (m >> (exponent + 3)) & 0x0F
        code = ~(np.where(neg, 0x80, 0) | (exponent << 4) | mantissa) & 0xFF
    elif law == "a":
        mask = np.where(neg, 0x55, 0xD5)
        seg_in = mag >> 8
        exponent = np.zeros_like(mag)
        for b in range(7):  # bit_length of a 7-bit value
            exponent = np.where(seg_in >= (1 << b), b + 1, exponent)
        mantissa = (mag >> (exponent + 3)) & 0x0F
        hi = (exponent << 4) | mantissa
        code = np.where(mag >= 256, hi, mag >> 4) ^ mask
    else:
        raise ValueError(f"unknown G.711 law: {law!r}")
    return code.astype(np.uint8).tobytes()


def g711_decode(codes: bytes, law: str = "mu") -> np.ndarray:
    table = _ULAW_DECODE_TABLE if law == "mu" else _ALAW_DECODE_TABLE
    return table[np.frombuffer(codes, np.uint8)]


def encode_g711_wav(samples: np.ndarray, sample_rate: int = 8000,
                    law: str = "mu") -> bytes:
    """int16 mono → G.711 in a RIFF/WAVE container (format tag 7
    µ-law / 6 A-law, 8 bits per sample, mandatory fact chunk)."""
    codes = g711_encode(np.asarray(samples, np.int16), law)
    tag = 7 if law == "mu" else 6
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    fact = struct.pack("<I", len(codes))
    riff_sz = 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(codes))
    return (
        b"RIFF" + struct.pack("<I", riff_sz) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(codes)) + codes
    )


def _decode_ima_blocks(payload: bytes, block_align: int, spb: int,
                       total: int) -> np.ndarray:
    out = np.empty(total, dtype=np.int16)
    w = 0
    pos = 0
    while w < total:
        if pos + 4 > len(payload):
            raise ValueError("ADPCM stream truncated")
        pred, index, _res = struct.unpack_from("<hBB", payload, pos)
        if index > 88:
            raise ValueError("corrupt ADPCM block: step index > 88")
        pos += 4
        out[w] = pred
        w += 1
        data = payload[pos : pos + block_align - 4]
        pos += block_align - 4
        count = min(spb - 1, total - w)
        k = 0
        for byte in data:
            for code in (byte & 0x0F, byte >> 4):
                if k >= count:
                    break
                pred, index = _ima_decode_sample(code, pred, index)
                out[w] = pred
                w += 1
                k += 1
            if k >= count:
                break
        if k < count:
            raise ValueError("ADPCM stream truncated")
    return out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 mono samples, sample_rate). Walks the
    chunk list per spec (tolerates extra chunks). Real paths: PCM16
    (tag 1) and IMA ADPCM (tag 0x11, via the fact-chunk sample count);
    other compression tags are rejected."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    pcm = None
    audio_fmt = None
    block_align = spb = fact_n = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _br, block_align, bits = (
                struct.unpack_from("<HHIIHH", payload)
            )
            if audio_fmt == 1:
                if channels != 1 or bits != 16:
                    raise NotImplementedError("only 16-bit mono PCM supported")
            elif audio_fmt == 0x11:
                if channels != 1 or bits != 4:
                    raise NotImplementedError("only 4-bit mono IMA ADPCM supported")
                spb = struct.unpack_from("<H", payload, 18)[0]
            elif audio_fmt in (6, 7):  # G.711 A-law / µ-law
                if channels != 1 or bits != 8:
                    raise NotImplementedError("only 8-bit mono G.711 supported")
            else:
                raise NotImplementedError(
                    "only PCM16 (tag 1), G.711 (tags 6/7) and IMA ADPCM "
                    "(tag 17) supported"
                )
        elif tag == b"fact":
            (fact_n,) = struct.unpack_from("<I", payload)
        elif tag == b"data":
            pcm = payload
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if audio_fmt == 0x11:
        if spb is None:
            raise ValueError("IMA ADPCM fmt chunk missing samples-per-block")
        if fact_n is None:  # fact is mandatory per spec, but be tolerant
            fact_n = (len(pcm) // block_align) * spb
        return _decode_ima_blocks(pcm, block_align, spb, fact_n), sample_rate
    if audio_fmt in (6, 7):
        codes = pcm if fact_n is None else pcm[:fact_n]
        return g711_decode(codes, "mu" if audio_fmt == 7 else "a"), sample_rate
    return np.frombuffer(pcm, dtype="<i2").astype(np.int16), sample_rate


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Deterministic integer features (oracle-exact: no float output):
    duration_ms (floor), rms (rounded), peak, zero crossings."""
    x = samples.astype(np.float64)
    n = len(x)
    rms = int(round(float(np.sqrt(np.mean(x * x))))) if n else 0
    zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if n > 1 else 0
    return {
        "n_samples": n,
        "duration_ms": (n * 1000) // sample_rate if sample_rate else 0,
        "rms": rms,
        "peak": int(np.max(np.abs(x))) if n else 0,
        "zero_crossings": zc,
    }
