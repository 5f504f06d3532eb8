"""FLAC codec (spider_ray.flac) — round-trip exactness, CRC/MD5
corruption detection, foreign-stream subframe types (LPC, rice2),
scope rejections, and WAV-vs-FLAC feature parity through the
AudioFeatures stage (pure callable — no Ray needed)."""

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pytest

from spider_ray.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_frame_number,
    decode_flac,
    encode_flac,
)


def _signal(name, n=9000):
    if name == "square":
        return (1200 * np.where(np.arange(n) % 2 == 0, 1, -1)).astype(np.int16)
    if name == "sine":
        return (3000 * np.sin(np.arange(n) / 7.0)).astype(np.int16)
    if name == "noise":
        return ((np.arange(n) * 2654435761 + 97) % 65536 - 32768).astype(np.int16)
    if name == "ramp":
        return np.arange(-n // 2, n - n // 2, dtype=np.int16)
    raise KeyError(name)


@pytest.mark.parametrize("name", ["square", "sine", "noise", "ramp"])
def test_roundtrip_exact(name):
    x = _signal(name)
    y, sr = decode_flac(encode_flac(x, 8000))
    assert sr == 8000
    assert np.array_equal(x, y)


def test_roundtrip_edges():
    for x in (
        np.empty(0, np.int16),
        np.array([7], np.int16),
        np.full(10000, -123, np.int16),  # constant, multi-block
        np.array([32767, -32768] * 300, np.int16),  # extreme amplitudes
    ):
        y, sr = decode_flac(encode_flac(x, 44100))
        assert sr == 44100
        assert np.array_equal(x, y)


def test_compresses_predictable_signals():
    ramp = _signal("ramp")
    data = encode_flac(ramp, 8000)
    assert len(data) < len(ramp) * 2 // 4  # ≥4× smaller than raw PCM


def test_corruption_detected():
    x = _signal("sine")
    good = encode_flac(x, 8000)
    # flip one bit in the frame payload region → CRC-16 (or header
    # CRC-8 / MD5) must catch it
    for pos in (len(good) // 2, len(good) - 3, 50):
        bad = bytearray(good)
        bad[pos] ^= 0x10
        # the only unacceptable outcome is decoding to DIFFERENT samples
        # without an error; a raised CRC/parse error OR a benign flip
        # that still decodes to the original samples both pass (ADVICE
        # r3: pytest.raises would spuriously fail the benign case)
        try:
            got, _ = decode_flac(bytes(bad))
        except (ValueError, NotImplementedError):
            continue
        assert np.array_equal(got, x), "silent mis-decode"


def test_rejects_non_flac_and_unsupported():
    with pytest.raises(ValueError):
        decode_flac(b"RIFF....WAVE")
    # stereo STREAMINFO → NotImplementedError
    x = _signal("sine", 100)
    data = bytearray(encode_flac(x, 8000))
    # STREAMINFO channels live in byte 4+4+12 bits 20..23 of the block
    # body; flip channels-1 from 0 to 1 (byte 12 of body = offset 8+12)
    body_off = 8  # fLaC(4) + block header(4)
    b = data[body_off + 12]
    data[body_off + 12] = (b & ~0x0E) | (1 << 1)
    with pytest.raises(NotImplementedError):
        decode_flac(bytes(data))


def _lpc_frame_stream(samples, order, coef, shift, sample_rate=8000):
    """Hand-built single-frame FLAC stream with an LPC subframe (our
    encoder never emits LPC — this exercises the decode-only path)."""
    x = np.asarray(samples, dtype=np.int64)
    n = len(x)
    res = np.array(
        [
            x[i] - (int(np.dot(coef, x[i - order : i][::-1])) >> shift)
            for i in range(order, n)
        ],
        dtype=np.int64,
    )
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | 0)  # 16-bit blocksize follows; rate from SI
    hdr.append((0 << 4) | (0b100 << 1))  # mono, 16-bit
    hdr += _utf8_frame_number(0)
    hdr += struct.pack(">H", n - 1)
    hdr.append(_crc8(bytes(hdr)))
    w = _BitWriter()
    w.write((0b100000 | (order - 1)) << 1, 8)  # LPC subframe, no wasted
    for s in x[:order]:
        w.write(int(s) & 0xFFFF, 16)
    prec = 15
    w.write(prec - 1, 4)
    w.write(shift, 5)
    for c in coef:
        w.write(int(c) & ((1 << prec) - 1), prec)
    # residual: method 0, partition order 0, escape-raw for simplicity
    w.write(0, 2)
    w.write(0, 4)
    w.write(0b1111, 4)
    rawn = max(1, int(np.max(np.abs(res))).bit_length() + 1) if len(res) else 1
    w.write(rawn, 5)
    for v in res:
        w.write(int(v) & ((1 << rawn) - 1), rawn)
    w.align()
    frame = bytes(hdr) + w.bytes()
    frame += struct.pack(">H", _crc16(frame))
    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n, 36)
    md5 = hashlib.md5(np.asarray(samples, "<i2").tobytes()).digest()
    streaminfo = si.bytes() + md5
    return b"fLaC" + bytes([0x80, 0, 0, len(streaminfo)]) + streaminfo + frame


def _fixed1_partitioned_stream(samples, po, method, sample_rate=8000):
    """Hand-built FIXED-order-1 frame using residual coding method 0 or
    1 (rice2) and partition order ``po`` — paths our encoder never
    emits (it always writes method 0, po=0)."""
    x = np.asarray(samples, dtype=np.int64)
    n = len(x)
    res = np.diff(x)
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | 0)
    hdr.append((0 << 4) | (0b100 << 1))
    hdr += _utf8_frame_number(0)
    hdr += struct.pack(">H", n - 1)
    hdr.append(_crc8(bytes(hdr)))
    w = _BitWriter()
    w.write((0b001001) << 1, 8)  # FIXED order 1, no wasted bits
    w.write(int(x[0]) & 0xFFFF, 16)
    w.write(method, 2)
    w.write(po, 4)
    pbits = 4 if method == 0 else 5
    nparts = 1 << po
    pos = 0
    for part in range(nparts):
        cnt = (n >> po) - (1 if part == 0 else 0)
        chunk = res[pos : pos + cnt]
        param = 6
        w.write(param, pbits)
        for v in chunk:
            zz = (abs(int(v)) << 1) - (1 if v < 0 else 0)
            w.write_unary(zz >> param)
            w.write(zz & ((1 << param) - 1), param)
        pos += cnt
    w.align()
    frame = bytes(hdr) + w.bytes()
    frame += struct.pack(">H", _crc16(frame))
    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n, 36)
    md5 = hashlib.md5(np.asarray(samples, "<i2").tobytes()).digest()
    streaminfo = si.bytes() + md5
    return b"fLaC" + bytes([0x80, 0, 0, len(streaminfo)]) + streaminfo + frame


@pytest.mark.parametrize("po,method", [(2, 0), (0, 1), (3, 1)])
def test_partitioned_and_rice2_residuals_decode(po, method):
    # blocksize divisible by 2^po; FIXED-1 with smooth signal
    x = (900 * np.sin(np.arange(512) / 11.0)).astype(np.int16)
    data = _fixed1_partitioned_stream(x, po=po, method=method)
    y, sr = decode_flac(data)
    assert sr == 8000
    assert np.array_equal(x, y)


def test_lpc_subframe_decodes():
    x = (2000 * np.sin(np.arange(600) / 9.0)).astype(np.int16)
    data = _lpc_frame_stream(x, order=2, coef=np.array([3, -1]), shift=1)
    y, sr = decode_flac(data)
    assert sr == 8000
    assert np.array_equal(x, y)


def test_audio_features_wav_flac_parity():
    from spider_ray.audio import FMT_WAV, encode_wav
    from spider_ray.flac import FMT_FLAC
    from spider_ray.ops.multimodal import AudioFeatures

    x = _signal("square", 801)
    batch = pa.table(
        {
            "bytes": pa.array([encode_wav(x, 8000), encode_flac(x, 8000)],
                              pa.binary()),
            "fmt": pa.array([FMT_WAV, FMT_FLAC]),
        }
    )
    out = AudioFeatures()(batch)
    for col in ("n_samples", "duration_ms", "rms", "peak", "zero_crossings"):
        vals = out[col].to_pylist()
        assert vals[0] == vals[1], col
    assert out["decode_ok"].to_pylist() == [True, True]
    assert out["peak"].to_pylist()[0] == 1200
