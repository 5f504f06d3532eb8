"""ITU-T G.711 µ-law / A-law codec (spider_ray.audio) — pure tests.

The companding formulas come from G.711 (µ-law §4.1, A-law Table
1a/1b) in the 16-bit-PCM convention the WAVE tags 6/7 carry; the
reference crawl corpus includes telephony-band media attachments the
reference delegated to external tooling.
"""

import numpy as np
import pytest

from spider_ray.audio import (
    _ALAW_DECODE_TABLE,
    _ULAW_DECODE_TABLE,
    _alaw_encode_scalar,
    _ulaw_encode_scalar,
    decode_wav,
    encode_g711_wav,
    g711_decode,
    g711_encode,
)


def test_known_anchor_codes():
    """Spec anchors: µ-law silence is 0xFF, A-law silence is 0xD5
    (A-law is mid-tread — no true zero, 0xD5 decodes to +8)."""
    assert _ulaw_encode_scalar(0) == 0xFF
    assert _ULAW_DECODE_TABLE[0xFF] == 0
    assert _alaw_encode_scalar(0) == 0xD5
    assert _ALAW_DECODE_TABLE[0xD5] == 8


def test_vectorized_equals_scalar_full_domain():
    allv = np.arange(-32768, 32768, dtype=np.int64)
    assert (
        np.frombuffer(g711_encode(allv, "mu"), np.uint8)
        == np.array([_ulaw_encode_scalar(int(s)) for s in allv], np.uint8)
    ).all()
    assert (
        np.frombuffer(g711_encode(allv, "a"), np.uint8)
        == np.array([_alaw_encode_scalar(int(s)) for s in allv], np.uint8)
    ).all()


def test_decode_image_is_exact():
    """Every decodable level re-encodes to itself (quantizer
    consistency: decode values are bin midpoints)."""
    for law, tbl in (("mu", _ULAW_DECODE_TABLE), ("a", _ALAW_DECODE_TABLE)):
        vals = tbl.astype(np.int64)
        assert (g711_decode(g711_encode(vals, law), law) == tbl).all()


def test_oracle_amplitudes_exact():
    """The closed-form amplitudes the audio_features oracle uses sit
    exactly on decode levels, both polarities."""
    mu = np.array([924 + 64 * m for m in range(16)], np.int64)
    al = np.array([1056 + 64 * m for m in range(16)], np.int64)
    for law, amps in (("mu", mu), ("a", al)):
        for sgn in (1, -1):
            x = sgn * amps
            assert (g711_decode(g711_encode(x, law), law) == x).all()


def test_sine_snr():
    """Companding SQNR for a loud sine ≈ 37-38 dB for both laws — the
    classic G.711 figure; a mid-tread/mid-rise mistake drops ~6 dB."""
    t = np.arange(8000)
    x = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    for law in ("mu", "a"):
        y = g711_decode(g711_encode(x, law), law).astype(np.float64)
        snr = 10 * np.log10(
            (x.astype(np.float64) ** 2).sum() / ((x - y) ** 2).sum()
        )
        assert snr > 35.0, (law, snr)


def test_monotonic_decode_levels():
    """Decode tables are strictly monotone when sorted by code value
    within a sign — the companding curve property."""
    for tbl in (_ULAW_DECODE_TABLE, _ALAW_DECODE_TABLE):
        pos = np.sort(tbl[tbl > 0])
        assert (np.diff(pos) > 0).all()


def test_wav_container_roundtrip_and_rejects():
    x = (3000 * np.sin(2 * np.pi * np.arange(800) / 50)).astype(np.int16)
    for law, tag in (("mu", 7), ("a", 6)):
        wav = encode_g711_wav(x, 8000, law)
        y, sr = decode_wav(wav)
        assert sr == 8000 and len(y) == len(x)
        assert (y == g711_decode(g711_encode(x, law), law)).all()
        # fmt tag really is 6/7 in the container
        import struct

        assert struct.unpack_from("<H", wav, 20)[0] == tag
    with pytest.raises(ValueError):
        g711_encode(x, "g728")


def test_clipping_saturates():
    """±32767 encodes to the top segment and decodes to the clip-level
    maximum, not a wrapped value."""
    for law in ("mu", "a"):
        y = g711_decode(
            g711_encode(np.array([32767, -32768], np.int64), law), law
        )
        assert y[0] > 30000 and y[1] < -30000
