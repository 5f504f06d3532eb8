"""IMA ADPCM codec tests (spider_ray.audio, WAVE format tag 0x11) —
SNR floor over band-limited signals, compression ratio, exactness on
constant signals, block-header seekability, corruption contracts, and
the AudioFeatures three-codec mix."""

import numpy as np
import pyarrow as pa
import pytest
import struct

from spider_ray.audio import (
    FMT_ADPCM,
    FMT_WAV,
    decode_wav,
    encode_adpcm_wav,
    encode_wav,
)


def _smooth_signal(n=2000, amp=12000):
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * t / 50) + 0.3 * amp * np.sin(2 * np.pi * t / 13)
    return np.round(x).astype(np.int16)


def test_round_trip_snr_floor():
    x = _smooth_signal()
    got, sr = decode_wav(encode_adpcm_wav(x, 8000))
    assert sr == 8000 and len(got) == len(x)
    err = got.astype(np.float64) - x.astype(np.float64)
    snr = 10 * np.log10(
        (x.astype(np.float64) ** 2).mean() / max((err**2).mean(), 1e-9)
    )
    assert snr >= 20.0, snr  # lossy, but must track band-limited input


def test_compression_ratio():
    # 4 bits/sample + 4-byte block headers ≈ 1/4 of PCM16
    x = _smooth_signal(4000)
    assert len(encode_adpcm_wav(x)) < 0.3 * len(encode_wav(x))


def test_constant_signal_exact():
    # diff 0 at step index 0 reconstructs as step>>3 = 0: a constant
    # signal round-trips EXACTLY (header carries the first sample)
    x = np.full(600, 1234, np.int16)
    got, _ = decode_wav(encode_adpcm_wav(x))
    assert (got == 1234).all()


def test_block_headers_are_seek_points():
    # every block's first decoded sample must equal its own header
    # predictor — the format's independent-decodability property
    x = _smooth_signal(1600)
    data = encode_adpcm_wav(x, block_align=256)
    got, _ = decode_wav(data)
    spb = (256 - 4) * 2 + 1
    payload_off = data.index(b"data") + 8
    for b in range((len(x) + spb - 1) // spb):
        pred = struct.unpack_from("<h", data, payload_off + b * 256)[0]
        assert got[b * spb] == pred


def test_partial_tail_block():
    # a signal that does not fill the last block still round-trips to
    # the exact sample count (fact chunk truncation)
    for n in (1, 2, 504, 505, 506, 777):
        x = _smooth_signal(n)
        got, _ = decode_wav(encode_adpcm_wav(x))
        assert len(got) == n


def test_corruption_contracts():
    x = _smooth_signal(1500)
    data = encode_adpcm_wav(x)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(data[:-40])
    bad = bytearray(data)
    bad[bad.index(b"data") + 8 + 2] = 200  # step index byte of block 0
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))


def test_audio_features_three_codec_mix():
    from spider_ray.flac import FMT_FLAC, encode_flac
    from spider_ray.ops.multimodal import AudioFeatures

    x = _smooth_signal(900)
    batch = pa.table(
        {
            "bytes": pa.array(
                [encode_wav(x), encode_adpcm_wav(x), encode_flac(x)],
                pa.binary(),
            ),
            "fmt": pa.array([FMT_WAV, FMT_ADPCM, FMT_FLAC], pa.string()),
        }
    )
    out = AudioFeatures()(batch)
    assert out["decode_ok"].to_pylist() == [True] * 3
    # structure features are exact for all three codecs
    assert out["n_samples"].to_pylist() == [900] * 3
    assert len(set(out["duration_ms"].to_pylist())) == 1
    # signal features: lossless codecs agree exactly; ADPCM within 2%
    rms = out["rms"].to_pylist()
    assert rms[0] == rms[2]
    assert abs(rms[1] - rms[0]) <= 0.02 * rms[0]
