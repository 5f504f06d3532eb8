"""Minimal WAV codec + audio feature kernels (numpy/struct only).

The multimodal contract treats audio as an opaque ``binary`` column
with typed metadata. This container has no audio libraries (no
soundfile/librosa/pydub), but PCM WAV needs none: the RIFF/WAVE
format (Microsoft/IBM spec, public) is a chunked header around raw
PCM samples. This module implements 16-bit mono PCM encode/decode
from the spec — the real path. FLAC is also real since round 3
(:mod:`spider_ray.flac`, RFC 9639); mp3/ogg remain stubs behind
import-tries (see ops.multimodal ``AudioFeatures``).

All functions are pure and deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

FMT_WAV = "wav"


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


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 mono samples, sample_rate). Walks the
    chunk list per spec (tolerates extra chunks; rejects non-PCM16)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only 16-bit mono PCM supported")
        elif tag == b"data":
            pcm = payload
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
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
