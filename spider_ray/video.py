"""Minimal AVI (RIFF) MJPEG container codec — numpy/struct only.

Round 1-2 stubbed video frame-sampling behind "no codec in the
container". With the baseline JPEG codec (:mod:`spider_ray.jpeg`,
ITU-T T.81) in the repo, Motion-JPEG in an AVI container is fully
implementable from public specs: the AVI RIFF form (Microsoft "AVI
RIFF File Reference" / OpenDML AVI spec) is a chunk container —
``RIFF('AVI ' LIST('hdrl' avih strl) LIST('movi' 00dc...) idx1)`` —
and each ``00dc`` chunk of an MJPG stream is a standalone baseline
JPEG. Frame SAMPLING therefore never transcodes: it walks the chunk
index and emits the selected frames' JPEG bytes as-is.

Same build-from-spec pattern as the PNG (imaging.py) and RIFF/WAVE
(audio.py) codecs. Mirrors the reference's media-pipeline surface
(pyspiders-master items.py:25-27 stores media via Scrapy pipelines).

Pure and deterministic: no wall clock, no RNG.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

FMT_AVI_MJPEG = "avi-mjpeg"


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame bytes → AVI/MJPG container (one 'vids' stream,
    keyframe-only, idx1 index)."""
    if not frames:
        raise ValueError("no frames")
    us_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0,  # flags, priority, language, initial frames
            1, fps,      # scale / rate → fps
            0, len(frames), max_bytes, 0xFFFFFFFF, 0,  # start len buf quality
            0, 0, int(width), int(height),  # sample_size, rcFrame
        )
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_payload))  # offset from 'movi' fourcc
        movi_payload += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
            for off, f in zip(offsets, frames)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


@dataclass(frozen=True)
class AviInfo:
    n_frames: int
    width: int
    height: int
    fps: int


def _walk_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def avi_info(data: bytes) -> AviInfo:
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    for fourcc, off, size in _walk_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[off : off + 4] == b"hdrl":
            for fc2, off2, size2 in _walk_chunks(data, off + 4, off + size):
                if fc2 == b"avih":
                    (uspf, _mbs, _pad, _flags, n, _init, _streams, _buf,
                     w, h) = struct.unpack_from("<10I", data, off2)
                    fps = 1_000_000 // uspf if uspf else 0
                    return AviInfo(n_frames=n, width=w, height=h, fps=fps)
    raise ValueError("no avih header found")


def iter_mjpeg_frames(data: bytes):
    """Yield (frame_index, jpeg_bytes) for every video-data chunk, in
    stream order. No transcoding — the payload IS a baseline JPEG."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    idx = 0
    for fourcc, off, size in _walk_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[off : off + 4] == b"movi":
            for fc2, off2, size2 in _walk_chunks(data, off + 4, off + size):
                if fc2[2:4] in (b"dc", b"db"):  # compressed / uncompressed video
                    yield idx, data[off2 : off2 + size2]
                    idx += 1


def sample_mjpeg_frames(data: bytes, every_n: int = 30):
    """Yield (frame_index, jpeg_bytes) for frames 0, n, 2n, … — chunk
    walking only, the unsampled frames are never touched beyond their
    size field."""
    for idx, payload in iter_mjpeg_frames(data):
        if idx % every_n == 0:
            yield idx, payload
