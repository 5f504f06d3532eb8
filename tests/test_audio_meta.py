"""Compressed-audio container metadata (spider_ray.audio_meta) —
mp3 frame-header walk and Ogg page walk, tested against streams built
field-by-field from the public specs (the builder lives in the test:
the engine module is parse-only and never fabricates audio)."""

import struct

import numpy as np
import pytest

from spider_ray.audio_meta import mp3_meta, ogg_crc, ogg_meta


# ---------------------------------------------------------------- mp3
def _mp3_frame(version=3, layer=3, br_idx=9, sr_idx=0, padding=0,
               mono=False):
    """One MPEG audio frame: a spec-correct 32-bit header + arbitrary
    payload bytes of exactly the implied frame length."""
    hdr = (
        0x7FF << 21 | version << 19 | (4 - layer) << 17 | 1 << 16
        | br_idx << 12 | sr_idx << 10 | padding << 9
        | (3 if mono else 0) << 6
    )
    br = {
        (3, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                 384, 416, 448),
        (3, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                 256, 320, 384),
        (3, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320),
        (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 144, 160),
    }[(version, layer)][br_idx] * 1000
    sr = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
          0: (11025, 12000, 8000)}[version][sr_idx]
    if layer == 1:
        n = (12 * br // sr + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == 3) else 576
        n = spf // 8 * br // sr + padding
    body = bytes((7 * i + 13) % 256 for i in range(n - 4))
    return struct.pack(">I", hdr) + body


def test_mp3_cbr_walk():
    # 10 frames of 128 kbps 44.1 kHz stereo Layer III
    data = b"".join(_mp3_frame() for _ in range(10))
    m = mp3_meta(data)
    assert m["n_frames"] == 10
    assert m["n_samples"] == 11520
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["duration_ms"] == 11520 * 1000 // 44100
    assert m["bitrate_kbps"] == 128 and not m["vbr"]


def test_mp3_vbr_padding_and_layers():
    # VBR: mixed bitrate indices; padding bit changes frame length
    data = b"".join(
        _mp3_frame(br_idx=i % 14 + 1, padding=i % 2) for i in range(8)
    )
    m = mp3_meta(data)
    assert m["n_frames"] == 8 and m["vbr"]
    # Layer I frame sizes are in 4-byte slots
    m1 = mp3_meta(_mp3_frame(layer=1) * 3)
    assert m1["n_samples"] == 3 * 384
    # Layer II
    m2 = mp3_meta(_mp3_frame(layer=2) * 2)
    assert m2["n_samples"] == 2 * 1152
    # MPEG2 Layer III halves the frame to 576 samples
    m3 = mp3_meta(_mp3_frame(version=2, layer=3, sr_idx=1) * 4)
    assert m3["n_samples"] == 4 * 576 and m3["sample_rate"] == 24000


def test_mp3_id3_tags_skipped():
    frames = b"".join(_mp3_frame(mono=True) for _ in range(3))
    # ID3v2.3 header: syncsafe size 200
    id3v2 = b"ID3\x03\x00\x00" + bytes([0, 0, 200 >> 7, 200 & 0x7F]) + b"x" * 200
    id3v1 = b"TAG" + b"\x00" * 125
    m = mp3_meta(id3v2 + frames + id3v1)
    assert m["n_frames"] == 3 and m["channels"] == 1


def test_mp3_rejects_corruption():
    data = bytearray(b"".join(_mp3_frame() for _ in range(4)))
    with pytest.raises(ValueError, match="sync"):
        mp3_meta(bytes(data)[2:])  # start mid-frame
    data[0] = 0x00  # break the first sync
    with pytest.raises(ValueError, match="sync"):
        mp3_meta(bytes(data))
    with pytest.raises(ValueError, match="no mp3 frames"):
        mp3_meta(b"")
    # free-format (bitrate idx 0) is rejected, not guessed
    with pytest.raises(ValueError, match="free-format"):
        mp3_meta(struct.pack(">I", 0xFF << 24 | 0xFB << 16 | 0x0 << 12 | 0x0))


# ---------------------------------------------------------------- ogg
def _ogg_page(body: bytes, granule: int, serial=7, seq=0, htype=0):
    assert len(body) < 255 * 255
    lacing = bytearray()
    left = len(body)
    while True:
        lacing.append(min(left, 255))
        left -= lacing[-1]
        if lacing[-1] < 255:
            break
    hdr = bytearray(b"OggS\x00")
    hdr.append(htype)
    hdr += struct.pack("<qIII", granule, serial, seq, 0)
    hdr.append(len(lacing))
    hdr += lacing
    page = bytes(hdr) + body
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def _vorbis_id(channels=2, rate=44100):
    return (b"\x01vorbis" + struct.pack("<IBI", 0, channels, rate)
            + struct.pack("<iii", 0, 160000, 0) + b"\xb8\x01")


def test_ogg_vorbis_walk():
    pages = (
        _ogg_page(_vorbis_id(), granule=0, seq=0, htype=0x02)
        + _ogg_page(b"\x05data", granule=4096, seq=1)
        + _ogg_page(b"\x05more", granule=44100 * 3, seq=2, htype=0x04)
    )
    m = ogg_meta(pages)
    assert m["n_pages"] == 3
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["n_samples"] == 44100 * 3 and m["duration_ms"] == 3000


def test_ogg_crc_and_contracts():
    good = _ogg_page(_vorbis_id(rate=8000), granule=0, htype=0x02)
    # flip a body byte: CRC must catch it
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        ogg_meta(bytes(bad))
    with pytest.raises(ValueError, match="capture"):
        ogg_meta(b"NotOggData")
    # first packet must be a Vorbis id header
    with pytest.raises(ValueError, match="Vorbis"):
        ogg_meta(_ogg_page(b"\x03vorbis junk", granule=0, htype=0x02))
    # granule -1 (no finished packet) does not move the duration
    pages = (
        _ogg_page(_vorbis_id(rate=8000), granule=0, htype=0x02)
        + _ogg_page(b"x", granule=-1, seq=1)
        + _ogg_page(b"y", granule=16000, seq=2, htype=0x04)
    )
    assert ogg_meta(pages)["duration_ms"] == 2000


def test_ogg_crc_vector():
    # CRC of the empty string under the Ogg polynomial is 0; a known
    # non-trivial vector pins endianness/reflection choices
    assert ogg_crc(b"") == 0
    v = ogg_crc(b"123456789")
    assert v == 0x89A1897F  # CRC-32/MPEG-2 family, init 0 (posix/cksum poly)
