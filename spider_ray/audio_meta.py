"""Compressed-audio CONTAINER metadata — mp3 frame-header walk and
Ogg page walk — from the public specs (ISO/IEC 11172-3 §2.4.1.3 /
13818-3 for the MPEG audio frame header; RFC 3533 for Ogg; the Vorbis
I specification §4.2.2 for the identification header).

Scope (honest): this module parses HEADERS only — frame sync, bitrate
/ sample-rate tables, frame sizes, Ogg page structure + CRC, the
Vorbis identification packet. It yields duration, sample counts,
rates, channel counts and average bitrate WITHOUT decoding a single
audio sample; sample decode for mp3/ogg remains the one stubbed path
in the engine (a conformant polyphase/MDCT decoder is out of
proportion to audio's role here — see ops.multimodal.AudioFeatures).

Reference parity note: the reference crawls listing sites whose media
attachments include compressed audio; it delegated metadata to
downstream tooling. Here the container walk is in-engine because the
sandbox has no audio library.

All functions are pure and deterministic.
"""

from __future__ import annotations

import struct

FMT_MP3 = "mp3"
FMT_OGG = "ogg"

# ---------------------------------------------------------------- mp3
# Header bit layout (32 bits, big-endian): 11 sync | 2 version |
# 2 layer | 1 no-crc | 4 bitrate idx | 2 samplerate idx | 1 padding |
# 1 private | 2 channel mode | 2 mode ext | 1 copyright | 1 original |
# 2 emphasis  (ISO/IEC 11172-3 §2.4.1.3)

# version field: 0=MPEG2.5 (13818-3 ext), 1=reserved, 2=MPEG2, 3=MPEG1
_SR_TABLE = {
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),   # MPEG2.5
}
# bitrate kbps by (version-group, layer); index 0 = "free", 15 invalid
_BR_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BR_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none). Size bytes
    are syncsafe (7 bits each); flag bit 4 adds a 10-byte footer."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    flags = data[5]
    size = (
        (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
        | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
    )
    return 10 + size + (10 if flags & 0x10 else 0)


def _parse_frame_header(hdr: int) -> tuple[int, int, int, int, int]:
    """32-bit header → (samples_per_frame, frame_bytes, sample_rate,
    channels, bitrate_kbps). Raises ValueError on any invalid field."""
    if hdr >> 21 != 0x7FF:
        raise ValueError("mp3 frame sync lost")
    version = (hdr >> 19) & 0x3
    layer_code = (hdr >> 17) & 0x3  # 3=Layer I, 2=Layer II, 1=Layer III
    if version == 1 or layer_code == 0:
        raise ValueError("reserved MPEG version/layer")
    layer = 4 - layer_code  # → 1/2/3
    br_idx = (hdr >> 12) & 0xF
    sr_idx = (hdr >> 10) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("free-format/invalid bitrate or bad sample rate")
    bitrate = (_BR_V1 if version == 3 else _BR_V2)[layer][br_idx]
    sample_rate = _SR_TABLE[version][sr_idx]
    padding = (hdr >> 9) & 0x1
    channels = 1 if ((hdr >> 6) & 0x3) == 3 else 2
    if layer == 1:
        spf = 384
        frame_bytes = (12 * bitrate * 1000 // sample_rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == 3) else 576
        frame_bytes = spf // 8 * bitrate * 1000 // sample_rate + padding
    if frame_bytes <= 4:
        raise ValueError("mp3 frame shorter than its header")
    return spf, frame_bytes, sample_rate, channels, bitrate


def mp3_meta(data: bytes) -> dict:
    """Walk every MPEG audio frame → container metadata.

    Returns n_frames, n_samples, sample_rate, channels, duration_ms,
    bitrate_kbps (exact average over frames) and vbr (True when frame
    bitrates differ). Trailing ID3v1 tags ('TAG', 128 bytes) and a
    leading ID3v2 tag are skipped. A sync loss mid-stream raises
    ValueError — rejected, never a silently short duration."""
    pos = _id3v2_size(data)
    end = len(data)
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    n_frames = n_samples = 0
    sample_rate = channels = 0
    br_sum = 0
    br_first = None
    vbr = False
    while pos < end:
        if end - pos < 4:
            raise ValueError("trailing garbage after last mp3 frame")
        (hdr,) = struct.unpack_from(">I", data, pos)
        spf, fb, sr, ch, br = _parse_frame_header(hdr)
        if n_frames == 0:
            sample_rate, channels, br_first = sr, ch, br
        elif sr != sample_rate:
            raise ValueError("sample-rate change mid-stream")
        vbr = vbr or br != br_first
        n_frames += 1
        n_samples += spf
        br_sum += br
        pos += fb
    if n_frames == 0:
        raise ValueError("no mp3 frames found")
    return {
        "n_frames": n_frames,
        "n_samples": n_samples,
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_ms": n_samples * 1000 // sample_rate,
        "bitrate_kbps": br_sum // n_frames,
        "vbr": vbr,
    }


# ---------------------------------------------------------------- ogg
def _ogg_crc_table() -> list[int]:
    # Ogg CRC-32: poly 0x04C11DB7, NOT reflected, init 0, xorout 0
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
        table.append(r & 0xFFFFFFFF)
    return table


_OGG_CRC = _ogg_crc_table()


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC[((crc >> 24) & 0xFF) ^ b]
    return crc


def _walk_pages(data: bytes):
    """Yield (header_type, granulepos, serial, seq, segments, body) per
    RFC 3533 §6, verifying each page's CRC."""
    pos = 0
    while pos < len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("Ogg capture pattern lost")
        if data[pos + 4] != 0:
            raise ValueError("unknown Ogg stream structure version")
        htype = data[pos + 5]
        granule, serial, seq, crc = struct.unpack_from("<qIII", data, pos + 6)
        nsegs = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + nsegs]
        body_len = sum(lacing)
        page_len = 27 + nsegs + body_len
        page = bytearray(data[pos : pos + page_len])
        if len(page) < page_len:
            raise ValueError("truncated Ogg page")
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        body = data[pos + 27 + nsegs : pos + page_len]
        yield htype, granule, serial, seq, lacing, body
        pos += page_len


def ogg_meta(data: bytes) -> dict:
    """Ogg/Vorbis container metadata from the page walk + the Vorbis
    identification header (first packet of the stream): sample_rate,
    channels, n_pages, n_samples (final granule position = total PCM
    samples per Vorbis granulepos semantics), duration_ms. Every
    page's CRC is verified; a non-Vorbis first packet raises."""
    n_pages = 0
    last_granule = 0
    sample_rate = channels = 0
    serial0 = None
    for htype, granule, serial, seq, lacing, body in _walk_pages(data):
        if n_pages == 0:
            if not (htype & 0x02):
                raise ValueError("first Ogg page is not beginning-of-stream")
            if body[:7] != b"\x01vorbis":
                raise ValueError("first packet is not a Vorbis id header")
            (version,) = struct.unpack_from("<I", body, 7)
            if version != 0:
                raise ValueError(f"unknown Vorbis version {version}")
            channels = body[11]
            (sample_rate,) = struct.unpack_from("<I", body, 12)
            if sample_rate == 0 or channels == 0:
                raise ValueError("invalid Vorbis id header")
            serial0 = serial
        elif serial != serial0:
            raise ValueError("multiplexed Ogg streams not supported")
        if granule >= 0:  # -1 marks a page with no finished packet
            last_granule = granule
        n_pages += 1
    if n_pages == 0:
        raise ValueError("no Ogg pages found")
    return {
        "n_pages": n_pages,
        "n_samples": last_granule,
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_ms": last_granule * 1000 // sample_rate,
    }
