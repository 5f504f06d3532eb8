"""Multimodal column operators — images/audio/video as opaque ``binary``
columns with typed metadata (the sink-table shape of BASELINE.json
``input_hint``).

Everything that CAN be real in this container (no PIL/cv2/ffmpeg) is
real: PNG/QPNG decode, baseline JPEG (spider_ray.jpeg, ITU-T T.81),
GIF89a (spider_ray.gif — round 4), PCM WAV (spider_ray.audio),
AVI/MJPEG frame-sampling
(spider_ray.video), block-mean resize, channel statistics, phash —
all numpy/zlib kernels built from the public specs; FLAC audio is
real since round 3 (spider_ray.flac, RFC 9639). The remaining
codec-dependent paths (compressed audio mp3/ogg, inter-coded
video mp4/h264) are STUBS behind import-tries that raise
``NotImplementedError`` with the Ray-side plumbing (schema, batch
sizing, actor signature, output layout) fully wired and tested.

Batch sizing note (wide binary rows): these stages should run with a
small ``batch_size`` (64–256) and ``batch_format='pyarrow'`` so a
batch × actor-pool-concurrency of image bytes fits in the worker heap;
blocks of the input dataset should be capped via
``DataContext.target_max_block_size`` when bytes are large.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..gif import FMT_GIF
from ..webp import FMT_WEBP
from ..imaging import FMT_JPEG, FMT_PNG, FMT_QPNG, _resize_mean, decode, phash

_DECODABLE = (FMT_PNG, FMT_QPNG, FMT_JPEG, FMT_GIF, FMT_WEBP)


class DecodeStats:
    """Actor-pool stage: decode image bytes → (w, h, mean_r, mean_g,
    mean_b, phash64). Real for png/qpng (imaging.py) AND baseline jpeg
    (spider_ray.jpeg, T.81 from the public spec — round 3); unknown
    formats raise (strict) or skip."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = np.zeros(n, np.int32)
        h = np.zeros(n, np.int32)
        means = np.zeros((n, 3), np.float64)
        ph = np.zeros(n, np.int64)
        ok = np.zeros(n, bool)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        for j in range(n):
            fmt = fmts[j]
            if fmt in _DECODABLE:
                px = decode(blobs[j], fmt)
            elif self.strict:
                raise NotImplementedError(
                    f"no decoder for fmt={fmt!r} in this container (stub)"
                )
            else:
                continue
            h[j], w[j] = px.shape[0], px.shape[1]
            means[j] = px.reshape(-1, 3).mean(axis=0)
            ph[j] = phash(px)
            ok[j] = True
        cols = dict(zip(batch.column_names, batch.columns))
        cols["dec_w"] = pa.array(w, pa.int32())
        cols["dec_h"] = pa.array(h, pa.int32())
        cols["mean_r"] = pa.array(np.round(means[:, 0], 4))
        cols["mean_g"] = pa.array(np.round(means[:, 1], 4))
        cols["mean_b"] = pa.array(np.round(means[:, 2], 4))
        cols["phash64"] = pa.array(ph, pa.int64())
        cols["decode_ok"] = pa.array(ok)
        return pa.table(cols)


class ResizeImages:
    """Actor-pool stage: decode → block-mean resize to (size × size) →
    re-encode PNG. Output keeps the sink schema (bytes/w/h/fmt)."""

    def __init__(self, size: int = 16):
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..imaging import encode_png

        out_bytes, out_w, out_h = [], [], []
        for data, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            if fmt not in _DECODABLE:
                raise NotImplementedError(f"no decoder for fmt={fmt!r} (stub)")
            px = decode(data, fmt)
            small = np.stack(
                [_resize_mean(px[..., c].astype(np.float64), self.size) for c in range(3)],
                axis=-1,
            )
            small = np.clip(np.round(small), 0, 255).astype(np.uint8)
            out_bytes.append(encode_png(small))
            out_w.append(self.size)
            out_h.append(self.size)
        cols = dict(zip(batch.column_names, batch.columns))
        cols["bytes"] = pa.array(out_bytes, pa.binary())
        cols["w"] = pa.array(out_w, pa.int32())
        cols["h"] = pa.array(out_h, pa.int32())
        cols["fmt"] = pa.array([FMT_PNG] * batch.num_rows, pa.string())
        return pa.table(cols)


class AudioFeatures:
    """Actor-pool stage: audio binary column → integer feature columns
    (n_samples, duration_ms, rms, peak, zero_crossings). REAL for PCM
    WAV (spider_ray.audio, RIFF spec), FLAC (spider_ray.flac, RFC 9639
    — r3), and lossy IMA ADPCM (spider_ray.audio, IMA rev 3.00 / WAVE
    tag 17 — r4). mp3/ogg rows get REAL container metadata — n_samples
    and duration_ms from the MPEG frame-header walk / Ogg page walk
    (spider_ray.audio_meta, late r4) — while their SAMPLE decode stays
    the one honest stub (``decode_ok=False``, signal features 0): a
    conformant polyphase/MDCT decoder is out of proportion to audio's
    role here."""

    def __init__(self, strict: bool = True):
        self.strict = strict
        try:  # pragma: no cover — not in this container
            import soundfile  # noqa: F401

            self.has_codecs = True
        except ImportError:
            self.has_codecs = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..audio import (FMT_ADPCM, FMT_ALAW, FMT_ULAW, FMT_WAV,
                             audio_features, decode_wav)
        from ..audio_meta import FMT_MP3, FMT_OGG, mp3_meta, ogg_meta
        from ..flac import FMT_FLAC, decode_flac

        n = batch.num_rows
        feats = {k: np.zeros(n, np.int64) for k in
                 ("n_samples", "duration_ms", "rms", "peak", "zero_crossings")}
        ok = np.zeros(n, bool)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        for j in range(n):
            if fmts[j] in (FMT_WAV, FMT_ADPCM, FMT_ULAW, FMT_ALAW,
                           FMT_FLAC):
                # ADPCM/G.711 share the WAVE container walker
                # (tags 0x11 / 7 / 6)
                samples, sr = (decode_flac if fmts[j] == FMT_FLAC
                               else decode_wav)(blobs[j])
                for k, v in audio_features(samples, sr).items():
                    feats[k][j] = v
                ok[j] = True
            elif fmts[j] in (FMT_MP3, FMT_OGG):
                # container metadata is real (header walk); the sample
                # decode is the stub — decode_ok stays False
                meta = (mp3_meta if fmts[j] == FMT_MP3 else ogg_meta)(blobs[j])
                feats["n_samples"][j] = meta["n_samples"]
                feats["duration_ms"][j] = meta["duration_ms"]
            elif self.has_codecs:  # pragma: no cover
                raise NotImplementedError("compressed-audio path not wired")
            elif self.strict:
                raise NotImplementedError(
                    f"no decoder for fmt={fmts[j]!r} in this container (stub)"
                )
        cols = dict(zip(batch.column_names, batch.columns))
        for k, v in feats.items():
            cols[k] = pa.array(v, pa.int64())
        cols["decode_ok"] = pa.array(ok)
        return pa.table(cols)


class FrameSample:
    """Video frame-sampling stage (flat_map shape: one video row →
    many frame rows). REAL for AVI/MJPEG since round 3
    (:mod:`spider_ray.video` parses the RIFF container from the public
    AVI spec; each sampled ``00dc`` chunk is emitted as its baseline
    JPEG bytes WITHOUT transcoding — dimensions come from the avih
    header, cross-checked against the frame's own SOF) and for
    animated GIF since round 4 (:mod:`spider_ray.gif` — every Nth
    frame composited per the spec's rendering model, sub-rectangle
    transparent delta frames included, and re-emitted as a lossless
    single-frame GIF). Inter-coded formats (mp4/h264/vp9) stay honestly stubbed
    behind a cv2 import-try: temporal decoding from scratch is out of
    scope.
    """

    OUTPUT_SCHEMA = pa.schema(
        [
            ("video_id", pa.string()),
            ("frame_idx", pa.int32()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
        ]
    )

    def __init__(self, every_n_frames: int = 30):
        self.every = every_n_frames
        try:  # pragma: no cover
            import cv2  # noqa: F401

            self.backend = "cv2"
        except ImportError:
            self.backend = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..gif import FMT_GIF_ANIM, decode_gif_frames, encode_gif
        from ..jpeg import jpeg_dims
        from ..video import FMT_AVI_MJPEG, avi_info, sample_mjpeg_frames

        fmts = (
            batch["fmt"].to_pylist()
            if "fmt" in batch.column_names
            else [FMT_AVI_MJPEG] * batch.num_rows
        )
        vids = batch["video_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out: dict = {k: [] for k in ("video_id", "frame_idx", "bytes", "w", "h", "fmt")}
        for vid, data, fmt in zip(vids, blobs, fmts):
            if fmt == FMT_GIF_ANIM:
                frames = decode_gif_frames(data)
                for idx in range(0, len(frames), self.every):
                    px = frames[idx]
                    out["video_id"].append(vid)
                    out["frame_idx"].append(idx)
                    out["bytes"].append(encode_gif(px))  # lossless re-emit
                    out["w"].append(px.shape[1])
                    out["h"].append(px.shape[0])
                    out["fmt"].append(FMT_GIF)
                continue
            if fmt != FMT_AVI_MJPEG:
                if self.backend is None:
                    raise NotImplementedError(
                        f"no decoder for video fmt={fmt!r} (no cv2/ffmpeg in "
                        "container); avi-mjpeg and gif_anim are the real paths"
                    )
                raise NotImplementedError  # pragma: no cover
            info = avi_info(data)
            for idx, jpg in sample_mjpeg_frames(data, self.every):
                w, h = jpeg_dims(jpg)
                if (w, h) != (info.width, info.height):
                    raise ValueError(
                        f"frame {idx} dims {w}x{h} disagree with avih "
                        f"{info.width}x{info.height}"
                    )
                out["video_id"].append(vid)
                out["frame_idx"].append(idx)
                out["bytes"].append(jpg)
                out["w"].append(w)
                out["h"].append(h)
                out["fmt"].append("jpeg")
        return pa.table(
            {
                "video_id": pa.array(out["video_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "fmt": pa.array(out["fmt"], pa.string()),
            }
        )
