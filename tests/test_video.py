"""AVI/MJPEG container codec (spider_ray.video) + FrameSample stage.

The container codec is pure struct/bytes (no Ray needed); the stage
tests run through Ray Data to exercise the actor-pool plumbing.
"""

import numpy as np
import pyarrow as pa
import pytest

from spider_ray.jpeg import encode_jpeg, jpeg_dims
from spider_ray.ops.multimodal import FrameSample
from spider_ray.video import (
    FMT_AVI_MJPEG,
    avi_info,
    encode_avi_mjpeg,
    iter_mjpeg_frames,
    sample_mjpeg_frames,
)

RNG = np.random.RandomState(20260817)


def _frames(n, w=32, h=16):
    out = []
    for i in range(n):
        col = np.array([(i * 37) % 256, (i * 53) % 256, (i * 29) % 256], np.uint8)
        out.append(encode_jpeg(np.broadcast_to(col, (h, w, 3)).copy(), quality=90))
    return out


def test_container_roundtrip():
    frames = _frames(7)
    avi = encode_avi_mjpeg(frames, 32, 16, fps=12)
    info = avi_info(avi)
    assert (info.n_frames, info.width, info.height, info.fps) == (7, 32, 16, 12)
    got = list(iter_mjpeg_frames(avi))
    assert [i for i, _ in got] == list(range(7))
    # frame payloads are the ORIGINAL jpeg bytes — sampling never transcodes
    assert [b for _, b in got] == frames


def test_word_alignment_odd_payloads():
    # RIFF chunks are word-aligned; force odd-length payloads and make
    # sure the walker still lands on every chunk boundary
    frames = _frames(5)
    odd = [f + bytes([0]) if len(f) % 2 == 0 else f for f in frames]
    assert any(len(f) % 2 == 1 for f in odd)
    avi = encode_avi_mjpeg(odd, 32, 16)
    assert [b for _, b in iter_mjpeg_frames(avi)] == odd


def test_sampling_stride():
    frames = _frames(11)
    avi = encode_avi_mjpeg(frames, 32, 16)
    got = list(sample_mjpeg_frames(avi, every_n=4))
    assert [i for i, _ in got] == [0, 4, 8]
    assert got[1][1] == frames[4]


def test_not_an_avi_rejected():
    with pytest.raises(ValueError):
        avi_info(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        list(iter_mjpeg_frames(b"\x00" * 32))
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 8, 8)


def test_jpeg_dims_header_only():
    f = _frames(1, w=48, h=24)[0]
    assert jpeg_dims(f) == (48, 24)
    # truncating PAST the SOF header must not matter (no entropy decode)
    assert jpeg_dims(f[: len(f) // 2]) == (48, 24)
    with pytest.raises(ValueError):
        jpeg_dims(b"not a jpeg")


def _stage_batch(n_videos=3, nf=9, w=32, h=16):
    vids, blobs = [], []
    for v in range(n_videos):
        frames = _frames(nf + v, w=w, h=h)
        vids.append(f"v{v}")
        blobs.append(encode_avi_mjpeg(frames, w, h))
    return pa.table(
        {
            "video_id": pa.array(vids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array([FMT_AVI_MJPEG] * n_videos, pa.string()),
        }
    )


def test_frame_sample_stage_direct():
    batch = _stage_batch(n_videos=2, nf=9)
    out = FrameSample(every_n_frames=4)(batch)
    assert out.schema.equals(FrameSample.OUTPUT_SCHEMA)
    df = out.to_pandas()
    # video 0: 9 frames -> idx 0,4,8 ; video 1: 10 frames -> 0,4,8
    assert df[df.video_id == "v0"].frame_idx.tolist() == [0, 4, 8]
    assert df[df.video_id == "v1"].frame_idx.tolist() == [0, 4, 8]
    assert (df.w == 32).all() and (df.h == 16).all() and (df.fmt == "jpeg").all()


def test_frame_sample_dims_cross_check():
    # a frame whose SOF dims disagree with the avih header must be
    # rejected, not silently emitted
    good = _frames(4, w=32, h=16)
    bad = _frames(1, w=16, h=16)[0]
    avi = encode_avi_mjpeg(good[:2] + [bad] + good[3:], 32, 16)
    batch = pa.table(
        {
            "video_id": pa.array(["v0"], pa.string()),
            "bytes": pa.array([avi], pa.binary()),
            "fmt": pa.array([FMT_AVI_MJPEG], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="disagree"):
        FrameSample(every_n_frames=1)(batch)


def test_frame_sample_unknown_fmt_is_honest_stub():
    batch = pa.table(
        {
            "video_id": pa.array(["v0"], pa.string()),
            "bytes": pa.array([b"\x00" * 64], pa.binary()),
            "fmt": pa.array(["mp4"], pa.string()),
        }
    )
    with pytest.raises(NotImplementedError, match="mp4"):
        FrameSample()(batch)


def test_frame_sample_through_ray(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_stage_batch(n_videos=4, nf=12)).map_batches(
        FrameSample,
        fn_constructor_kwargs={"every_n_frames": 6},
        batch_format="pyarrow",
        batch_size=2,
        concurrency=2,
    )
    df = ds.to_pandas()
    # nf = 12,13,14,15 -> sampled 0,6 / 0,6,12(no:13->0,6,12) ...
    expect = {f"v{v}": list(range(0, 12 + v, 6)) for v in range(4)}
    for vid, grp in df.groupby("video_id"):
        assert sorted(grp.frame_idx.tolist()) == expect[vid]
    assert df.bytes.map(len).gt(100).all()
