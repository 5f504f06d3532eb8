"""Sink verification stages — the graft analog of the reference's
remote validation API (python_spiders/pipelines.py:39-54): every run
POSTed items to ``/api/spiders/validate``; here the validation is a
local, vectorizable ``map_batches`` stage over sink rows asserting the
per-row invariant from BASELINE.json ``input_hint``:

  * decoded pixels match the **independently re-synthesized oracle
    pixels** (from the ``src_url`` lineage column the sink carries) —
    exact for lossless PNG/GIF, PSNR ≥ 40 dB for lossy re-encodes;
  * caption exact equality against the caption the source detail page
    carries (``caption_for(detail ordinal)``);
  * ``phash`` recompute match.

Every check is falsifiable: corrupting a row's bytes flips
``pixels_ok`` (and usually ``phash_ok``); swapping a caption flips
``caption_ok`` (tests/test_ops.py::test_verify_images_falsifiable).
At real-crawl scale the actor holds a reference-dataset reader
instead of the synthetic World — the lineage column is the same.

Usable two ways: ``VerifyImages`` as a map_batches actor stage
(streaming, scale path), and ``verify_images_against_oracle`` driver
helper that raises on any violation (test path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .gif import FMT_GIF
from .imaging import FMT_PNG, decode, phash, psnr

from .webp import FMT_WEBP

_LOSSLESS = (FMT_PNG, FMT_GIF, FMT_WEBP)  # exact; everything else PSNR ≥ 40
from .synth import World, WorldConfig, image_pixels


def _oracle_for_url(src_url: str):
    """(image_key, detail ordinal) from an image URL's lineage.

    World image URLs are ``http://{host}/img/{k}_{j}.{ext}`` — the stem
    is the pixel-synthesis key, its first component the detail ordinal
    that owns the caption. Returns (None, None) for foreign URLs."""
    name = (src_url or "").rpartition("/")[2]
    key = name.split(".")[0]
    try:
        k = int(key.split("_")[0])
    except ValueError:
        return None, None
    return key, k


class VerifyImages:
    """Actor-pool verification stage (stateful: holds the re-synthesis
    World — at real-crawl scale this would hold the reference dataset
    reader instead)."""

    def __init__(self, cfg: WorldConfig, captions: list[str] | None = None,
                 captions_ref=None):
        if captions_ref is not None:
            import ray

            captions = ray.get(captions_ref)
        self.world = World(cfg, captions)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        pix_ok = np.zeros(n, dtype=bool)
        cap_ok = np.zeros(n, dtype=bool)
        ph_ok = np.zeros(n, dtype=bool)
        psnr_db = np.zeros(n, dtype=np.float64)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        captions = batch["caption"].to_pylist()
        phashes = batch["phash"].to_pylist()
        srcs = batch["src_url"].to_pylist()
        for j in range(n):
            try:
                px = decode(blobs[j], fmts[j])
            except Exception:
                psnr_db[j] = 0.0
                continue  # undecodable: every check stays False
            key, k = _oracle_for_url(srcs[j])
            if key is None:
                continue
            # ground truth re-synthesized from lineage, NOT from the
            # stored bytes — pixels_ok is falsifiable
            opx = image_pixels(self.world.cfg, key)
            if px.shape != opx.shape:
                psnr_db[j] = 0.0
            elif fmts[j] in _LOSSLESS:
                pix_ok[j] = bool((px == opx).all())
                psnr_db[j] = float("inf") if pix_ok[j] else psnr(px, opx)
            else:
                p = psnr(px, opx)
                psnr_db[j] = p
                pix_ok[j] = p >= 40.0
            cap_ok[j] = captions[j] == self.world.caption_for(k)
            ph_ok[j] = phash(px) == phashes[j]
        cols = dict(zip(batch.column_names, batch.columns))
        cols["pixels_ok"] = pa.array(pix_ok)
        cols["caption_ok"] = pa.array(cap_ok)
        cols["phash_ok"] = pa.array(ph_ok)
        cols["psnr_db"] = pa.array(psnr_db)
        return pa.table(cols)


def verify_images_against_oracle(images: pa.Table, oracle_pixels: dict,
                                 oracle_rows: dict) -> None:
    """Strict test-path check against an OracleCrawler result: raises
    AssertionError on the first violated row invariant."""
    d = images.to_pydict()
    for image_id, data, fmt, caption, ph in zip(
        d["image_id"], d["bytes"], d["fmt"], d["caption"], d["phash"]
    ):
        px = decode(data, fmt)
        opx = oracle_pixels[image_id]
        if fmt in _LOSSLESS:
            assert (px == opx).all(), f"pixel mismatch {image_id}"
        else:
            assert psnr(px, opx) >= 40.0, f"PSNR<40dB {image_id}"
        ocap, _ofmt, oph = oracle_rows[image_id]
        assert caption == ocap, f"caption mismatch {image_id}"
        assert phash(px) == ph == oph, f"phash mismatch {image_id}"
