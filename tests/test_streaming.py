"""StreamingCrawler (spider_ray.frontier_stream) must be semantically
identical to the driver-mode Crawler: same seen-set, same per-round
fetch counts, same item/image outputs — on GET worlds, POST/API worlds
and deferral-heavy windows."""

import pytest

from spider_ray.frontier import Crawler
from spider_ray.frontier_stream import StreamingCrawler
from spider_ray.synth import WorldConfig

CAPTIONS = [f"caption {i}" for i in range(5)]


def _driver_run(cfg, window=60_000, **kw):
    c = Crawler(cfg, CAPTIONS, num_dedup_shards=4, obey_robots=True,
                round_window_ms=window, **kw)
    res = c.crawl(cfg.seeds())
    seen = set()
    for snap in c.dedup.snapshot():
        seen.update(int(x) for x in snap)
    return c, res, seen


def _stream_run(cfg, tmp_path, window=60_000, **kw):
    s = StreamingCrawler(cfg, CAPTIONS, work_dir=str(tmp_path / "work"),
                         num_dedup_shards=4, obey_robots=True,
                         round_window_ms=window, **kw)
    res = s.crawl(cfg.seeds())
    return s, res, s.seen_set()


# threshold 0 forces the distributed-sort + stamp-task path on every
# round (the at-scale route); default exercises the small-round fast path
@pytest.mark.parametrize(
    "api_pct,window,thresh",
    [(0, 60_000, 100_000), (100, 60_000, 100_000), (0, 3_000, 100_000),
     (0, 60_000, 0), (0, 3_000, 0)],
)
def test_streaming_equals_driver_mode(ray_session, tmp_path, api_pct, window,
                                      thresh):
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, private_pct=15,
                      api_host_pct=api_pct)
    dc, dres, dseen = _driver_run(cfg, window)
    sc, sres, sseen = _stream_run(cfg, tmp_path, window,
                                  small_round_threshold=thresh)

    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["items"] == dres["items"]
    assert sres["images"] == dres["images"]
    # per-round admitted counts line up
    d_admits = [row["rows_admitted"] for row in dc.lineage]
    s_admits = [row["rows_admitted"] for row in sc.lineage]
    assert s_admits == d_admits

    # sink rows identical (ids + phashes + captions)
    dimg = dc.images_table().to_pydict()
    simg = sc.images_dataset().to_pandas()
    d_rows = dict(zip(dimg["image_id"], zip(dimg["phash"], dimg["caption"])))
    s_rows = dict(zip(simg["image_id"], zip(simg["phash"], simg["caption"])))
    assert s_rows == d_rows

    # item rows identical (link + rent + position)
    ditems = dc.items_table()
    if ditems.num_rows:
        dset = set(
            zip(
                ditems.column("external_link").to_pylist(),
                ditems.column("rent").to_pylist(),
                ditems.column("position").to_pylist(),
            )
        )
        sitems = sc.items_dataset().to_pandas()
        sset = set(zip(sitems["external_link"], sitems["rent"], sitems["position"]))
        assert sset == dset


def test_streaming_frontier_partitions_on_disk(ray_session, tmp_path):
    import os

    cfg = WorldConfig(num_hosts=2, max_pages_per_host=1, details_per_page=3)
    sc, res, _ = _stream_run(cfg, tmp_path)
    rounds = sorted(os.listdir(sc.frontier_root))
    assert len(rounds) >= res["rounds"]  # one partition dir per round
    assert all(r.startswith("round_") for r in rounds)
    # seen snapshots checkpointed per round
    assert len(os.listdir(sc.seen_dir)) == res["rounds"]


def test_streaming_resume(ray_session, tmp_path):
    """Interrupt a streaming crawl, resume from the same work_dir:
    totals equal an uninterrupted run and nothing refetches."""
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10)
    work = str(tmp_path / "resume_work")

    full = StreamingCrawler(cfg, CAPTIONS, work_dir=str(tmp_path / "full"),
                            num_dedup_shards=4)
    full_res = full.crawl(cfg.seeds())

    part = StreamingCrawler(cfg, CAPTIONS, work_dir=work, num_dedup_shards=4,
                            max_rounds=2)
    part.crawl(cfg.seeds())
    assert len(part.lineage) == 2

    resumed = StreamingCrawler(cfg, CAPTIONS, work_dir=work, num_dedup_shards=4)
    res = resumed.crawl([])  # seeds ignored: state restored
    assert res["rounds"] == full_res["rounds"]
    assert res["fetched"] == full_res["fetched"]
    assert res["images"] == full_res["images"]
    assert res["items"] == full_res["items"]
    assert resumed.seen_set() == full.seen_set()
    # sink identical to the uninterrupted run
    a = sorted(full.images_dataset().to_pandas()["image_id"])
    b = sorted(resumed.images_dataset().to_pandas()["image_id"])
    assert a == b
    # resuming a FINISHED crawl is a no-op
    again = StreamingCrawler(cfg, CAPTIONS, work_dir=work, num_dedup_shards=4)
    res2 = again.crawl([])
    assert res2["fetched"] == full_res["fetched"]


def test_streaming_resume_after_lost_finalizer(ray_session, tmp_path):
    """Kill between a round's execution and its ASYNC checkpoint
    finalizer: the round-complete marker (seen snapshot, written by
    _finalize_round after the frontier parts) never lands, so resume
    must re-run that round from its durable frontier checkpoint and
    converge to the uninterrupted run with no duplicate sink rows
    (VERDICT r3 Next-round #9 — tests the marker-implies-durable
    ordering promise from the failing side)."""
    import os
    import shutil

    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10)
    full = StreamingCrawler(cfg, CAPTIONS, work_dir=str(tmp_path / "full"),
                            num_dedup_shards=4)
    full_res = full.crawl(cfg.seeds())

    work = str(tmp_path / "lost_fin")
    part = StreamingCrawler(cfg, CAPTIONS, work_dir=work, num_dedup_shards=4,
                            max_rounds=2)
    part.crawl(cfg.seeds())
    assert len(part.lineage) == 2
    # round 1 ran (its images/items partitions exist) but its finalizer
    # "never fired": erase the marker + lineage it would have written
    shutil.rmtree(os.path.join(part.seen_dir, "round_0001"))
    lp = os.path.join(work, "lineage", "round_0001.json")
    if os.path.exists(lp):
        os.remove(lp)

    resumed = StreamingCrawler(cfg, CAPTIONS, work_dir=work,
                               num_dedup_shards=4)
    res = resumed.crawl([])  # restarts at round 1 from its checkpoint
    assert res["rounds"] == full_res["rounds"]
    assert res["fetched"] == full_res["fetched"]
    assert res["images"] == full_res["images"]
    assert res["items"] == full_res["items"]
    assert resumed.seen_set() == full.seen_set()
    a = sorted(full.images_dataset().to_pandas()["image_id"])
    b = sorted(resumed.images_dataset().to_pandas()["image_id"])
    assert a == b  # no duplicate or missing sink rows


def test_carry_blocks_are_host_aligned(ray_session, tmp_path):
    """The r4 invariant behind shuffle-free admission: every carry
    block the stamp hands the next round holds WHOLE hosts (a host_hash
    never spans two blocks), on both stamp paths."""
    import numpy as np

    # big enough that at least one round's carry exceeds the 256-row
    # minimum block target and splits into multiple host-aligned blocks
    cfg = WorldConfig(num_hosts=40, max_pages_per_host=1, details_per_page=16)

    for thresh in (100_000, 0):  # driver-sort path and distributed-sort path
        sc = StreamingCrawler(
            cfg, CAPTIONS, work_dir=str(tmp_path / f"align_{thresh}"),
            num_dedup_shards=4, small_round_threshold=thresh, max_rounds=3,
        )
        seen_round = False
        orig = sc._run_round

        def checked(r):
            nonlocal seen_round
            if sc._carry is not None and sc._carry_rows > 0:
                blocks = [
                    ray.get(ref)
                    for b in sc._carry.iter_internal_ref_bundles()
                    for ref, _m in b.blocks
                ]
                owners = {}
                for bi, t in enumerate(blocks):
                    for hh in set(
                        t["host_hash"].to_numpy(zero_copy_only=False).tolist()
                    ):
                        assert owners.setdefault(hh, bi) == bi, (
                            f"host {hh} spans blocks {owners[hh]} and {bi}"
                        )
                    # within-block order: (host_hash, seq) ascending —
                    # the precondition for the fused admit kernel
                    hhv = t["host_hash"].to_numpy(zero_copy_only=False)
                    assert (np.diff(hhv.astype(np.uint64)) >= 0).all() or len(hhv) < 2
                if len(blocks) > 1:
                    seen_round = True
            return orig(r)

        import ray
        sc._run_round = checked
        sc.crawl(cfg.seeds())
        assert seen_round, "no multi-block carry was ever checked"
        sc.close()


def test_streaming_redirects_equal_driver(ray_session, tmp_path):
    """The streaming mode follows 301 aliases identically to the
    driver mode (shared parse kernel) — on the pure at-scale path
    (threshold 0: distributed sort every round)."""
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, private_pct=15,
                      redirect_pct=40)
    dc, dres, dseen = _driver_run(cfg)
    sc, sres, sseen = _stream_run(cfg, tmp_path, small_round_threshold=0)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["images"] == dres["images"]
    d_admits = [row["rows_admitted"] for row in dc.lineage]
    s_admits = [row["rows_admitted"] for row in sc.lineage]
    assert s_admits == d_admits


def test_streaming_content_encoding_equal_driver(ray_session, tmp_path):
    """Compressed worlds (gzip_pct > 0) crawl identically in both
    modes — the decode lives in the shared fetch kernel."""
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, private_pct=15,
                      gzip_pct=60)
    dc, dres, dseen = _driver_run(cfg)
    sc, sres, sseen = _stream_run(cfg, tmp_path, small_round_threshold=0)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["images"] == dres["images"]


def test_streaming_offsite_equal_driver(ray_session, tmp_path):
    """Offsite worlds (offsite_pct > 0) crawl identically in both
    modes — the OffsiteMiddleware filter lives in the shared parse
    kernel, so dropped partner links never enter either frontier."""
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, private_pct=15,
                      offsite_pct=50)
    dc, dres, dseen = _driver_run(cfg)
    sc, sres, sseen = _stream_run(cfg, tmp_path, small_round_threshold=0)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["images"] == dres["images"]
    assert sum(row["rows_offsite"] for row in dc.lineage) > 0


def test_streaming_handled_status_equal_driver(ray_session, tmp_path):
    """Soft-401 worlds with handle_httpstatus_list crawl identically
    in both modes — the handled-status routing lives in the shared
    parse kernel (retry-to-exhaustion first, then parse)."""
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, private_pct=15,
                      soft401_pct=40, handle_httpstatus_list=(401,))
    dc, dres, dseen = _driver_run(cfg)
    sc, sres, sseen = _stream_run(cfg, tmp_path, small_round_threshold=0)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["images"] == dres["images"]
    assert sres["items"] == dres["items"]


def test_streaming_http_cache_equal_driver(ray_session, tmp_path):
    """HTTP-cached worlds crawl identically in both modes (the cache
    probe lives in the shared winner+admit kernel, the serve/store in
    the shared fetch kernel), and a warm streaming re-run over the
    same cache dir reproduces the cold outputs."""
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, private_pct=15)
    dc, dres, dseen = _driver_run(
        cfg, http_cache_dir=str(tmp_path / "hc_driver"))
    sc, sres, sseen = _stream_run(cfg, tmp_path, small_round_threshold=0,
                                  http_cache_dir=str(tmp_path / "hc_stream"))
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["images"] == dres["images"]
    assert sres["items"] == dres["items"]
    # warm streaming re-run on the now-populated cache dir
    sw, swres, swseen = _stream_run(cfg, tmp_path / "warm",
                                    small_round_threshold=0,
                                    http_cache_dir=str(tmp_path / "hc_stream"))
    assert swseen == sseen
    assert swres["fetched"] == sres["fetched"]
    assert swres["images"] == sres["images"]
    assert swres["items"] == sres["items"]


def test_streaming_cookies_equal_driver(ray_session, tmp_path):
    """Session-gated worlds (cookie_host_pct > 0) crawl identically in
    both modes: the streaming jar rides the stats actor (harvested
    in-task, merged round-aligned) and must reproduce the driver
    mode's fetch/image totals exactly."""
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=4,
                      fail_pct=10, notfound_pct=5, private_pct=15,
                      cookie_host_pct=80)
    gated = [i for i in range(cfg.num_hosts) if cfg.is_cookie_host(i)]
    assert gated, "no gated hosts"
    dc, dres, dseen = _driver_run(cfg)
    sc, sres, sseen = _stream_run(cfg, tmp_path, small_round_threshold=0)
    assert sseen == dseen
    assert sres["fetched"] == dres["fetched"]
    assert sres["images"] == dres["images"]
    assert sres["items"] == dres["items"]
    assert sc.cookie_jar == dc.cookie_jar
    assert sum(len(row["cookies_learned"]) for row in sc.lineage) == len(gated)
