"""Exercise the at-scale code paths that the default test configs skip:
the groupby(host_hash) politeness shuffle + skew prefilter (used when a
round's frontier exceeds prefilter_threshold) must produce results
identical to the shuffle-free host-aligned path and to the oracle; and
the near-dup/ANN pair pipelines must stay off the driver (no payload
column is ever collected driver-side) while scaling past toy corpora."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from spider_ray.frontier import Crawler
from spider_ray.synth import WorldConfig

from .oracle import OracleCrawler

CAPTIONS = [f"caption {i}" for i in range(5)]


def _fetch_sets(crawler):
    return [frozenset(int(h) for h in arr) for arr in crawler.fetched_hashes]


def _run(cfg, **kw):
    defaults = dict(num_dedup_shards=4, obey_robots=True, round_window_ms=4_000)
    defaults.update(kw)
    c = Crawler(cfg, CAPTIONS, **defaults)
    res = c.crawl(cfg.seeds())
    return c, res


def test_groupby_shuffle_path_matches_local_path(ray_session):
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=5)
    # force the at-scale path: every round takes the prefilter + groupby
    # shuffle route (prefilter_threshold=0) and no inline fast path
    shuffle_c, shuffle_res = _run(cfg, prefilter_threshold=0, inline_threshold=0)
    local_c, local_res = _run(cfg)
    assert shuffle_res == local_res
    assert _fetch_sets(shuffle_c) == _fetch_sets(local_c)
    img_a = shuffle_c.images_table()
    img_b = local_c.images_table()
    assert sorted(img_a.column("image_id").to_pylist()) == sorted(
        img_b.column("image_id").to_pylist()
    )


def test_fused_round_path_matches_inline_and_oracle(ray_session):
    """The fused use_local execution (winner→admit→commit→fetch→parse
    in ONE dataset per round, r3) must byte-match the inline driver
    path and the sequential oracle — including under a tight
    politeness window that produces real deferrals riding back as
    'deferred' carrier rows."""
    cfg = WorldConfig(num_hosts=3, max_pages_per_host=2, details_per_page=5)
    fused_c, fused_res = _run(cfg, inline_threshold=0)  # use_local, not inline
    base_c, base_res = _run(cfg)  # mostly inline
    assert fused_res == base_res
    assert _fetch_sets(fused_c) == _fetch_sets(base_c)
    assert sorted(fused_c.images_table().column("image_id").to_pylist()) == sorted(
        base_c.images_table().column("image_id").to_pylist()
    )

    # deferral flow through the fused union
    cfg2 = WorldConfig(num_hosts=2, max_pages_per_host=2, details_per_page=6)
    eng, _ = _run(cfg2, inline_threshold=0, round_window_ms=3_000)
    ora = OracleCrawler(cfg2, CAPTIONS, round_window_ms=3_000).crawl(cfg2.seeds())
    rounds = {}
    for r, _url, fp in ora.fetch_log:
        rounds.setdefault(r, set()).add(fp)
    ora_sets = [frozenset(rounds.get(i, set())) for i in range(max(rounds) + 1)]
    assert _fetch_sets(eng) == ora_sets
    assert sum(row["rows_deferred"] for row in eng.lineage) > 0


def test_groupby_shuffle_path_matches_oracle_with_deferral(ray_session):
    # tight window → real deferrals flowing through the prefilter path
    cfg = WorldConfig(num_hosts=2, max_pages_per_host=2, details_per_page=6)
    eng, _ = _run(cfg, prefilter_threshold=0, inline_threshold=0,
                  round_window_ms=3_000)
    ora = OracleCrawler(cfg, CAPTIONS, round_window_ms=3_000).crawl(cfg.seeds())
    rounds = {}
    for r, _url, fp in ora.fetch_log:
        rounds.setdefault(r, set()).add(fp)
    ora_sets = [frozenset(rounds.get(i, set())) for i in range(max(rounds) + 1)]
    assert _fetch_sets(eng) == ora_sets
    assert sum(row["rows_deferred"] for row in eng.lineage) > 0


def test_hot_host_skew_deferral(ray_session):
    """One host dominating the frontier: budget-first-k admission must
    drain it over multiple rounds in strict seq order (the skew story:
    only the admissible head of the hot queue competes each round)."""
    cfg = WorldConfig(num_hosts=1, max_pages_per_host=1, details_per_page=40,
                      fail_pct=0, notfound_pct=0, private_pct=0)
    eng, res = _run(cfg, round_window_ms=2_000)
    ora = OracleCrawler(cfg, CAPTIONS, round_window_ms=2_000).crawl(cfg.seeds())
    assert res["seen"] == len(ora.seen)
    assert sum(r["rows_deferred"] for r in eng.lineage) > 0
    # per-round fetch sets match the oracle exactly despite deferral
    rounds = {}
    for r, _url, fp in ora.fetch_log:
        rounds.setdefault(r, set()).add(fp)
    ora_sets = [frozenset(rounds.get(i, set())) for i in range(max(rounds) + 1)]
    assert _fetch_sets(eng) == ora_sets


# ------------------------------------------------------------------ near-dup suite
# payload columns that must never appear in a driver-side collection
_PAYLOAD = {"text", "embedding", "shingles", "sh_a", "sh_b", "words", "minhash"}


def _spy_collections(monkeypatch):
    """Record the column set of every Dataset the driver collects."""
    collected = []

    orig_tp = rd.Dataset.to_pandas
    orig_refs = rd.Dataset.to_arrow_refs
    orig_iter = rd.Dataset.iter_batches

    def spy_tp(self, *a, **k):
        out = orig_tp(self, *a, **k)
        collected.append(set(out.columns))
        return out

    def spy_refs(self, *a, **k):
        out = orig_refs(self, *a, **k)
        try:
            collected.append(set(self.schema().names))
        except Exception:
            pass
        return out

    def spy_iter(self, *a, **k):
        for b in orig_iter(self, *a, **k):
            cols = set(
                b.column_names if isinstance(b, pa.Table) else getattr(b, "columns", [])
            )
            collected.append(cols)
            yield b

    monkeypatch.setattr(rd.Dataset, "to_pandas", spy_tp)
    monkeypatch.setattr(rd.Dataset, "to_arrow_refs", spy_refs)
    monkeypatch.setattr(rd.Dataset, "iter_batches", spy_iter)
    return collected


def test_near_dup_suite_never_collects_payload(ray_session, monkeypatch):
    """VERDICT r1 #1: the minhash/simhash/embedding/ANN pipelines must
    not materialize corpus payloads on the driver — only pair/result
    rows. Spies on every driver-collection API and asserts no collected
    frame carries a payload column."""
    from spider_ray.ops import dedup_text, similarity

    collected = _spy_collections(monkeypatch)

    docs = [
        {"doc_id": i, "text": f"token{i} alpha{i % 97} beta gamma delta epsilon "
                              f"zeta eta theta word{i % 89} tail{i}"}
        for i in range(290)
    ]
    # plant 10 exact duplicates so the pair pipelines emit real output
    docs += [{"doc_id": 290 + j, "text": docs[j]["text"]} for j in range(10)]
    ds = rd.from_items(docs, override_num_blocks=4)
    mh = dedup_text.minhash_lsh_pairs(ds, k=3, bands=32, threshold=0.5).to_pandas()
    sh = dedup_text.simhash_near_pairs(ds, max_hamming=10).to_pandas()

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(400, 16))
    mat[200:] = mat[:200]  # exact dup of every vector
    eds = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].astype("float32").tolist()}
         for i in range(400)], override_num_blocks=4,
    )
    ep = dedup_text.embedding_dup_pairs(eds, threshold=0.95, num_blocks=4).to_pandas()
    assert len(ep) >= 200  # injected dups all found
    qm = mat[:3]
    al = similarity.ann_topk_lsh(eds, [0, 1, 2], qm, k=5, nbits=6)
    assert set(al["query_id"]) == {0, 1, 2}

    for cols in collected:
        assert not (cols & _PAYLOAD), f"driver collected payload columns: {cols}"


def test_pair_pipelines_moderate_scale(ray_session):
    """Beyond-toy corpus (the VERDICT r1 'done' bar): the distributed
    pair shapes complete on a >10^4-row corpus with bounded group
    counts and produce exactly the injected duplicates."""
    from spider_ray.ops import dedup_text

    n = 20_000
    rng = np.random.default_rng(42)
    words = np.array([f"w{i}" for i in range(50)])
    texts = [
        " ".join(words[rng.integers(0, 50, size=12)]) for _ in range(n // 2)
    ]
    texts = texts + texts  # second half = exact duplicates
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
        override_num_blocks=8,
    )
    pairs = dedup_text.simhash_near_pairs(ds, max_hamming=0).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    # every (i, i + n/2) exact-dup pair has hamming 0 and shares all chunks
    expect = {(i, i + n // 2) for i in range(n // 2)}
    assert expect <= got

    m = 10_000
    mat = rng.normal(size=(m, 16))
    mat[m // 2 :] = mat[: m // 2]
    eds = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].astype("float32").tolist()}
         for i in range(m)], override_num_blocks=8,
    )
    ep = dedup_text.embedding_dup_pairs(eds, threshold=0.9999, num_blocks=8).to_pandas()
    egot = set(zip(ep["a"], ep["b"]))
    eexpect = {(i, i + m // 2) for i in range(m // 2)}
    assert eexpect <= egot


def test_groupby_shuffle_path_with_new_knobs(ray_session):
    """The at-scale prefilter+groupby route under the r4 surfaces that
    touch its budget math: per-spider politeness custom_settings (the
    prefilter containment bound must still contain every custom
    profile's budget), dont_filter featured rows (must survive the
    prefilter and bypass the winner query), and token-carrying API
    pagination. Shuffle route = local route = oracle."""
    from collections import Counter

    cfg = WorldConfig(num_hosts=4, max_pages_per_host=2, details_per_page=5,
                      custom_politeness_pct=60, featured_pct=60,
                      api_host_pct=34, viewstate_pct=100,
                      # DUPEFILTER-off repeats and per-host allow-lists
                      # must survive the prefilter + shuffle admission
                      # exactly like the local route
                      dedup_off_pct=50, related_pct=70,
                      soft401_pct=30, httperror_allowed_pct=60,
                      # header surfaces: the shuffle route's fetch
                      # slices must carry parent_url (Referer) and the
                      # per-host spider headers exactly like the local
                      # route, or hotlinked images / negotiated
                      # listings / gated API pages silently drop
                      lang_host_pct=50, hotlink_pct=60,
                      xhr_api_pct=100, json_api_pct=50,
                      # late-r4 surfaces: form-postback pagination (the
                      # harvested POST rows must ride the shuffle with
                      # their form_body intact) and DOWNLOAD_TIMEOUT
                      # (timed-out attempts must retry/die identically
                      # through the shuffle admission)
                      form_pag_pct=60, slow_pct=40,
                      download_timeout_ms=20_000, timeout_host_pct=50,
                      # pinned-UA WAF gates and dont_redirect dead
                      # listings: the shuffle route's fetch slices
                      # carry host (→ pinned UA) and callback (→ the
                      # dont_redirect exemption) like the local route
                      ua_strict_pct=50, dead_detail_pct=40,
                      dont_redirect_details=True)
    shuffle_c, shuffle_res = _run(cfg, prefilter_threshold=0,
                                  inline_threshold=0)
    local_c, local_res = _run(cfg)
    assert shuffle_res == local_res
    assert _fetch_sets(shuffle_c) == _fetch_sets(local_c)
    # multiset equality pins the double-fetches through the shuffle path
    sh_ms = [Counter(int(h) for h in a) for a in shuffle_c.fetched_hashes]
    lo_ms = [Counter(int(h) for h in a) for a in local_c.fetched_hashes]
    assert sh_ms == lo_ms
    ora = OracleCrawler(cfg, CAPTIONS, round_window_ms=4_000).crawl(cfg.seeds())
    rounds = {}
    for r, _u, fp in ora.fetch_log:
        rounds.setdefault(r, Counter())[fp] += 1
    assert sh_ms == [rounds.get(i, Counter()) for i in range(len(sh_ms))]


def test_ann_hot_bucket_bounded_tasks(ray_session):
    """VERDICT r4 next-round #1: a single LSH bucket (or IVF cell)
    holding ~80% of the corpus must NOT ship whole to one task. With
    ``max_task_rows`` armed, every partial batch and every merge group
    asserts its row count in-worker — the old whole-bucket map_groups
    shape would trip it immediately (one task = 4000 rows here)."""
    from spider_ray.ops import similarity

    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    n = 5_000
    mat = np.empty((n, 16))
    # 80% of vectors are tiny perturbations of one direction -> one
    # hyperplane sign-pattern bucket; the rest are random
    hot = int(n * 0.8)
    mat[:hot] = base + 0.01 * rng.normal(size=(hot, 16))
    mat[hot:] = rng.normal(size=(n - hot, 16))
    eds = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].astype("float32").tolist()}
         for i in range(n)], override_num_blocks=16,
    )
    qm = mat[:3]  # queries land in the hot bucket
    bound = 1_024  # >= map_batches default batch size, << hot-bucket size

    lsh = similarity.ann_topk_lsh(eds, [0, 1, 2], qm, k=5, nbits=6,
                                  max_task_rows=bound)
    assert set(lsh["query_id"]) == {0, 1, 2}
    # each query's own vector is its rank-1 hit (cosine 1.0)
    assert lsh[lsh["rank"] == 1]["vec_id"].tolist() == [0, 1, 2]

    ivf = similarity.ann_topk_ivf(eds, [0, 1, 2], qm, k=5, nlist=8,
                                  nprobe=2, max_task_rows=bound)
    assert set(ivf["query_id"]) == {0, 1, 2}
    assert ivf[ivf["rank"] == 1]["vec_id"].tolist() == [0, 1, 2]
