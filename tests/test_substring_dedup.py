"""Substring (k-token span) duplication — Lee et al., arXiv:2107.06499:
verbatim spans shared between (or within) documents that document-level
near-dup misses. Engine output must equal a brute-force token-tuple
oracle exactly, and the star pattern must bound output linearly in the
group size."""

import numpy as np
import ray.data as rd

from spider_ray.ops.dedup_text import kgram_span_rows, shared_kgram_spans

BOILER = ("this listing is provided by example corp all rights reserved "
          "contact the agency for a viewing appointment today")  # 17 tokens


def _brute(docs, k):
    occ = {}
    for d in docs:
        toks = d["text"].split()
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p:p + k]), []).append((d["doc_id"], p))
    rows = []
    for lst in occ.values():
        if len(lst) < 2:
            continue
        lst = sorted(lst)
        c = lst[0]
        for doc, pos in lst[1:]:
            rows.append((doc, pos, c[0], c[1]))
    return sorted(rows)


def _engine(docs, k, blocks=3):
    ds = rd.from_items(docs, override_num_blocks=blocks)
    df = shared_kgram_spans(ds, k=k).to_pandas()
    return sorted(
        (int(a), int(b), int(c), int(d))
        for a, b, c, d in zip(df["doc_id"], df["pos"],
                              df["canon_doc_id"], df["canon_pos"])
    )


def _corpus():
    docs = []
    for i in range(12):
        body = " ".join(f"tok{i}w{j}" for j in range(30))
        if i % 3 == 0:  # boilerplate planted mid-document
            body = body + " " + BOILER + " tail" + str(i)
        docs.append({"doc_id": i, "text": body})
    # within-document repeat of the same span
    docs.append({"doc_id": 50,
                 "text": BOILER + " filler one two three " + BOILER})
    # a short doc (< k tokens) that must emit nothing
    docs.append({"doc_id": 51, "text": "tiny doc"})
    return docs


def test_span_rows_positions_and_short_docs(ray_session):
    import pyarrow as pa

    docs = _corpus()
    tbl = pa.Table.from_pylist(docs)
    rows = kgram_span_rows(tbl, k=10)
    ids = rows["doc_id"].to_pylist()
    assert 51 not in ids  # short doc emits no window
    # every doc with >= k tokens emits exactly len(toks)-k+1 windows
    from collections import Counter

    per = Counter(ids)
    for d in docs:
        n = len(d["text"].split())
        if n >= 10:
            assert per[d["doc_id"]] == n - 10 + 1


def test_shared_spans_match_brute_force(ray_session):
    docs = _corpus()
    for k in (10, 17):
        assert _engine(docs, k) == _brute(docs, k)


def test_star_bounds_hot_span_output(ray_session):
    """A boilerplate span shared by 60 docs yields 59 star rows per
    shared k-gram, not the 1,770 all-pairs rows — the bounded-output
    discipline for the hot-key case (every corpus has a license
    header). The 18-token boilerplate holds two 17-grams, so 2×59."""
    docs = [{"doc_id": i, "text": f"head{i} " + BOILER} for i in range(60)]
    k = 17
    got = _engine(docs, k, blocks=4)
    brute = _brute(docs, k)
    assert got == brute
    assert len(got) == 2 * 59
    assert {r[2] for r in got} == {0}  # doc 0 is every span's canon


def test_span_rows_batch_split_invariance(ray_session):
    """Block layout is an execution detail: 1 block vs 5 blocks must
    produce the same shared-span rows."""
    docs = _corpus()
    assert _engine(docs, 10, blocks=1) == _engine(docs, 10, blocks=5)
