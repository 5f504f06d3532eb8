"""Document deduplication — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup. Ray-Data-first shapes (see ray_guide):

  exact     : content-hash in a vectorized map_batches → groupby(hash)
              → first row per group (the hash-partition + per-group-first
              pattern; same shape as the crawl's O3 dedup-first).
  minhash   : shingle→minhash per batch (numpy, vectorized over perms)
              → explode to (band, band_hash, doc_id) → groupby bands →
              candidate pairs → exact-Jaccard verify on the pairs only.
  simhash   : 64-bit sign-sum of token hashes per doc; near-dup =
              hamming ≤ t (pairs via banding on 16-bit chunks).
  embedding : cosine ≥ τ pairs — brute force within blocks vs a
              broadcast matrix at test scale; LSH-bucketed at scale.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..hashing import splitmix64, xxh64

# ------------------------------------------------------------------ exact
def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = np.fromiter(
        (xxh64(t or "") for t in batch[text_col].to_pylist()),
        dtype=np.uint64,
        count=batch.num_rows,
    )
    return batch.append_column("text_hash", pa.array(h, pa.uint64()))


def exact_dedup(ds: rd.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """Keep the minimal-id row per distinct text (hash-partition +
    per-group first; ray_guide 'Exact dedup' pattern)."""

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return (
        ds.map_batches(add_text_hash, fn_kwargs={"text_col": text_col},
                       batch_format="pyarrow")
        .groupby("text_hash")
        .map_groups(first_per_group, batch_format="pandas")
    )


# ------------------------------------------------------------------ shingles
def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = (text or "").split()
    if len(toks) < k:
        return np.array([xxh64(" ".join(toks))], dtype=np.uint64)
    return np.unique(
        np.fromiter(
            (xxh64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)),
            dtype=np.uint64,
            count=len(toks) - k + 1,
        )
    )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


# ------------------------------------------------------------------ minhash
NUM_PERM = 128
_PERM_SEEDS = splitmix64(np.arange(1, NUM_PERM + 1, dtype=np.uint64) * np.uint64(0x9E37))


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """128-perm MinHash via the splitmix64 xor-permutation family —
    vectorized (|shingles| × 128) min-reduce."""
    if shingles.size == 0:
        return np.zeros(NUM_PERM, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = splitmix64(shingles[:, None] ^ _PERM_SEEDS[None, :])
    return m.min(axis=0)


def minhash_batch(batch: pa.Table, text_col: str = "text", k: int = 3) -> pa.Table:
    sigs = [
        minhash_signature(_shingle_hashes(t, k))
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(
        "minhash",
        pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64(), NUM_PERM)),
    )


def lsh_band_rows(batch: pa.Table, bands: int = 32, id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id) rows — the
    groupby on (band_id, band_hash) buckets candidates."""
    rows_per_band = NUM_PERM // bands
    ids = batch[id_col].to_pylist()
    sigs = batch["minhash"].to_pylist()
    out_band, out_hash, out_id = [], [], []
    for i, sig in zip(ids, sigs):
        s = np.asarray(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = s[b * rows_per_band : (b + 1) * rows_per_band]
            out_band.append(b)
            out_hash.append(xxh64(chunk.tobytes()))
            out_id.append(i)
    return pa.table(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.uint64()),
            "doc_id": pa.array(out_id, pa.int64()),
        }
    )


def minhash_lsh_pairs(ds: rd.Dataset, *, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3, bands: int = 32,
                      threshold: float = 0.6) -> pd.DataFrame:
    """Near-duplicate pairs: LSH candidates → exact-Jaccard verify.

    Candidate generation is fully distributed (map_batches → band
    explode → groupby buckets). Verification re-shingles only the
    candidate doc ids (a small broadcast join of texts at test scale;
    at 100 TB the verify stage would join texts by id through a
    bucketed shuffle instead).
    Returns pairs (a, b, jaccard) with a < b, jaccard ≥ threshold.
    """
    sigged = ds.map_batches(
        minhash_batch, fn_kwargs={"text_col": text_col, "k": k},
        batch_format="pyarrow",
    )
    band_rows = sigged.map_batches(
        lsh_band_rows, fn_kwargs={"bands": bands, "id_col": id_col},
        batch_format="pyarrow",
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique().tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        pairs = list(itertools.combinations(ids, 2))
        return pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})

    cand = (
        band_rows.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    cand = cand.drop_duplicates().reset_index(drop=True)

    # verify: fetch texts of candidate ids once (small side), exact jaccard
    need = sorted(set(cand["a"]) | set(cand["b"]))
    texts = {}
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            if i in texts:
                continue
            texts[i] = t
    shingle_cache = {i: _shingle_hashes(texts[i], k) for i in need if i in texts}
    keep_a, keep_b, keep_j = [], [], []
    for a, b in zip(cand["a"], cand["b"]):
        j = jaccard(shingle_cache[a], shingle_cache[b])
        if j >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
            keep_j.append(round(j, 4))
    return pd.DataFrame({"a": keep_a, "b": keep_b, "jaccard": keep_j}).sort_values(
        ["a", "b"]
    ).reset_index(drop=True)


# ------------------------------------------------------------------ simhash
def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash (Charikar): sign-sum of token xxh64 bit vectors."""
    out = np.empty(batch.num_rows, dtype=np.int64)
    for j, t in enumerate(batch[text_col].to_pylist()):
        toks = (t or "").split()
        if not toks:
            out[j] = 0
            continue
        hs = np.fromiter((xxh64(w) for w in toks), dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int32
        )
        votes = (2 * bits - 1).sum(axis=0)
        val = 0
        for bit in range(64):
            if votes[bit] > 0:
                val |= 1 << bit
        out[j] = val - (1 << 64) if val >= (1 << 63) else val
    return batch.append_column("simhash", pa.array(out, pa.int64()))


def simhash_near_pairs(ds: rd.Dataset, *, id_col: str = "doc_id",
                       max_hamming: int = 8) -> pd.DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ t, candidate-bucketed
    on 16-bit chunks (any pair within hamming ≤ 3 chunks-differ shares
    at least one identical chunk when t < 4 chunks — the classic
    Charikar banding argument extended; for t ≤ 8 we bucket on each of
    the four 16-bit chunks and verify)."""
    sigged = ds.map_batches(simhash_batch, batch_format="pyarrow")
    small = sigged.select_columns([id_col, "simhash"]).to_pandas()
    sig = small["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
    ids = small[id_col].to_numpy()
    buckets: dict[tuple[int, int], list[int]] = {}
    for row, s in enumerate(sig):
        for c in range(4):
            chunk = int((s >> np.uint64(16 * c)) & np.uint64(0xFFFF))
            buckets.setdefault((c, chunk), []).append(row)
    seen_pairs = set()
    out_a, out_b, out_h = [], [], []
    for rows in buckets.values():
        if len(rows) < 2:
            continue
        for i, j in itertools.combinations(rows, 2):
            key = (min(ids[i], ids[j]), max(ids[i], ids[j]))
            if key in seen_pairs:
                continue
            seen_pairs.add(key)
            h = bin(int(sig[i] ^ sig[j])).count("1")
            if h <= max_hamming:
                out_a.append(int(key[0]))
                out_b.append(int(key[1]))
                out_h.append(h)
    return (
        pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


# ------------------------------------------------------------------ embeddings
def embedding_dup_pairs(ds: rd.Dataset, *, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cos ≥ τ).

    Test-scale path: the normalized matrix is broadcast via ``ray.put``
    and each batch computes its block of the similarity matrix (numpy
    matmul) — O(n²) work distributed over batches, no shuffle. At 10^9
    vectors the same kernel runs inside LSH buckets (see
    similarity.lsh_buckets) instead of all-pairs.
    """
    tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = tbl[id_col].to_numpy()
    mat = np.stack(tbl[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, mat))

    def block_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        b_ids = batch[id_col].to_pylist()
        b_mat = np.stack(batch[vec_col].to_pylist()).astype(np.float64)
        b_mat /= np.maximum(np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-12)
        sims = b_mat @ all_mat.T
        ai, bj = np.nonzero(sims >= threshold)
        rows_a, rows_b, rows_s = [], [], []
        for i, j in zip(ai, bj):
            a, b = b_ids[i], int(all_ids[j])
            if a < b:
                rows_a.append(a)
                rows_b.append(b)
                rows_s.append(round(float(sims[i, j]), 4))
        return pa.table(
            {
                "a": pa.array(rows_a, pa.int64()),
                "b": pa.array(rows_b, pa.int64()),
                "cosine": pa.array(rows_s, pa.float64()),
            }
        )

    out = ds.map_batches(block_pairs, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return out.sort_values(["a", "b"]).reset_index(drop=True)
