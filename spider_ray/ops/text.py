"""Text analysis operators over a documents table.

All are single-pass ``map_batches`` bodies (no shuffle): token
counting, quality scoring, language-ID heuristic, document
fingerprinting. Counts are integers so the DuckDB oracle compares
exactly (no float hash drift).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import xxh64_many

_TOKEN_RE = r"\S+"
# BPE-style pre-tokenization (the GPT-2 pattern family, lookahead-free
# so it runs on RE2 — pyarrow and DuckDB both use RE2): contractions,
# letter runs, digit runs, punctuation runs
_BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"

# stopword lists for the langid heuristic (tiny, public-knowledge lists)
LANG_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en"},
    "nl": {"de", "het", "een", "en", "is", "van", "te", "met"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token counts, vectorized (pc.count_substring_regex): whitespace
    tokens plus a BPE-style pre-tokenizer count (the unit a GPT-2-family
    tokenizer splits into before merges)."""
    n = pc.count_substring_regex(batch[text_col], _TOKEN_RE)
    nb = pc.count_substring_regex(batch[text_col], _BPE_RE)
    out = batch.append_column("n_tokens", n.cast(pa.int64()))
    return out.append_column("n_bpe_tokens", nb.cast(pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-signal columns: length, tokens, stopword hits ('the'/'a'),
    punctuation count, mean token length ×100 (int — oracle-exact)."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = pc.count_substring_regex(text, _TOKEN_RE).cast(pa.int64())
    n_stop = pc.count_substring_regex(text, r"\b(the|a)\b").cast(pa.int64())
    n_punct = pc.count_substring_regex(text, r"[.,;:!?]").cast(pa.int64())
    out = batch.append_column("q_chars", n_chars)
    out = out.append_column("q_tokens", n_tokens)
    out = out.append_column("q_stopwords", n_stop)
    out = out.append_column("q_punct", n_punct)
    return out


# PII patterns — RE2-safe (no lookaround), so the SAME strings run in
# pyarrow's kernels and in the DuckDB oracle's REGEXP_* functions.
# Email per the practical HTML5-ish form; phone pinned to the
# +C (AAA) NNN-NNNN shape the synthetic injector emits (a scrubber's
# phone grammar is deployment-specific — the op's structure is what's
# under test); IPv4 as dotted quads.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,2} \([0-9]{3}\) [0-9]{3}-[0-9]{4}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII detect + redact — the scrub stage LLM training pipelines run
    before tokenization (C4/Dolma/RefinedWeb-style cleaning): count
    emails / phone numbers / IPv4s and replace each with a typed
    placeholder token. Fully vectorized (three RE2 count kernels +
    three replace kernels per batch, no Python loop); redaction order
    is email → phone → IP (placeholders contain none of the other
    patterns, so the order is inert — pinned anyway for the oracle)."""
    text = batch[text_col]
    out = batch.append_column(
        "n_emails", pc.count_substring_regex(text, PII_EMAIL_RE).cast(pa.int64()))
    out = out.append_column(
        "n_phones", pc.count_substring_regex(text, PII_PHONE_RE).cast(pa.int64()))
    out = out.append_column(
        "n_ipv4", pc.count_substring_regex(text, PII_IPV4_RE).cast(pa.int64()))
    red = pc.replace_substring_regex(text, PII_EMAIL_RE, "<EMAIL>")
    red = pc.replace_substring_regex(red, PII_PHONE_RE, "<PHONE>")
    red = pc.replace_substring_regex(red, PII_IPV4_RE, "<IP>")
    return out.append_column("redacted", red)


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher/MassiveText-style repetition-quality signals (Rae et al.
    2021, "Scaling Language Models: Gopher", App. A1.1 repetition
    filters), integer-exact so the SQL oracle hash-matches:

      r_lines            — '\\n'-split line count
      r_distinct_lines   — distinct lines
      r_dup_line_chars   — Σ (count−1) × len(line) over distinct lines
                           (the duplicate-line character mass)
      r_top_bigram_chars — max over word 2-grams of count × gram chars
                           (incl. the joining space); 0 when <2 tokens

    Consumers derive the paper's fractions (dup_line_frac =
    r_dup_line_chars / q_chars, …) downstream — integers keep the
    driver's value-hash comparison exact. Vectorized batch-wide: one
    factorize per string domain, one lexsort per (doc, key) grouping,
    no per-doc Python beyond the initial str.split."""
    import itertools

    texts = batch[text_col].to_pylist()
    n = len(texts)

    def grouped_counts(doc_of: np.ndarray, codes: np.ndarray):
        """(doc, code) group representatives + multiplicities via ONE
        lexsort + adjacent-equal scan."""
        order = np.lexsort((codes, doc_of))
        d = doc_of[order]
        c = codes[order]
        if not len(d):
            z = np.empty(0, np.int64)
            return z, z, z
        new = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
        gidx = np.nonzero(new)[0]
        cnt = np.diff(np.r_[gidx, len(d)]).astype(np.int64)
        return d[gidx], c[gidx], cnt

    # ---- line repetition
    line_lists = [(t or "").split("\n") for t in texts]
    llen = np.fromiter((len(x) for x in line_lists), np.int64, count=n)
    flat_lines = list(itertools.chain.from_iterable(line_lists))
    if flat_lines:
        lcodes, luniq = pd.factorize(np.asarray(flat_lines, dtype=object))
        lulen = np.fromiter((len(u) for u in luniq), np.int64,
                            count=len(luniq))
    else:
        lcodes = np.empty(0, np.int64)
        lulen = np.empty(0, np.int64)
    ldoc = np.repeat(np.arange(n, dtype=np.int64), llen)
    gd, gc, cnt = grouped_counts(ldoc, np.asarray(lcodes, np.int64))
    distinct = np.bincount(gd, minlength=n).astype(np.int64)
    dup_chars = np.bincount(
        gd, weights=(cnt - 1) * lulen[gc], minlength=n
    ).astype(np.int64)

    # ---- top word-bigram character mass
    tok_lists = [(t or "").split() for t in texts]
    tlen = np.fromiter((len(x) for x in tok_lists), np.int64, count=n)
    flat_toks = list(itertools.chain.from_iterable(tok_lists))
    top = np.zeros(n, dtype=np.int64)
    if flat_toks:
        tcodes, tuniq = pd.factorize(np.asarray(flat_toks, dtype=object))
        tcodes = np.asarray(tcodes, np.int64)
        tulen = np.fromiter((len(u) for u in tuniq), np.int64,
                            count=len(tuniq))
        tdoc = np.repeat(np.arange(n, dtype=np.int64), tlen)
        if len(tcodes) >= 2:
            valid = tdoc[:-1] == tdoc[1:]
            d2 = tdoc[:-1][valid]
            a = tcodes[:-1][valid]
            b = tcodes[1:][valid]
            # group (doc, a, b) without composing an overflow-prone key
            order = np.lexsort((b, a, d2))
            d2, a, b = d2[order], a[order], b[order]
            if len(d2):
                new = np.r_[
                    True,
                    (d2[1:] != d2[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1]),
                ]
                gidx = np.nonzero(new)[0]
                cnt2 = np.diff(np.r_[gidx, len(d2)]).astype(np.int64)
                val = cnt2 * (tulen[a[gidx]] + tulen[b[gidx]] + 1)
                np.maximum.at(top, d2[gidx], val)

    out = batch.append_column("r_lines", pa.array(llen, pa.int64()))
    out = out.append_column("r_distinct_lines", pa.array(distinct, pa.int64()))
    out = out.append_column("r_dup_line_chars", pa.array(dup_chars, pa.int64()))
    return out.append_column("r_top_bigram_chars", pa.array(top, pa.int64()))


class LangId:
    """Stopword-vote language ID (actor-pool stage: vocab sets compiled
    once per actor). Returns best language or 'und' when no stopword
    hits. Heuristic — no SQL oracle (driver rows-only check)."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zà-ÿäöüß]+")
        self.vocab = {lang: frozenset(ws) for lang, ws in LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = []
        for t in texts:
            words = self.word_re.findall((t or "").lower())
            best, best_n = "und", 0
            for lang, vocab in self.vocab.items():
                n = sum(1 for w in words if w in vocab)
                if n > best_n:
                    best, best_n = lang, n
            langs.append(best)
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: xxh64 of whitespace-normalized text, stored
    as int64 (two's complement). Content-addressable identity for exact
    dedup at any scale."""
    texts = batch[text_col].to_pylist()
    ws = re.compile(r"\s+")
    normed = [ws.sub(" ", (t or "")).strip() for t in texts]
    # one vectorized batch hash (r4); int64 view = two's complement
    fps = xxh64_many(normed).view(np.int64)
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))


def rolling_hashes(text: str, window: int = 8, base: int = 257,
                   mod: int = (1 << 61) - 1) -> list[int]:
    """Rabin-Karp rolling hash of byte windows (public algorithm) —
    the primitive for content-defined chunk fingerprints."""
    data = text.encode("utf-8")
    if len(data) < window:
        return [int.from_bytes(data, "big") % mod] if data else []
    out = []
    h = 0
    power = pow(base, window - 1, mod)
    for i, b in enumerate(data):
        h = (h * base + b) % mod
        if i >= window - 1:
            out.append(h)
            h = (h - data[i - window + 1] * power) % mod
    return out
