"""Text analysis operators over a documents table.

All are single-pass ``map_batches`` bodies (no shuffle): token
counting, quality scoring, language-ID heuristic, document
fingerprinting. Counts are integers so the DuckDB oracle compares
exactly (no float hash drift).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import xxh64

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
    fps = np.fromiter(
        (
            (xxh64(ws.sub(" ", (t or "")).strip()) + (1 << 63)) % (1 << 64) - (1 << 63)
            for t in texts
        ),
        dtype=np.int64,
        count=len(texts),
    )
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
