"""Text-analysis kernels: tokenization, quality scoring, language-ID, shingles,
fingerprints — the training-data-pipeline operator set plus the reference's
HTML→text analogues (M10-M13 in SURVEY §2.2; pa2 segmentation M12).

All functions are pure and vectorize over a batch (list/ndarray of strings);
they are called inside ``map_batches`` bodies.
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np

# whitespace tokenization — matches the reference's ``content.split()``
# (Estrella.py:589 ``html_content.split()``) and DuckDB's
# string_split_regex(trim(text), '\s+') used by the oracle SQL.


def ws_tokens(text: str) -> list[str]:
    return text.split()


# BPE-ish tokenizer: word pieces + standalone punctuation marks.
_BPE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def bpe_tokens(text: str) -> list[str]:
    return _BPE_RE.findall(text)


def token_counts(texts: Sequence[str]) -> np.ndarray:
    """Whitespace token count per text (int64)."""
    return np.fromiter((len(t.split()) for t in texts), dtype=np.int64, count=len(texts))


def bpe_token_counts(texts: Sequence[str]) -> np.ndarray:
    return np.fromiter((len(_BPE_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts))


# ---------------------------------------------------------------- quality ----

# explicit charset so the DuckDB oracle can replicate with regexp_replace
PUNCT_CHARS = ",.!?;:"
_PUNCT_SET = set(PUNCT_CHARS)

STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)


def punct_ratios(texts: Sequence[str]) -> np.ndarray:
    """#punct-chars / #chars (0.0 for empty text). Charset = PUNCT_CHARS."""
    out = np.zeros(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        if t:
            out[i] = sum(c in _PUNCT_SET for c in t) / len(t)
    return out


def stopword_ratios(texts: Sequence[str], stopwords: frozenset = STOPWORDS_EN) -> np.ndarray:
    out = np.zeros(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = t.lower().split()
        if toks:
            out[i] = sum(w in stopwords for w in toks) / len(toks)
    return out


def quality_scores(texts: Sequence[str]) -> np.ndarray:
    """Heuristic document quality in [0, 1]:
    0.4·length-band + 0.3·(1 − punct_ratio·5 clipped) + 0.3·stopword presence.

    A deterministic, documented formula (not from the reference — the reference
    has no quality scorer; this is the training-data-pipeline extension)."""
    n_tok = token_counts(texts).astype(np.float64)
    length_band = np.clip(n_tok / 100.0, 0.0, 1.0)
    punct = np.clip(1.0 - punct_ratios(texts) * 5.0, 0.0, 1.0)
    stop = np.clip(stopword_ratios(texts) * 4.0, 0.0, 1.0)
    return 0.4 * length_band + 0.3 * punct + 0.3 * stop


# ---------------------------------------------------------------- lang id ----

# character-bigram profiles per language, built from small public seed phrases.
_LANG_SEEDS = {
    "en": "the quick brown fox jumps over the lazy dog and runs to the house with a friend",
    "de": "der schnelle braune fuchs springt über den faulen hund und läuft zum haus mit einem freund",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y corre a la casa con un amigo",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et court à la maison avec un ami",
    "zh": "敏捷的棕色狐狸跳过懒狗然后和朋友跑到房子",
}


def _bigram_profile(text: str) -> dict[str, float]:
    text = f" {text.lower()} "
    grams: dict[str, int] = {}
    for i in range(len(text) - 1):
        g = text[i : i + 2]
        grams[g] = grams.get(g, 0) + 1
    total = sum(grams.values()) or 1
    return {g: c / total for g, c in grams.items()}


_LANG_PROFILES = {lang: _bigram_profile(seed) for lang, seed in _LANG_SEEDS.items()}


def lang_id(texts: Sequence[str]) -> list[str]:
    """n-gram-overlap language guess (heuristic; 'und' when nothing matches).

    On the synthetic corpus (English-wordlist text for every lang label) this
    is exercised as plumbing, not accuracy — see tests.
    """
    out = []
    langs = list(_LANG_PROFILES)
    for t in texts:
        prof = _bigram_profile(t[:400])
        best, best_score = "und", 0.0
        for lang in langs:
            ref = _LANG_PROFILES[lang]
            score = sum(min(v, ref.get(g, 0.0)) for g, v in prof.items())
            if score > best_score:
                best, best_score = lang, score
        out.append(best if best_score > 0.05 else "und")
    return out


# ------------------------------------------------------------- shingling ----


def char_shingles(text: str, k: int = 5) -> list[str]:
    """Overlapping character k-grams (lowercased); the MinHash shingle unit
    for caption near-dup (D2). Short texts yield the whole text."""
    t = text.lower()
    if len(t) <= k:
        return [t] if t else []
    return [t[i : i + k] for i in range(len(t) - k + 1)]


def word_shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) <= k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity (the verify step after LSH)."""
    sa, sb = set(word_shingles(a, k)), set(word_shingles(b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# -------------------------------------------------------- fingerprinting ----

_B = np.uint64(1_000_003)


def rolling_fingerprint(texts: Sequence[str], window: int = 8, keep: int = 4) -> list[list[int]]:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash over the
    byte stream, keep the ``keep`` smallest window hashes (as int64 list).
    Deterministic, mergeable, order-insensitive representation for doc identity.
    """
    from .hashing import splitmix64

    out: list[list[int]] = []
    for t in texts:
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(data) < window:
            h = splitmix64(data.sum(keepdims=True) if len(data) else np.zeros(1, dtype=np.uint64))
            out.append([int(np.int64(h[0].astype(np.int64)))])
            continue
        # rolling polynomial hash via cumulative powers
        n = len(data)
        base = np.full(window, _B, dtype=np.uint64)
        base[0] = np.uint64(1)
        pows = np.cumprod(base)  # [1, B, B², …] with uint64 wraparound
        # windows matrix (n-window+1, window) via stride tricks
        win = np.lib.stride_tricks.sliding_window_view(data, window)
        hashes = (win * pows[::-1][None, :]).sum(axis=1, dtype=np.uint64)
        hashes = splitmix64(hashes)
        smallest = np.sort(hashes)[:keep]
        out.append([int(v) for v in smallest.astype(np.int64)])
    return out


# ------------------------------------------------------------- embedding ----


def embed_texts(texts: Sequence[str], dim: int = 64) -> np.ndarray:
    """Deterministic hashed bag-of-words embedding, L2-normalized float32
    (n, dim) — the sandbox stand-in for the reference's LaBSE sentence
    encoder (M15, vector_processor.py:12-67): swap in a real model behind
    the same (texts) -> (n, dim) signature. Feature index = token hash mod
    dim, sign = one hash bit (feature hashing / hashing trick)."""
    from .hashing import _flatten_token_hashes

    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float32)
    hashes, offsets, lengths = _flatten_token_hashes([t.lower().split() for t in texts])
    if len(hashes) == 0:
        return out
    idx = (hashes % np.uint64(dim)).astype(np.int64)
    sign = np.where((hashes >> np.uint64(32)) & np.uint64(1) == 1, 1.0, -1.0).astype(np.float32)
    doc = np.repeat(np.arange(n, dtype=np.int64), lengths)
    np.add.at(out, (doc, idx), sign)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norms, 1e-12)
