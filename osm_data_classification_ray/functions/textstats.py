"""Text-analysis kernels for large-scale training-data pipelines:
language-ID (stopword/char-class heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), rolling-hash fingerprints.

All pure functions over lists/arrays; called from map_batches. Regexes and
stopword tables are module-level constants (compiled once per worker).
"""

from __future__ import annotations

import re

import numpy as np

# per-language stopword profiles (tiny, deterministic)
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to a in is it you that he was for on are".split()),
    "de": frozenset("der die und den von zu das mit sich des auf ist nicht".split()),
    "fr": frozenset("le la et les des en un du une que est pour qui dans".split()),
    "es": frozenset("de la que el en y a los del se las por un con no".split()),
}
_LANGS = ("en", "de", "fr", "es")

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish pre-tokenizer (GPT-2 style word/number/punct split, no lookbehind)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")
_UPPER_RE = re.compile(r"[A-Z]")
_DIGIT_RE = re.compile(r"[0-9]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.U)


def langid_one(text: str) -> tuple[str, float]:
    """Heuristic language id → (lang, confidence). CJK ratio → zh; else the
    stopword profile with the most hits; ties → 'en' (frozen order)."""
    if not text:
        return "und", 0.0
    cjk = len(_CJK_RE.findall(text))
    if cjk / max(len(text), 1) > 0.05:
        return "zh", min(1.0, cjk / max(len(text), 1) * 5)
    toks = [t.lower() for t in _TOKEN_RE.findall(text)]
    if not toks:
        return "und", 0.0
    best_lang, best_hits = "und", 0
    for lang in _LANGS:
        hits = sum(1 for t in toks if t in STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang, best_hits / len(toks)


def quality_one(text: str) -> dict[str, float]:
    """Frozen quality features: length, token stats, char-class ratios,
    stopword ratio, and a composite [0,1] score."""
    n = len(text)
    toks = _TOKEN_RE.findall(text)
    nt = len(toks)
    mean_tok = (sum(len(t) for t in toks) / nt) if nt else 0.0
    upper = len(_UPPER_RE.findall(text)) / n if n else 0.0
    digit = len(_DIGIT_RE.findall(text)) / n if n else 0.0
    punct = len(_PUNCT_RE.findall(text)) / n if n else 0.0
    low = [t.lower() for t in toks]
    stop = sum(1 for t in low if t in STOPWORDS["en"]) / nt if nt else 0.0
    # composite: long-enough, word-like tokens, some stopwords, not shouty
    score = 1.0
    score *= min(nt / 20.0, 1.0)
    score *= 1.0 if 3.0 <= mean_tok <= 12.0 else 0.5
    score *= 1.0 - min(upper * 2.0, 0.5)
    score *= 1.0 - min(digit * 2.0, 0.5)
    return {
        "n_chars": float(n),
        "n_tokens": float(nt),
        "mean_token_len": mean_tok,
        "upper_ratio": upper,
        "digit_ratio": digit,
        "punct_ratio": punct,
        "stopword_ratio": stop,
        "quality_score": score,
    }


def bpe_token_count(text: str) -> int:
    """BPE-ish pre-token count (letters / digits / punct runs)."""
    return len(_BPE_RE.findall(text))


_FP_BASE = np.uint64(1099511628211)
_FP_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_fingerprints(text: str, window: int = 64) -> np.ndarray:
    """Rabin-Karp rolling 64-bit hashes over ``window``-char windows
    (vectorized via cumulative polynomial trick mod 2^64)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n < window:
        window = max(n, 1)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # vectorized windowed polynomial hash mod 2^64: BASE is odd, hence
        # invertible; H(i) = BASE^(i+w-1) * (Q(i+w) - Q(i)) with
        # Q(k) = Σ_{j<k} b[j]·inv^j — all cumulative products/sums.
        invpow, basepow = _fp_powers(n)
        q = np.concatenate([[np.uint64(0)], np.cumsum(b * invpow, dtype=np.uint64)])
        i = np.arange(n - window + 1)
        out = basepow[i + window - 1] * (q[i + window] - q[i])
    return out


_FP_INV = np.uint64(pow(int(_FP_BASE), -1, 1 << 64))
_FP_POW: tuple[np.ndarray, np.ndarray] = (np.ones(1, np.uint64), np.ones(1, np.uint64))


def _fp_powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(inv^i, BASE^i) for i < n — grown once per worker (uint64 cumprod
    wraps mod 2^64 exactly like the sequential product), sliced per doc."""
    global _FP_POW
    if len(_FP_POW[0]) < n:
        m = max(n, 2 * len(_FP_POW[0]))
        with np.errstate(over="ignore"):
            _FP_POW = (
                np.concatenate([[np.uint64(1)], np.cumprod(np.full(m - 1, _FP_INV, np.uint64))]),
                np.concatenate([[np.uint64(1)], np.cumprod(np.full(m - 1, _FP_BASE, np.uint64))]),
            )
    return _FP_POW[0][:n], _FP_POW[1][:n]


def doc_fingerprint(text: str, window: int = 64) -> int:
    """Document fingerprint = min rolling hash (winnowing-style min-sample)."""
    fps = rolling_fingerprints(text, window)
    return int(fps.min()) if len(fps) else 0
