"""Text-analysis stages for a web-scale training-data pipeline: token
counting, quality scoring, language ID, document fingerprinting, simhash.

All hot paths are vectorized (pyarrow.compute regex kernels / NumPy over
Arrow buffers); language-ID is an actor-pool stage whose per-language
patterns compile once in ``__init__``.  The token/quality metrics are
defined with SQL-expressible arithmetic so the DuckDB oracle can verify
them value-for-value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .geocode import hash64_utf8

_PUNCT_RE = r"[.,!?;:]"
_TOKEN_RE = r"\S+"
# BPE-ish word/punct splitter (GPT-2-style, simplified to what both RE2
# (pyarrow) and this engine support)
_BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+"


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds n_chars, n_tokens (whitespace runs), n_bpe_tokens, n_punct.

    Oracle equivalence (DuckDB): ``length(text)``,
    ``len(regexp_extract_all(text, '\\S+'))``,
    ``len(regexp_extract_all(text, '[.,!?;:]'))``.
    """
    t = batch[text_col]
    batch = batch.append_column(
        "n_chars", pc.cast(pc.utf8_length(t), pa.int64())
    )
    batch = batch.append_column(
        "n_tokens", pc.cast(pc.count_substring_regex(t, _TOKEN_RE), pa.int64())
    )
    batch = batch.append_column(
        "n_bpe_tokens", pc.cast(pc.count_substring_regex(t, _BPE_RE), pa.int64())
    )
    batch = batch.append_column(
        "n_punct", pc.cast(pc.count_substring_regex(t, _PUNCT_RE), pa.int64())
    )
    return batch


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds alpha_ratio, punct_ratio, mean_token_len, quality_score — pure
    double arithmetic over regex counts, replicated 1:1 in the oracle SQL so
    results hash-match:

        alpha_ratio     = n_alpha / (n_chars + 1)
        punct_ratio     = n_punct / (n_tokens + 1)
        mean_token_len  = n_chars / (n_tokens + 1)
        quality_score   = alpha_ratio * (1.0 - punct_ratio)
    """
    t = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(t), pa.float64())
    n_alpha = pc.cast(pc.count_substring_regex(t, r"[A-Za-z]"), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(t, _PUNCT_RE), pa.float64())
    n_tokens = pc.cast(pc.count_substring_regex(t, _TOKEN_RE), pa.float64())
    alpha_ratio = pc.divide(n_alpha, pc.add(n_chars, 1.0))
    punct_ratio = pc.divide(n_punct, pc.add(n_tokens, 1.0))
    mean_token_len = pc.divide(n_chars, pc.add(n_tokens, 1.0))
    quality = pc.multiply(alpha_ratio, pc.subtract(1.0, punct_ratio))
    batch = batch.append_column("alpha_ratio", alpha_ratio)
    batch = batch.append_column("punct_ratio", punct_ratio)
    batch = batch.append_column("mean_token_len", mean_token_len)
    return batch.append_column("quality_score", quality)


class LangId:
    """Actor-pool stage: n-gram/stopword-heuristic language ID over
    {en, de, fr, es, zh}.  Profiles (compiled alternation regexes + CJK
    range) are built ONCE per actor in __init__; __call__ is vectorized
    pyarrow regex counting per batch.  Adds ``lang_pred`` and
    ``lang_conf``."""

    _STOPS = {
        "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "it"],
        "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
        "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
        "es": ["el", "la", "los", "las", "de", "que", "es", "una", "por", "para"],
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # one word-boundary alternation per language (RE2-compatible)
        self.patterns = {
            lang: r"\b(" + "|".join(words) + r")\b"
            for lang, words in self._STOPS.items()
        }
        self.cjk = r"[一-鿿]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch[self.text_col])
        n_tokens = pc.cast(
            pc.count_substring_regex(t, _TOKEN_RE), pa.float64()
        ).to_numpy(zero_copy_only=False)
        denom = np.maximum(n_tokens, 1.0)
        scores = []
        langs = []
        for lang, pat in self.patterns.items():
            c = pc.cast(pc.count_substring_regex(t, pat), pa.float64()).to_numpy(
                zero_copy_only=False
            )
            scores.append(c / denom)
            langs.append(lang)
        # zh: CJK character density (per char, not per token)
        n_chars = pc.cast(pc.utf8_length(t), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        cjk = pc.cast(pc.count_substring_regex(t, self.cjk), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        scores.append(cjk / np.maximum(n_chars, 1.0) * 2.0)
        langs.append("zh")
        m = np.stack(scores)  # (L, N)
        best = np.argmax(m, axis=0)
        conf = m[best, np.arange(m.shape[1])]
        pred = np.array(langs, dtype=object)[best]
        pred = np.where(conf <= 0.0, "und", pred)
        batch = batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))
        return batch.append_column("lang_conf", pa.array(conf, pa.float64()))


def _byte_segments(arr: pa.Array | pa.ChunkedArray):
    """(data uint8 array, starts, ends) views of a utf8 column's buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks() if arr.num_chunks != 1 else arr.chunk(0)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return data, offsets[:-1], offsets[1:]


def fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8
) -> pa.Table:
    """Adds ``fingerprint`` (uint64): min rolling Rabin-Karp hash over all
    byte windows of length ``window`` (winnowing-style document signature).
    Vectorized: one pass of uint64 NumPy ops over the column's whole byte
    buffer; no per-character Python.  Documents shorter than the window
    fall back to the full-text polynomial hash."""
    data, starts, ends = _byte_segments(batch[text_col])
    full = hash64_utf8(batch[text_col])
    n = len(starts)
    out = full.copy()
    if data.size >= window:
        b = np.uint64(257)
        with np.errstate(over="ignore"):
            pw = np.multiply.accumulate(
                np.concatenate([[np.uint64(1)], np.full(window - 1, b)]),
                dtype=np.uint64,
            )
            # hash of every length-`window` byte window in the whole buffer:
            # h[i] = sum_{j<window} data[i+j] * b^(window-1-j)  (mod 2^64)
            h = np.zeros(data.size - window + 1, dtype=np.uint64)
            for j in range(window):
                h += data[j : data.size - window + 1 + j].astype(np.uint64) * pw[
                    window - 1 - j
                ]
        for i in range(n):
            s, e = int(starts[i]), int(ends[i])
            if e - s >= window:
                out[i] = h[s : e - window + 1].min()
    return batch.append_column("fingerprint", pa.array(out, pa.uint64()))


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``simhash`` (uint64): 64-bit SimHash over whitespace tokens,
    token hashes via the engine's polynomial hash.  The bit-vote loop is
    vectorized over all tokens of the batch at once."""
    t = pc.utf8_lower(batch[text_col])
    toks = pc.split_pattern_regex(t, r"\s+")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat_all = pc.list_flatten(toks)
    doc_ids = np.repeat(np.arange(len(batch)), counts)
    nonempty = pc.not_equal(flat_all, "")
    flat = flat_all.filter(nonempty)
    doc_ids = doc_ids[nonempty.to_numpy(zero_copy_only=False)]
    th = hash64_utf8(flat) if len(flat) else np.empty(0, np.uint64)
    votes = np.zeros((len(batch), 64), dtype=np.int64)
    for bit in range(64):
        bitval = ((th >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
        np.add.at(votes[:, bit], doc_ids, bitval)
    sim = np.zeros(len(batch), dtype=np.uint64)
    for bit in range(64):
        sim |= (votes[:, bit] > 0).astype(np.uint64) << np.uint64(bit)
    return batch.append_column("simhash", pa.array(sim, pa.uint64()))
