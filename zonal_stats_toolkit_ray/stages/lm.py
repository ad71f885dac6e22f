"""Hashed character-bigram language models: CCNet/KenLM-shaped perplexity
quality scoring (Wenzek et al. 2020) and DSIR importance weights (Xie et
al. 2023) — train n-gram models on a corpus / target domain, score every
document, and filter/bucket/resample on the score.  The real pipelines
use word n-gram models (KenLM, 10k-bucket word uni+bigrams); this engine
implements the same shapes with a hashed character-bigram model so that
(a) everything stays vectorized NumPy over Arrow buffers, and (b) the
scoring arithmetic is SQL-expressible for the DuckDB oracle (unlike a
KenLM binary, which the sandbox does not have).

Model = a fixed 65 536-bucket table: bucket ``(cp_prev * 257 + cp_cur) %
65536`` over Unicode codepoints, add-half smoothing.  Training partials
are the classic mergeable-sketch shape: ONE fixed 512 KB count vector per
block, summed on the driver — no shuffle, no per-token rows, scales with
block count only (the HLL/centroid pattern, ``sketch.py``).

Scoring broadcasts the 512 KB log-prob table once (``ray.put``) and does
one ``frombuffer``/``reduceat`` pass per batch — no Python row loop.

Reference parity: the reference toolkit has no text operators; this is
part of the training-data-pipeline extension surface (SURVEY §2.6),
sibling to ``text.py:quality_score_batch`` (heuristic ratios) — the LM
score is the learned complement to those hand-written ratios.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

NUM_BUCKETS = 65_536
_MIX = np.int64(257)


def _doc_codepoints(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column → (flat codepoint array, per-doc lengths),
    vectorized: one UTF-32 encode of the whole batch, no per-char loop.

    UTF-32-LE units ARE Unicode codepoints, so this matches DuckDB's
    ``unicode()`` per character exactly (astral chars included)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    texts = col.to_pylist()
    joined = "".join(t if t is not None else "" for t in texts)
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    lens = np.fromiter(
        (len(t) if t is not None else 0 for t in texts), dtype=np.int64, count=len(texts)
    )
    return cps, lens


def _pair_indices(cps: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Bigram bucket index per adjacent codepoint pair, with pairs never
    crossing a document boundary.  Returns (idx, valid mask over the
    len(cps)-1 adjacent positions)."""
    if cps.size < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=bool)
    idx = (cps[:-1] * _MIX + cps[1:]) % np.int64(NUM_BUCKETS)
    # mask positions whose pair straddles a doc boundary: each doc's last
    # codepoint must not pair with the next doc's first
    valid = np.ones(cps.size - 1, dtype=bool)
    last = np.cumsum(lens) - 1
    last = last[(last >= 0) & (last < cps.size - 1)]
    valid[last] = False
    return idx, valid


def _count_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """One fixed-size count row per block: (counts list<int64>[65536],
    n_pairs)."""
    cps, lens = _doc_codepoints(batch[text_col])
    idx, valid = _pair_indices(cps, lens)
    counts = np.bincount(idx[valid], minlength=NUM_BUCKETS).astype(np.int64)
    return pa.table(
        {
            "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
            "n_pairs": pa.array([int(valid.sum())], pa.int64()),
        }
    )


def train_char_lm(ds, *, text_col: str = "text") -> np.ndarray:
    """Train the hashed char-bigram model → float64 ``log2``-prob table of
    length 65 536 (add-half smoothing over the joint bigram distribution:
    ``log2((count + 0.5) / (N + 32768))``).  One pass, fixed-size partials,
    driver reduce over ≤ blocks rows."""
    parts = ds.map_batches(
        _count_partial, batch_format="pyarrow", fn_kwargs=dict(text_col=text_col)
    ).to_pandas()
    counts = np.zeros(NUM_BUCKETS, dtype=np.int64)
    for c in parts["counts"]:
        counts += np.asarray(c, dtype=np.int64)
    n = int(parts["n_pairs"].sum())
    return np.log2((counts + 0.5) / (n + 0.5 * NUM_BUCKETS))


def _doc_table_sums(
    batch: pa.Table, table: np.ndarray, text_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """(per-doc bigram count, per-doc sum of table[bucket] over bigram
    occurrences) — the shared prefix-sum kernel: doc d's pair positions in
    the flat adjacent-position arrays are [start_d, start_d + len_d - 1)."""
    cps, lens = _doc_codepoints(batch[text_col])
    idx, valid = _pair_indices(cps, lens)
    contrib = np.where(valid, table[idx] if idx.size else 0.0, 0.0)
    cap = max(cps.size - 1, 0)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    s = np.minimum(starts, cap)
    e = np.clip(starts + lens - 1, s, cap)
    csum = np.concatenate([[0.0], np.cumsum(contrib)])
    cval = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
    return cval[e] - cval[s], csum[e] - csum[s]


def score_batch(
    batch: pa.Table, logp_ref, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-doc cross-entropy in bits/bigram: ``-mean(log2 p)`` over the
    doc's bigram buckets, 6-dp rounded (float-sum order differs from the
    oracle's).  Docs with < 2 chars score 0.0 with n_bigrams 0."""
    from .knn import _cached_ref

    logp = np.asarray(_cached_ref(logp_ref), dtype=np.float64)
    npairs, sums = _doc_table_sums(batch, logp, text_col)
    bits = np.where(npairs > 0, -sums / np.maximum(npairs, 1), 0.0)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_bigrams": pa.array(npairs.astype(np.int64)),
            "bits": pa.array(np.round(bits, 6)),
        }
    )


def char_lm_score(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: np.ndarray | None = None,
):
    """Score every document under the char-bigram model (trained on ``ds``
    itself when ``model`` is None — the CCNet self-scoring setup) →
    Dataset ``(id, n_bigrams, bits)``.  Training is one extra streaming
    pass; the model table broadcasts once."""
    from .knn import _put_maybe

    if model is None:
        model = train_char_lm(ds, text_col=text_col)
    ref = _put_maybe(model)
    return ds.map_batches(
        score_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(logp_ref=ref, text_col=text_col, id_col=id_col),
    )


def table_score_batch(
    batch: pa.Table,
    table_ref,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "logw",
) -> pa.Table:
    """Per-doc SUM of a broadcast per-bucket table over the doc's bigram
    occurrences (6-dp rounded) — the generic kernel behind DSIR log
    importance weights.  Same prefix-sum machinery as :func:`score_batch`
    but an occurrence SUM, not a mean."""
    from .knn import _cached_ref

    table = np.asarray(_cached_ref(table_ref), dtype=np.float64)
    npairs, sums = _doc_table_sums(batch, table, text_col)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_bigrams": pa.array(npairs.astype(np.int64)),
            out_col: pa.array(np.round(sums, 6)),
        }
    )


def dsir_logweight(
    ds,
    target_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ratio_table: np.ndarray | None = None,
):
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    every raw document by ``log2 p_target(doc) / p_raw(doc)`` under hashed
    n-gram models — the data-selection step that upsamples raw-corpus text
    resembling a target domain.  The paper hashes word uni+bigrams to 10k
    buckets; this engine uses its char-bigram buckets (same machinery as
    :func:`char_lm_score`, documented deviation).

    Two training passes (target corpus, raw corpus — each one streaming
    pass of fixed-size partials), then one broadcast-table scoring pass →
    Dataset ``(id, n_bigrams, logw)``.  High ``logw`` = more
    target-domain-like.  Pass ``ratio_table`` to skip training (e.g. a
    persisted model pair)."""
    from .knn import _put_maybe

    if ratio_table is None:
        ratio_table = train_char_lm(target_ds, text_col=text_col) - train_char_lm(
            ds, text_col=text_col
        )
    ref = _put_maybe(ratio_table)
    return ds.map_batches(
        table_score_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(table_ref=ref, text_col=text_col, id_col=id_col),
    )


def write_model_parquet(model: np.ndarray, path: str) -> None:
    """Persist the model as (idx, logp) — the oracle-side join table (the
    flagship reduce-oracle pattern, ``__ray_entry__._FLAGSHIP_ORACLE_DIR``)."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "idx": pa.array(np.arange(NUM_BUCKETS, dtype=np.int64)),
                "logp": pa.array(model.astype(np.float64)),
            }
        ),
        path,
    )


# ---------------------------------------------------------------------------
# Naive Bayes classifier over hashed char-bigrams (fastText-shaped
# supervised lang/quality classifier: train on labeled docs, classify the
# stream).  Same mergeable fixed-size-partial training shape as
# train_char_lm, one partial row per (block, label); scoring broadcasts
# the stacked (L, 65536) log-prob tables + log-priors once and reuses the
# _doc_table_sums prefix-sum kernel per label (L is small; each pass is
# fully vectorized).
# ---------------------------------------------------------------------------


def _nb_partial(batch: pa.Table, *, text_col: str, label_col: str) -> pa.Table:
    """One (label, counts[65536], n_pairs, n_docs) row per label present
    in the block."""
    lcol = batch[label_col]
    if isinstance(lcol, pa.ChunkedArray):
        lcol = lcol.combine_chunks()
    labels = lcol.to_pylist()
    out_lab, out_counts, out_np, out_nd = [], [], [], []
    import pyarrow.compute as pc

    for lab in sorted(set(labels)):
        sub = batch.filter(pc.equal(lcol, lab))
        cps, lens = _doc_codepoints(sub[text_col])
        idx, valid = _pair_indices(cps, lens)
        counts = np.bincount(idx[valid], minlength=NUM_BUCKETS).astype(np.int64)
        out_lab.append(lab)
        out_counts.append(counts.tolist())
        out_np.append(int(valid.sum()))
        out_nd.append(len(sub))
    return pa.table(
        {
            "label": pa.array(out_lab, pa.string()),
            "counts": pa.array(out_counts, pa.list_(pa.int64())),
            "n_pairs": pa.array(out_np, pa.int64()),
            "n_docs": pa.array(out_nd, pa.int64()),
        }
    )


def nb_train(
    ds, *, text_col: str = "text", label_col: str = "lang"
) -> tuple[list, np.ndarray, np.ndarray]:
    """→ (labels sorted asc, log2-prob tables (L, 65536) with add-half
    smoothing, log2 priors (L,)).  One streaming pass; driver reduce over
    ≤ blocks × L fixed-size rows."""
    parts = ds.map_batches(
        _nb_partial,
        batch_format="pyarrow",
        fn_kwargs=dict(text_col=text_col, label_col=label_col),
    ).to_pandas()
    labels = sorted(parts["label"].unique().tolist())
    L = len(labels)
    if L == 0:
        raise ValueError("no labeled rows")
    counts = np.zeros((L, NUM_BUCKETS), dtype=np.int64)
    n_pairs = np.zeros(L, dtype=np.int64)
    n_docs = np.zeros(L, dtype=np.int64)
    pos = {lab: i for i, lab in enumerate(labels)}
    for _, row in parts.iterrows():
        i = pos[row["label"]]
        counts[i] += np.asarray(row["counts"], dtype=np.int64)
        n_pairs[i] += int(row["n_pairs"])
        n_docs[i] += int(row["n_docs"])
    tables = np.log2(
        (counts + 0.5) / (n_pairs[:, None] + 0.5 * NUM_BUCKETS)
    )
    logpriors = np.log2(n_docs / n_docs.sum())
    return labels, tables, logpriors


def nb_classify_batch(
    batch: pa.Table,
    model_ref,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """argmax_label (prior + Σ log2 p(bigram | label)); ties break to the
    ascending-first label (np.argmax ↔ the oracle's ORDER BY score DESC,
    label ASC)."""
    from .knn import _cached_ref

    labels, tables, logpriors = _cached_ref(model_ref)
    n = len(batch)
    scores = np.empty((n, len(labels)), dtype=np.float64)
    npairs = np.zeros(n, dtype=np.int64)
    for i in range(len(labels)):
        npairs, sums = _doc_table_sums(batch, tables[i], text_col)
        scores[:, i] = logpriors[i] + sums
    best = np.argmax(scores, axis=1)
    pred = pa.array([labels[i] for i in best], pa.string())
    # report the PER-BIGRAM posterior (score / (n_bigrams + 1), the +1
    # folding the prior in as one pseudo-term): magnitude ~16 keeps ten
    # float64 guard digits under the 6-dp rounding, where the raw sum
    # (magnitude ~1e3) provably lands on rounding boundaries (one doc at
    # sf0.1 differed from the oracle by exactly 1e-6 before this)
    avg = scores[np.arange(n), best] / (npairs + 1.0)
    return pa.table(
        {
            id_col: batch[id_col],
            "pred_label": pred,
            "avg_logp": pa.array(np.round(avg, 6) + 0.0, pa.float64()),
        }
    )


def nb_classify(
    ds,
    model: tuple | None = None,
    *,
    train_ds=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
):
    """Classify every document → Dataset (id, pred_label, score).  Trains
    on ``train_ds`` (or ``ds`` itself) when no model is given; the model
    (L × 65536 float64 + priors) broadcasts once."""
    from .knn import _put_maybe

    if model is None:
        model = nb_train(
            train_ds if train_ds is not None else ds,
            text_col=text_col,
            label_col=label_col,
        )
    ref = _put_maybe(model)
    return ds.map_batches(
        nb_classify_batch,
        batch_format="pyarrow",
        fn_kwargs=dict(model_ref=ref, text_col=text_col, id_col=id_col),
    )


def write_nb_oracle(model: tuple, model_path: str, priors_path: str) -> None:
    """Long-format (idx, label, logp) + (label, logprior) parquet pair for
    the DuckDB argmax oracle."""
    import pyarrow.parquet as pq

    labels, tables, logpriors = model
    L = len(labels)
    pq.write_table(
        pa.table(
            {
                "idx": pa.array(
                    np.tile(np.arange(NUM_BUCKETS, dtype=np.int64), L)
                ),
                "label": pa.array(
                    np.repeat(np.asarray(labels, dtype=object), NUM_BUCKETS),
                    pa.string(),
                ),
                "logp": pa.array(tables.ravel().astype(np.float64)),
            }
        ),
        model_path,
    )
    pq.write_table(
        pa.table(
            {
                "label": pa.array(list(labels), pa.string()),
                "logprior": pa.array(logpriors.astype(np.float64)),
            }
        ),
        priors_path,
    )
