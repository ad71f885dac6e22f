"""BM25 retrieval over the document corpus — score every document against
a query term set and return the global top-k, in two streaming passes.

The keyword-retrieval sibling of ``knn.knn_brute`` (dense) and
``invindex.inverted_lookup`` (posting pruning): a curation pipeline uses
it to pull topical subsets ("find the docs about X") and to build
weak-supervision labels.

* **Stats pass**: per-block partials (per-term document frequency, Σ doc
  length, doc count) — fixed-size rows, driver reduce (the
  ``pca_train`` moment shape).
* **Score pass**: broadcast (idf, avgdl) once; per batch, term
  frequencies come from ONE Arrow ``pc.equal`` + ``bincount`` per query
  term over the flat token buffer (queries are few terms; each is
  vectorized over the whole batch).  Per-block top-k (argpartition) →
  ≤ blocks × k driver merge — the corpus never sorts globally.

Scoring is Okapi BM25 (Robertson et al.), idf = ln((N − df + 0.5) /
(df + 0.5) + 1), written with the SAME operation order as the SQL
oracle so identical (tf, dl) configurations produce bit-identical
float64 scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _flat_tokens(batch: pa.Table, text_col: str):
    t = pc.utf8_lower(pc.fill_null(batch[text_col], ""))
    toks = pc.split_pattern_regex(t, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_of = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(ne)), doc_of[ne], counts.size


def corpus_stats(ds, terms: list[str], *, text_col: str = "text"):
    """→ (df per term (len(terms),), n_docs, sum_dl): one streaming pass
    of fixed-size partials."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = _flat_tokens(batch, text_col)
        dl = np.bincount(doc_of, minlength=ndocs)
        dfs = []
        for term in terms:
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            dfs.append(int(np.unique(doc_of[m]).size))
        return pa.table(
            {
                "df": pa.array([dfs], pa.list_(pa.int64())),
                "n": pa.array([ndocs], pa.int64()),
                "sdl": pa.array([int(dl.sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    df = np.zeros(len(terms), dtype=np.int64)
    for c in parts["df"]:
        df += np.asarray(c, dtype=np.int64)
    return df, int(parts["n"].sum()), int(parts["sdl"].sum())


def bm25_topk(
    ds,
    terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """→ DataFrame(id, score) of the ``k`` highest-BM25 documents (score
    desc, id asc; 6-dp rounded score, cutoff on the unrounded value).
    Documents matching no query term score 0 and are excluded."""
    import ray

    df, n_docs, sum_dl = corpus_stats(ds, terms, text_col=text_col)
    if n_docs == 0:
        return pd.DataFrame(
            {id_col: pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
        )
    avgdl = sum_dl / n_docs
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    payload = (list(terms), idf, avgdl, k1, b)
    ref = ray.put(payload) if ray.is_initialized() else payload

    def score(batch: pa.Table, *, _r=ref) -> pa.Table:
        terms_, idf_, avgdl_, k1_, b_ = ray.get(_r) if ray.is_initialized() else _r
        flat, doc_of, ndocs = _flat_tokens(batch, text_col)
        dl = np.bincount(doc_of, minlength=ndocs).astype(np.float64)
        s = np.zeros(ndocs, dtype=np.float64)
        denom_dl = k1_ * (1.0 - b_ + b_ * dl / avgdl_)
        for ti, term in enumerate(terms_):
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc_of[m], minlength=ndocs).astype(np.float64)
            s += idf_[ti] * (tf * (k1_ + 1.0)) / (tf + denom_dl)
        hit = s > 0.0
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[hit]
        sc = s[hit]
        if sc.size > k:
            keep = np.argpartition(-sc, k - 1)[:k]
            ids, sc = ids[keep], sc[keep]
        return pa.table(
            {id_col: pa.array(ids), "score": pa.array(sc, pa.float64())}
        )

    local = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if len(local.columns) == 0 or len(local) == 0:
        return pd.DataFrame(
            {id_col: pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
        )
    local = local.sort_values(
        ["score", id_col], ascending=[False, True], kind="stable"
    ).head(k)
    local["score"] = np.round(local["score"].to_numpy(), 6) + 0.0
    return local.reset_index(drop=True)
