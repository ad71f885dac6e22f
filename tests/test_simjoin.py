"""Exact set-similarity join (stages/simjoin.py): brute-force equality,
planted near-dups, threshold boundary exactness, and the hot-gram cap."""

import numpy as np
import pandas as pd
import pytest


def _grams(text, n=3):
    toks = [t for t in text.lower().split() if t]
    return {
        "\x1f".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def _brute(da, db, t, n=3):
    rows = []
    for _, ra in da.iterrows():
        ga = _grams(ra["text"], n)
        if not ga:
            continue
        for _, rb in db.iterrows():
            gb = _grams(rb["text"], n)
            if not gb:
                continue
            inter = len(ga & gb)
            if inter == 0:
                continue
            j = inter / (len(ga) + len(gb) - inter)
            if j >= t:
                rows.append(
                    (ra["doc_id"], rb["doc_id"], inter, len(ga), len(gb),
                     round(j, 6))
                )
    return pd.DataFrame(
        rows, columns=["a_id", "b_id", "inter", "na", "nb", "jaccard"]
    ).sort_values(["a_id", "b_id"]).reset_index(drop=True)


def _mk_corpus(seed=1, n_docs=80):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, size=rng.integers(3, 15)))
                for _ in range(n_docs)
            ],
        }
    )


@pytest.mark.parametrize("threshold", [0.3, 0.5])
def test_matches_brute_force(ray_session, threshold):
    import ray.data as rd
    from zonal_stats_toolkit_ray.stages.simjoin import similarity_join

    da = _mk_corpus(seed=1)
    db = _mk_corpus(seed=2, n_docs=60)
    db["doc_id"] += 1000
    got = similarity_join(
        rd.from_pandas(da).repartition(5),
        rd.from_pandas(db).repartition(4),
        threshold=threshold,
    )
    exp = _brute(da, db, threshold)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_identical_docs_score_one_and_threshold_is_exact(ray_session):
    import ray.data as rd
    from zonal_stats_toolkit_ray.stages.simjoin import similarity_join

    da = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c d", "a b c d e f g h"]}
    )
    db = pd.DataFrame({"doc_id": [10], "text": ["a b c d"]})
    # doc0 vs doc10: identical gram sets → J = 1.0
    # doc1 vs doc10: inter=2, na=6, nb=2 → J = 2/6 exactly
    out = similarity_join(
        rd.from_pandas(da), rd.from_pandas(db), threshold=2 / 6
    )
    assert len(out) == 2
    assert out.loc[out["a_id"] == 0, "jaccard"].iloc[0] == 1.0
    # >= is inclusive at the exact boundary
    assert out.loc[out["a_id"] == 1, "inter"].iloc[0] == 2
    out_hi = similarity_join(
        rd.from_pandas(da), rd.from_pandas(db), threshold=2 / 6 + 1e-12
    )
    assert len(out_hi) == 1


def test_gram_df_cap_drops_only_hot_gram_overlap(ray_session):
    import ray.data as rd
    from zonal_stats_toolkit_ray.stages.simjoin import similarity_join

    # every doc shares the hot gram "x y z"; pairs whose ONLY overlap is
    # the hot gram vanish under the cap, the genuinely-similar pair stays
    da = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["x y z p q r s", "x y z a b c d", "x y z u v w t"],
        }
    )
    db = pd.DataFrame({"doc_id": [10], "text": ["x y z p q r s"]})
    exact = similarity_join(rd.from_pandas(da), rd.from_pandas(db), threshold=0.05)
    assert set(exact["a_id"]) == {0, 1, 2}
    capped = similarity_join(
        rd.from_pandas(da), rd.from_pandas(db), threshold=0.05, gram_df_cap=3
    )
    # "x y z" appears in 4 docs > cap 3 → dropped; only doc0 still overlaps
    assert set(capped["a_id"]) == {0}
