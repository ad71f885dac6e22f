"""Char-bigram LM scoring (stages/lm.py): pure-Python parity (Unicode
incl. astral chars), doc-boundary masking across blocks, empty/short docs,
block-layout invariance."""

import numpy as np
import pyarrow as pa

from zonal_stats_toolkit_ray.stages.lm import (
    NUM_BUCKETS,
    char_lm_score,
    train_char_lm,
)


def _ref_scores(texts):
    from collections import Counter

    cnt, n = Counter(), 0
    for t in texts:
        cps = [ord(c) for c in t]
        for a, b in zip(cps, cps[1:]):
            cnt[(a * 257 + b) % NUM_BUCKETS] += 1
            n += 1
    lp = {k: np.log2((v + 0.5) / (n + 0.5 * NUM_BUCKETS)) for k, v in cnt.items()}
    default = np.log2(0.5 / (n + 0.5 * NUM_BUCKETS))
    rows = []
    for i, t in enumerate(texts):
        cps = [ord(c) for c in t]
        lps = [lp.get((a * 257 + b) % NUM_BUCKETS, default) for a, b in zip(cps, cps[1:])]
        rows.append((i, len(lps), round(-sum(lps) / len(lps), 6) if lps else 0.0))
    return rows


def _mk(texts, nparts=1):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return ds.repartition(nparts) if nparts > 1 else ds


TEXTS = [
    "hello world",
    "héllo wörld ünïcode \U0001f600\U0001f600",  # astral chars = 1 codepoint each
    "",
    "a",
    "the quick brown fox jumps over the lazy dog",
    "aaaaaa",
    "x" * 1000,
]


class TestCharLM:
    def test_matches_pure_python_reference(self, ray_session):
        ds = _mk(TEXTS, nparts=3)
        model = train_char_lm(ds)
        out = (
            char_lm_score(ds, model=model)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref = _ref_scores(TEXTS)
        got = list(zip(out["doc_id"], out["n_bigrams"], out["bits"]))
        assert [(int(a), int(b), float(c)) for a, b, c in got] == [
            (a, b, float(c)) for a, b, c in ref
        ]

    def test_block_layout_invariant(self, ray_session):
        # bigrams never cross doc boundaries, so block layout cannot change
        # either the trained model or the scores
        outs = []
        for nparts in (1, 5):
            ds = _mk(TEXTS, nparts=nparts)
            outs.append(
                char_lm_score(ds)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])

    def test_short_docs_score_zero(self, ray_session):
        out = char_lm_score(_mk(["", "a", "bb"])).to_pandas()
        by = dict(zip(out["doc_id"], zip(out["n_bigrams"], out["bits"])))
        assert by[0] == (0, 0.0) and by[1] == (0, 0.0)
        assert by[2][0] == 1 and by[2][1] > 0

    def test_dsir_upweights_target_like_docs(self, ray_session):
        # raw corpus = half "vowel-ish" docs, half "consonant-ish" docs;
        # target = vowel-ish only → vowel-ish raw docs must get higher
        # per-doc log importance weight
        import numpy as np

        from zonal_stats_toolkit_ray.stages.lm import dsir_logweight

        rng = np.random.default_rng(5)
        vowels, cons = "aeiou ", "bcdfg "
        mk = lambda alpha: "".join(rng.choice(list(alpha), size=200))
        texts = [mk(vowels) for _ in range(20)] + [mk(cons) for _ in range(20)]
        ds = _mk(texts, nparts=2)
        target = _mk([mk(vowels) for _ in range(20)])
        out = dsir_logweight(ds, target).to_pandas()
        vw = out[out["doc_id"] < 20]["logw"].mean()
        cw = out[out["doc_id"] >= 20]["logw"].mean()
        assert vw > cw + 100  # decisively separated, not borderline

    def test_dsir_matches_pure_python(self, ray_session):
        import numpy as np

        from zonal_stats_toolkit_ray.stages.lm import dsir_logweight, train_char_lm

        ds = _mk(TEXTS, nparts=3)
        target = _mk(TEXTS[:3])
        table = train_char_lm(target) - train_char_lm(ds)
        out = (
            dsir_logweight(ds, None, ratio_table=table)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i, t in enumerate(TEXTS):
            cps = [ord(c) for c in t]
            w = sum(table[(a * 257 + b) % NUM_BUCKETS] for a, b in zip(cps, cps[1:]))
            assert out["logw"][i] == round(w, 6)
            assert out["n_bigrams"][i] == max(len(cps) - 1, 0)

    def test_repeated_text_scores_lower(self, ray_session):
        # the LM's whole point: repetitive text is more predictable under a
        # model trained on it than high-entropy text
        texts = ["ababababababababab" * 4] * 8 + ["zq9!kT#mW@x7&vL$pR2^"]
        out = char_lm_score(_mk(texts)).to_pandas()
        rep = out[out["doc_id"] < 8]["bits"].mean()
        odd = float(out[out["doc_id"] == 8]["bits"].iloc[0])
        assert rep < odd


class TestNaiveBayes:
    def _fixture(self):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(12)
        rows = []
        for i in range(400):
            if i % 2 == 0:
                text = "".join(rng.choice(list("abcdeé "), size=80))
                lab = "x"
            else:
                text = "".join(rng.choice(list("uvwxyz± "), size=80))
                lab = "y"
            rows.append((i, text, lab))
        return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])

    def test_discriminates_distribution_split(self, ray_session):
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages.lm import nb_classify, nb_train

        df = self._fixture()
        ds = rd.from_pandas(df).repartition(6)
        model = nb_train(ds)
        out = (
            nb_classify(ds, model)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        acc = (out["pred_label"].to_numpy() == df["lang"].to_numpy()).mean()
        assert acc == 1.0  # disjoint alphabets → perfect separation

    def test_layout_invariant_training(self, ray_session):
        import numpy as np
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages.lm import nb_train

        df = self._fixture()
        la, ta, pa_ = nb_train(rd.from_pandas(df).repartition(2))
        lb, tb, pb = nb_train(rd.from_pandas(df).repartition(13))
        assert la == lb
        np.testing.assert_array_equal(ta, tb)  # integer counts → exact
        np.testing.assert_array_equal(pa_, pb)

    def test_empty_doc_falls_back_to_max_prior(self, ray_session):
        import pandas as pd
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages.lm import nb_classify, nb_train

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["aaaa bbbb", "aaaa bbbb", "zzzz", ""],
                "lang": ["x", "x", "y", "y"],
            }
        )
        ds = rd.from_pandas(df)
        model = nb_train(ds)
        out = (
            nb_classify(ds, model)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc 3 has no bigrams: argmax prior = 'x' (2/4 vs 2/4 → tie
        # breaks to ascending label), avg_logp == its logprior
        assert out["pred_label"].iloc[3] == "x"
        import math

        assert abs(out["avg_logp"].iloc[3] - round(math.log2(0.5), 6)) < 1e-9
