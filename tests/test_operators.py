"""Tests for the training-data operators: text analysis, dedup family,
similarity search, windowed aggregates, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from zonal_stats_toolkit_ray.sources.pages import synth_pages_table
from zonal_stats_toolkit_ray.stages import dedup as D
from zonal_stats_toolkit_ray.stages import knn as K
from zonal_stats_toolkit_ray.stages import text as T
from zonal_stats_toolkit_ray.stages.multimodal import (
    ImageDecode,
    media_pipeline,
    synth_media_table,
)
from zonal_stats_toolkit_ray.stages.window import session_windows, windowed_aggregate

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


class TestText:
    def test_pii_scrub(self):
        t = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "mail a.b+c@site.org or x@y.io, call 555-0199",
                    None,
                    "server 192.168.0.1 and 10.0.0.255 up",
                    "no pii here 12-34",
                ],
            }
        )
        out = T.pii_scrub_batch(t)
        assert out["text"].to_pylist() == [
            "mail <EMAIL> or <EMAIL>, call <PHONE>",
            "",
            "server <IP> and <IP> up",
            "no pii here 12-34",
        ]
        assert out["n_email"].to_pylist() == [2, 0, 0, 0]
        assert out["n_ip"].to_pylist() == [0, 0, 2, 0]
        assert out["n_phone"].to_pylist() == [1, 0, 0, 0]
        # extra columns (doc_id) pass through; counts are int64
        assert out["doc_id"].to_pylist() == [1, 2, 3, 4]
        assert out.schema.field("n_email").type == pa.int64()

    def test_boilerplate_lines(self, ray_session):
        import ray.data as rd

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "unique one\ncopyright footer\nbody a",
                    "copyright footer\nbody b\n\ntrailing empty kept",
                    "copyright footer",
                    "nothing shared here",
                ],
            }
        )
        out = (
            T.remove_boilerplate_lines(rd.from_pandas(docs).repartition(2), min_docs=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["text"].tolist() == [
            "unique one\nbody a",
            "body b\n\ntrailing empty kept",  # empty lines survive
            "",  # all-boilerplate doc empties out
            "nothing shared here",
        ]
        assert out["n_removed"].tolist() == [1, 1, 1, 0]
        # below threshold nothing is boilerplate
        out4 = (
            T.remove_boilerplate_lines(rd.from_pandas(docs), min_docs=4)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out4["n_removed"].tolist() == [0, 0, 0, 0]

    def test_token_stats(self):
        t = pa.table({"text": ["hello world  foo", "", "one", "a, b! c?"]})
        out = T.token_stats_batch(t)
        assert out["n_tokens"].to_pylist() == [3, 0, 1, 3]
        assert out["n_chars"].to_pylist() == [16, 0, 3, 8]
        assert out["n_punct"].to_pylist() == [0, 0, 0, 3]

    def test_quality_formula(self):
        t = pa.table({"text": ["Hello, world!"]})
        out = T.quality_score_batch(t)
        n_chars, n_alpha, n_punct, n_tok = 13.0, 10.0, 2.0, 2.0
        ar = n_alpha / (n_chars + 1)
        pr = n_punct / (n_tok + 1)
        assert np.isclose(out["alpha_ratio"][0].as_py(), ar)
        assert np.isclose(out["quality_score"][0].as_py(), ar * (1 - pr))

    def test_langid_actor(self):
        lid = T.LangId()
        t = pa.table(
            {
                "text": [
                    "the cat and the dog sat with it for the day",
                    "der hund und die katze ist nicht mit den",
                    "le chat et les chiens est dans la maison pour que",
                    "el perro y la casa es una de las que por para",
                    "这是一个中文句子 也是中文",
                ]
            }
        )
        out = lid(t)
        assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "es", "zh"]

    def test_fingerprint_deterministic_and_shift_invariant(self):
        a = pa.table({"text": ["abcdefghijklmnop", "xx abcdefghijklmnop", "short"]})
        out = T.fingerprint_batch(a, window=8)
        fp = out["fingerprint"].to_pylist()
        assert fp[0] != fp[2]
        # the min-rolling-hash signature of a superstring shares the min
        # window when the original's minimal window is preserved
        out2 = T.fingerprint_batch(a, window=8)
        assert out2["fingerprint"].to_pylist() == fp

    def test_simhash_similarity(self):
        t = pa.table(
            {
                "text": [
                    "the quick brown fox jumps over the lazy dog today",
                    "the quick brown fox jumps over the lazy cat today",
                    "completely different words entirely unrelated content here",
                ]
            }
        )
        s = T.simhash_batch(t)["simhash"].to_pylist()
        ham01 = bin(s[0] ^ s[1]).count("1")
        ham02 = bin(s[0] ^ s[2]).count("1")
        assert ham01 < ham02

    def test_token_stats_match_duckdb(self):
        import duckdb

        tbl = synth_pages_table(200, seed=4).select(["url", "text"])
        got = T.token_stats_batch(tbl).select(["url", "n_chars", "n_tokens", "n_punct"])
        con = duckdb.connect()
        con.register("t", tbl.to_pandas())
        want = con.sql(
            r"""
            SELECT url, length(text) AS n_chars,
                   len(regexp_extract_all(text, '\S+')) AS n_tokens,
                   len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
            FROM t
            """
        ).df()
        gdf = got.to_pandas()
        m = gdf.merge(want, on="url", suffixes=("_ray", "_sql"))
        for c in ("n_chars", "n_tokens", "n_punct"):
            assert (m[f"{c}_ray"] == m[f"{c}_sql"]).all()


class TestDedup:
    def test_exact_dedup(self, ray_session):
        import ray.data as rd

        pages = synth_pages_table(200, seed=6, dup_fraction=0.3)
        df = pages.to_pandas()
        df["doc_id"] = np.arange(len(df))
        ds = rd.from_pandas(df[["doc_id", "text"]]).repartition(3)
        out = D.exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = (
            df.groupby("text")
            .agg(doc_id=("doc_id", "min"), n_dupes=("doc_id", "size"))
            .reset_index(drop=True)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(want)
        assert np.array_equal(out["doc_id"].to_numpy(), want["doc_id"].to_numpy())
        assert np.array_equal(out["n_dupes"].to_numpy(), want["n_dupes"].to_numpy())

    def test_minhash_finds_exact_dupes(self, ray_session):
        import ray.data as rd

        pages = synth_pages_table(150, seed=8, dup_fraction=0.2).to_pandas()
        pages["doc_id"] = np.arange(len(pages))
        ds = rd.from_pandas(pages[["doc_id", "text"]])
        comp = D.minhash_dedup(ds, threshold=0.8).to_pandas()
        # verbatim duplicates must land in the same cluster
        by_text = pages.groupby("text")["doc_id"].agg(list)
        cl = dict(zip(comp["doc_id"], comp["cluster_id"]))
        for ids in by_text:
            if len(ids) > 1:
                assert len({cl[i] for i in ids}) == 1
        # count of is_duplicate rows == extra copies
        n_extra = len(pages) - pages["text"].nunique()
        assert comp["is_duplicate"].sum() >= n_extra

    def test_simhash_dedup(self, ray_session):
        import ray.data as rd

        pages = synth_pages_table(120, seed=12, dup_fraction=0.25).to_pandas()
        pages["doc_id"] = np.arange(len(pages))
        ds = rd.from_pandas(pages[["doc_id", "text"]])
        comp = D.simhash_dedup(ds, max_hamming=3).to_pandas()
        by_text = pages.groupby("text")["doc_id"].agg(list)
        cl = dict(zip(comp["doc_id"], comp["cluster_id"]))
        for ids in by_text:
            if len(ids) > 1:
                assert len({cl[i] for i in ids}) == 1

    def test_ngram_jaccard_dedup(self, ray_session):
        import ray.data as rd

        pages = synth_pages_table(100, seed=14, dup_fraction=0.2).to_pandas()
        pages["doc_id"] = np.arange(len(pages))
        ds = rd.from_pandas(pages[["doc_id", "text"]])
        comp = D.ngram_jaccard_dedup(ds, threshold=0.9).to_pandas()
        by_text = pages.groupby("text")["doc_id"].agg(list)
        cl = dict(zip(comp["doc_id"], comp["cluster_id"]))
        for ids in by_text:
            if len(ids) > 1:
                assert len({cl[i] for i in ids}) == 1

    def test_embedding_dedup(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        base = rng.standard_normal((40, 16))
        # rows 40..49 are near-copies of rows 0..9
        near = base[:10] + rng.standard_normal((10, 16)) * 1e-3
        mat = np.vstack([base, near])
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(50, dtype=np.int64)),
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in mat],
                    pa.list_(pa.float32()),
                ),
            }
        )
        comp = D.embedding_dedup(rd.from_arrow(tbl), threshold=0.999).to_pandas()
        cl = dict(zip(comp["vec_id"], comp["cluster_id"]))
        for i in range(10):
            assert cl[i] == cl[40 + i]
        assert comp["is_duplicate"].sum() >= 10

    def test_single_upstream_execution(self, ray_session):
        """Round 4 (VERDICT r3 #3): each dedup call executes its input
        pipeline EXACTLY once — band-gen, verify and cluster attach all
        read the materialized slim projection.  Accounting: a counting
        stage tallies rows processed; one execution = len(df) rows."""
        import ray
        import ray.data as rd

        @ray.remote
        class Tally:
            def __init__(self):
                self.rows = 0

            def add(self, n):
                self.rows += n

            def total(self):
                return self.rows

        pages = synth_pages_table(150, seed=21, dup_fraction=0.3).to_pandas()
        pages["doc_id"] = np.arange(len(pages))

        def run(dedup_fn, df):
            tally = Tally.remote()

            def count_rows(b: pa.Table) -> pa.Table:
                ray.get(tally.add.remote(len(b)))
                return b

            base = rd.from_pandas(df).repartition(4).map_batches(
                count_rows, batch_format="pyarrow"
            )
            dedup_fn(base).to_pandas()  # consume the full output
            return ray.get(tally.total.remote())

        docs = pages[["doc_id", "text"]]
        assert run(D.minhash_dedup, docs) == len(docs)
        assert run(D.simhash_dedup, docs) == len(docs)
        assert run(D.ngram_jaccard_dedup, docs) == len(docs)
        rng = np.random.default_rng(3)
        mat = rng.standard_normal((60, 16))
        mat[50:] = mat[:10] + 1e-4
        vecs = pd.DataFrame(
            {
                "vec_id": np.arange(60, dtype=np.int64),
                "embedding": [r.astype(np.float32).tolist() for r in mat],
            }
        )
        assert run(D.embedding_dedup, vecs) == len(vecs)

    def test_bucket_cap_none_disables_capping(self, ray_session):
        """ADVICE r3: bucket_cap=None on the public entry points restores
        exact all-pairs in hot buckets."""
        import ray.data as rd

        # 30 verbatim-identical docs in one bucket, cap forced tiny
        df = pd.DataFrame(
            {"doc_id": np.arange(30, dtype=np.int64), "text": ["same text here"] * 30}
        )
        ds = rd.from_pandas(df)
        out_capped = D.minhash_dedup(ds, bucket_cap=4).to_pandas()
        out_exact = D.minhash_dedup(ds, bucket_cap=None).to_pandas()
        # both must still cluster the verbatim dupes into one cluster
        assert out_capped["cluster_id"].nunique() == 1
        assert out_exact["cluster_id"].nunique() == 1
        # exact mode generated all-pairs (no drops recorded)
        assert D.LAST_PAIR_STATS["hot_buckets"] == 0
        assert D.LAST_PAIR_STATS["dropped_reps"] == 0


class TestKNN:
    def test_brute_vs_numpy(self, ray_session, docs_ds):
        import ray.data as rd

        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        df = emb.to_pandas()
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        qm = mat[:2]
        res = K.knn_brute(
            emb, {"query_id": [0, 1], "matrix": qm}, k=5
        )
        # numpy reference
        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        nq = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        s = nm @ nq.T
        for qi in (0, 1):
            order = np.lexsort((df["vec_id"].to_numpy(), -s[:, qi]))[:5]
            want_ids = df["vec_id"].to_numpy()[order]
            got = res[res["query_id"] == qi].sort_values("rank")
            assert np.array_equal(got["vec_id"].to_numpy(), want_ids)

    def test_ivf_recall(self, ray_session):
        import ray.data as rd

        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        df = emb.to_pandas()
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        qm = mat[:3]
        queries = {"query_id": [0, 1, 2], "matrix": qm}
        brute = K.knn_brute(emb, queries, k=10)
        ivf = K.knn_ivf(emb, queries, k=10, nlist=8, nprobe=4)
        recall = 0.0
        for qi in range(3):
            b = set(brute[brute["query_id"] == qi]["vec_id"])
            a = set(ivf[ivf["query_id"] == qi]["vec_id"])
            recall += len(a & b) / len(b)
        recall /= 3
        assert recall >= 0.6  # nprobe=4/8 lists: most neighbors recovered

    def test_hash_sample_unbiased_on_clustered_input(self, ray_session):
        """Round-3: IVF training sampling must be unbiased on input sorted
        by cluster — ds.limit() reads only the first blocks and would train
        every centroid on cluster A."""
        import ray.data as rd

        rng = np.random.default_rng(0)
        n, d = 2000, 8
        a = rng.normal(loc=0.0, scale=0.05, size=(n // 2, d)) + np.eye(d)[0]
        b = rng.normal(loc=0.0, scale=0.05, size=(n // 2, d)) + np.eye(d)[1]
        mat = np.concatenate([a, b])  # file order: all of A, then all of B
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(mat.astype(np.float32)), pa.list_(pa.float32())),
            }
        )
        ds = rd.from_arrow(tbl).repartition(8)
        sample = K.hash_sample(ds, 256)
        assert sample.shape == (256, d)
        # an unbiased sample must draw from BOTH halves (limit() would not)
        from_a = (sample[:, 0] > 0.5).sum()
        from_b = (sample[:, 1] > 0.5).sum()
        assert from_a >= 64 and from_b >= 64
        # and IVF trained on it must recover cluster-B neighbors
        queries = {"query_id": [0], "matrix": mat[-1:].astype(np.float64)}
        brute = K.knn_brute(ds, queries, k=10)
        ivf = K.knn_ivf(ds, queries, k=10, nlist=4, nprobe=1, sample_size=256)
        bset = set(brute["vec_id"])
        aset = set(ivf["vec_id"])
        assert len(aset & bset) / len(bset) >= 0.8


class TestWindow:
    def test_tumbling_vs_pandas(self, ray_session):
        import ray.data as rd

        ev = rd.read_parquet(f"{SF}/events.parquet")
        got = windowed_aggregate(ev, every="hour")
        df = ev.to_pandas()
        df["window_start"] = df["ts"].dt.floor("h")
        want = (
            df.groupby(["event_type", "window_start"])
            .agg(
                n_events=("value", "size"),
                sum_value=("value", "sum"),
                min_value=("value", "min"),
                max_value=("value", "max"),
            )
            .reset_index()
            .sort_values(["event_type", "window_start"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        assert np.array_equal(got["n_events"].to_numpy(), want["n_events"].to_numpy())
        assert np.allclose(got["sum_value"].to_numpy(), want["sum_value"].to_numpy())

    def test_sessions(self, ray_session):
        import ray.data as rd

        ev = rd.read_parquet(f"{SF}/events.parquet")
        out = session_windows(ev, gap_seconds=3600.0).to_pandas()
        df = ev.to_pandas()
        assert out["n_events"].sum() == len(df)
        assert (out["duration_s"] >= 0).all()

    @staticmethod
    def _norm_sessions(df):
        return (
            df.sort_values(["user_id", "start", "end"], kind="stable")
            .reset_index(drop=True)[["user_id", "n_events", "start", "end", "duration_s"]]
        )

    def test_sessions_chunked_equals_per_key(self, ray_session):
        """Round-4 (VERDICT r3 #7): the sort+stitch sessionizer is exactly
        equal to the per-key map_groups one, on real events and with a
        forced distributed stitch."""
        import ray.data as rd

        ev = rd.read_parquet(f"{SF}/events.parquet")
        legacy = self._norm_sessions(
            session_windows(ev, gap_seconds=1800.0, chunked=False).to_pandas()
        )
        chunked = self._norm_sessions(
            session_windows(ev, gap_seconds=1800.0, chunked=True).to_pandas()
        )
        pd.testing.assert_frame_equal(chunked, legacy, check_dtype=False)
        forced = self._norm_sessions(
            session_windows(
                ev, gap_seconds=1800.0, chunked=True, stitch_driver_threshold=0
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(forced, legacy, check_dtype=False)

    def test_sessions_one_hot_key_splits_across_blocks(self, ray_session):
        """A single pathological key (one bot user, every event) must NOT
        land on one worker: the sort range-partitions it, per-block
        sessionize is vectorized, and the stitch sees ≤ 2 sessions per
        block.  Exactness vs a NumPy single-pass reference."""
        import ray.data as rd

        rng = np.random.default_rng(9)
        n = 400_000
        gaps = rng.choice([5.0, 10_000.0], n, p=[0.999, 0.001])
        ts = np.cumsum(gaps) + 1_700_000_000
        df = pd.DataFrame(
            {
                "user_id": np.zeros(n, dtype=np.int64),  # ONE key
                "ts": pd.to_datetime((ts * 1e6).astype(np.int64), unit="us"),
            }
        )
        ds = rd.from_pandas(df).repartition(16)
        got = self._norm_sessions(
            session_windows(ds, gap_seconds=1800.0, chunked=True).to_pandas()
        )
        # NumPy reference (single pass over the sorted events)
        t = np.sort(ts)
        new = np.ones(n, dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > 1800.0
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:] - 1, [n - 1]])
        assert len(got) == starts.size
        assert got["n_events"].to_numpy().sum() == n
        assert np.allclose(np.sort(got["start"].to_numpy()), t[starts])
        assert np.allclose(np.sort(got["end"].to_numpy()), t[ends])


class TestMultimodal:
    def test_strict_stub_raises(self):
        dec = ImageDecode(strict=True)
        with pytest.raises(NotImplementedError):
            dec(synth_media_table(4))

    def test_pipeline_plumbing(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(synth_media_table(64, seed=2)).repartition(2)
        out = media_pipeline(ds, dim=8, n_frames=3).to_pandas()
        assert len(out) == 64
        assert all(len(f) == 8 for f in out["features"])
        assert all(len(f) == 3 for f in out["frame_offsets_ms"])
        # determinism: same payload → same features
        out2 = media_pipeline(
            rd.from_arrow(synth_media_table(64, seed=2)), dim=8, n_frames=3
        ).to_pandas()
        a = np.stack(out.sort_values("media_id")["features"].to_numpy())
        b = np.stack(out2.sort_values("media_id")["features"].to_numpy())
        assert np.array_equal(a, b)


class TestDedupScale:
    """Round-2 hardening: the verify path must fetch candidate rows only,
    never the corpus (VERDICT next-round item 1)."""

    def test_pairs_sink_consistent_across_regimes(self, ray_session, tmp_path):
        """Round 5: pairs_sink must export the SAME verified pair set from
        the driver and the distributed regimes, and the exported pairs
        must regenerate the clustering (the oracle's recursive-CC
        contract)."""
        import pyarrow.parquet as pq
        import ray.data as rd

        pages = synth_pages_table(400, seed=9, dup_fraction=0.15).to_pandas()
        pages["doc_id"] = np.arange(len(pages))
        ds = rd.from_pandas(pages[["doc_id", "text"]]).repartition(4)
        sinks = [str(tmp_path / "p_driver"), str(tmp_path / "p_dist")]
        comp_a = D.minhash_dedup(ds, threshold=0.8, pairs_sink=sinks[0]).to_pandas()
        comp_b = D.minhash_dedup(
            ds, threshold=0.8, driver_threshold=0, pair_driver_threshold=0,
            pairs_sink=sinks[1],
        ).to_pandas()

        def load_pairs(p):
            import glob

            t = pd.concat(
                [pq.read_table(f).to_pandas() for f in glob.glob(f"{p}/*.parquet")],
                ignore_index=True,
            )
            ab = np.sort(t[["a", "b"]].to_numpy(np.int64), axis=1)
            return set(map(tuple, ab))

        pa_, pb_ = load_pairs(sinks[0]), load_pairs(sinks[1])
        assert pa_ == pb_ and len(pa_) > 0
        # exported pairs regenerate the clustering exactly
        cc = D.connected_components(
            pd.DataFrame(sorted(pa_), columns=["a", "b"])
        ).set_index("doc_id")["cluster_id"]
        got = comp_a.set_index("doc_id")["cluster_id"]
        for doc, cl in cc.items():
            assert got[doc] == cl

    def test_minhash_distributed_path_fetches_candidates_only(self, ray_session):
        import ray.data as rd

        pages = synth_pages_table(1000, seed=8, dup_fraction=0.1).to_pandas()
        pages["doc_id"] = np.arange(len(pages))
        ds = rd.from_pandas(pages[["doc_id", "text"]]).repartition(4)
        # driver_threshold=0 forces the distributed bucket-groupby pairing
        comp = D.minhash_dedup(ds, threshold=0.8, driver_threshold=0).to_pandas()
        # accounting: the verify pulled candidate rows only, not the corpus
        assert 0 < D.LAST_DRIVER_FETCH["rows"] < len(pages)
        # correctness identical to the driver-side path
        comp2 = D.minhash_dedup(ds, threshold=0.8).to_pandas()
        a = comp.sort_values("doc_id").reset_index(drop=True)
        b = comp2.sort_values("doc_id").reset_index(drop=True)
        assert np.array_equal(a["cluster_id"].to_numpy(), b["cluster_id"].to_numpy())
        # verbatim duplicates still co-cluster
        cl = dict(zip(a["doc_id"], a["cluster_id"]))
        for ids in pages.groupby("text")["doc_id"].agg(list):
            if len(ids) > 1:
                assert len({cl[i] for i in ids}) == 1

    def test_simhash_and_embedding_distributed_paths(self, ray_session):
        import ray.data as rd

        pages = synth_pages_table(300, seed=12, dup_fraction=0.25).to_pandas()
        pages["doc_id"] = np.arange(len(pages))
        ds = rd.from_pandas(pages[["doc_id", "text"]]).repartition(3)
        a = D.simhash_dedup(ds, max_hamming=3, driver_threshold=0).to_pandas()
        b = D.simhash_dedup(ds, max_hamming=3).to_pandas()
        assert np.array_equal(
            a.sort_values("doc_id")["cluster_id"].to_numpy(),
            b.sort_values("doc_id")["cluster_id"].to_numpy(),
        )
        # templated synthetic text collides broadly in 16-bit simhash bands,
        # so nearly all docs can be candidates here; the accounting bound is
        # exercised strictly by the minhash test above
        assert D.LAST_DRIVER_FETCH["rows"] <= len(pages)

        rng = np.random.default_rng(5)
        base = rng.standard_normal((60, 16))
        mat = np.vstack([base, base[:10] + rng.standard_normal((10, 16)) * 1e-3])
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(70, dtype=np.int64)),
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in mat], pa.list_(pa.float32())
                ),
            }
        )
        e1 = D.embedding_dedup(
            rd.from_arrow(tbl).repartition(2), threshold=0.999, driver_threshold=0
        ).to_pandas()
        e2 = D.embedding_dedup(rd.from_arrow(tbl), threshold=0.999).to_pandas()
        assert np.array_equal(
            e1.sort_values("vec_id")["cluster_id"].to_numpy(),
            e2.sort_values("vec_id")["cluster_id"].to_numpy(),
        )
        cl = dict(zip(e1["vec_id"], e1["cluster_id"]))
        for i in range(10):
            assert cl[i] == cl[60 + i]

    def test_dataset_regime_pairs_globally_unique(self, ray_session):
        """Round-4: identical docs collide in EVERY band, so the Dataset
        pair regime must dedup cross-band duplicates before the expensive
        payload-join verify — returned pairs are globally unique and the
        before/after census lands in LAST_PAIR_STATS."""
        import ray.data as rd

        # 5 docs sharing one bucket in each of 4 bands (verbatim-dup shape)
        n_bands, ids = 4, np.arange(5, dtype=np.int64)
        rows = pd.DataFrame(
            {
                "band": np.repeat(np.arange(n_bands, dtype=np.int64), ids.size),
                "band_hash": np.uint64(77),
                "sig_hash": np.uint64(123),
                "doc_id": np.tile(ids, n_bands),
            }
        )
        band_ds = rd.from_pandas(rows).repartition(3)
        res = D.lsh_candidate_pairs(
            band_ds, driver_threshold=0, pair_driver_threshold=0
        )
        pairs = res.to_pandas()
        # all-pairs of 5 docs per band = 10; 4 bands raw = 40; unique = 10
        assert D.LAST_PAIR_STATS["dataset_pairs_raw"] == 40
        assert D.LAST_PAIR_STATS["dataset_pairs"] == 10
        assert len(pairs) == 10
        assert not pairs.duplicated().any()

    def test_fully_distributed_pairs_and_components(self, ray_session):
        """Round-3 (VERDICT #2): with pair_driver_threshold=0 the pair set
        stays a Dataset end-to-end — verify + connected components run
        distributed, the driver never materializes a pair frame
        (pair_rows == 0), and clusters equal the driver path exactly."""
        import ray.data as rd

        pages = synth_pages_table(300, seed=9, dup_fraction=0.25).to_pandas()
        pages["doc_id"] = np.arange(len(pages))
        ds = rd.from_pandas(pages[["doc_id", "text"]]).repartition(3)

        for fn, kw in [
            (D.minhash_dedup, dict(threshold=0.8)),
            (D.simhash_dedup, dict(max_hamming=3)),
            (D.ngram_jaccard_dedup, dict(threshold=0.9)),
        ]:
            base = fn(ds, **kw).to_pandas().sort_values("doc_id")
            dist = (
                fn(ds, driver_threshold=0, pair_driver_threshold=0, **kw)
                .to_pandas()
                .sort_values("doc_id")
            )
            assert D.LAST_DRIVER_FETCH["pair_rows"] == 0, fn.__name__
            assert np.array_equal(
                base["cluster_id"].to_numpy(), dist["cluster_id"].to_numpy()
            ), fn.__name__

        rng = np.random.default_rng(5)
        basem = rng.standard_normal((60, 16))
        mat = np.vstack([basem, basem[:10] + rng.standard_normal((10, 16)) * 1e-3])
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(70, dtype=np.int64)),
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in mat], pa.list_(pa.float32())
                ),
            }
        )
        e_base = D.embedding_dedup(rd.from_arrow(tbl), threshold=0.999).to_pandas()
        e_dist = D.embedding_dedup(
            rd.from_arrow(tbl).repartition(2),
            threshold=0.999,
            driver_threshold=0,
            pair_driver_threshold=0,
        ).to_pandas()
        assert D.LAST_DRIVER_FETCH["pair_rows"] == 0
        assert np.array_equal(
            e_base.sort_values("vec_id")["cluster_id"].to_numpy(),
            e_dist.sort_values("vec_id")["cluster_id"].to_numpy(),
        )

    def test_join_verify_regime_matches_broadcast(self, ray_session):
        """Round-3 (100-TB hardening): with broadcast_id_threshold=0 the
        verify hash-joins per-doc payloads onto the pair Dataset — no text
        fetch, no broadcast dict — and clusters equal the default path for
        all four variants."""
        import ray.data as rd

        pages = synth_pages_table(250, seed=21, dup_fraction=0.3).to_pandas()
        pages["doc_id"] = np.arange(len(pages))
        ds = rd.from_pandas(pages[["doc_id", "text"]]).repartition(3)
        forced = dict(
            driver_threshold=0, pair_driver_threshold=0, broadcast_id_threshold=0
        )
        for fn, kw in [
            (D.minhash_dedup, dict(threshold=0.8)),
            (D.simhash_dedup, dict(max_hamming=3)),
            (D.ngram_jaccard_dedup, dict(threshold=0.9)),
        ]:
            base = fn(ds, **kw).to_pandas().sort_values("doc_id")
            joined = fn(ds, **forced, **kw).to_pandas().sort_values("doc_id")
            assert D.LAST_DRIVER_FETCH["rows"] == 0, fn.__name__
            assert D.LAST_DRIVER_FETCH["pair_rows"] == 0, fn.__name__
            assert np.array_equal(
                base["cluster_id"].to_numpy(), joined["cluster_id"].to_numpy()
            ), fn.__name__

        rng = np.random.default_rng(2)
        basem = rng.standard_normal((50, 8))
        mat = np.vstack([basem, basem[:8] + rng.standard_normal((8, 8)) * 1e-3])
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(58, dtype=np.int64)),
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in mat], pa.list_(pa.float32())
                ),
            }
        )
        e_base = D.embedding_dedup(rd.from_arrow(tbl), threshold=0.999).to_pandas()
        e_join = D.embedding_dedup(
            rd.from_arrow(tbl).repartition(2), threshold=0.999, **forced
        ).to_pandas()
        assert D.LAST_DRIVER_FETCH["rows"] == 0
        assert np.array_equal(
            e_base.sort_values("vec_id")["cluster_id"].to_numpy(),
            e_join.sort_values("vec_id")["cluster_id"].to_numpy(),
        )

    def test_distributed_connected_components_chain(self, ray_session):
        """Label propagation + pointer jumping converges on a long chain
        (worst diameter) and on disjoint components."""
        import ray.data as rd

        a = list(range(0, 50)) + [100, 102]
        b = list(range(1, 51)) + [101, 103]
        pairs = rd.from_arrow(
            pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
        ).repartition(4)
        comp = D.distributed_connected_components(pairs, id_col="doc_id")
        cl = dict(zip(comp["doc_id"], comp["cluster_id"]))
        assert all(cl[i] == 0 for i in range(51))
        assert cl[100] == cl[101] == 100
        assert cl[102] == cl[103] == 102

    def test_hot_bucket_cap_bounds_pairs(self, ray_session):
        """Round-3 (VERDICT #1): a degenerate LSH bucket (every doc shares
        one band hash — the boilerplate-page shape) must generate O(n) star
        pairs via the sig_hash sub-split, never C(n,2) all-pairs."""
        n = 4000
        ids = np.arange(n, dtype=np.int64)
        df = pd.DataFrame(
            {
                "band": np.zeros(n, np.int32),
                "band_hash": np.full(n, 7, np.uint64),
                "sig_hash": np.full(n, 99, np.uint64),  # all identical docs
                "doc_id": ids,
            }
        )
        D.LAST_PAIR_STATS.update(hot_buckets=0, star_pairs=0, dropped_reps=0)
        pairs = D._pairs_from_bands_df(df, "doc_id", bucket_cap=512)
        assert len(pairs) == n - 1  # star to min id, not C(n,2) ≈ 8M
        assert (pairs["a"] == 0).all()
        assert D.LAST_PAIR_STATS["hot_buckets"] == 1

        # mixed signatures in one hot bucket: per-sig stars + rep all-pairs
        df2 = df.copy()
        df2["sig_hash"] = (ids % 3).astype(np.uint64)
        D.LAST_PAIR_STATS.update(hot_buckets=0, star_pairs=0, dropped_reps=0)
        p2 = D._pairs_from_bands_df(df2, "doc_id", bucket_cap=512)
        # 3 groups → n-3 star pairs + C(3,2) representative pairs
        assert len(p2) == (n - 3) + 3
        # reps beyond the cap are dropped (and counted)
        df3 = df.copy()
        df3["sig_hash"] = ids.astype(np.uint64)  # all distinct signatures
        D.LAST_PAIR_STATS.update(hot_buckets=0, star_pairs=0, dropped_reps=0)
        p3 = D._pairs_from_bands_df(df3, "doc_id", bucket_cap=512)
        assert len(p3) == 512 * 511 // 2
        assert D.LAST_PAIR_STATS["dropped_reps"] == n - 512

    def test_hot_bucket_end_to_end_100k_identical(self, ray_session):
        """Stress (VERDICT #1 'done' bar): 100k verbatim-identical docs —
        one shared band hash in every band — completes with bounded pair
        count and co-clusters everything."""
        import ray.data as rd

        n = 100_000
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": ["boilerplate lorem ipsum page content"] * n,
            }
        )
        ds = rd.from_pandas(df).repartition(8)
        comp = D.minhash_dedup(ds, threshold=0.8).to_pandas()
        # bounded: the driver pair frame is O(n), not O(n²)
        assert 0 < D.LAST_DRIVER_FETCH["pair_rows"] <= 2 * n
        assert D.LAST_PAIR_STATS["hot_buckets"] >= 1
        assert comp["cluster_id"].nunique() == 1
        assert comp["is_duplicate"].sum() == n - 1


class TestHopping:
    def test_hopping_vs_pandas(self, ray_session):
        import ray.data as rd

        ev = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
        from zonal_stats_toolkit_ray.stages.window import hopping_aggregate

        got = hopping_aggregate(ev, length_s=3600, hop_s=1800)
        df = ev.to_pandas()
        es = df["ts"].to_numpy().astype("datetime64[us]").astype("int64") // 1_000_000
        rows = []
        for k in (0, 1):
            rows.append(
                pd.DataFrame(
                    {
                        "event_type": df["event_type"],
                        "window_start": (es // 1800) * 1800 - k * 1800,
                        "value": df["value"],
                    }
                )
            )
        want = (
            pd.concat(rows)
            .groupby(["event_type", "window_start"])
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
            .reset_index()
            .sort_values(["event_type", "window_start"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        assert np.array_equal(got["n_events"].to_numpy(), want["n_events"].to_numpy())
        assert np.allclose(got["sum_value"].to_numpy(), want["sum_value"].to_numpy())
        # every event lands in exactly length/hop windows
        assert got["n_events"].sum() == 2 * len(df)

    def test_hopping_rejects_nonmultiple(self, ray_session):
        import ray.data as rd

        from zonal_stats_toolkit_ray.stages.window import hopping_aggregate

        ev = rd.read_parquet(f"{SF}/events.parquet")
        with pytest.raises(ValueError, match="multiple"):
            hopping_aggregate(ev, length_s=3600, hop_s=1000)


class TestSplitOps:
    def test_split_deterministic_and_fractional(self, ray_session):
        import ray.data as rd

        from zonal_stats_toolkit_ray.stages.split import train_val_split

        ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
        a = train_val_split(ds, val_fraction=0.2).to_pandas()
        b = train_val_split(ds.repartition(7), val_fraction=0.2).to_pandas()
        m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
        # partitioning-independent assignment
        assert (m["split_a"] == m["split_b"]).all()
        frac = (a["split"] == "val").mean()
        assert 0.1 < frac < 0.3  # ~0.2 for a uniform id hash

    def test_bloom_filter_and_decontaminate_superset(self, ray_session):
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages import split as S

        rng = np.random.default_rng(3)
        keys = rng.integers(0, 2**64, 50_000, dtype=np.uint64)
        other = rng.integers(0, 2**64, 50_000, dtype=np.uint64)
        bf = S.BloomFilter(keys.size, fp_rate=0.01)
        bf.add_many(keys)
        assert bf.contains_many(keys).all()  # zero false negatives, always
        assert bf.contains_many(other).mean() < 0.03
        # bit array ~7x smaller than the exact uint64 set
        assert bf.bits.nbytes < keys.nbytes / 4

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(40, dtype=np.int64),
                "text": [
                    " ".join(f"w{(i * 7 + j) % 23}" for j in range(30))
                    for i in range(40)
                ],
            }
        )
        ds = rd.from_pandas(docs).repartition(3)
        bh = S.benchmark_ngram_hashes(pa.array(docs["text"][:3], pa.string()), 8)
        exact = S.decontaminate(ds, bh, n=8).to_pandas().sort_values("doc_id")
        bloom = (
            S.decontaminate_bloom(ds, bh, n=8, fp_rate=0.001)
            .to_pandas()
            .sort_values("doc_id")
        )
        e = exact["contaminated"].to_numpy()
        b = bloom["contaminated"].to_numpy()
        assert (~e | b).all()  # bloom is a superset of exact
        assert e[:3].all() and b[:3].all()  # the benchmark docs themselves

    def test_decontaminate_flags_benchmark_and_copies(self, ray_session):
        import ray.data as rd

        from zonal_stats_toolkit_ray.stages.split import (
            benchmark_ngram_hashes,
            decontaminate,
        )

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "text": [
                    "alpha beta gamma delta epsilon zeta eta theta iota",  # benchmark
                    "totally unrelated words one two three four five six",
                    "alpha beta gamma delta epsilon zeta eta theta tail",  # shares 8-gram
                    "short doc",
                    "alpha beta gamma delta", # shares no full 8-gram
                    "ALPHA BETA GAMMA DELTA EPSILON ZETA ETA THETA IOTA",  # case-folded dup
                ],
            }
        )
        bh = benchmark_ngram_hashes(pa.array([docs["text"][0]]), 8)
        out = (
            decontaminate(rd.from_pandas(docs), bh, n=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["contaminated"].tolist() == [True, False, True, False, False, True]


def test_distributed_pair_verify_matches_driver(ray_session):
    """Forcing pair_driver_threshold=0 routes Jaccard verification through
    the distributed pair Dataset; clusters must equal the driver loop's."""
    import ray.data as rd

    pages = synth_pages_table(300, seed=8, dup_fraction=0.25).to_pandas()
    pages["doc_id"] = np.arange(len(pages))
    ds = rd.from_pandas(pages[["doc_id", "text"]]).repartition(3)
    import zonal_stats_toolkit_ray.stages.dedup as dd

    orig = dd.jaccard_verify

    def forced(texts, pairs, **kw):
        kw["pair_driver_threshold"] = 0
        return orig(texts, pairs, **kw)

    dd.jaccard_verify = forced
    try:
        a = dd.minhash_dedup(ds, threshold=0.8).to_pandas()
    finally:
        dd.jaccard_verify = orig
    b = dd.minhash_dedup(ds, threshold=0.8).to_pandas()
    assert np.array_equal(
        a.sort_values("doc_id")["cluster_id"].to_numpy(),
        b.sort_values("doc_id")["cluster_id"].to_numpy(),
    )


class TestNormalizeByGroup:
    def test_zscore_minmax_and_edges(self, ray_session):
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages.normalize import normalize_by_group

        df = pd.DataFrame(
            {
                "event_id": np.arange(7, dtype=np.int64),
                "event_type": ["a", "a", "a", "b", "b", "c", "a"],
                "value": [1.0, 2.0, 3.0, 5.0, 5.0, 9.0, np.nan],
            }
        )
        out = (
            normalize_by_group(
                rd.from_pandas(df).repartition(3),
                group_col="event_type",
                value_col="value",
                ndigits=None,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # group a: mean 2, std sqrt(2/3); NaN row excluded from moments
        std_a = np.sqrt(2.0 / 3.0)
        np.testing.assert_allclose(
            out.loc[:2, "zscore"], [-1 / std_a, 0.0, 1 / std_a], rtol=1e-12
        )
        np.testing.assert_allclose(out.loc[:2, "minmax"], [0.0, 0.5, 1.0])
        # constant group b and singleton group c: defined as 0
        assert (out.loc[3:5, "zscore"] == 0).all()
        assert (out.loc[3:5, "minmax"] == 0).all()
        # NaN passes through
        assert np.isnan(out.loc[6, "zscore"]) and np.isnan(out.loc[6, "minmax"])


class TestChunkAndHistogram:
    """Round-4 late additions: overlapping chunking + exact histogram."""

    def test_chunk_matches_python_slicing(self, ray_session):
        import duckdb
        import ray.data as rd

        texts = [
            "",  # no chunks
            "short",  # one short chunk
            "a" * 10,  # exact stride multiple
            "x𝄞yz" * 7,  # astral chars: codepoint slicing, not UTF-16/byte
            "héllo wörld " * 4,
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = (
            T.chunk_documents(rd.from_pandas(df), size=8, stride=5)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        # python reference
        rows = []
        for i, t in enumerate(texts):
            k = 0
            while k * 5 < len(t):
                c = t[k * 5 : k * 5 + 8]
                rows.append((i, k, c, len(c)))
                k += 1
        want = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "chunk_text", "n_chars"])
        pd.testing.assert_frame_equal(out, want)
        # and SQL substr parity (the oracle's exact expression)
        con = duckdb.connect()
        con.register("documents", df)
        sql = """
            SELECT doc_id, chunk_id,
                   substr(text, CAST(chunk_id * 5 + 1 AS BIGINT), 8) AS chunk_text,
                   length(substr(text, CAST(chunk_id * 5 + 1 AS BIGINT), 8)) AS n_chars
            FROM (SELECT doc_id, text,
                         unnest(generate_series(0,
                             CAST(ceil(length(text) / 5.0) AS BIGINT) - 1)) AS chunk_id
                  FROM documents WHERE length(text) > 0)
            ORDER BY doc_id, chunk_id
        """
        want_sql = con.execute(sql).df()
        pd.testing.assert_frame_equal(out, want_sql, check_dtype=False)

    def test_assemble_chunks_roundtrip(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        texts = [
            "",  # no chunks → absent from output
            "short",
            "a" * 10,  # exact stride multiple
            "x𝄞yz" * 7,  # astral codepoints
            "héllo wörld " * 40,  # multi-chunk
        ]
        # plus bulk docs of varied lengths so the sort splits docs across
        # blocks and the boundary-fragment stitch actually runs
        for i in range(40):
            n = int(rng.integers(0, 60))
            texts.append("".join(chr(97 + (j + i) % 26) for j in range(n)))
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        chunks = T.chunk_documents(
            rd.from_pandas(df).repartition(5), size=8, stride=5
        )
        out = (
            T.assemble_chunks(chunks.repartition(9), stride=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = df[df["text"].str.len() > 0].rename(columns={"text": "doc_text"})
        want["n_chars"] = want["doc_text"].str.len().astype("int64")
        want = want.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out[["doc_id", "doc_text", "n_chars"]], want, check_dtype=False
        )

    def test_assemble_chunks_hot_doc_spans_blocks(self, ray_session):
        """One huge doc forced across many sorted blocks: every block emits
        ≤2 fragments and the driver stitch reproduces it exactly."""
        import ray.data as rd

        big = "".join(chr(0x3041 + (i % 80)) + "abcdefg"[i % 7] for i in range(4000))
        df = pd.DataFrame({"doc_id": [1, 2], "text": [big, "tiny"]})
        chunks = T.chunk_documents(rd.from_pandas(df), size=80, stride=50)
        out = (
            T.assemble_chunks(chunks.repartition(12), stride=50)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["doc_id"]) == [1, 2]
        assert out.loc[0, "doc_text"] == big
        assert out.loc[1, "doc_text"] == "tiny"

    def test_histogram_boundaries_and_merge(self, ray_session):
        import ray.data as rd

        from zonal_stats_toolkit_ray.stages.sketch import histogram_batch, histogram_ds

        rng = np.random.default_rng(11)
        v = np.concatenate(
            [
                rng.uniform(-5, 105, 5000),
                [0.0, 100.0, 99.9999999, -0.0001, np.nan, np.inf, -np.inf],
                np.arange(0, 101, 10.0),  # exact bin edges
            ]
        )
        df = pd.DataFrame({"x": v})
        lo, hi, bins = 0.0, 100.0, 10
        got = (
            histogram_ds(rd.from_pandas(df).repartition(7), value_col="x",
                         lo=lo, hi=hi, bins=bins)
            .to_pandas()
            .sort_values("bin")
            .reset_index(drop=True)
        )
        w = (hi - lo) / bins
        m = np.isfinite(v) & (v >= lo) & (v < hi)
        idx = np.floor((v[m] - lo) / w).astype(np.int64)
        counts = np.bincount(idx, minlength=bins)
        want = pd.DataFrame(
            {"bin": np.nonzero(counts)[0].astype(np.int64),
             "n": counts[np.nonzero(counts)[0]].astype(np.int64)}
        )
        pd.testing.assert_frame_equal(got, want)
        assert int(got["n"].sum()) == int(m.sum())
        # single-batch partial equals the distributed result
        one = histogram_batch(pa.table({"x": v}), value_col="x", lo=lo, hi=hi, bins=bins)
        pd.testing.assert_frame_equal(one.to_pandas(), want)


class TestWeightedSample:
    def test_proportional_and_partition_invariant(self, ray_session):
        import ray.data as rd

        from zonal_stats_toolkit_ray.stages.split import weighted_sample

        n = 20000
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                # two weight classes, 1:9 — heavy rows should be ~9x likelier
                "n_chars": np.where(np.arange(n) % 2 == 0, 100, 900).astype(np.int64),
            }
        )
        out = weighted_sample(
            rd.from_pandas(df).repartition(8), expected_k=2000.0
        ).to_pandas()
        light = (out["n_chars"] == 100).sum()
        heavy = (out["n_chars"] == 900).sum()
        assert 1500 < len(out) < 2500  # expected 2000
        assert heavy > 5 * light  # ~9x, loose bound
        # pure function of id: a different partitioning yields identical rows
        out2 = weighted_sample(
            rd.from_pandas(df).repartition(3), expected_k=2000.0
        ).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values("doc_id").reset_index(drop=True),
            out2.sort_values("doc_id").reset_index(drop=True),
        )


class TestCharEntropy:
    def test_edge_cases_and_known_values(self):
        import math
        import pyarrow as pa
        from zonal_stats_toolkit_ray.stages.text import char_entropy_batch

        batch = pa.table(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [
                    "",            # empty → 0 bits, 0 distinct
                    "aaaa",        # single symbol → exactly 0.0 (not -0.0)
                    "abab",        # uniform 2 symbols → 1 bit
                    "abcd",        # uniform 4 symbols → 2 bits
                    "a\U0001F600a\U0001F600",  # astral chars count as ONE cp
                ],
            }
        )
        out = char_entropy_batch(batch).to_pandas()
        assert out["n_distinct"].tolist() == [0, 1, 2, 4, 2]
        assert out["entropy_bits"].tolist() == [0.0, 0.0, 1.0, 2.0, 1.0]
        # -0.0 normalization: the hash-compare distinguishes signed zeros
        assert all(math.copysign(1.0, v) > 0 for v in out["entropy_bits"])

    def test_matches_pure_python(self):
        import collections
        import math
        import numpy as np
        import pyarrow as pa
        from zonal_stats_toolkit_ray.stages.text import char_entropy_batch

        rng = np.random.default_rng(4)
        texts = [
            "".join(rng.choice(list("abcdefg \né\U0001F600"), size=n))
            for n in rng.integers(0, 60, 50)
        ]
        out = char_entropy_batch(
            pa.table({"doc_id": list(range(50)), "text": texts})
        ).to_pandas()
        for i, t in enumerate(texts):
            c = collections.Counter(t)
            ent = -sum(
                (n / len(t)) * math.log2(n / len(t)) for n in c.values()
            ) if t else 0.0
            assert abs(out["entropy_bits"][i] - round(ent, 6)) < 1e-9
            assert out["n_distinct"][i] == len(c)


class TestDocFrequencyByGroup:
    def test_matches_pandas_reference(self, ray_session):
        import ray.data as rd
        import pandas as pd
        import numpy as np
        from zonal_stats_toolkit_ray.stages.text import doc_frequency_by_group

        rng = np.random.default_rng(8)
        vocab = ["alpha", "beta", "gamma", "delta", "eps"]
        langs = ["en", "de", "fr"]
        rows = []
        for i in range(300):
            lang = langs[rng.integers(0, 3)]
            toks = rng.choice(vocab, size=rng.integers(1, 8))
            rows.append((i, lang, " ".join(toks)))
        df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
        got = doc_frequency_by_group(
            rd.from_pandas(df).repartition(9), top_n=3
        )
        exp = (
            df.assign(token=df["text"].str.lower().str.split())
            .explode("token")
            .drop_duplicates(["doc_id", "lang", "token"])
            .groupby(["lang", "token"])
            .size()
            .reset_index(name="df")
            .sort_values(["lang", "df", "token"], ascending=[True, False, True])
            .groupby("lang")
            .head(3)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp, check_dtype=False
        )

    def test_doc_never_double_counted_within_group(self, ray_session):
        import ray.data as rd
        import pandas as pd
        from zonal_stats_toolkit_ray.stages.text import doc_frequency_by_group

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "lang": ["en", "en", "de"],
                "text": ["dup dup dup", "dup x", "dup"],
            }
        )
        got = doc_frequency_by_group(rd.from_pandas(df), top_n=10)
        en_dup = got[(got["lang"] == "en") & (got["token"] == "dup")]["df"].iloc[0]
        de_dup = got[(got["lang"] == "de") & (got["token"] == "dup")]["df"].iloc[0]
        assert en_dup == 2 and de_dup == 1


class TestBM25:
    def test_matches_pure_python(self, ray_session):
        import math
        import numpy as np
        import pandas as pd
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages.bm25 import bm25_topk

        rng = np.random.default_rng(3)
        vocab = ["data", "merge", "window", "x", "y", "z", "w"]
        docs = [
            " ".join(rng.choice(vocab, size=rng.integers(2, 12)))
            for _ in range(120)
        ]
        df = pd.DataFrame({"doc_id": range(120), "text": docs})
        terms = ["data", "window"]
        got = bm25_topk(rd.from_pandas(df).repartition(6), terms, k=10)

        toks = [d.split() for d in docs]
        n = len(toks)
        avgdl = sum(len(t) for t in toks) / n
        dfc = {t: sum(1 for d in toks if t in d) for t in terms}
        scores = {}
        for i, d in enumerate(toks):
            s = 0.0
            for t in terms:
                tf = d.count(t)
                if tf == 0:
                    continue
                idf = math.log((n - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1.0)
                s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(d) / avgdl))
            if s > 0:
                scores[i] = s
        exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert got["doc_id"].tolist() == [i for i, _ in exp]
        np.testing.assert_allclose(
            got["score"], [round(s, 6) for _, s in exp], atol=2e-6
        )

    def test_no_match_returns_empty(self, ray_session):
        import pandas as pd
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages.bm25 import bm25_topk

        df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "d e f"]})
        out = bm25_topk(rd.from_pandas(df), ["zzz"], k=5)
        assert len(out) == 0


class TestCohortRetention:
    def test_matches_pandas_reference(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages.cohort import cohort_retention

        rng = np.random.default_rng(14)
        n = 4000
        users = rng.integers(0, 120, n)
        # spread over ~10 weeks; duplicates within a week exercise the
        # distinct (a user active twice in week k counts once)
        tus = (rng.uniform(0, 10 * 604800, n) * 1e6).astype("int64")
        df = pd.DataFrame(
            {"user_id": users, "ts": pd.to_datetime(tus, unit="us")}
        )
        got = cohort_retention(rd.from_pandas(df).repartition(11))

        wk = (df["ts"].astype("int64") // 10**9 // 604800).astype("int64")
        r = pd.DataFrame({"user_id": users, "wk": wk})
        first = r.groupby("user_id")["wk"].min().rename("cohort_week")
        j = r.join(first, on="user_id")
        j["week_offset"] = j["wk"] - j["cohort_week"]
        exp = (
            j.drop_duplicates(["cohort_week", "week_offset", "user_id"])
            .groupby(["cohort_week", "week_offset"])
            .size()
            .reset_index(name="n_users")
            .sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # offset-0 rows are cohort sizes and sum to the user universe
        assert (
            got[got["week_offset"] == 0]["n_users"].sum()
            == df["user_id"].nunique()
        )


class TestProfileTable:
    def test_nulls_and_types(self, ray_session):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages.profile import profile_table

        t = pa.table(
            {
                "x": pa.array([1.5, None, 2.5, 2.5, None], pa.float64()),
                "s": pa.array(["a", "b", None, "a", "b"], pa.string()),
                "i": pa.array([7, 7, 7, 7, 7], pa.int64()),
            }
        )
        out = profile_table(rd.from_arrow(t).repartition(3), ["x", "s", "i"])
        out = out.set_index("column")
        assert out.loc["x", "n"] == 5 and out.loc["x", "n_null"] == 2
        assert out.loc["x", "n_distinct"] == 2  # nulls excluded
        assert out.loc["x", "min_value"] == 1.5
        assert out.loc["x", "max_value"] == 2.5
        assert abs(out.loc["x", "mean_value"] - round(6.5 / 3, 6)) < 1e-12
        assert out.loc["s", "n_distinct"] == 2
        assert np.isnan(out.loc["s", "mean_value"])
        assert out.loc["i", "n_distinct"] == 1
        assert out.loc["i", "mean_value"] == 7.0

    def test_unknown_column_raises(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data as rd
        from zonal_stats_toolkit_ray.stages.profile import profile_table

        ds = rd.from_pandas(pd.DataFrame({"a": [1]}))
        with pytest.raises(KeyError):
            profile_table(ds, ["nope"])
