"""window_ranks: distributed per-key window functions."""

import numpy as np
import pandas as pd
import pandas.testing as pt

import ray.data as rd

from zonal_stats_toolkit_ray.stages.winfunc import window_ranks, window_ranks_ref


def _cmp(ds, **kw):
    got = (
        window_ranks(ds, **kw)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = (
        window_ranks_ref(ds, **kw)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pt.assert_frame_equal(got, ref, check_like=True)
    return got


class TestWindowRanks:
    def test_events_with_ties(self, ray_session):
        import pyarrow.compute as pc
        import pyarrow as pa

        ds = rd.read_parquet(
            "/root/testdata/sf0.001/events.parquet",
            columns=["event_id", "user_id", "value"],
        )

        def fl(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index("value"), "value", pc.floor(t["value"])
            )

        got = _cmp(ds.map_batches(fl, batch_format="pyarrow"))
        assert (got["rnk"] != got["row_num"]).any()  # ties exercised

    def test_hot_key_tie_block_spanning(self, ray_session):
        # ONE key, many rows, few distinct values → tie groups span blocks
        rng = np.random.default_rng(5)
        n = 30_000
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": np.int64(1),
                "value": rng.integers(0, 7, n).astype(np.float64),
            }
        )
        ds = rd.from_pandas(df).repartition(16)
        got = _cmp(ds)
        # rank of every row with the minimum value is 1
        mn = df["value"].min()
        ids = df.loc[df["value"] == mn, "event_id"]
        assert (got.set_index("event_id").loc[ids, "rnk"] == 1).all()

    def test_all_equal_values_one_key(self, ray_session):
        df = pd.DataFrame(
            {
                "event_id": np.arange(5000, dtype=np.int64),
                "user_id": np.int64(9),
                "value": np.full(5000, 3.5),
            }
        )
        ds = rd.from_pandas(df).repartition(8)
        got = _cmp(ds)
        assert (got["rnk"] == 1).all()
        assert (got["pct_rank"] == 0.0).all()
        assert sorted(got["row_num"]) == list(range(1, 5001))

    def test_single_row_partitions(self, ray_session):
        df = pd.DataFrame(
            {
                "event_id": np.arange(10, dtype=np.int64),
                "user_id": np.arange(10, dtype=np.int64),
                "value": np.linspace(1, 2, 10),
            }
        )
        got = _cmp(rd.from_pandas(df).repartition(4))
        assert (got["pct_rank"] == 0.0).all()
        assert (got["row_num"] == 1).all()

    def test_many_keys_random(self, ray_session):
        rng = np.random.default_rng(12)
        n = 8000
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.integers(0, 50, n),
                "value": rng.integers(0, 20, n).astype(np.float64),
            }
        )
        _cmp(rd.from_pandas(df).repartition(8))


def test_ntile_matches_duckdb_edges(ray_session):
    """NTILE edge shapes: n < t, n == t, n % t != 0, heavy ties."""
    import duckdb
    import ray.data as rd

    from zonal_stats_toolkit_ray.stages.winfunc import window_ranks

    rows = []
    eid = 0
    for key, n in [(1, 2), (2, 4), (3, 7), (4, 13), (5, 1)]:
        for i in range(n):
            rows.append((eid, key, float(i % 3)))  # ties
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "value"])
    got = (
        window_ranks(rd.from_pandas(df).repartition(3), ntile=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)[["event_id", "ntile"]]
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """
        SELECT event_id,
               NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id)
                   AS ntile
        FROM t ORDER BY event_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
