"""ROLLUP aggregate: every grouping level from one input pass."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from zonal_stats_toolkit_ray.stages.rollup import rollup_sum_count


def test_rollup_three_keys_matches_duckdb(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], 500),
            "b": rng.choice(["p", "q", "r"], 500),
            "c": rng.choice(["1", "2"], 500),
            "v": rng.integers(0, 100, 500),
        }
    )
    got = rollup_sum_count(
        rd.from_pandas(df).repartition(5), keys=["a", "b", "c"], value_col="v"
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """
        SELECT coalesce(a, '__ALL__') AS a, coalesce(b, '__ALL__') AS b,
               coalesce(c, '__ALL__') AS c,
               count(*) AS n, CAST(sum(v) AS DOUBLE) AS sum_v
        FROM t GROUP BY ROLLUP(a, b, c) ORDER BY a, b, c, n
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    # level count: distinct(a,b,c) + distinct(a,b) + distinct(a) + 1
    n_levels = (
        df.groupby(["a", "b", "c"]).ngroups
        + df.groupby(["a", "b"]).ngroups
        + df["a"].nunique()
        + 1
    )
    assert len(got) == n_levels


class TestPivotCounts:
    def test_pivot_matches_pandas_and_fills_zero(self, ray_session):
        import ray.data as rd

        from zonal_stats_toolkit_ray.stages.rollup import pivot_counts

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "k": rng.choice(["s1", "s2", "s3"], 1000),
                "c": rng.choice(["a", "b"], 1000),
            }
        )
        got = pivot_counts(
            rd.from_pandas(df).repartition(5),
            index_col="k",
            columns_col="c",
            categories=["a", "b", "never_seen"],
        )
        want = df.pivot_table(index="k", columns="c", aggfunc="size", fill_value=0)
        for _, row in got.iterrows():
            assert row["n_a"] == want.loc[row["k"], "a"]
            assert row["n_b"] == want.loc[row["k"], "b"]
            assert row["n_never_seen"] == 0
            assert row["total"] == row["n_a"] + row["n_b"]

    def test_pivot_unknown_category_raises(self, ray_session):
        import ray.data as rd

        from zonal_stats_toolkit_ray.stages.rollup import pivot_counts

        df = pd.DataFrame({"k": ["x"], "c": ["surprise"]})
        with pytest.raises(ValueError, match="surprise"):
            pivot_counts(
                rd.from_pandas(df), index_col="k", columns_col="c", categories=["a"]
            )


class TestCube:
    def test_cube_matches_duckdb(self, ray_session):
        from zonal_stats_toolkit_ray.stages.rollup import cube_sum_count

        rng = np.random.default_rng(13)
        df = pd.DataFrame(
            {
                "a": rng.choice(["x", "y"], 500),
                "b": rng.choice(["p", "q", "r"], 500),
                "v": rng.integers(0, 100, 500),
            }
        )
        got = cube_sum_count(
            rd.from_pandas(df).repartition(4), keys=["a", "b"], value_col="v"
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql(
            """SELECT coalesce(a,'__ALL__') a, coalesce(b,'__ALL__') b,
                      count(*) n, CAST(sum(v) AS DOUBLE) sum_v
               FROM t GROUP BY CUBE(a,b) ORDER BY a,b,n"""
        ).df()
        want["n"] = want["n"].astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestStringAgg:
    def test_matches_duckdb_with_hot_key(self, ray_session):
        from zonal_stats_toolkit_ray.stages.rollup import string_agg_sorted

        rng = np.random.default_rng(19)
        n = 30_000
        # 90% of rows in one key -> the range sort must split it
        keys = np.where(rng.random(n) < 0.9, "hot", rng.choice(["a", "b"], n))
        df = pd.DataFrame({"k": keys, "v": rng.integers(0, 50, n).astype(str)})
        got = string_agg_sorted(
            rd.from_pandas(df).repartition(12), key_col="k", val_col="v"
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql(
            "SELECT k, string_agg(v, ',' ORDER BY v) agg, count(*) n "
            "FROM t GROUP BY k ORDER BY k"
        ).df()
        want["n"] = want["n"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
