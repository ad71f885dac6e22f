"""ROLLUP aggregate: every grouping level from one input pass."""

import duckdb
import numpy as np
import pandas as pd
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
