"""Code-enforced bounded-universe guard (round 5, VERDICT r4 #4).

The value-universe statistics family documents a bounded-universe regime;
these tests pin that the regime is now enforced in CODE: a continuous
value column whose distinct universe exceeds ``max_universe`` fails fast
with guidance naming the salted-percentile alternative, BEFORE anything
universe-sized reaches the driver, while bounded inputs are unaffected.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _continuous_df(n=200_000, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 8, n).astype(str),
            "v": rng.normal(0, 1, n),  # effectively all-distinct
            "w": rng.uniform(0.5, 2.0, n),
            "y": rng.integers(0, 2, n),
        }
    )


class TestUniverseGuard:
    def test_weighted_median_fails_fast_with_guidance(self, ray_session):
        from zonal_stats_toolkit_ray.stages.rank import weighted_median_by_group

        ds = rd.from_pandas(_continuous_df()).repartition(8)
        with pytest.raises(ValueError, match="salted_group_percentiles"):
            weighted_median_by_group(
                ds, key_col="k", value_col="v", weight_col="w",
                max_universe=50_000,
            )

    def test_gini_auc_ks_qt_winsor_guarded(self, ray_session):
        from zonal_stats_toolkit_ray.stages.bivar import auc_by_group
        from zonal_stats_toolkit_ray.stages.normalize import quantile_transform
        from zonal_stats_toolkit_ray.stages.profile import ks_test
        from zonal_stats_toolkit_ray.stages.rank import (
            gini_by_group,
            winsorized_mean_by_group,
        )

        ds = rd.from_pandas(_continuous_df()).repartition(8)
        for call in (
            lambda: gini_by_group(
                ds, key_col="k", value_col="v", max_universe=50_000
            ),
            lambda: winsorized_mean_by_group(
                ds, key_col="k", value_col="v", max_universe=50_000
            ),
            lambda: auc_by_group(
                ds, group_col="k", label_col="y", score_col="v",
                max_universe=50_000,
            ),
            lambda: ks_test(
                ds, value_col="v", seg_col="k", ref_segment="0",
                max_universe=50_000,
            ),
            lambda: quantile_transform(
                ds, id_col="event_id", value_col="v", max_universe=50_000
            ),
        ):
            with pytest.raises(ValueError, match="max_universe"):
                call()

    def test_bounded_universe_unaffected(self, ray_session):
        # integer-valued (bounded) inputs pass the guard and stay exact
        from zonal_stats_toolkit_ray.stages.rank import gini_by_group

        df = _continuous_df(20_000)
        df["v"] = np.round(df["v"] * 10).astype(np.int64).astype(np.float64)
        out = gini_by_group(
            rd.from_pandas(df).repartition(4), key_col="k", value_col="v"
        )
        assert len(out) == 8 and out["n"].sum() == 20_000
