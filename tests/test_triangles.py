"""Triangle counting (stages/triangles.py): equality to brute force on
random graphs, hub-graph skew, normalization (direction / multi-edge /
self-loop), and known closed forms."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _run(ray_session, edges_df, **kw):
    import ray.data as rd
    from zonal_stats_toolkit_ray.stages.triangles import triangle_stats

    ds = rd.from_pandas(edges_df).repartition(7)
    return (
        triangle_stats(ds, **kw).sort_values("node").reset_index(drop=True)
    )


def test_complete_graph_k6(ray_session):
    # K6: every node has degree 5, C(5,2)=10 triangles, clustering 1.0
    i, j = np.triu_indices(6, k=1)
    df = pd.DataFrame({"src": i.astype(np.int64), "dst": j.astype(np.int64)})
    out = _run(ray_session, df)
    assert out["degree"].tolist() == [5] * 6
    assert out["triangles"].tolist() == [10] * 6
    assert out["clustering"].tolist() == [1.0] * 6


def test_random_graph_matches_brute(ray_session):
    from zonal_stats_toolkit_ray.stages.triangles import (
        triangle_stats_reference,
    )

    rng = np.random.default_rng(6)
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 60, 900).astype(np.int64),
            "dst": rng.integers(0, 60, 900).astype(np.int64),
        }
    )
    out = _run(ray_session, df)
    exp = triangle_stats_reference(df)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_normalization_direction_multi_self(ray_session):
    # (1,2) twice, (2,1) once, self-loop (3,3): simple graph is one edge
    df = pd.DataFrame(
        {"src": [1, 1, 2, 3], "dst": [2, 2, 1, 3]}, dtype=np.int64
    )
    out = _run(ray_session, df)
    assert out["node"].tolist() == [1, 2]
    assert out["degree"].tolist() == [1, 1]
    assert out["triangles"].tolist() == [0, 0]


def test_hub_graph_wedges_bounded_by_degree_orientation(ray_session):
    from zonal_stats_toolkit_ray.stages.triangles import (
        triangle_stats_reference,
    )

    # star hub 0 — {1..400} plus a ring among leaves: id-orientation would
    # enumerate C(400,2) wedges at the hub; degree orientation points
    # every spoke INTO the hub (leaves have lower degree), so the hub
    # apexes no wedges
    n = 400
    leaves = np.arange(1, n + 1, dtype=np.int64)
    df = pd.DataFrame(
        {
            "src": np.concatenate([np.zeros(n, dtype=np.int64), leaves]),
            "dst": np.concatenate([leaves, (leaves % n) + 1]),
        }
    )
    out = _run(ray_session, df)
    exp = triangle_stats_reference(df)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # ring + star: each consecutive leaf pair + hub closes a triangle
    assert out.loc[out["node"] == 0, "triangles"].iloc[0] == n
