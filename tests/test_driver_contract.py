"""Simulate the driver exactly: a FRESH process does ray.init, imports
__ray_entry__, and calls entry() + sample queries.  Catches any
library-side ray.init()/shutdown() contract violations."""

import json
import os
import subprocess
import sys

SCRIPT = r"""
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
import importlib.util, sys
spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
mod = importlib.util.module_from_spec(spec)
sys.modules["__ray_entry__"] = mod
spec.loader.exec_module(mod)

res = mod.entry()
import pandas as pd
assert len(res) >= 0 and "group_value" in res.columns

q = mod.queries()
o = mod.oracle_sql()
assert set(o) <= set(q), "every oracle key must have a query"
out = q["zonal_grid_stats"]("/root/testdata/sf0.001")
n1 = len(out if isinstance(out, pd.DataFrame) else out.to_pandas())
out2 = q["dedup_exact"]("/root/testdata/sf0.001")
n2 = len(out2 if isinstance(out2, pd.DataFrame) else out2.to_pandas())
assert ray.is_initialized(), "queries must not shut ray down"
print({"entry_rows": len(res), "zonal_grid": n1, "dedup": n2, "n_queries": len(q), "n_oracles": len(o)})
ray.shutdown()
"""


def test_driver_contract_fresh_process():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-3000:]
    last = out.stdout.strip().splitlines()[-1]
    assert "entry_rows" in last, out.stdout
