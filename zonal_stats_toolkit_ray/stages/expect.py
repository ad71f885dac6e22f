"""Data-quality expectations — the validation pass a production pipeline
runs before (or after) every load: declarative per-column rules checked
distributed, one violations row per rule.

Rules (tuples, so an SQL twin can be GENERATED from the same constants —
the pii_scrub pattern):

* ``("not_null", col)``               — NULL values
* ``("in_range", col, lo, hi)``       — non-null values outside [lo, hi]
* ``("accepted_values", col, vals)``  — non-null values not in ``vals``
* ``("matches_regex", col, pat)``     — non-null values not matching
* ``("unique", col)``                 — rows − distinct values (NULLs are
  rows but at most one distinct, SQL COUNT DISTINCT semantics)

Shape: all scan rules evaluate in ONE pass of fixed-size per-batch
partials (one int64 per rule per block — the mergeable-sketch shape);
each ``unique`` rule adds one pruned single-column distinct aggregate
(the stages/profile.py shape).  Nothing row-sized ever leaves the
workers.

Reference parity: extends the reference's config-time validation
(runner.py:87-261, which checks files/layers/fields before running) to
data-content validation (SURVEY §2 graft extensions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def rule_label(rule: tuple) -> str:
    kind, col = rule[0], rule[1]
    if kind == "in_range":
        return f"in_range({col},{rule[2]},{rule[3]})"
    if kind == "accepted_values":
        return f"accepted_values({col})"
    if kind == "matches_regex":
        return f"matches_regex({col})"
    return f"{kind}({col})"


def _violations_batch(b: pa.Table, *, scan_rules: list[tuple]) -> pa.Table:
    labels, counts = [], []
    for rule in scan_rules:
        kind, col = rule[0], rule[1]
        c = b[col]
        if kind == "not_null":
            v = len(b) - pc.count(c, mode="only_valid").as_py()
        elif kind == "in_range":
            lo, hi = rule[2], rule[3]
            bad = pc.or_(pc.less(c, lo), pc.greater(c, hi))
            v = pc.sum(pc.cast(pc.fill_null(bad, False), pa.int64())).as_py() or 0
        elif kind == "accepted_values":
            ok = pc.is_in(c, value_set=pa.array(list(rule[2]), type=c.type))
            bad = pc.and_(pc.is_valid(c), pc.invert(ok))
            v = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
        elif kind == "matches_regex":
            m = pc.match_substring_regex(pc.cast(c, pa.string()), rule[2])
            bad = pc.and_(pc.is_valid(c), pc.invert(pc.fill_null(m, False)))
            v = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
        else:  # pragma: no cover
            raise ValueError(f"unknown scan rule {kind}")
        labels.append(rule_label(rule))
        counts.append(int(v))
    return pa.table(
        {
            "rule": pa.array(labels, pa.string()),
            "v": pa.array(counts, pa.int64()),
        }
    )


def expect(ds, rules: list[tuple]) -> pd.DataFrame:
    """Evaluate ``rules`` → DataFrame(rule, violations, passed), in rule
    order.  See the module docstring for the execution shape."""
    from .joins import distinct_rows

    scan_rules = [r for r in rules if r[0] != "unique"]
    uniq_rules = [r for r in rules if r[0] == "unique"]
    results: dict[str, int] = {}
    if scan_rules:
        cols = sorted({r[1] for r in scan_rules})
        part = (
            ds.select_columns(cols)
            .map_batches(
                _violations_batch,
                batch_format="pyarrow",
                fn_kwargs={"scan_rules": scan_rules},
            )
            .to_pandas()  # rules × blocks rows
        )
        for rule, g in part.groupby("rule"):
            results[rule] = int(g["v"].sum())
    for r in uniq_rules:
        col = r[1]
        total = ds.count()
        distinct = distinct_rows(ds.select_columns([col]), [col]).count()
        results[rule_label(r)] = int(total - distinct)
    labels = [rule_label(r) for r in rules]
    v = np.array([results[l] for l in labels], dtype=np.int64)
    return pd.DataFrame({"rule": labels, "violations": v, "passed": v == 0})
