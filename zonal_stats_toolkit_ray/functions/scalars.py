"""Scalar helpers shared across stages — the reference's small pure
functions (SURVEY.md §2.7): percentile-key formatting, operation-token
parsing, group labeling, and the engine's null-safe group-key encoding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Sentinel for a null group_value when a non-null shuffle key is needed.
# Real values get a constant "v:" prefix; the null sentinel starts with
# "~" (0x7E > "v" 0x76) so it sorts after EVERY prefixed key — reproducing
# the reference's (is None, str(value)) order (quirk Q8, runner.py:981-997).
# The prefixes are printable ASCII on purpose: pandas' object-string
# hashtable compares keys as C strings, so embedded NUL bytes make ALL
# keys compare equal (observed: groupby merged every "\x00…" key into one
# group).
GROUP_KEY_NULL = "~null~"
_KEY_PREFIX = "v:"

# the reference's validated operation set (runner.py:23-38)
VALID_OPERATIONS = {
    "avg",
    "stdev",
    "min",
    "max",
    "sum",
    "total_count",
    "valid_count",
    "median",
    "p5",
    "p10",
    "p25",
    "p75",
    "p90",
    "p95",
}


def percentile_keys(plist) -> list[str]:
    """p-list → column keys: 5.0 → "p5", 2.5 → "p2.5" (runner.py:289-292)."""
    return [f"p{int(p) if float(p).is_integer() else p}" for p in plist]


def parse_operations(ops: list[str]) -> tuple[list[str], list[float]]:
    """Normalize operation tokens and mine the percentile list — quirk Q1:
    the list is *validated* but only the ``pN`` entries affect output
    (runner.py:198-212, 945-949)."""
    norm = [op.strip().lower() for op in ops]
    for op in norm:
        if op in VALID_OPERATIONS:
            continue
        if op.startswith("p") and op[1:].replace(".", "", 1).isdigit():
            continue
        raise ValueError(f"invalid operation: {op!r}")
    plist = [
        float(op[1:])
        for op in norm
        if op.startswith("p") and op[1:].replace(".", "", 1).isdigit()
    ]
    return norm, plist


def group_label(value) -> str:
    """None → "" else str(value) (runner.py:984-985, 996)."""
    return "" if value is None else str(value)


def encode_group_key(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Nullable group_value column → non-null sortable key strings.

    Real values get a "\\x00" prefix; nulls map to GROUP_KEY_NULL which
    sorts after every prefixed key — so a plain string sort of keys equals
    the reference's (is None, str(value)) row order."""
    vals = arr.to_pylist() if isinstance(arr, (pa.ChunkedArray, pa.Array)) else arr
    return np.array(
        [GROUP_KEY_NULL if v is None else _KEY_PREFIX + str(v) for v in vals],
        dtype=object,
    )


def decode_group_key(key: str):
    if key == GROUP_KEY_NULL:
        return None
    return key[len(_KEY_PREFIX):] if key.startswith(_KEY_PREFIX) else key
