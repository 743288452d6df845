"""Spark-vs-DuckDB result comparison — the driver's correctness
contract, factored out so both the CLI gate (tools/check_oracle.py) and
the staged-entry tests (tests/test_staged.py) apply the identical
normalization: columns sorted by name, rows sorted by their normalized
string form, doubles to 9 significant digits, NaN/None unified,
timestamps to ISO strings.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd


def norm_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(norm_cell(x) for x in seq) + "]"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _norm_rows(df: pd.DataFrame) -> list[str]:
    df = df[sorted(df.columns)]
    return sorted(
        "|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256("\n".join(_norm_rows(df)).encode()).hexdigest()[:16]


def compare_frames(sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    """Problems list, empty when the frames match under the driver's
    row-count + column-set + order-insensitive value-hash contract.
    On a hash mismatch the first few one-side-only rows are included
    for diagnosis."""
    problems: list[str] = []
    if len(sdf) != len(ddf):
        problems.append(f"rows {len(sdf)} != {len(ddf)}")
    if sorted(sdf.columns) != sorted(ddf.columns):
        problems.append(f"cols {sorted(sdf.columns)} != {sorted(ddf.columns)}")
    elif value_hash(sdf) != value_hash(ddf):
        problems.append("value hash mismatch")
        s_rows, d_rows = _norm_rows(sdf), _norm_rows(ddf)
        s_only = [r for r in s_rows if r not in set(d_rows)][:3]
        d_only = [r for r in d_rows if r not in set(s_rows)][:3]
        if s_only:
            problems.append(f"spark-only: {s_only}")
        if d_only:
            problems.append(f"duckdb-only: {d_only}")
    return problems
