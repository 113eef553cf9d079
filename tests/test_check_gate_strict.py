"""The gate replica must be RED exactly when the driver would be:
pre-normalization dtype drift (e.g. DuckDB HUGEINT surfacing as
float64/object where Spark emits int64) is a FAILURE, not a warning —
the int64 coercion in normalize() would hide it, the driver's hash
comparison would not (VERDICT r4 'What's wrong #3')."""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_gate import dtype_drift, normalize  # noqa: E402


def test_seeded_hugeint_drift_is_flagged():
    sp = pd.DataFrame({"k": ["a"], "n": pd.array([1], dtype="int64")})
    dk = pd.DataFrame({"k": ["a"], "n": pd.array([1.0], dtype="float64")})
    assert dtype_drift(sp, dk) == [("n", "int64", "float64")]
    # and the value comparison alone would have masked it (1 == 1.0
    # compares equal post-normalize) — that's WHY the drift must fail
    a, b = normalize(sp), normalize(dk)
    assert a["n"].eq(b["n"]).all()


def test_int_width_drift_is_flagged():
    sp = pd.DataFrame({"n": pd.array([1], dtype="int64")})
    dk = pd.DataFrame({"n": pd.array([1], dtype="int32")})
    assert dtype_drift(sp, dk) == [("n", "int64", "int32")]


def test_matching_dtypes_pass():
    sp = pd.DataFrame({"k": ["a"], "n": pd.array([1], dtype="int64")})
    dk = pd.DataFrame({"k": ["a"], "n": pd.array([1], dtype="int64")})
    assert dtype_drift(sp, dk) == []


def test_datetime_resolution_is_exempt():
    sp = pd.DataFrame({"t": pd.to_datetime(["2024-01-01"]).astype("datetime64[ns]")})
    dk = pd.DataFrame({"t": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]")})
    assert dtype_drift(sp, dk) == []
