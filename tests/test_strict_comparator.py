"""Pin the driver-strict comparator (VERDICT r5 item 2): the in-repo
contract replica must fail on exactly the two bug classes that shipped
builder-green / driver-red in round 5 — signed-zero drift (+0.0 vs
-0.0, bitwise-different but ==-equal) and dtype drift (DuckDB HUGEINT
promotion materializing as float64 against Spark's int64)."""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "verify_contract", os.path.join(ROOT, "scripts", "verify_contract.py")
)
vc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vc)


def test_signed_zero_fails_bitwise():
    got = pd.Series(np.array([1.5, 0.0], dtype=np.float64))
    want = pd.Series(np.array([1.5, -0.0], dtype=np.float64))
    # value-equal under ==, must be RED under the strict comparator
    assert bool((got.values == want.values).all())
    assert not vc._col_equal(got, want)
    assert vc._col_equal(got, got.copy())


def test_dtype_drift_fails():
    got = pd.Series(np.array([7, 9], dtype=np.int64))
    want = pd.Series(np.array([7.0, 9.0], dtype=np.float64))  # HUGEINT->float64
    # numpy cross-casts these equal; the strict comparator must not
    assert bool((got.values == want.values).all())
    assert not vc._col_equal(got, want)


def test_exact_paths_still_green():
    ints = pd.Series(np.array([1, 2, 3], dtype=np.int64))
    assert vc._col_equal(ints, ints.copy())
    objs = pd.Series(["a", None, "c"], dtype=object)
    assert vc._col_equal(objs, objs.copy())
    floats = pd.Series(np.array([0.1, np.nan, -0.0], dtype=np.float64))
    assert vc._col_equal(floats, floats.copy())
    f32 = pd.Series(np.array([1.25, -0.0], dtype=np.float32))
    assert vc._col_equal(f32, f32.copy())
    assert not vc._col_equal(f32, pd.Series(np.array([1.25, 0.0], dtype=np.float32)))
