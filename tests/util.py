"""Comparison helpers: align engine output and oracle on a row key, then
assert per-column equality (allclose for floats, exact otherwise)."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd


def to_pdf(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def assert_frames_match(
    got,
    want,
    *,
    row_key: Sequence[str],
    cols: Sequence[str],
    atol: float = 1e-9,
    rtol: float = 1e-9,
):
    g = to_pdf(got).sort_values(list(row_key), kind="stable").reset_index(drop=True)
    w = to_pdf(want).sort_values(list(row_key), kind="stable").reset_index(drop=True)
    assert len(g) == len(w), f"row count {len(g)} != {len(w)}"
    for c in cols:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
            ga = pd.to_numeric(gv, errors="coerce").to_numpy(dtype=float)
            wa = pd.to_numeric(wv, errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(ga) & np.isnan(wa)
            ok = both_nan | np.isclose(ga, wa, atol=atol, rtol=rtol, equal_nan=True)
            bad = np.flatnonzero(~ok)
            assert len(bad) == 0, (
                f"column {c}: {len(bad)} mismatches, first at row {bad[0]}: "
                f"{ga[bad[0]]} != {wa[bad[0]]}\nrow: {g.iloc[bad[0]].to_dict()}"
            )
        else:
            gn, wn = gv.isna(), wv.isna()
            assert (gn == wn).all(), f"column {c}: null mask mismatch"
            eq = (gv[~gn].reset_index(drop=True) == wv[~wn].reset_index(drop=True))
            assert eq.all(), (
                f"column {c}: value mismatch at {np.flatnonzero(~eq.to_numpy())[:5]}"
            )
