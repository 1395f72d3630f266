"""Round-4 wave-40: the HLL-vs-exact audit query — pure-python HLL twin
(same hash, registers, estimator) plus error-bound checks."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, user_id, event_type):
    n = len(user_id)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.arange(n, dtype=np.int64)).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.asarray(user_id, dtype=np.int64)),
            "event_type": pa.array(list(event_type), pa.string()),
            "value": pa.array([None] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        tmp_path / "events.parquet",
    )


def _py_hll(tbl: pa.Table, key_val: str, p: int = 12) -> float:
    """Reference HLL over one group's user_id column — same hash_columns
    mixer, same register/rank arithmetic, same bias/linear-count rules."""
    from feast_ray.grouped import hash_columns
    from feast_ray.stages.sketch import _hll_estimate

    sub = tbl.filter(pa.compute.equal(tbl["event_type"], key_val))
    hv = hash_columns(sub, ["user_id"])
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    reg_idx = (hv & np.uint64(m - 1)).astype(np.int64)
    w = hv >> np.uint64(p)
    nbits = 64 - p
    rho = np.where(w != 0,
                   nbits - np.floor(np.log2(np.maximum(
                       w.astype(np.float64), 1.0))).astype(np.int64),
                   nbits + 1)
    np.maximum.at(regs, reg_idx, rho.astype(np.uint8))
    return _hll_estimate(regs)


def test_hll_audit_matches_python_twin_and_bounds(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_approx_distinct_users

    rng = np.random.default_rng(10)
    n = 20000
    users = rng.integers(0, 3000, n)
    types = rng.choice(["a", "b"], n)
    _write_events(tmp_path, users, types)
    out = (q_approx_distinct_users(str(tmp_path)).to_pandas()
           .set_index("event_type").sort_index())

    tbl = pq.read_table(tmp_path / "events.parquet",
                        columns=["event_type", "user_id"])
    for ty in ("a", "b"):
        exact = len(set(users[types == ty].tolist()))
        assert out.loc[ty, "n_exact"] == exact
        # deterministic estimate: exact float equality with the twin
        assert out.loc[ty, "hll_estimate"] == _py_hll(tbl, ty)
        # p=12 error bound (~1.6%; allow 4 sigma)
        assert abs(out.loc[ty, "rel_error"]) < 0.07
        assert out.loc[ty, "rel_error"] == pytest.approx(
            (out.loc[ty, "hll_estimate"] - exact) / exact, abs=1e-12)
