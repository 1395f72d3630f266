"""Round-4 wave-38 operators vs brute-force oracles: weekly user overlap,
top-1% value share."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

WEEK = 604_800_000_000


def _write_events(tmp_path, ts_us, user_id, value=None, event_type=None):
    n = len(ts_us)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.asarray(ts_us, dtype=np.int64)).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.asarray(user_id, dtype=np.int64)),
            "event_type": pa.array(event_type or ["e"] * n, pa.string()),
            "value": pa.array(value or [None] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        tmp_path / "events.parquet",
    )


def test_weekly_user_overlap_jaccard(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_weekly_user_overlap

    # week 0: users {0,1,2}; week 1: {1,2,3}; week 2: {9}
    ts = [0, 0, 0, WEEK, WEEK, WEEK, 2 * WEEK]
    users = [0, 1, 2, 1, 2, 3, 9]
    _write_events(tmp_path, ts, users)
    out = (q_weekly_user_overlap(str(tmp_path)).to_pandas()
           .set_index("week_a").sort_index())
    assert out.loc[0, "inter"] == 2                     # {1,2}
    assert out.loc[0, "jaccard"] == pytest.approx(2 / 4)
    assert out.loc[1, "inter"] == 0                     # disjoint
    assert out.loc[1, "jaccard"] == 0.0
    assert out.loc[0, "n_users_a"] == 3 and out.loc[0, "n_users_b"] == 3


def test_top1pct_share_concentration(ray_session, tmp_path):
    from feast_ray.pipelines.queries_ml import q_value_share_top1pct

    # 199 events of 1.00 + 1 whale of 1000.00: p99 disc over 200 rows is
    # the 198th order stat... compute brute force below
    vals = [1.0] * 199 + [1000.0]
    _write_events(tmp_path, list(range(200)), [0] * 200, value=vals)
    out = q_value_share_top1pct(str(tmp_path)).to_pandas()
    c = np.round(np.array(vals) * 100).astype(np.int64)
    cs = np.sort(c)
    p99 = int(cs[int(np.ceil(0.99 * len(cs))) - 1])
    top = int(c[c >= p99].sum())
    assert out["p99_cents"][0] == p99
    assert out["top_cents"][0] == top
    assert out["total_cents"][0] == int(c.sum())
    assert out["top_share"][0] == pytest.approx(top / c.sum(), abs=1e-12)
    # the whale dominates: share far above 1%
    assert out["top_share"][0] > 0.8
