"""Round-4 wave-36: trailing cross-table window join boundary semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DAY = 86_400_000_000
W = 7 * DAY


def _write_events(tmp_path, ts_us, user_id, event_type, value):
    n = len(ts_us)
    pq.write_table(
        pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.asarray(ts_us, dtype=np.int64)).cast(
                pa.timestamp("us")),
            "user_id": pa.array(np.asarray(user_id, dtype=np.int64)),
            "event_type": pa.array(list(event_type), pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }),
        tmp_path / "events.parquet",
    )


def test_trailing_window_boundaries(ray_session, tmp_path):
    from feast_ray.pipelines.queries import q_trailing_purchases_at_click

    click_t = 10 * DAY
    ts = [click_t,            # event 0: the click
          click_t - W,        # event 1: purchase exactly 7d before -> IN
          click_t - W - 1,    # event 2: one us earlier -> OUT
          click_t - 1,        # event 3: just before the click -> IN
          click_t,            # event 4: same instant as the click -> OUT
          click_t + 1]        # event 5: future -> OUT
    types = ["click"] + ["purchase"] * 5
    vals = [None, 1.00, 100.0, 2.00, 100.0, 100.0]
    _write_events(tmp_path, ts, [7] * 6, types, vals)
    out = q_trailing_purchases_at_click(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["n_purch_7d"][0] == 2           # events 1 and 3 only
    assert out["sum_cents_7d"][0] == 100 + 200
    # a click by a user with no purchases still emits a zero row
    tmp2 = tmp_path / "nop"
    tmp2.mkdir()
    _write_events(tmp2, [0], [1], ["click"], [None])
    out2 = q_trailing_purchases_at_click(str(tmp2)).to_pandas()
    assert out2["n_purch_7d"][0] == 0 and out2["sum_cents_7d"][0] == 0
