"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or in
feast_ray) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``      — flagship per-entity feature pipeline on sf0.001.
- ``queries()``    — one callable per implemented operator family
                     (SURVEY.md §2); takes ``sf_dir``.
- ``oracle_sql()`` — matching DuckDB SQL per query (same column names);
                     omitted only for genuinely non-SQL-expressible ops.
"""

from __future__ import annotations

from feast_ray.sources.parquet import read_pq

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: sessionized, windowed, as-of-joined per-event feature
    vectors over the sf0.001 events stream (the get_historical_features-
    style backfill of SURVEY §3.1/§3.2)."""
    from feast_ray.pipelines.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    from feast_ray.stages.windows import (
        Lag,
        Lead,
        RollingRows,
        RollingTime,
        Sessionize,
        add_window_features,
    )
    import ray.data as rd

    ds = read_pq(f"{sf_dir}/events.parquet")
    out = add_window_features(
        ds,
        key="user_id",
        ts_col="ts",
        order_cols=["ts", "event_id"],
        specs=[
            Lag("value", 1),
            Lead("value", 1),
            RollingRows("value", 5, aggs=("count", "sum", "mean", "last")),
            RollingTime("value", 3600 * 1_000_000, aggs=("count", "mean")),
            Sessionize(1800 * 1_000_000),
        ],
    )
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    # core-first ordering: a driver that samples the registry always covers
    # the SURVEY §2 operator ledger before the derived-analytics long tail
    from feast_ray.pipelines.queries import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from feast_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
