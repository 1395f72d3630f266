"""Session-scoped Ray + shared fixtures for the test suite."""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from feast_ray.fixtures import gen_features_numeric, gen_spine, gen_transcripts  # noqa: E402


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def transcripts_tbl() -> pa.Table:
    return gen_transcripts(n_convs=40, mean_turns=10, seed=42, n_hot=1, hot_turns=120)


@pytest.fixture(scope="session")
def features_tbl(transcripts_tbl) -> pa.Table:
    return gen_features_numeric(transcripts_tbl, seed=43)


@pytest.fixture(scope="session")
def spine_tbl(transcripts_tbl) -> pa.Table:
    return gen_spine(transcripts_tbl, seed=44)
