"""Declarative data-quality expectations over a Dataset — the batch analog
of upstream Feast's feature-validation surface (Feast wires logged feature
frames to Great Expectations via ``feast.dqm`` / ``ValidationReference``;
this engine evaluates the same class of column expectations natively on the
streaming pipeline, one vectorized pass, no row materialization).

An :class:`Expectation` is a (name, column, kind, params) tuple; ``validate``
compiles the suite to ONE ``map_batches`` scan emitting int64 partial
counters per batch (rows seen, violations) which a tiny grouped exchange
sums — the classic map-side-combined aggregate, so the shuffle carries
O(#expectations x #blocks) one-row partials regardless of data size.
``unique`` expectations are the exception: exact uniqueness needs the
column's values co-located, so each one costs one hash exchange on that
column (map-side combined to distinct-values-per-batch first).

Kinds:
- ``not_null``    — NULL values are violations.
- ``between``     — values outside [lo, hi] are violations (NULLs pass;
                    pair with ``not_null`` to forbid them).
- ``in_set``      — values outside ``allowed`` are violations (NULLs pass).
- ``matches``     — values not matching the regex are violations (NULLs
                    pass; RE2 syntax via pyarrow).
- ``unique``      — each surplus duplicate row is a violation
                    (n_rows - n_distinct, NULLs count as a value).

Output: one row per expectation — (expectation, column, n_rows,
n_violations, passed) — stable, tiny, SQL-twinable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class Expectation:
    name: str
    column: str
    kind: str  # not_null | between | in_set | matches | unique
    lo: Optional[float] = None
    hi: Optional[float] = None
    allowed: tuple = field(default_factory=tuple)
    pattern: Optional[str] = None

    def __post_init__(self):
        kinds = ("not_null", "between", "in_set", "matches", "unique")
        if self.kind not in kinds:
            raise ValueError(f"kind must be one of {kinds}, got {self.kind!r}")
        if self.kind == "between" and self.lo is None and self.hi is None:
            raise ValueError("between expectation needs lo and/or hi")
        if self.kind == "in_set" and not self.allowed:
            raise ValueError("in_set expectation needs a non-empty allowed set")
        if self.kind == "matches" and not self.pattern:
            raise ValueError("matches expectation needs a regex pattern")


def _violations(exp: Expectation, col: pa.ChunkedArray) -> int:
    """Vectorized violation count for one scalar expectation on one batch."""
    if exp.kind == "not_null":
        return col.null_count
    valid = col.drop_null()
    if len(valid) == 0:
        return 0
    if exp.kind == "between":
        bad = pa.array(np.zeros(len(valid), dtype=bool))
        if exp.lo is not None:
            bad = pc.or_(bad, pc.less(valid, exp.lo))
        if exp.hi is not None:
            bad = pc.or_(bad, pc.greater(valid, exp.hi))
        return int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
    if exp.kind == "in_set":
        ok = pc.is_in(valid, value_set=pa.array(list(exp.allowed)))
        return len(valid) - int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
    if exp.kind == "matches":
        ok = pc.match_substring_regex(valid, exp.pattern)
        return len(valid) - int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
    raise AssertionError(exp.kind)


def validate(ds, expectations: Sequence[Expectation], *, num_buckets=None):
    """Evaluate an expectation suite; returns a Dataset with one row per
    expectation: (expectation, column, n_rows, n_violations, passed)."""
    from feast_ray.stages.stats import partial_count_sum, sum_by

    expectations = list(expectations)
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError("expectation names must be unique")
    scalar = [e for e in expectations if e.kind != "unique"]
    uniq = [e for e in expectations if e.kind == "unique"]

    outs = []
    if scalar:

        def partial(t: pa.Table) -> pa.Table:
            rows = [
                (e.name, e.column, t.num_rows, _violations(e, t[e.column].combine_chunks()))
                for e in scalar
            ]
            return pa.table(
                {
                    "expectation": pa.array([r[0] for r in rows], pa.string()),
                    "column": pa.array([r[1] for r in rows], pa.string()),
                    "n_rows": pa.array([r[2] for r in rows], pa.int64()),
                    "n_violations": pa.array([r[3] for r in rows], pa.int64()),
                }
            )

        partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        outs.append(
            sum_by(partials, ["expectation", "column"], ["n_rows", "n_violations"],
                   num_buckets=num_buckets)
        )

    for e in uniq:
        counts = partial_count_sum(
            ds.select_columns([e.column]), [e.column], count_name="__c",
            num_buckets=num_buckets,
        )

        def upartial(t: pa.Table, _e=e) -> pa.Table:
            c = t["__c"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "expectation": pa.array([_e.name], pa.string()),
                    "column": pa.array([_e.column], pa.string()),
                    "n_rows": pa.array([int(c.sum())], pa.int64()),
                    "n_violations": pa.array([int(c.sum()) - len(c)], pa.int64()),
                }
            )

        up = counts.map_batches(upartial, batch_format="pyarrow", zero_copy_batch=True)
        outs.append(
            sum_by(up, ["expectation", "column"], ["n_rows", "n_violations"],
                   num_buckets=num_buckets)
        )

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column("passed", pc.equal(t["n_violations"], 0))

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
