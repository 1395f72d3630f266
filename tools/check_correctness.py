"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf dir via Ray AND its oracle_sql() via DuckDB, then
compare row count, column set, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [only_csv]   (from /root/repo)
       python tools/check_correctness.py [sf_dir] --chunk N

``--chunk N`` runs the battery as ceil(Q/N) SUBPROCESSES of N queries each,
one fresh Ray session per chunk.  Purpose: ray 2.49's core worker has an
intermittent fatal race under long many-dataset sessions (observed twice on
this box: ``reference_count.cc:581 submitted_task_ref_count > 0`` and
``task_manager.cc:930 Tried to complete task that was not pending``); a
crash then loses one chunk, not the whole run, and the chunk is retried
once before being reported.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pdf(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64").where(df[c].notna())
        elif pd.api.types.is_integer_dtype(df[c]) or str(df[c].dtype).startswith(("UInt", "Int")):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str).where(df[c].notna())
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    issues = []
    if len(got) != len(want):
        issues.append(f"rows {len(got)} != {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        issues.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        return issues
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c], w[c]
            if pd.api.types.is_float_dtype(gv):
                ga = gv.to_numpy(dtype=float, na_value=np.nan)
                wa = pd.to_numeric(wv, errors="coerce").to_numpy(dtype=float, na_value=np.nan)
                ok = (np.isnan(ga) & np.isnan(wa)) | np.isclose(ga, wa, atol=1e-9, rtol=0, equal_nan=True)
                exact = (np.isnan(ga) & np.isnan(wa)) | (ga == wa)
                if not ok.all():
                    i = int(np.flatnonzero(~ok)[0])
                    issues.append(f"col {c}: value mismatch row {i}: {ga[i]} != {wa[i]}")
                elif not exact.all():
                    i = int(np.flatnonzero(~exact)[0])
                    issues.append(
                        f"col {c}: HASH-RISK inexact float row {i}: {ga[i]!r} != {wa[i]!r}"
                    )
            else:
                gn, wn = gv.isna(), wv.isna()
                if not (gn.to_numpy() == wn.to_numpy()).all():
                    issues.append(f"col {c}: null mask mismatch")
                    continue
                if not (gv[~gn].to_numpy() == wv[~wn].to_numpy()).all():
                    issues.append(f"col {c}: value mismatch")
    return issues


def _chunked_main(sf_dir: str, chunk: int) -> int:
    import subprocess

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    names = list(entrymod.queries())
    rc = 0
    for i in range(0, len(names), chunk):
        batch = ",".join(names[i : i + chunk])
        for attempt in (1, 2):
            p = subprocess.run(
                [sys.executable, __file__, sf_dir, batch], cwd="/root/repo"
            )
            if p.returncode == 0:
                break
            print(f"[chunk {i // chunk}] attempt {attempt} rc={p.returncode}")
        else:
            rc = 1
    return rc


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if len(sys.argv) > 3 and sys.argv[2] == "--chunk":
        return _chunked_main(sf_dir, int(sys.argv[3]))
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pdf(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: ray query raised: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(sqls[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle sql raised: {e}")
            n_fail += 1
            continue
        issues = compare(name, got, want)
        if issues:
            n_fail += 1
            print(f"[FAIL] {name}: " + "; ".join(issues[:4]))
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
