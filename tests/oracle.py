"""Independent pure-pandas oracle for point-in-time joins and window
features — deliberately naive (per-row / per-group loops), mirroring the
reference's test strategy (upstream
``sdk/python/tests/integration/offline_store/
test_universal_historical_retrieval.py::get_expected_training_df`` builds the
expected frame by scanning feature rows per spine row).  No Ray, no shared
code with the engine's kernels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd


def oracle_asof(
    spine: pd.DataFrame,
    feats: pd.DataFrame,
    *,
    key: str,
    spine_ts: str = "ts",
    feat_ts: str = "ts",
    created_ts: Optional[str] = None,
    ttl_us: Optional[int] = None,
    feature_cols: Sequence[str] = (),
) -> pd.DataFrame:
    """Per spine row: latest feature row with fts <= t and fts >= t - ttl;
    ties on fts broken by max created_ts.  Miss => NaN/None."""
    out_rows = []
    fts_us = feats[feat_ts].astype("int64")
    sts_us = spine[spine_ts].astype("int64")
    for i in range(len(spine)):
        k = spine[key].iloc[i]
        t = sts_us.iloc[i]
        m = (feats[key] == k) & (fts_us <= t)
        if ttl_us is not None:
            m &= fts_us >= t - ttl_us
        cand = feats[m]
        row = {c: spine[c].iloc[i] for c in spine.columns}
        if len(cand) == 0:
            for c in feature_cols:
                row[c] = None
            row["__matched_ts"] = None
        else:
            cu = fts_us[m]
            best_t = cu.max()
            cand2 = cand[cu == best_t]
            if created_ts is not None and len(cand2) > 1:
                cand2 = cand2[cand2[created_ts] == cand2[created_ts].max()]
            best = cand2.iloc[-1]
            for c in feature_cols:
                row[c] = best[c]
            row["__matched_ts"] = best[feat_ts]
        out_rows.append(row)
    return pd.DataFrame(out_rows)


def _sorted_groups(df: pd.DataFrame, key: str, order: Sequence[str]):
    df = df.sort_values([key, *order], kind="stable").reset_index(drop=True)
    for _, g in df.groupby(key, sort=True):
        yield g


def oracle_lag_lead(
    df: pd.DataFrame, *, key: str, order: Sequence[str], col: str, k: int
) -> pd.DataFrame:
    """Adds lag{k}_{col} and lead{k}_{col}."""
    out = []
    for g in _sorted_groups(df, key, order):
        g = g.copy()
        g[f"lag{k}_{col}"] = g[col].shift(k)
        g[f"lead{k}_{col}"] = g[col].shift(-k)
        out.append(g)
    return pd.concat(out, ignore_index=True)


def oracle_rolling_rows(
    df: pd.DataFrame, *, key: str, order: Sequence[str], col: str, k: int
) -> pd.DataFrame:
    """count/sum/mean/last/min/max/std over trailing k rows incl. current."""
    out = []
    for g in _sorted_groups(df, key, order):
        g = g.copy().reset_index(drop=True)
        n = len(g)
        res = {a: [] for a in ("count", "sum", "mean", "last", "min", "max", "std")}
        for i in range(n):
            w = g[col].iloc[max(0, i - k + 1) : i + 1]
            wv = w.dropna()
            res["count"].append(len(wv))
            res["sum"].append(wv.sum() if len(wv) else np.nan)
            res["mean"].append(wv.mean() if len(wv) else np.nan)
            res["last"].append(wv.iloc[-1] if len(wv) else np.nan)
            res["min"].append(wv.min() if len(wv) else np.nan)
            res["max"].append(wv.max() if len(wv) else np.nan)
            res["std"].append(wv.std(ddof=1) if len(wv) > 1 else np.nan)
        for a, vals in res.items():
            g[f"roll_{a}"] = vals
        out.append(g)
    return pd.concat(out, ignore_index=True)


def oracle_rolling_time(
    df: pd.DataFrame,
    *,
    key: str,
    order: Sequence[str],
    ts: str,
    col: str,
    delta_us: int,
) -> pd.DataFrame:
    """count/sum/mean over ts in [t - delta, t], peers of t included."""
    out = []
    for g in _sorted_groups(df, key, order):
        g = g.copy().reset_index(drop=True)
        tus = g[ts].astype("int64")
        res = {a: [] for a in ("count", "sum", "mean", "min", "max")}
        for i in range(len(g)):
            t = tus.iloc[i]
            m = (tus >= t - delta_us) & (tus <= t)
            wv = g[col][m].dropna()
            res["count"].append(len(wv))
            res["sum"].append(wv.sum() if len(wv) else np.nan)
            res["mean"].append(wv.mean() if len(wv) else np.nan)
            res["min"].append(wv.min() if len(wv) else np.nan)
            res["max"].append(wv.max() if len(wv) else np.nan)
        for a, vals in res.items():
            g[f"troll_{a}"] = vals
        out.append(g)
    return pd.concat(out, ignore_index=True)


def oracle_sessionize(
    df: pd.DataFrame, *, key: str, order: Sequence[str], ts: str, gap_us: int
) -> pd.DataFrame:
    """0-based session id per entity; new session when ts - prev > gap
    (strictly greater)."""
    out = []
    for g in _sorted_groups(df, key, order):
        g = g.copy().reset_index(drop=True)
        tus = g[ts].astype("int64")
        sid, cur = [], 0
        for i in range(len(g)):
            if i > 0 and tus.iloc[i] - tus.iloc[i - 1] > gap_us:
                cur += 1
            sid.append(cur)
        g["session_id"] = sid
        out.append(g)
    return pd.concat(out, ignore_index=True)


def oracle_latest_per_entity(
    df: pd.DataFrame,
    *,
    key: str,
    ts: str,
    created_ts: Optional[str] = None,
    tie_break: Sequence[str] = (),
    start=None,
    end=None,
) -> pd.DataFrame:
    m = pd.Series(True, index=df.index)
    if start is not None:
        m &= df[ts] >= start
    if end is not None:
        m &= df[ts] <= end
    d = df[m]
    order = [ts] + ([created_ts] if created_ts else []) + list(tie_break)
    d = d.sort_values([key, *order], kind="stable")
    return d.groupby(key, sort=True).tail(1).reset_index(drop=True)
