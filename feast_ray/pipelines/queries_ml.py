"""Tabular-ML feature-encoding query family: target/frequency encoding,
per-entity quantile bucketing, activity shares, negative sampling, CUBE
grouping sets, lag-1 autocorrelation, sliding-window distinct counts.

Upstream Feast leaves these to user-side ``on_demand_feature_view`` UDFs;
here each is a distributed first-class operator with an exact DuckDB twin
(same exactness contract as ``pipelines/queries.py``: int64-exact sums,
one fixed float64 division/schedule per emitted float).

None of these functions call ``ray.init`` — the caller owns the session.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.sources.parquet import read_pq

QUERIES_ML: dict = {}
ORACLE_SQL_ML: dict = {}


def _events(sf_dir: str, columns=None):
    return read_pq(f"{sf_dir}/events.parquet", columns=columns)


def _mix64_sql(expr: str) -> str:
    """The engine's splitmix multiply (mod-2^64 bijection) as a HUGEINT
    split-multiply — same constants as ``stages.sampling.mix64`` (hi/lo
    words of 0x9E3779B97F4A7C15), validated bit-exact in the sample and
    simhash oracles."""
    return f"""
        ((CAST({expr} AS HUGEINT) % 4294967296) * 2135587861
         + (((CAST({expr} AS HUGEINT) % 4294967296) * 2654435769
             + (CAST({expr} AS HUGEINT) // 4294967296) * 2135587861)
            % 4294967296) * 4294967296)
        % CAST(18446744073709551616 AS HUGEINT)"""


def _with_cents(t: pa.Table, out: str = "cents") -> pa.Table:
    c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
    return t.append_column(out, c)


def q_target_encode_events(sf_dir: str):
    """Leave-one-out target encoding + frequency encoding of event_type
    against the value target (``stages.encode.target_encode``): the
    leakage-safe categorical-to-numeric encoder every tabular trainer
    applies.  One map-side-combined stats pass over a bounded categorical
    domain, broadcast back into a stateless map — the raw data is never
    shuffled."""
    from feast_ray.stages.encode import target_encode

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    ds = ds.map_batches(_with_cents, batch_format="pyarrow", zero_copy_batch=True)
    out = target_encode(ds, key_col="event_type", cents_col="cents")
    return out.select_columns(["event_id", "event_type", "freq", "loo_mean_cents"])


QUERIES_ML["target_encode_events"] = q_target_encode_events
ORACLE_SQL_ML["target_encode_events"] = """
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS na,
             CAST(COUNT(value) AS BIGINT) AS nv,
             CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)), 0) AS BIGINT) AS s
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, m.na AS freq,
           CASE WHEN e.value IS NULL
                THEN CASE WHEN m.nv > 0
                          THEN CAST(m.s AS DOUBLE) / CAST(m.nv AS DOUBLE) END
                ELSE CASE WHEN m.nv > 1
                          THEN CAST(m.s - CAST(ROUND(e.value * 100) AS BIGINT) AS DOUBLE)
                               / CAST(m.nv - 1 AS DOUBLE) END
           END AS loo_mean_cents
    FROM events e JOIN m USING (event_type)
"""


def q_autocorr_value_user(sf_dir: str):
    """Lag-1 autocorrelation of the value series per user
    (``stages.stats.grouped_autocorr``): pairs formed positionally inside
    ONE grouped exchange, five int64-exact moments, grouped_corr's fixed
    float schedule."""
    from feast_ray.stages.stats import grouped_autocorr

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return _with_cents(t).drop_columns(["value"])

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_autocorr(
        ds, "user_id", "cents", order_cols=["ts", "event_id"],
        out_col="autocorr1", count_col="n_pairs",
    )


QUERIES_ML["autocorr_value_user"] = q_autocorr_value_user
ORACLE_SQL_ML["autocorr_value_user"] = """
    WITH e AS (
      SELECT user_id, ts, event_id, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    p AS (
      SELECT user_id, c AS x,
             LEAD(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
      FROM e),
    m AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM p WHERE y IS NOT NULL GROUP BY user_id)
    SELECT user_id, n AS n_pairs,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS autocorr1
    FROM m
"""


def q_type_share_user(sf_dir: str):
    """Behavioral-mix feature: per (user, event_type) count and its share
    of the user's total activity (``stages.encode.share_of_entity``) —
    map-side-combined partials, ONE grouped exchange, share = one float64
    division of exact counts."""
    from feast_ray.stages.encode import share_of_entity

    ds = _events(sf_dir, ["user_id", "event_type"])
    return share_of_entity(ds, key="user_id", sub_key="event_type")


QUERIES_ML["type_share_user"] = q_type_share_user
ORACLE_SQL_ML["type_share_user"] = """
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY user_id)
             AS share
    FROM events GROUP BY user_id, event_type
"""


def q_value_quartile_user(sf_dir: str):
    """Within-entity equal-frequency bucketing: SQL NTILE(4) of the value
    cents per user (``stages.encode.group_ntile``) — the per-user quantile
    features (is this purchase big FOR THIS USER) that global deciles
    cannot express.  One grouped exchange, vectorized tile rule."""
    from feast_ray.stages.encode import group_ntile

    ds = _events(sf_dir, ["user_id", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return _with_cents(t).drop_columns(["value"])

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return group_ntile(
        ds, keys="user_id", val_col="cents", k=4,
        tie_cols=["event_id"], tile_name="quartile",
    )


QUERIES_ML["value_quartile_user"] = q_value_quartile_user
ORACLE_SQL_ML["value_quartile_user"] = """
    WITH e AS (
      SELECT user_id, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
    SELECT user_id, event_id, cents,
           CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY cents, event_id)
                AS BIGINT) AS quartile
    FROM e
"""


def q_cube_type_day(sf_dir: str):
    """Full CUBE grouping sets over (event_type, UTC day): count + exact
    cents sum at all four subset levels (``stages.stats.cube_agg``) — the
    monitoring rollup that feeds both per-type and per-day dashboards from
    one scan.  Raw data feeds exactly one map-side-combined exchange;
    the other grouping sets cascade over the finest cells."""
    from feast_ray.stages.stats import cube_agg

    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table(
            {"event_type": t["event_type"], "day": pa.array(us // 86_400_000_000),
             "cents": c}
        )

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    return cube_agg(
        ds, ["event_type", "day"], "cents", count_name="n_events", sum_name="cents"
    )


QUERIES_ML["cube_type_day"] = q_cube_type_day
ORACLE_SQL_ML["cube_type_day"] = """
    SELECT event_type,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY CUBE(event_type, day)
"""


def q_negative_samples_user(sf_dir: str):
    """Deterministic negative sampling (``stages.encode.negative_samples``):
    the interaction set is "user spent >= $100 on this event type"; for
    every interacting user, 2 types they never interacted with, picked by
    the splitmix mixer over (user_id * 64 + type_ordinal) — the
    implicit-feedback negatives of a recsys training set, reproducible on
    any cluster shape.  Users and vocabulary both come from the filtered
    interaction set (self-consistent universe)."""
    from feast_ray.stages.encode import negative_samples

    ds = _events(sf_dir, ["user_id", "event_type", "value"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["value"], 100.0)).select(
            ["user_id", "event_type"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return negative_samples(
        ds, user_col="user_id", item_col="event_type", k=2, rank_name="neg_rank"
    )


QUERIES_ML["negative_samples_user"] = q_negative_samples_user
ORACLE_SQL_ML["negative_samples_user"] = f"""
    WITH i AS (SELECT user_id, event_type FROM events WHERE value >= 100),
    t AS (SELECT DISTINCT event_type FROM i),
    o AS (SELECT event_type,
                 CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS BIGINT) AS ord
          FROM t),
    u AS (SELECT DISTINCT user_id FROM i),
    cand AS (
      SELECT u.user_id, o.event_type, o.ord
      FROM u CROSS JOIN o
      WHERE NOT EXISTS (SELECT 1 FROM i e
                        WHERE e.user_id = u.user_id
                          AND e.event_type = o.event_type)),
    h AS (SELECT user_id, event_type, ord,
                 {_mix64_sql("user_id * 64 + ord")} AS hv
          FROM cand),
    r AS (SELECT user_id, event_type,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hv, ord)
                      AS BIGINT) AS neg_rank
          FROM h)
    SELECT user_id, event_type, neg_rank FROM r WHERE neg_rank <= 2
"""


def q_rolling_distinct_types(sf_dir: str):
    """Sliding-window behavioral variety: distinct event types among each
    user's last 10 events (``stages.windows.rolling_distinct``) — the
    interval-contribution kernel (no per-window sets, no hashing), ONE
    grouped exchange."""
    from feast_ray.stages.windows import rolling_distinct

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    out = rolling_distinct(
        ds, key="user_id", cat_col="event_type", window=10,
        order_cols=["ts", "event_id"], out_name="n_distinct_w10",
    )
    return out.select_columns(["user_id", "event_id", "ts", "n_distinct_w10"])


QUERIES_ML["rolling_distinct_types"] = q_rolling_distinct_types
ORACLE_SQL_ML["rolling_distinct_types"] = """
    SELECT user_id, event_id, ts,
           CAST(COUNT(DISTINCT event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_distinct_w10
    FROM events
"""


def q_robust_scale_events(sf_dir: str):
    """Per-entity robust scaling + percent rank in ONE grouped exchange:
    (cents - median) / IQR (outlier-immune standardization, NULL when the
    IQR is zero) and SQL PERCENT_RANK (rank / (n-1), 0.0 for singleton
    groups) — the exact order-statistic selections come straight off the
    exchange's (cents, event_id) sort, so no second pass and no join back
    to rows."""
    from feast_ray.grouped import grouped_map

    ds = _events(sf_dir, ["user_id", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return _with_cents(t).drop_columns(["value"])

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        if n_rows == 0:
            t = t.append_column("pct_rank", pa.array([], pa.float64()))
            return t.append_column("robust", pa.array([], pa.float64()))
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        n = np.repeat(sizes, sizes)
        rank = np.arange(n_rows, dtype=np.int64) - gstart
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)

        def disc(q: float) -> np.ndarray:
            idx = gstart + np.maximum(
                np.ceil(q * n.astype(np.float64)).astype(np.int64), 1
            ) - 1
            return c[idx]

        med, q25, q75 = disc(0.5), disc(0.25), disc(0.75)
        iqr = q75 - q25
        with np.errstate(invalid="ignore", divide="ignore"):
            robust = (c - med).astype(np.float64) / iqr.astype(np.float64)
            pct = rank.astype(np.float64) / (n - 1).astype(np.float64)
        pct = np.where(n == 1, 0.0, pct)
        t = t.append_column("pct_rank", pa.array(pct))
        return t.append_column("robust", pa.array(robust, mask=iqr == 0))

    return grouped_map(ds, ["user_id"], kernel, sort_keys=["cents", "event_id"])


QUERIES_ML["robust_scale_events"] = q_robust_scale_events
ORACLE_SQL_ML["robust_scale_events"] = """
    WITH e AS (
      SELECT user_id, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    q AS (
      SELECT user_id,
             quantile_disc(cents, 0.25) AS q25,
             quantile_disc(cents, 0.50) AS med,
             quantile_disc(cents, 0.75) AS q75
      FROM e GROUP BY user_id)
    SELECT e.user_id, e.event_id, e.cents,
           PERCENT_RANK() OVER (PARTITION BY e.user_id
                                ORDER BY e.cents, e.event_id) AS pct_rank,
           CASE WHEN q.q75 - q.q25 > 0
                THEN CAST(e.cents - q.med AS DOUBLE)
                     / CAST(q.q75 - q.q25 AS DOUBLE) END AS robust
    FROM e JOIN q USING (user_id)
"""


SESSION_GAP_US = 1800 * 1_000_000


def q_covisit_types_session(sf_dir: str):
    """Session co-visitation matrix (the recsys/item2vec evidence counts):
    for every unordered event-type pair, the number of (user, session)
    groups where BOTH occur, sessions cut by the 30-minute gap rule.
    Sessionization, per-session distinct types and the triangular pair
    expansion all happen inside ONE grouped exchange on user; the global
    pair counts are map-side combined (<= |types|^2 rows per bucket) and
    reduced on a tiny second exchange."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.editdist import _tri_pairs
    from feast_ray.stages.stats import sum_by
    from feast_ray.stages.windows import sessionize_ids

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        enc = t["event_type"].combine_chunks().dictionary_encode()
        if n_rows == 0:
            return pa.table(
                {
                    "type_a": enc.dictionary.slice(0, 0),
                    "type_b": enc.dictionary.slice(0, 0),
                    "n_sess": pa.array([], pa.int64()),
                }
            )
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sess = sessionize_ids(ts, starts, SESSION_GAP_US)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        # dictionary codes are first-appearance ordered; remap to LEXICAL
        # ranks so code_a < code_b <=> type_a < type_b (a < b contract)
        k_dict = len(enc.dictionary)
        perm = np.argsort(np.asarray(enc.dictionary.to_pylist(), dtype=object))
        rank_of = np.empty(k_dict, dtype=np.int64)
        rank_of[perm] = np.arange(k_dict, dtype=np.int64)
        codes = rank_of[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        order = np.lexsort((codes, sess, gidx))
        sg, ss, sc = gidx[order], sess[order], codes[order]
        new = np.empty(n_rows, dtype=bool)
        new[0] = True
        new[1:] = (sg[1:] != sg[:-1]) | (ss[1:] != ss[:-1]) | (sc[1:] != sc[:-1])
        dg, dsess, dcode = sg[new], ss[new], sc[new]
        sess_change = np.empty(len(dg), dtype=bool)
        sess_change[0] = True
        sess_change[1:] = (dg[1:] != dg[:-1]) | (dsess[1:] != dsess[:-1])
        bounds = np.concatenate(
            (np.flatnonzero(sess_change), [len(dg)])
        ).astype(np.int64)
        ai, bi = _tri_pairs(bounds)
        pack = dcode[ai] * k_dict + dcode[bi]
        upack, cnt = np.unique(pack, return_counts=True)
        return pa.table(
            {
                "type_a": pc.take(enc.dictionary, pa.array(perm[upack // k_dict])),
                "type_b": pc.take(enc.dictionary, pa.array(perm[upack % k_dict])),
                "n_sess": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = grouped_map(
        ds, ["user_id"], kernel, sort_keys=["ts", "event_id"]
    )
    return sum_by(partials, ["type_a", "type_b"], ["n_sess"])


QUERIES_ML["covisit_types_session"] = q_covisit_types_session
ORACLE_SQL_ML["covisit_types_session"] = f"""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    s AS (
      SELECT user_id, event_type,
             SUM(CASE WHEN prev_ts IS NOT NULL
                       AND epoch_us(ts) - epoch_us(prev_ts) <= {SESSION_GAP_US}
                      THEN 0 ELSE 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e),
    st AS (SELECT DISTINCT user_id, session_id, event_type FROM s)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_sess
    FROM st a JOIN st b
      ON a.user_id = b.user_id AND a.session_id = b.session_id
         AND a.event_type < b.event_type
    GROUP BY 1, 2
"""


def q_knn_graph(sf_dir: str):
    """Exact cosine 3-NN graph over the embedding corpus
    (``stages.similarity.knn_graph``): blockpair chunk exchange (each
    reducer matmuls 2/n_chunks of the corpus, per-node top-k partials),
    per-node merge on a second exchange — the ANN-graph construction
    step of semantic dedup / diversity sampling, no driver state."""
    from feast_ray.stages.similarity import knn_graph

    ds = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_graph(ds, k=3, id_col="vec_id", emb_col="embedding", n_chunks=8)


QUERIES_ML["knn_graph"] = q_knn_graph
ORACLE_SQL_ML["knn_graph"] = """
    WITH s AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
    r AS (
      SELECT vec_id, nbr_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cos_sim DESC, nbr_id)
                  AS BIGINT) AS nbr_rank
      FROM s)
    SELECT vec_id, nbr_id, cos_sim, nbr_rank FROM r WHERE nbr_rank <= 3
"""


EMB_CLUSTER_TAU = 0.4


def q_cluster_embeddings(sf_dir: str):
    """Semantic duplicate clusters: embedding-cosine pairs (blockpair
    exchange, exact, tau=0.4) become an edge list, distributed min-label
    connected components assign every vector its cluster's min id,
    singletons cluster as themselves — the semantic-dedup grouping step
    (SemDeDup-style) over the embedding table."""
    from feast_ray.stages.cc import connected_components
    from feast_ray.stages.dedup import embedding_pair_pipeline
    from feast_ray.stages.join import equi_join

    vecs = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pairs = embedding_pair_pipeline(
        vecs, id_col="vec_id", tau=EMB_CLUSTER_TAU, mode="blockpair"
    ).select_columns(["doc_a", "doc_b"])
    ids = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    labels = connected_components(
        pairs, src="doc_a", dst="doc_b", node_col="vec_id", comp_col="comp"
    )
    joined = equi_join(ids, labels, keys=["vec_id"], how="left")
    return joined.map_batches(
        lambda t: pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster_id": pc.coalesce(
                    t["comp"].combine_chunks(), t["vec_id"].combine_chunks()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


QUERIES_ML["cluster_embeddings"] = q_cluster_embeddings
ORACLE_SQL_ML["cluster_embeddings"] = f"""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 6)
            >= {EMB_CLUSTER_TAU}),
    e AS (SELECT doc_a AS u, doc_b AS v FROM p
          UNION SELECT doc_b, doc_a FROM p),
    reach(u, v) AS (
        SELECT u, v FROM e
        UNION
        SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
    ),
    lab AS (SELECT u AS vec_id, LEAST(MIN(v), u) AS cluster_id
            FROM reach GROUP BY u)
    SELECT m.vec_id,
           COALESCE(l.cluster_id, m.vec_id) AS cluster_id
    FROM embeddings m LEFT JOIN lab l USING (vec_id)
"""


def q_asof_interp_value(sf_dir: str):
    """Interpolating as-of join (the sensor-resampling / feature-curve
    primitive): every click gets the user's purchase value linearly
    interpolated between the nearest purchase at-or-before and at-or-after
    the click — backward + forward one-shuffle as-of kernels composed on
    the same spine, purchases pre-deduped per (user, ts) so ties cannot
    make the match nondeterministic.  The interpolation is one fixed
    float schedule: (vn-vp)*(t-tp)/(tn-tp)+vp, exact-int inputs."""
    from feast_ray.stages.asof import asof_join, asof_join_forward
    from feast_ray.stages.stats import partial_count_sum

    ev = _events(sf_dir, ["user_id", "event_id", "ts", "event_type", "value"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click")).select(
            ["user_id", "event_id", "ts"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def purch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
            }
        )

    feats = partial_count_sum(
        ev.map_batches(purch, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "ts"],
        "cents",
        count_name="__n",
        sum_name="cents",
    ).drop_columns(["__n"])

    prev = asof_join(
        clicks, feats, key="user_id", feature_cols=["cents"],
        prefix="prev", matched_ts_name="prev_ts",
    )
    both = asof_join_forward(
        prev, feats, key="user_id", feature_cols=["cents"],
        prefix="next", matched_ts_name="next_ts",
    )

    def interp(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        tp_a = t["prev_ts"].combine_chunks().cast(pa.int64())
        tn_a = t["next_ts"].combine_chunks().cast(pa.int64())
        vp_a = t["prev__cents"].combine_chunks()
        vn_a = t["next__cents"].combine_chunks()
        ok = pc.and_(pc.is_valid(tp_a), pc.is_valid(tn_a)).to_numpy(
            zero_copy_only=False
        )
        tp = tp_a.fill_null(0).to_numpy(zero_copy_only=False)
        tn = tn_a.fill_null(0).to_numpy(zero_copy_only=False)
        vp = vp_a.fill_null(0).to_numpy(zero_copy_only=False).astype(np.float64)
        vn = vn_a.fill_null(0).to_numpy(zero_copy_only=False).astype(np.float64)
        span = (tn - tp).astype(np.float64)
        dt = (ts - tp).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            val = (vn - vp) * dt / span + vp
        val = np.where(span == 0, vp, val)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "prev_cents": vp_a,
                "next_cents": vn_a,
                "interp_cents": pa.array(val, mask=~ok),
            }
        )

    return both.map_batches(interp, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["asof_interp_value"] = q_asof_interp_value
ORACLE_SQL_ML["asof_interp_value"] = """
    WITH f AS (
      SELECT user_id, ts,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
    c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    j AS (
      SELECT c.user_id, c.event_id, c.ts,
             p.cents AS prev_cents, p.ts AS prev_ts,
             n.cents AS next_cents, n.ts AS next_ts
      FROM c
      LEFT JOIN LATERAL (
        SELECT cents, ts FROM f
        WHERE f.user_id = c.user_id AND f.ts <= c.ts
        ORDER BY f.ts DESC LIMIT 1) p ON TRUE
      LEFT JOIN LATERAL (
        SELECT cents, ts FROM f
        WHERE f.user_id = c.user_id AND f.ts >= c.ts
        ORDER BY f.ts LIMIT 1) n ON TRUE)
    SELECT user_id, event_id, ts, prev_cents, next_cents,
           CASE
             WHEN prev_ts IS NULL OR next_ts IS NULL THEN NULL
             WHEN next_ts = prev_ts THEN CAST(prev_cents AS DOUBLE)
             ELSE CAST(next_cents - prev_cents AS DOUBLE)
                  * CAST(epoch_us(ts) - epoch_us(prev_ts) AS DOUBLE)
                  / CAST(epoch_us(next_ts) - epoch_us(prev_ts) AS DOUBLE)
                  + CAST(prev_cents AS DOUBLE)
           END AS interp_cents
    FROM j
"""


def q_rolling_distinct_1h(sf_dir: str):
    """Time-windowed behavioral variety: distinct event types among each
    user's events in the trailing hour (RANGE window, peers included —
    ``stages.windows.rolling_distinct_time``): interval-contribution
    identity over the monotone time-window bounds, three global
    searchsorteds, ONE grouped exchange."""
    from feast_ray.stages.windows import rolling_distinct_time

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    out = rolling_distinct_time(
        ds, key="user_id", cat_col="event_type", ts_col="ts",
        delta_us=3600 * 1_000_000, order_cols=["ts", "event_id"],
        out_name="n_distinct_1h",
    )
    return out.select_columns(["user_id", "event_id", "ts", "n_distinct_1h"])


QUERIES_ML["rolling_distinct_1h"] = q_rolling_distinct_1h
ORACLE_SQL_ML["rolling_distinct_1h"] = """
    SELECT user_id, event_id, ts,
           CAST(COUNT(DISTINCT event_type) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_distinct_1h
    FROM events
"""


def q_knn_mutual_pairs(sf_dir: str):
    """Mutual-kNN edge pruning (the reciprocal-neighbor filter of
    semantic-dedup graph construction): keep (a, b) only when each is in
    the other's exact cosine top-3 — composition over
    ``stages.similarity.knn_graph`` output, one tiny grouped exchange on
    the unordered pair keeping pairs seen from BOTH directions."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.similarity import knn_graph

    ds = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    edges = knn_graph(ds, k=3, id_col="vec_id", emb_col="embedding", n_chunks=8)

    def orient(t: pa.Table) -> pa.Table:
        u = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["nbr_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_a": pa.array(np.minimum(u, v)),
                "vec_b": pa.array(np.maximum(u, v)),
                "cos_sim": t["cos_sim"],
            }
        )

    pairs = edges.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)

    def mutual(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        both = np.diff(starts) == 2  # one row per direction
        take = pa.array(firsts[both])
        return t.take(take)

    return grouped_map(pairs, ["vec_a", "vec_b"], mutual)


QUERIES_ML["knn_mutual_pairs"] = q_knn_mutual_pairs
ORACLE_SQL_ML["knn_mutual_pairs"] = """
    WITH s AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
    r AS (
      SELECT vec_id, nbr_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, nbr_id) AS rk
      FROM s)
    SELECT x.vec_id AS vec_a, x.nbr_id AS vec_b, x.cos_sim
    FROM r x JOIN r y ON x.vec_id = y.nbr_id AND x.nbr_id = y.vec_id
    WHERE x.rk <= 3 AND y.rk <= 3 AND x.vec_id < x.nbr_id
"""


def q_target_encode_smooth(sf_dir: str):
    """m-estimate (Bayesian-smoothed) target encoding alongside LOO +
    frequency (``stages.encode.target_encode`` with smoothing_m=20):
    (sum + m * global_mean) / (n + m) — the rare-category-robust encoder;
    fixed float schedule, still zero shuffles of the raw data."""
    from feast_ray.stages.encode import target_encode

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    ds = ds.map_batches(_with_cents, batch_format="pyarrow", zero_copy_batch=True)
    out = target_encode(
        ds, key_col="event_type", cents_col="cents", smoothing_m=20.0
    )
    return out.select_columns(["event_id", "event_type", "smooth_mean_cents"])


QUERIES_ML["target_encode_smooth"] = q_target_encode_smooth
ORACLE_SQL_ML["target_encode_smooth"] = """
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(value) AS BIGINT) AS nv,
             CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)), 0) AS BIGINT) AS s
      FROM events GROUP BY event_type),
    g AS (
      SELECT CAST(SUM(s) AS DOUBLE) / CAST(SUM(nv) AS DOUBLE) AS prior FROM m)
    SELECT e.event_id, e.event_type,
           (CAST(m.s AS DOUBLE) + 20.0 * g.prior)
             / (CAST(m.nv AS DOUBLE) + 20.0) AS smooth_mean_cents
    FROM events e JOIN m USING (event_type) CROSS JOIN g
"""


def q_feature_staleness_user(sf_dir: str):
    """Materialization-freshness audit (the feature-store monitoring read):
    per entity, the newest event time and its staleness vs the corpus
    high-watermark, in exact integer microseconds (no float).  Per-batch
    (user, max) partials feed one tiny grouped exchange; the global
    watermark is the driver-side max of the same partials (bounded: one
    row per distinct user per batch)."""
    from feast_ray.grouped import grouped_map

    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        u_a = t["user_id"].combine_chunks()
        if n == 0:
            return pa.table(
                {"user_id": u_a.slice(0, 0), "__mx": pa.array([], pa.int64())}
            )
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        enc = u_a.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        mx = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, codes, us)
        return pa.table({"user_id": enc.dictionary, "__mx": pa.array(mx)})

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # tiny: one row per distinct user per batch
    gmax_rows = partials.map_batches(
        lambda t: pa.table(
            {"__mx": pa.array([pc.max(t["__mx"]).as_py()], pa.int64())}
            if t.num_rows
            else {"__mx": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    gmax = max(int(r["__mx"]) for r in gmax_rows)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        lasts = pa.array(starts[1:] - 1)
        u = pc.take(t["user_id"].combine_chunks(), lasts)
        mx = t["__mx"].combine_chunks().to_numpy(zero_copy_only=False)[
            starts[1:] - 1
        ] if t.num_rows else np.zeros(0, np.int64)
        return pa.table(
            {
                "user_id": u,
                "last_ts_us": pa.array(mx.astype(np.int64)),
                "staleness_us": pa.array((gmax - mx).astype(np.int64)),
            }
        )

    return grouped_map(partials, ["user_id"], kernel, sort_keys=["__mx"])


QUERIES_ML["feature_staleness_user"] = q_feature_staleness_user
ORACLE_SQL_ML["feature_staleness_user"] = """
    SELECT user_id,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_ts_us,
           CAST((SELECT MAX(epoch_us(ts)) FROM events) - MAX(epoch_us(ts))
                AS BIGINT) AS staleness_us
    FROM events GROUP BY user_id
"""


def q_rolling_by_type(sf_dir: str):
    """Composite-key fused window pass: rolling 5-row count/sum/mean of the
    value cents per (user_id, event_type) — the same one-shuffle window
    kernel as the flagship, keyed by TWO entity columns (Feast's
    multi-join-key feature views)."""
    from feast_ray.stages.windows import RollingRows, add_window_features

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type", "value"])
    ds = ds.map_batches(
        lambda t: _with_cents(t, out="vc").drop_columns(["value"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = add_window_features(
        ds,
        key=["user_id", "event_type"],
        ts_col="ts",
        order_cols=["ts", "event_id"],
        specs=[RollingRows("vc", 5, aggs=("count", "sum"), prefix="r5c")],
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["r5c_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["r5c_count"].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "r5_count": t["r5c_count"],
                "r5_sum_cents": pa.array(s),
                "r5_mean_cents": pa.array(s / c, mask=c == 0),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["rolling_by_type"] = q_rolling_by_type
ORACLE_SQL_ML["rolling_by_type"] = """
    WITH e AS (
      SELECT user_id, event_type, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events)
    SELECT user_id, event_type, event_id, ts,
           CAST(COUNT(vc) OVER w AS BIGINT) AS r5_count,
           CAST(SUM(vc) OVER w AS DOUBLE) AS r5_sum_cents,
           CAST(SUM(vc) OVER w AS DOUBLE) / CAST(COUNT(vc) OVER w AS DOUBLE)
             AS r5_mean_cents
    FROM e
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def q_knn_triangles(sf_dir: str):
    """Per-node triangle counts on the mutual-kNN graph (local clustering
    evidence — how clique-like each vector's semantic neighborhood is):
    wedges (neighbor pairs around a center, <= C(k,2) per node) off one
    grouped exchange, closed by a co-partitioned semi-join against the
    edge list, counted map-side.  Each triangle contributes exactly one
    closed wedge per vertex."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.editdist import _tri_pairs
    from feast_ray.stages.join import semi_join
    from feast_ray.stages.stats import partial_count_sum

    edges = q_knn_mutual_pairs(sf_dir).select_columns(["vec_a", "vec_b"])

    def undirect(t: pa.Table) -> pa.Table:
        a = t["vec_a"].combine_chunks()
        b = t["vec_b"].combine_chunks()
        return pa.table(
            {
                "u": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                "v": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
            }
        )

    und = edges.map_batches(undirect, batch_format="pyarrow", zero_copy_batch=True)

    def wedges(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"vec_a": v.slice(0, 0), "vec_b": v.slice(0, 0), "center": u.slice(0, 0)}
            )
        ai, bi = _tri_pairs(starts)
        va = pc.take(v, pa.array(ai))  # sorted by v within group -> va < vb
        vb = pc.take(v, pa.array(bi))
        return pa.table(
            {"vec_a": va, "vec_b": vb, "center": pc.take(u, pa.array(ai))}
        )

    w = grouped_map(und, ["u"], wedges, sort_keys=["v"])
    closed = semi_join(w, edges, keys=["vec_a", "vec_b"])
    out = partial_count_sum(closed, ["center"], count_name="n_triangles")
    return out.map_batches(
        lambda t: pa.table(
            {"vec_id": t["center"], "n_triangles": t["n_triangles"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


QUERIES_ML["knn_triangles"] = q_knn_triangles
ORACLE_SQL_ML["knn_triangles"] = """
    WITH s AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
    r AS (
      SELECT vec_id, nbr_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, nbr_id) AS rk
      FROM s),
    me AS (
      SELECT x.vec_id AS vec_a, x.nbr_id AS vec_b
      FROM r x JOIN r y ON x.vec_id = y.nbr_id AND x.nbr_id = y.vec_id
      WHERE x.rk <= 3 AND y.rk <= 3 AND x.vec_id < x.nbr_id),
    und AS (SELECT vec_a AS u, vec_b AS v FROM me
            UNION ALL SELECT vec_b, vec_a FROM me),
    wedge AS (
      SELECT a.u AS center, a.v AS x, b.v AS y
      FROM und a JOIN und b ON a.u = b.u AND a.v < b.v),
    closed AS (
      SELECT w.center FROM wedge w
      JOIN me ON me.vec_a = w.x AND me.vec_b = w.y)
    SELECT center AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM closed GROUP BY center
"""


def q_order_count_distribution(sf_dir: str):
    """Distribution-of-aggregates (TPC-H Q13 shape): how many customers
    placed exactly N orders, INCLUDING the zero-order customers a plain
    GROUP BY silently drops — per-customer counts via one LEFT
    co-partitioned join + map-side-combined count, then the tiny
    second-level histogram.  The zero bucket is the reason this is a LEFT
    shape: losing it misstates the inactive-customer mass."""
    from feast_ray.stages.join import equi_join
    from feast_ray.stages.stats import partial_count_sum, sum_by

    customers = read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = read_pq(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    per_cust = partial_count_sum(
        orders.map_batches(
            lambda t: t.rename_columns(["c_custkey"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["c_custkey"],
        count_name="c_count",
    )
    joined = equi_join(customers, per_cust, keys=["c_custkey"], how="left")

    def zero_fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {"c_count": t["c_count"].combine_chunks().fill_null(0)}
        )

    counts = joined.map_batches(zero_fill, batch_format="pyarrow", zero_copy_batch=True)
    hist = partial_count_sum(counts, ["c_count"], count_name="custdist")
    return hist


QUERIES_ML["order_count_distribution"] = q_order_count_distribution
ORACLE_SQL_ML["order_count_distribution"] = """
    WITH pc AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_custkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM pc GROUP BY c_count
"""


def q_rfm_user(sf_dir: str):
    """RFM segmentation (the classic customer-feature triple): per user,
    recency vs the corpus high-watermark (exact integer us), purchase
    frequency, exact monetary cents — each scored 1-5 by GLOBAL
    equal-frequency NTILE via the range-partitioned global ranking (no
    Dataset sort), composed into the familiar 3-digit RFM code.  Raw data
    feeds one map-side-combined exchange; the three rankings run over the
    tiny per-user table."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import global_order_index

    ds = _events(sf_dir, ["user_id", "ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "__us": pa.array(us),
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
            }
        )

    purch = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        u_a = t["user_id"].combine_chunks()
        if n == 0:
            return pa.table(
                {"user_id": u_a.slice(0, 0), "__mx": pa.array([], pa.int64()),
                 "freq": pa.array([], pa.int64()), "monetary": pa.array([], pa.int64())}
            )
        enc = u_a.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        us = t["__us"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        mx = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, codes, us)
        s = np.zeros(k, dtype=np.int64)  # exact int64 (bincount weights are float64)
        np.add.at(s, codes, c)
        return pa.table(
            {
                "user_id": enc.dictionary,
                "__mx": pa.array(mx),
                "freq": pa.array(np.bincount(codes, minlength=k).astype(np.int64)),
                "monetary": pa.array(s),
            }
        )

    partials = purch.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    gmax_rows = partials.map_batches(
        lambda t: pa.table(
            {"__mx": pa.array([pc.max(t["__mx"]).as_py()], pa.int64())}
            if t.num_rows
            else {"__mx": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    gmax = max(int(r["__mx"]) for r in gmax_rows)

    def fold(t: pa.Table, starts: np.ndarray) -> pa.Table:
        lasts = starts[1:] - 1
        if t.num_rows == 0:
            return pa.table(
                {"user_id": t["user_id"].combine_chunks().slice(0, 0),
                 "recency_us": pa.array([], pa.int64()),
                 "freq": pa.array([], pa.int64()),
                 "monetary": pa.array([], pa.int64())}
            )
        mx = t["__mx"].combine_chunks().to_numpy(zero_copy_only=False)[lasts]
        firsts = starts[:-1]
        f = t["freq"].combine_chunks().to_numpy(zero_copy_only=False)
        m = t["monetary"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pc.take(t["user_id"].combine_chunks(), pa.array(lasts)),
                "recency_us": pa.array((gmax - mx).astype(np.int64)),
                "freq": pa.array(np.add.reduceat(f, firsts).astype(np.int64)),
                "monetary": pa.array(np.add.reduceat(m, firsts).astype(np.int64)),
            }
        )

    rfm = grouped_map(partials, ["user_id"], fold, sort_keys=["__mx"])
    rfm = global_order_index(rfm, "recency_us", tiebreak="user_id",
                             pos_name="__r_rank", ntile=5, ntile_name="r_score")
    rfm = global_order_index(rfm, "freq", tiebreak="user_id",
                             pos_name="__f_rank", ntile=5, ntile_name="f_score")
    rfm = global_order_index(rfm, "monetary", tiebreak="user_id",
                             pos_name="__m_rank", ntile=5, ntile_name="m_score")

    def code(t: pa.Table) -> pa.Table:
        r = t["r_score"].combine_chunks().to_numpy(zero_copy_only=False)
        f = t["f_score"].combine_chunks().to_numpy(zero_copy_only=False)
        m = t["m_score"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = t.select(["user_id", "recency_us", "freq", "monetary",
                         "r_score", "f_score", "m_score"])
        return keep.append_column("rfm", pa.array((r * 100 + f * 10 + m).astype(np.int64)))

    return rfm.map_batches(code, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["rfm_user"] = q_rfm_user
ORACLE_SQL_ML["rfm_user"] = """
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    a AS (
      SELECT user_id,
             CAST((SELECT MAX(us) FROM p) - MAX(us) AS BIGINT) AS recency_us,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(cents) AS BIGINT) AS monetary
      FROM p GROUP BY user_id),
    s AS (
      SELECT user_id, recency_us, freq, monetary,
             CAST(NTILE(5) OVER (ORDER BY recency_us, user_id) AS BIGINT) AS r_score,
             CAST(NTILE(5) OVER (ORDER BY freq, user_id) AS BIGINT) AS f_score,
             CAST(NTILE(5) OVER (ORDER BY monetary, user_id) AS BIGINT) AS m_score
      FROM a)
    SELECT *, CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
    FROM s
"""


def q_percent_change_events(sf_dir: str):
    """Per-entity percent change vs the previous observation (the
    return/delta feature of every time-series model): one fused window
    pass for the lag, one float64 division of exact cents, NULL on the
    first observation or a zero base."""
    from feast_ray.stages.windows import Lag, add_window_features

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: _with_cents(t).drop_columns(["value"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = add_window_features(
        ds, key="user_id", ts_col="ts", order_cols=["ts", "event_id"],
        specs=[Lag("cents", 1, name="prev_cents")],
    )

    def finish(t: pa.Table) -> pa.Table:
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        p_a = t["prev_cents"].combine_chunks()
        valid = pc.is_valid(p_a).to_numpy(zero_copy_only=False)
        p = p_a.fill_null(1).to_numpy(zero_copy_only=False)
        ok = valid & (p != 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            chg = (c - p).astype(np.float64) / p.astype(np.float64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "cents": t["cents"],
                "prev_cents": p_a,
                "pct_change": pa.array(chg, mask=~ok),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["percent_change_events"] = q_percent_change_events
ORACLE_SQL_ML["percent_change_events"] = """
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             LAG(CAST(ROUND(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_cents
      FROM events)
    SELECT user_id, event_id, ts, cents, prev_cents,
           CASE WHEN prev_cents IS NOT NULL AND prev_cents <> 0
                THEN CAST(cents - prev_cents AS DOUBLE)
                     / CAST(prev_cents AS DOUBLE) END AS pct_change
    FROM e
"""


def q_attribution_last_touch(sf_dir: str):
    """Last-touch attribution report (the marketing composition): each
    purchase is attributed to the user's most recent preceding event of
    any other type within 7 days (backward as-of with TTL, ties to the
    larger event_id = latest-written), then attributed revenue rolls up
    per touching type — exact cents, map-side combined.  Unattributed
    purchases land in the 'none' bucket."""
    from feast_ray.stages.asof import asof_join
    from feast_ray.stages.stats import partial_count_sum

    ev = _events(sf_dir, ["user_id", "event_id", "ts", "event_type", "value"])
    purchases = ev.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.filter(pc.equal(t["event_type"], "purchase"))["user_id"],
                "ts": t.filter(pc.equal(t["event_type"], "purchase"))["ts"],
                "event_id": t.filter(pc.equal(t["event_type"], "purchase"))["event_id"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            t.filter(pc.equal(t["event_type"], "purchase"))["value"],
                            100.0,
                        )
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    touches = ev.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.filter(pc.not_equal(t["event_type"], "purchase"))["user_id"],
                "ts": t.filter(pc.not_equal(t["event_type"], "purchase"))["ts"],
                "touch_type": t.filter(pc.not_equal(t["event_type"], "purchase"))[
                    "event_type"
                ],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = asof_join(
        purchases, touches, key="user_id", ttl_us=7 * 24 * 3600 * 1_000_000,
        feature_cols=["touch_type"], matched_ts_name="touch_ts",
    )

    def bucket(t: pa.Table) -> pa.Table:
        tt = t["touch_type"].combine_chunks().fill_null("none")
        return pa.table({"touch_type": tt, "cents": t["cents"]})

    rolled = partial_count_sum(
        joined.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True),
        ["touch_type"],
        "cents",
        count_name="n_purchases",
        sum_name="attributed_cents",
    )
    return rolled


QUERIES_ML["attribution_last_touch"] = q_attribution_last_touch
ORACLE_SQL_ML["attribution_last_touch"] = """
    WITH p AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    tch AS (
      SELECT user_id, ts, event_type AS touch_type
      FROM events WHERE event_type <> 'purchase'),
    j AS (
      SELECT p.cents, a.touch_type
      FROM p LEFT JOIN LATERAL (
        SELECT t.touch_type
        FROM tch t
        WHERE t.user_id = p.user_id AND t.ts <= p.ts
          AND epoch_us(p.ts) - epoch_us(t.ts) <= 604800000000
        ORDER BY t.ts DESC LIMIT 1) a ON TRUE)
    SELECT COALESCE(touch_type, 'none') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM j GROUP BY 1
"""


def q_crossset_embedding_leaks(sf_dir: str):
    """Embedding-space eval contamination: train/eval split by vec_id %
    20, report every CROSS-SET pair with cosine >= 0.4 — the semantic
    analog of shingle decontamination (a paraphrased eval item shares no
    4-gram but sits next to its source in embedding space).  Reuses the
    exact blockpair pair pipeline; the side restriction is a stateless
    post-filter, so the exchange shape is unchanged."""
    from feast_ray.stages.dedup import embedding_pair_pipeline

    vecs = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    pairs = embedding_pair_pipeline(
        vecs, id_col="vec_id", tau=0.4, mode="blockpair"
    )

    def cross_only(t: pa.Table) -> pa.Table:
        a = t["doc_a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["doc_b"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = (a % 20 == 0) != (b % 20 == 0)
        out = t.filter(pa.array(keep))
        a2 = out["doc_a"].combine_chunks().to_numpy(zero_copy_only=False)
        b2 = out["doc_b"].combine_chunks().to_numpy(zero_copy_only=False)
        ev = np.where(a2 % 20 == 0, a2, b2)
        tr = np.where(a2 % 20 == 0, b2, a2)
        return pa.table(
            {
                "eval_id": pa.array(ev),
                "train_id": pa.array(tr),
                "cos_sim": out["cos_sim"],
            }
        )

    return pairs.map_batches(cross_only, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["crossset_embedding_leaks"] = q_crossset_embedding_leaks
ORACLE_SQL_ML["crossset_embedding_leaks"] = """
    WITH p AS (
      SELECT a.vec_id AS da, b.vec_id AS db,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 6) >= 0.4)
    SELECT CASE WHEN da % 20 = 0 THEN da ELSE db END AS eval_id,
           CASE WHEN da % 20 = 0 THEN db ELSE da END AS train_id,
           cos_sim
    FROM p
    WHERE (da % 20 = 0) <> (db % 20 = 0)
"""


def q_conversion_by_value_decile(sf_dir: str):
    """Label-calibration table (the sanity check before training on a
    conversion label): clicks labeled by purchase-within-1-day (forward
    as-of), bucketed by GLOBAL click-value decile, conversion rate per
    decile — click count, conversions, one float64 division.  Composition:
    one forward as-of shuffle for the label, the range-partitioned global
    NTILE for the bucket, one map-side-combined rollup."""
    from feast_ray.stages.asof import asof_join_forward
    from feast_ray.stages.stats import global_order_index, partial_count_sum

    ev = _events(sf_dir, ["user_id", "event_id", "ts", "event_type", "value"])
    clicks = ev.map_batches(
        lambda t: _with_cents(
            t.filter(pc.equal(t["event_type"], "click"))
        ).select(["user_id", "event_id", "ts", "cents"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    purchases = ev.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.filter(pc.equal(t["event_type"], "purchase"))["user_id"],
                "ts": t.filter(pc.equal(t["event_type"], "purchase"))["ts"],
                "p_event_id": t.filter(pc.equal(t["event_type"], "purchase"))["event_id"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    labeled = asof_join_forward(
        clicks, purchases, key="user_id", tie_col="p_event_id",
        lookahead_us=86_400_000_000, feature_cols=[], matched_ts_name="conv_ts",
    )
    ranked = global_order_index(
        labeled, "cents", tiebreak="event_id",
        pos_name="__rank", ntile=10, ntile_name="decile",
    )

    def tag(t: pa.Table) -> pa.Table:
        conv = pc.is_valid(t["conv_ts"].combine_chunks())
        return pa.table(
            {
                "decile": t["decile"],
                "__conv": conv.cast(pa.int64()),
            }
        )

    rolled = partial_count_sum(
        ranked.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        ["decile"],
        "__conv",
        count_name="n_clicks",
        sum_name="n_conversions",
    )

    def rate(t: pa.Table) -> pa.Table:
        n = t["n_clicks"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["n_conversions"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "conv_rate", pa.array(c.astype(np.float64) / n.astype(np.float64))
        )

    return rolled.map_batches(rate, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["conversion_by_value_decile"] = q_conversion_by_value_decile
ORACLE_SQL_ML["conversion_by_value_decile"] = """
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    lab AS (
      SELECT c.cents, c.event_id,
             EXISTS (SELECT 1 FROM p
                     WHERE p.user_id = c.user_id AND p.ts >= c.ts
                       AND epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000)
               AS conv
      FROM c),
    d AS (
      SELECT CAST(NTILE(10) OVER (ORDER BY cents, event_id) AS BIGINT) AS decile,
             conv
      FROM lab)
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_conversions,
           CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS conv_rate
    FROM d GROUP BY decile
"""


def q_trimmed_mean_user(sf_dir: str):
    """Robust location per entity: the mean of value cents RESTRICTED to
    the entity's own [q10, q90] band (exact disc quantiles off the
    exchange sort, conditional int64 sum, one division) — the
    outlier-immune per-user average; NULL is impossible (the band always
    contains the median).  ONE grouped exchange."""
    from feast_ray.grouped import grouped_map

    ds = _events(sf_dir, ["user_id", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return _with_cents(t).select(["user_id", "cents"])

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"user_id": u_a.slice(0, 0), "n_in_band": pa.array([], pa.int64()),
                 "trimmed_mean_cents": pa.array([], pa.float64())}
            )
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        n = np.repeat(sizes, sizes)
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)

        def disc(q: float) -> np.ndarray:
            idx = gstart + np.maximum(
                np.ceil(q * n.astype(np.float64)).astype(np.int64), 1
            ) - 1
            return c[idx]

        lo, hi = disc(0.10), disc(0.90)
        in_band = (c >= lo) & (c <= hi)
        gidx = np.repeat(np.arange(len(sizes)), sizes)
        s = np.zeros(len(sizes), dtype=np.int64)
        np.add.at(s, gidx[in_band], c[in_band])
        cnt = np.bincount(gidx[in_band], minlength=len(sizes)).astype(np.int64)
        return pa.table(
            {
                "user_id": pc.take(u_a, pa.array(starts[:-1])),
                "n_in_band": pa.array(cnt),
                "trimmed_mean_cents": pa.array(
                    s.astype(np.float64) / cnt.astype(np.float64)
                ),
            }
        )

    return grouped_map(ds, ["user_id"], kernel, sort_keys=["cents"])


QUERIES_ML["trimmed_mean_user"] = q_trimmed_mean_user
ORACLE_SQL_ML["trimmed_mean_user"] = """
    WITH e AS (
      SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    q AS (
      SELECT user_id,
             quantile_disc(c, 0.10) AS lo, quantile_disc(c, 0.90) AS hi
      FROM e GROUP BY user_id)
    SELECT e.user_id,
           CAST(COUNT(*) FILTER (WHERE e.c BETWEEN q.lo AND q.hi) AS BIGINT)
             AS n_in_band,
           CAST(SUM(e.c) FILTER (WHERE e.c BETWEEN q.lo AND q.hi) AS DOUBLE)
             / CAST(COUNT(*) FILTER (WHERE e.c BETWEEN q.lo AND q.hi) AS DOUBLE)
             AS trimmed_mean_cents
    FROM e JOIN q USING (user_id)
    GROUP BY e.user_id
"""


def q_streak_days_user(sf_dir: str):
    """Longest consecutive-active-day streak per user (the engagement
    feature; SQL gaps-and-islands): distinct active days off the
    exchange's sort, island id = day - active-day ordinal (constant
    within a consecutive run), longest island per user — all run
    detection, zero per-row Python, ONE grouped exchange."""
    from feast_ray.grouped import grouped_map

    ds = _events(sf_dir, ["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"user_id": t["user_id"], "day": pa.array(us // 86_400_000_000)}
        )

    days = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"user_id": u_a.slice(0, 0),
                 "n_active_days": pa.array([], pa.int64()),
                 "max_streak_days": pa.array([], pa.int64())}
            )
        n_rows = t.num_rows
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes)), sizes)
        d = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        # distinct days per user (sorted by day within group)
        new_day = np.empty(n_rows, dtype=bool)
        new_day[0] = True
        new_day[1:] = (d[1:] != d[:-1]) | (gidx[1:] != gidx[:-1])
        dd = d[new_day]
        dg = gidx[new_day]
        n_active = np.bincount(dg, minlength=len(sizes)).astype(np.int64)
        # islands: a new streak starts when the day gap is not exactly 1
        new_streak = np.empty(len(dd), dtype=bool)
        new_streak[0] = True
        new_streak[1:] = (dg[1:] != dg[:-1]) | (dd[1:] != dd[:-1] + 1)
        sid = np.cumsum(new_streak) - 1
        streak_len = np.bincount(sid)
        streak_user = dg[np.flatnonzero(new_streak)]
        mx = np.zeros(len(sizes), dtype=np.int64)
        np.maximum.at(mx, streak_user, streak_len)
        return pa.table(
            {
                "user_id": pc.take(u_a, pa.array(starts[:-1])),
                "n_active_days": pa.array(n_active),
                "max_streak_days": pa.array(mx),
            }
        )

    return grouped_map(days, ["user_id"], kernel, sort_keys=["day"])


QUERIES_ML["streak_days_user"] = q_streak_days_user
ORACLE_SQL_ML["streak_days_user"] = """
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events),
    i AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM d),
    s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
      FROM i GROUP BY user_id, island),
    a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_active_days
          FROM d GROUP BY user_id),
    m AS (SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak_days
          FROM s GROUP BY user_id)
    SELECT user_id, n_active_days, max_streak_days
    FROM a JOIN m USING (user_id)
"""


def q_seq_pairs_1h(sf_dir: str):
    """Temporal sequence-pair mining: for every ordered type pair (a, b),
    how often an a-event is followed by a b-event BY THE SAME USER within
    one hour (all pairs in the horizon, not just adjacent — the
    sequence-rule evidence adjacent-transition counts miss).  Kernel: per
    user, one searchsorted gives each row's horizon end; per-type prefix
    sums turn every row's window type-histogram into two gathers; row
    contributions accumulate into the <= T^2 cells map-side, so the final
    exchange moves tiny partials.  ONE grouped exchange + a tiny reduce."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import sum_by
    from feast_ray.stages.windows import rolling_time_bounds

    HORIZON_US = 3600 * 1_000_000
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        enc = t["event_type"].combine_chunks().dictionary_encode()
        if t.num_rows == 0:
            return pa.table(
                {
                    "type_a": enc.dictionary.slice(0, 0),
                    "type_b": enc.dictionary.slice(0, 0),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        n = t.num_rows
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        # negate to reuse the backward bounds helper for a FORWARD horizon:
        # rows with ts_j in (ts_i, ts_i + H] are exactly the rows after i
        # (strictly later ts) within the horizon
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        sizes = np.diff(starts)
        gstart = np.repeat(starts[:-1], sizes)
        gend = np.repeat(starts[1:], sizes)
        pos = np.arange(n, dtype=np.int64)
        # horizon end: first index with ts > ts_i + H (groups rebased onto
        # disjoint ranges exactly like rolling_time_bounds)
        tmin = ts[starts[:-1]]
        ranges = ts[starts[1:] - 1] - tmin
        rel = ts - np.repeat(tmin, sizes)
        offs = np.concatenate(([0], np.cumsum(ranges + HORIZON_US + 2)))[:-1]
        key = rel + np.repeat(offs, sizes)
        hi = np.searchsorted(key, key + HORIZON_US, side="right")
        lo = np.searchsorted(key, key, side="right")  # strictly-later start
        # per-type prefix sums of the one-hot type indicators
        cells = np.zeros((k, k), dtype=np.int64)
        for tb in range(k):
            p = np.concatenate(([0], np.cumsum(codes == tb)))
            wcnt = p[hi] - p[lo]
            np.add.at(cells[:, tb], codes, wcnt)
        ga, gb = np.nonzero(cells)
        return pa.table(
            {
                "type_a": pc.take(enc.dictionary, pa.array(ga)),
                "type_b": pc.take(enc.dictionary, pa.array(gb)),
                "n_pairs": pa.array(cells[ga, gb]),
            }
        )

    partials = grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])
    return sum_by(partials, ["type_a", "type_b"], ["n_pairs"])


QUERIES_ML["seq_pairs_1h"] = q_seq_pairs_1h
ORACLE_SQL_ML["seq_pairs_1h"] = """
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
    GROUP BY 1, 2
"""


def q_salted_rolling_chunks(sf_dir: str):
    """The HOT-ENTITY path as a driver-checkable query: documents are
    chunked (32/24 token windows — chunk_idx is the per-entity dense
    ordinal salting keys on), then per-doc rolling 3-chunk token sums and
    the previous chunk's length are computed through
    ``stages.salt.salted_window_features`` with chunk_rows=4, far below
    the per-doc chunk counts — every long doc is actually split into
    overlapping salt chunks and re-stitched.  The oracle is the plain SQL
    window over the chunk CTE: salting must be invisible in the output
    (the parity the salt module's contract promises, proven here under
    the driver's hash compare, not just pytest)."""
    from feast_ray.stages.salt import salted_window_features
    from feast_ray.stages.text import chunk_texts
    from feast_ray.stages.windows import Lag, RollingRows
    from feast_ray.sources.parquet import read_pq as _rp

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    chunks = chunk_texts(
        docs, chunk_tokens=32, stride_tokens=24,
        idx_name="chunk_idx", out_name="chunk_text", len_name="n_tokens",
    ).drop_columns(["chunk_text"])
    out = salted_window_features(
        chunks,
        key="doc_id",
        ts_col="chunk_idx",
        ordinal_col="chunk_idx",
        order_cols=["chunk_idx"],
        specs=[
            RollingRows("n_tokens", 3, aggs=("count", "sum"), prefix="r3"),
            Lag("n_tokens", 1, name="prev_tokens"),
        ],
        chunk_rows=4,
    )
    return out.select_columns(
        ["doc_id", "chunk_idx", "n_tokens", "r3_count", "r3_sum", "prev_tokens"]
    )


QUERIES_ML["salted_rolling_chunks"] = q_salted_rolling_chunks
ORACLE_SQL_ML["salted_rolling_chunks"] = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tl
      FROM documents),
    mm AS (
      SELECT doc_id, tl, CAST(len(tl) AS BIGINT) AS m
      FROM toks WHERE len(tl) > 0),
    cc AS (
      SELECT doc_id, tl, m,
             CASE WHEN m <= 32 THEN 1
                  ELSE 1 + CAST(CEIL((m - 32) / 24.0) AS BIGINT) END AS n_chunks
      FROM mm),
    ch AS (
      SELECT doc_id, CAST(g.k AS BIGINT) AS chunk_idx,
             LEAST(g.k * 24 + 32, m) - g.k * 24 AS n_tokens
      FROM cc, LATERAL unnest(range(0, n_chunks)) AS g(k))
    SELECT doc_id, chunk_idx, n_tokens,
           CAST(COUNT(n_tokens) OVER w AS BIGINT) AS r3_count,
           CAST(SUM(n_tokens) OVER w AS DOUBLE) AS r3_sum,
           LAG(n_tokens) OVER (PARTITION BY doc_id ORDER BY chunk_idx)
             AS prev_tokens
    FROM ch
    WINDOW w AS (PARTITION BY doc_id ORDER BY chunk_idx
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_salted_cumulative_chunks(sf_dir: str):
    """Round-4 salted-path extension as a driver-checkable query: the
    UNBOUNDED-history window family — Expanding mean/std, RowNumber, and
    Ewma — computed THROUGH hot-entity salting (chunk_rows=4 splits every
    long doc) and re-stitched by the phase-2 prefix repair.  mean/std are
    bit-exact here (integer-fed sums are exact under any association);
    ewma is reassociated by the chunk-map composition, so both sides round
    to 6 decimals."""
    from feast_ray.stages.salt import salted_window_features
    from feast_ray.stages.text import chunk_texts
    from feast_ray.stages.windows import Ewma, Expanding, RowNumber
    from feast_ray.sources.parquet import read_pq as _rp

    docs = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    chunks = chunk_texts(
        docs, chunk_tokens=32, stride_tokens=24,
        idx_name="chunk_idx", out_name="chunk_text", len_name="n_tokens",
    ).drop_columns(["chunk_text"])
    out = salted_window_features(
        chunks,
        key="doc_id",
        ts_col="chunk_idx",
        ordinal_col="chunk_idx",
        order_cols=["chunk_idx"],
        specs=[
            Expanding("n_tokens", aggs=("mean", "std"), prefix="cum"),
            RowNumber(name="rn"),
            Ewma("n_tokens", alpha=0.25, name="ew"),
        ],
        chunk_rows=4,
    )

    def fin(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("ew"), "ew", pc.round(t["ew"], 6)
        )

    return out.map_batches(
        fin, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(
        ["doc_id", "chunk_idx", "n_tokens", "cum_mean", "cum_std", "rn", "ew"]
    )


QUERIES_ML["salted_cumulative_chunks"] = q_salted_cumulative_chunks
ORACLE_SQL_ML["salted_cumulative_chunks"] = """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tl
      FROM documents),
    mm AS (
      SELECT doc_id, CAST(len(tl) AS BIGINT) AS m
      FROM toks WHERE len(tl) > 0),
    cc AS (
      SELECT doc_id, m,
             CASE WHEN m <= 32 THEN 1
                  ELSE 1 + CAST(CEIL((m - 32) / 24.0) AS BIGINT) END AS n_chunks
      FROM mm),
    ch AS (
      SELECT doc_id, CAST(g.k AS BIGINT) AS chunk_idx,
             LEAST(g.k * 24 + 32, m) - g.k * 24 AS n_tokens
      FROM cc, LATERAL unnest(range(0, n_chunks)) AS g(k)),
    w AS (
      SELECT doc_id, chunk_idx, n_tokens,
             CAST(SUM(n_tokens) OVER uw AS DOUBLE) AS s,
             CAST(SUM(n_tokens * n_tokens) OVER uw AS DOUBLE) AS q,
             CAST(COUNT(*) OVER uw AS BIGINT) AS c,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY chunk_idx) AS BIGINT) AS rn
      FROM ch
      WINDOW uw AS (PARTITION BY doc_id ORDER BY chunk_idx
                    ROWS UNBOUNDED PRECEDING)),
    rec AS (
      SELECT doc_id, chunk_idx, rn,
             CAST(n_tokens AS DOUBLE) AS ewma FROM w WHERE rn = 1
      UNION ALL
      SELECT w.doc_id, w.chunk_idx, w.rn,
             CAST(0.25 AS DOUBLE) * w.n_tokens
               + CAST(0.75 AS DOUBLE) * rec.ewma
      FROM w JOIN rec ON w.doc_id = rec.doc_id AND w.rn = rec.rn + 1)
    SELECT w.doc_id, w.chunk_idx, w.n_tokens,
           w.s / w.c AS cum_mean,
           CASE WHEN w.c >= 2 THEN
             SQRT(GREATEST(w.q - w.s * w.s / GREATEST(w.c, 1), 0.0)
                  / GREATEST(w.c - 1, 1))
           END AS cum_std,
           w.rn,
           ROUND(rec.ewma, 6) AS ew
    FROM w JOIN rec ON w.doc_id = rec.doc_id AND w.rn = rec.rn
"""


def q_global_value_percentiles(sf_dir: str):
    """Exact GLOBAL percentiles of the value cents (p50/p90/p99) without a
    global sort: the range-partitioned global rank assigns every row its
    exact position; the three target ranks (SQL quantile_disc = element at
    rank ceil(q*n)) are filtered out — three rows leave the cluster.
    The corpus-level summary every data-quality dashboard pins."""
    from feast_ray.stages.stats import global_order_index

    ds = _events(sf_dir, ["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return _with_cents(t).select(["event_id", "cents"])

    thin = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    ranked = global_order_index(thin, "cents", tiebreak="event_id",
                                pos_name="grank").materialize()
    n = ranked.count()
    # integer-exact target ranks: ceil(q*n) - 1 with q in thousandths
    tgt = {q: (int(q * 1000) * n + 999) // 1000 - 1 for q in (0.5, 0.9, 0.99)}
    tgt_vals = np.array(sorted(set(tgt.values())), dtype=np.int64)

    def pick2(t: pa.Table) -> pa.Table:
        g = t["grank"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.isin(g, tgt_vals)
        return t.filter(pa.array(keep))

    picked = ranked.map_batches(pick2, batch_format="pyarrow", zero_copy_batch=True)
    rows = picked.take_all()  # <= 3 rows
    by_rank = {int(r["grank"]): int(r["cents"]) for r in rows}
    import ray.data as rd

    out = pa.table(
        {
            "q": pa.array([0.5, 0.9, 0.99], pa.float64()),
            "cents": pa.array(
                [by_rank[tgt[q]] for q in (0.5, 0.9, 0.99)], pa.int64()
            ),
        }
    )
    return rd.from_arrow(out)


QUERIES_ML["global_value_percentiles"] = q_global_value_percentiles
ORACLE_SQL_ML["global_value_percentiles"] = """
    WITH e AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL)
    SELECT 0.5 AS q, quantile_disc(c, 0.5) AS cents FROM e
    UNION ALL
    SELECT 0.9, quantile_disc(c, 0.9) FROM e
    UNION ALL
    SELECT 0.99, quantile_disc(c, 0.99) FROM e
"""


def q_knn_graph_lsh(sf_dir: str):
    """APPROXIMATE kNN graph (the 100-TB path — multi-table hyperplane
    buckets, exact cosine within buckets, per-node multi-table merge;
    ``stages.similarity.knn_graph_lsh``).  Recall pinned by
    tests/test_text_dedup.py against the exact blockpair graph; no SQL
    twin (the bucketing is a seeded random projection), so the driver
    records the weaker rows-only check — precision is exact by
    construction."""
    from feast_ray.stages.similarity import knn_graph_lsh

    ds = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_graph_lsh(ds, k=3, n_planes=5, n_tables=4)


QUERIES_ML["knn_graph_lsh"] = q_knn_graph_lsh


def q_column_profile_events(sf_dir: str):
    """Data-quality column profile (the dbt/GE-style report a feature
    pipeline gates ingest on): one row per numeric column — row count,
    null count, EXACT distinct count, integer min/max (value profiled in
    cents, ts as epoch micros).  Per-batch partials carry (column, batch
    mins/maxes/null counts) plus batch-DISTINCT values per column; ONE
    grouped exchange on the column id merges them (run detection over
    (column, value) for the distinct count).  Everything integer.

    Scale note: EXACT distinct concentrates each column's distinct-value
    stream on one reducer (there are only as many groups as columns) — at
    100 TB profile high-cardinality columns with the HLL sketch instead
    (``stages.sketch``, query ``approx_distinct_users``); the exact path
    here is for the bounded-cardinality gate columns."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import sum_by

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    COLS = ["event_id", "user_id", "cents", "ts_us"]

    def derive(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
                "ts_us": us,
            }
        )

    dv = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)

    # stream of per-batch DISTINCT (column, value) pairs + count/null partials
    def partial(t: pa.Table) -> pa.Table:
        cols_out, vals_out = [], []
        meta_rows = []
        for ci, name in enumerate(COLS):
            arr = t[name].combine_chunks()
            v = arr.fill_null(0).to_numpy(zero_copy_only=False)
            valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
            uv = np.unique(v[valid])
            cols_out.append(np.full(len(uv), ci, np.int64))
            vals_out.append(uv)
            n_valid = int(valid.sum())
            meta_rows.append(
                (ci, t.num_rows, t.num_rows - n_valid,
                 int(v[valid].min()) if n_valid else np.iinfo(np.int64).max,
                 int(v[valid].max()) if n_valid else np.iinfo(np.int64).min)
            )
        mr = np.array(meta_rows, dtype=np.int64).reshape(-1, 5)
        return pa.table(
            {
                "ci": pa.array(np.concatenate(cols_out + [mr[:, 0]])),
                "val": pa.array(np.concatenate(vals_out + [np.zeros(len(mr), np.int64)])),
                "is_meta": pa.array(
                    np.concatenate(
                        [np.zeros(sum(len(c) for c in cols_out), np.int64),
                         np.ones(len(mr), np.int64)]
                    )
                ),
                "n": pa.array(np.concatenate([np.zeros(sum(len(c) for c in cols_out), np.int64), mr[:, 1]])),
                "nulls": pa.array(np.concatenate([np.zeros(sum(len(c) for c in cols_out), np.int64), mr[:, 2]])),
                "mn": pa.array(np.concatenate([np.zeros(sum(len(c) for c in cols_out), np.int64), mr[:, 3]])),
                "mx": pa.array(np.concatenate([np.zeros(sum(len(c) for c in cols_out), np.int64), mr[:, 4]])),
            }
        )

    partials = dv.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"column": pa.array([], pa.string()),
                 "n_rows": pa.array([], pa.int64()),
                 "n_nulls": pa.array([], pa.int64()),
                 "n_distinct": pa.array([], pa.int64()),
                 "min_val": pa.array([], pa.int64()),
                 "max_val": pa.array([], pa.int64())}
            )
        ci = t["ci"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["val"].combine_chunks().to_numpy(zero_copy_only=False)
        meta = t["is_meta"].combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
        gidx = np.repeat(np.arange(len(starts) - 1, dtype=np.int64), np.diff(starts))
        # distinct: run detection over (group=column, value) for non-meta rows
        nm = ~meta
        new_run = np.empty(t.num_rows, dtype=bool)
        new_run[0] = True
        new_run[1:] = (gidx[1:] != gidx[:-1]) | (val[1:] != val[:-1]) | meta[1:] | meta[:-1]
        n_groups = len(starts) - 1
        nd = np.bincount(gidx[new_run & nm], minlength=n_groups).astype(np.int64)
        n = np.zeros(n_groups, np.int64)
        nulls = np.zeros(n_groups, np.int64)
        mn = np.full(n_groups, np.iinfo(np.int64).max)
        mx = np.full(n_groups, np.iinfo(np.int64).min)
        np.add.at(n, gidx[meta], t["n"].combine_chunks().to_numpy(zero_copy_only=False)[meta])
        np.add.at(nulls, gidx[meta], t["nulls"].combine_chunks().to_numpy(zero_copy_only=False)[meta])
        np.minimum.at(mn, gidx[meta], t["mn"].combine_chunks().to_numpy(zero_copy_only=False)[meta])
        np.maximum.at(mx, gidx[meta], t["mx"].combine_chunks().to_numpy(zero_copy_only=False)[meta])
        names = pa.array([COLS[int(c)] for c in ci[starts[:-1]]], pa.string())
        return pa.table(
            {
                "column": names,
                "n_rows": pa.array(n),
                "n_nulls": pa.array(nulls),
                "n_distinct": pa.array(nd),
                "min_val": pa.array(mn),
                "max_val": pa.array(mx),
            }
        )

    return grouped_map(partials, ["ci"], kernel, sort_keys=["is_meta", "val"])


QUERIES_ML["column_profile_events"] = q_column_profile_events
ORACLE_SQL_ML["column_profile_events"] = """
    WITH d AS (
      SELECT event_id, user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS ts_us
      FROM events)
    SELECT 'event_id' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(MIN(event_id) AS BIGINT) AS min_val,
           CAST(MAX(event_id) AS BIGINT) AS max_val
    FROM d
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
           COUNT(DISTINCT user_id), MIN(user_id), MAX(user_id) FROM d
    UNION ALL
    SELECT 'cents', COUNT(*), COUNT(*) - COUNT(cents),
           COUNT(DISTINCT cents), MIN(cents), MAX(cents) FROM d
    UNION ALL
    SELECT 'ts_us', COUNT(*), COUNT(*) - COUNT(ts_us),
           COUNT(DISTINCT ts_us), MIN(ts_us), MAX(ts_us) FROM d
"""


def q_value_drift_halves(sf_dir: str):
    """Distribution-drift evidence (the train/serve skew monitor): the
    event stream splits at its median timestamp; value cents bucket into
    10 equal-WIDTH bands over the global [min, max]; the output is the
    (band, half) contingency — all integers (the PSI/chi-square log is
    left to consumers, per the engine's libm-free contract).  Global
    extrema and the median come from tiny partial-aggregate passes; the
    banded counts are ONE map-side-combined exchange."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table(
            {"ts_us": us,
             "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())}
        )

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # global extrema: one-row-per-block partials, driver folds ints
    def extrema(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table(
            {"mn": pa.array([pc.min(t["cents"]).as_py()], pa.int64()),
             "mx": pa.array([pc.max(t["cents"]).as_py()], pa.int64())}
        )

    ex = dv.map_batches(extrema, batch_format="pyarrow", zero_copy_batch=True).take_all()
    mn = min(int(r["mn"]) for r in ex)
    mx = max(int(r["mx"]) for r in ex)

    # median ts: exact disc selection via the global rank (thin input)
    from feast_ray.stages.stats import global_order_index

    ranked = global_order_index(
        dv.map_batches(
            lambda t: pa.table({"ts_us": t["ts_us"],
                                "rid": pc.add(t["ts_us"], 0)}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "ts_us", tiebreak="rid", pos_name="grank",
    ).materialize()
    n = ranked.count()
    med_rank = (n + 1) // 2 - 1  # ceil(0.5 * n) - 1

    def pick(t: pa.Table) -> pa.Table:
        g = t["grank"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(g == med_rank)).select(["ts_us"])

    med_ts = int(
        ranked.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()[0]["ts_us"]
    )

    span = mx - mn + 1

    def band(t: pa.Table) -> pa.Table:
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        us = t["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(((c - mn) * 10) // span),
                "half": pa.array(np.where(us <= med_ts, 1, 2).astype(np.int64)),
            }
        )

    banded = dv.map_batches(band, batch_format="pyarrow", zero_copy_batch=True)
    return partial_count_sum(banded, ["band", "half"], count_name="n_events")


QUERIES_ML["value_drift_halves"] = q_value_drift_halves
ORACLE_SQL_ML["value_drift_halves"] = """
    WITH e AS (
      SELECT epoch_us(ts) AS us, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    g AS (
      SELECT MIN(c) AS mn, MAX(c) AS mx, quantile_disc(us, 0.5) AS med
      FROM e)
    SELECT ((e.c - g.mn) * 10) // (g.mx - g.mn + 1) AS band,
           CASE WHEN e.us <= g.med THEN 1 ELSE 2 END AS half,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM e CROSS JOIN g
    GROUP BY 1, 2
"""


def q_session_profile(sf_dir: str):
    """The per-session feature table (what a session-model trains on):
    one row per (user, session) under the 30-minute gap rule — event
    count, exact duration (integer us), distinct event types, exact value
    cents, entry and exit event types.  Sessionization, per-session
    boundaries, distinct-type counting (one lexsort) and the
    boundary-row gathers all happen inside ONE grouped exchange."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.windows import sessionize_ids

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type", "value"])
    ds = ds.map_batches(
        lambda t: _with_cents(t).drop_columns(["value"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        types = t["event_type"].combine_chunks()
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": u_a.slice(0, 0),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "duration_us": pa.array([], pa.int64()),
                    "n_types": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                    "entry_type": types.slice(0, 0),
                    "exit_type": types.slice(0, 0),
                }
            )
        n = t.num_rows
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        sess = sessionize_ids(ts, starts, SESSION_GAP_US)
        # global session run id (rows sorted by user, ts)
        new_s = np.empty(n, dtype=bool)
        new_s[0] = True
        new_s[1:] = (gidx[1:] != gidx[:-1]) | (sess[1:] != sess[:-1])
        s_first = np.flatnonzero(new_s)
        s_last = np.concatenate((s_first[1:] - 1, [n - 1]))
        sid_of_row = np.cumsum(new_s) - 1
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        n_sess = len(s_first)
        sums = np.zeros(n_sess, dtype=np.int64)
        np.add.at(sums, sid_of_row, c)
        # distinct types per session: lexsort (session, code), count runs
        codes = (
            types.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        order = np.lexsort((codes, sid_of_row))
        ss, sc = sid_of_row[order], codes[order]
        new_tc = np.empty(n, dtype=bool)
        new_tc[0] = True
        new_tc[1:] = (ss[1:] != ss[:-1]) | (sc[1:] != sc[:-1])
        n_types = np.bincount(ss[new_tc], minlength=n_sess).astype(np.int64)
        return pa.table(
            {
                "user_id": pc.take(u_a, pa.array(s_first)),
                "session_id": pa.array(sess[s_first].astype(np.int64)),
                "n_events": pa.array(
                    (s_last - s_first + 1).astype(np.int64)
                ),
                "duration_us": pa.array((ts[s_last] - ts[s_first]).astype(np.int64)),
                "n_types": pa.array(n_types),
                "sum_cents": pa.array(sums),
                "entry_type": pc.take(types, pa.array(s_first)),
                "exit_type": pc.take(types, pa.array(s_last)),
            }
        )

    return grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])


QUERIES_ML["session_profile"] = q_session_profile
ORACLE_SQL_ML["session_profile"] = f"""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    s AS (
      SELECT user_id, event_id, ts, event_type, cents,
             CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                            AND epoch_us(ts) - epoch_us(prev_ts) <= {1800 * 1_000_000}
                           THEN 0 ELSE 1 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
      FROM e)
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           FIRST(event_type ORDER BY ts, event_id) AS entry_type,
           LAST(event_type ORDER BY ts, event_id) AS exit_type
    FROM s GROUP BY user_id, session_id
"""


def q_anomaly_days_user(sf_dir: str):
    """Aggregate-of-aggregate outlier detection: user-days whose event
    count exceeds the user's own mean + 3 sigma over their active days
    (population variance from exact int64 moments, fixed float schedule)
    — the per-entity burst detector.  Daily counts are one map-side-
    combined exchange; moments + the threshold filter fold on a second
    tiny exchange over the per-day rows."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"user_id": t["user_id"], "day": pa.array(us // 86_400_000_000)}
        )

    days = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    daily = partial_count_sum(days, ["user_id", "day"], count_name="n_events")

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"user_id": u_a.slice(0, 0), "day": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "user_day_mean": pa.array([], pa.float64())}
            )
        firsts = starts[:-1]
        sizes = np.diff(starts)
        c = t["n_events"].combine_chunks().to_numpy(zero_copy_only=False)
        s = np.add.reduceat(c, firsts)
        s2 = np.add.reduceat(c * c, firsts)
        n = sizes
        mean = s.astype(np.float64) / n.astype(np.float64)
        var = (n * s2 - s * s).astype(np.float64) / (n * n).astype(np.float64)
        thr = mean + 3.0 * np.sqrt(var)
        per_row_thr = np.repeat(thr, sizes)
        per_row_mean = np.repeat(mean, sizes)
        keep = c.astype(np.float64) > per_row_thr
        idx = pa.array(np.flatnonzero(keep))
        return pa.table(
            {
                "user_id": pc.take(u_a, idx),
                "day": pc.take(t["day"].combine_chunks(), idx),
                "n_events": pc.take(t["n_events"].combine_chunks(), idx),
                "user_day_mean": pa.array(per_row_mean[keep]),
            }
        )

    return grouped_map(daily, ["user_id"], kernel, sort_keys=["day"])


QUERIES_ML["anomaly_days_user"] = q_anomaly_days_user
ORACLE_SQL_ML["anomaly_days_user"] = """
    WITH d AS (
      SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id, day),
    m AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(n_events) AS s, SUM(n_events * n_events) AS s2
      FROM d GROUP BY user_id)
    SELECT d.user_id, d.day, d.n_events,
           CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE) AS user_day_mean
    FROM d JOIN m USING (user_id)
    WHERE CAST(d.n_events AS DOUBLE)
          > CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE)
            + 3.0 * sqrt(CAST(m.n * m.s2 - m.s * m.s AS DOUBLE)
                         / CAST(m.n * m.n AS DOUBLE))
"""


def q_orders_above_global_p99(sf_dir: str):
    """Global-threshold filter (TPC-H Q18 flavor): orders whose total
    price is at or above the GLOBAL p99 (exact disc quantile via the
    range-partitioned rank — a driver scalar, never a sorted array),
    joined to their customer segment — the whale-order report.  The
    threshold broadcast is one int; the join is one co-partitioned
    exchange."""
    from feast_ray.stages.join import equi_join
    from feast_ray.stages.stats import global_order_index

    orders = read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64())
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
             "price_cents": c}
        )

    oc = orders.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True).materialize()
    ranked = global_order_index(
        oc.select_columns(["o_orderkey", "price_cents"]),
        "price_cents", tiebreak="o_orderkey", pos_name="grank",
    ).materialize()
    n = ranked.count()
    tgt = (99 * n + 99) // 100 - 1  # ceil(0.99 * n) - 1

    def pick(t: pa.Table) -> pa.Table:
        g = t["grank"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(g == tgt)).select(["price_cents"])

    thr = int(
        ranked.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()[0]["price_cents"]
    )

    big = oc.map_batches(
        lambda t: t.filter(pc.greater_equal(t["price_cents"], thr)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust = read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: pa.table(
            {"o_custkey": t["c_custkey"], "c_mktsegment": t["c_mktsegment"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return equi_join(big, cust, keys=["o_custkey"], how="left")


QUERIES_ML["orders_above_global_p99"] = q_orders_above_global_p99
ORACLE_SQL_ML["orders_above_global_p99"] = """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders),
    t AS (SELECT quantile_disc(price_cents, 0.99) AS thr FROM o)
    SELECT o.o_orderkey, o.o_custkey, o.price_cents, c.c_mktsegment
    FROM o CROSS JOIN t
    LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.price_cents >= t.thr
"""


def q_attribution_first_touch(sf_dir: str):
    """First-touch attribution (the acquisition-credit twin of last-touch):
    each purchase credits the EARLIEST non-purchase touch within the 7
    days before it — the forward as-of kernel launched from (ts - 7d)
    with a 7-day lookahead covers exactly [ts-7d, ts]; revenue rolls up
    per touch type map-side.  Unattributed purchases land in 'none'."""
    from feast_ray.stages.asof import asof_join_forward
    from feast_ray.stages.stats import partial_count_sum

    W_US = 7 * 24 * 3600 * 1_000_000
    ev = _events(sf_dir, ["user_id", "event_id", "ts", "event_type", "value"])

    def purch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": pa.array(us - W_US).cast(pa.timestamp("us")),
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
            }
        )

    spine = ev.map_batches(purch, batch_format="pyarrow", zero_copy_batch=True)

    def touch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["event_type"], "purchase"))
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "t_event_id": t["event_id"], "touch_type": t["event_type"]}
        )

    touches = ev.map_batches(touch, batch_format="pyarrow", zero_copy_batch=True)
    joined = asof_join_forward(
        spine, touches, key="user_id", tie_col="t_event_id",
        lookahead_us=W_US, feature_cols=["touch_type"],
        matched_ts_name="touch_ts",
    )

    def bucket(t: pa.Table) -> pa.Table:
        tt = t["touch_type"].combine_chunks().fill_null("none")
        return pa.table({"touch_type": tt, "cents": t["cents"]})

    return partial_count_sum(
        joined.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True),
        ["touch_type"], "cents",
        count_name="n_purchases", sum_name="attributed_cents",
    )


QUERIES_ML["attribution_first_touch"] = q_attribution_first_touch
ORACLE_SQL_ML["attribution_first_touch"] = """
    WITH p AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    tch AS (
      SELECT user_id, ts, event_id, event_type AS touch_type
      FROM events WHERE event_type <> 'purchase'),
    j AS (
      SELECT p.cents, a.touch_type
      FROM p LEFT JOIN LATERAL (
        SELECT t.touch_type
        FROM tch t
        WHERE t.user_id = p.user_id
          AND t.ts <= p.ts
          AND epoch_us(p.ts) - epoch_us(t.ts) <= 604800000000
        ORDER BY t.ts, t.event_id LIMIT 1) a ON TRUE)
    SELECT COALESCE(touch_type, 'none') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM j GROUP BY 1
"""


def q_dau_wau_daily(sf_dir: str):
    """DAU / WAU per day (the stickiness series): daily distinct actives
    plus the 7-day trailing distinct actives, via the interval-
    contribution identity applied to the CALENDAR axis — a user's active
    day d (previous active day p) adds +1 to WAU(x) for the contiguous
    day range [max(d, p+7), d+6], so per-bucket partials are day-indexed
    difference arrays (bounded by the calendar span), and the final
    reduce is a tiny day-keyed sum + prefix over days.  One exchange on
    user; no per-day distinct sets ever materialize."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import sum_by

    ds = _events(sf_dir, ["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"user_id": t["user_id"], "day": pa.array(us // 86_400_000_000)}
        )

    days = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()),
                 "dau": pa.array([], pa.int64()),
                 "wau_delta": pa.array([], pa.int64())}
            )
        n = t.num_rows
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        d = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        # distinct (user, day), rows sorted by day within user
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (gidx[1:] != gidx[:-1]) | (d[1:] != d[:-1])
        dd = d[new]
        dg = gidx[new]
        first = np.empty(len(dd), dtype=bool)
        first[0] = True
        first[1:] = dg[1:] != dg[:-1]
        prev = np.empty(len(dd), dtype=np.int64)
        prev[1:] = dd[:-1]
        prev[first] = np.iinfo(np.int64).min // 2  # none -> always outside
        lo = np.maximum(dd, prev + 7)
        hi = dd + 6
        # day-indexed difference partials (bounded by the bucket's span)
        dmin = int(dd.min())
        dmax = int(hi.max())
        span = dmax - dmin + 2
        diff = np.zeros(span, dtype=np.int64)
        np.add.at(diff, lo - dmin, 1)
        np.add.at(diff, hi - dmin + 1, -1)
        dau = np.zeros(span, dtype=np.int64)
        np.add.at(dau, dd - dmin, 1)
        keep = (diff != 0) | (dau != 0)
        idx = np.flatnonzero(keep)
        return pa.table(
            {
                "day": pa.array(idx + dmin),
                "dau": pa.array(dau[idx]),
                "wau_delta": pa.array(diff[idx]),
            }
        )

    partials = grouped_map(days, ["user_id"], kernel, sort_keys=["day"])
    agg = sum_by(partials, ["day"], ["dau", "wau_delta"]).materialize()
    rows = sorted(agg.take_all(), key=lambda r: r["day"])  # bounded: calendar days
    import ray.data as rd

    # WAU(x) = prefix of wau_delta over days <= x; delta rows exist at every
    # interval boundary, so accumulating over the emitted rows is exact
    day_arr, dau_arr, wau_arr = [], [], []
    run = 0
    for r in rows:
        run += int(r["wau_delta"])
        if int(r["dau"]) > 0:
            day_arr.append(int(r["day"]))
            dau_arr.append(int(r["dau"]))
            wau_arr.append(run)
    out = pa.table(
        {"day": pa.array(day_arr, pa.int64()),
         "dau": pa.array(dau_arr, pa.int64()),
         "wau": pa.array(wau_arr, pa.int64())}
    )
    return rd.from_arrow(out)


QUERIES_ML["dau_wau_daily"] = q_dau_wau_daily
ORACLE_SQL_ML["dau_wau_daily"] = """
    WITH p AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events),
    d AS (SELECT DISTINCT day FROM p)
    SELECT d.day,
           CAST((SELECT COUNT(*) FROM p WHERE p.day = d.day) AS BIGINT) AS dau,
           CAST((SELECT COUNT(DISTINCT user_id) FROM p
                 WHERE p.day BETWEEN d.day - 6 AND d.day) AS BIGINT) AS wau
    FROM d
"""


def q_new_vs_returning_daily(sf_dir: str):
    """Growth accounting: per day, how many active users are NEW (first
    day ever) vs RETURNING — per-user first day and per-(user, day)
    distinct flags fold inside ONE grouped exchange on user (the kernel
    knows each user's first day from the sorted group head), day-keyed
    partials reduce on a tiny second exchange."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import sum_by

    ds = _events(sf_dir, ["user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"user_id": t["user_id"], "day": pa.array(us // 86_400_000_000)}
        )

    days = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()),
                 "n_new": pa.array([], pa.int64()),
                 "n_returning": pa.array([], pa.int64())}
            )
        n = t.num_rows
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        d = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (gidx[1:] != gidx[:-1]) | (d[1:] != d[:-1])
        dd = d[new]
        dg = gidx[new]
        first = np.empty(len(dd), dtype=bool)
        first[0] = True
        first[1:] = dg[1:] != dg[:-1]
        uday, inv = np.unique(dd, return_inverse=True)
        n_new = np.bincount(inv[first], minlength=len(uday)).astype(np.int64)
        n_ret = np.bincount(inv[~first], minlength=len(uday)).astype(np.int64)
        return pa.table(
            {"day": pa.array(uday),
             "n_new": pa.array(n_new),
             "n_returning": pa.array(n_ret)}
        )

    partials = grouped_map(days, ["user_id"], kernel, sort_keys=["day"])
    return sum_by(partials, ["day"], ["n_new", "n_returning"])


QUERIES_ML["new_vs_returning_daily"] = q_new_vs_returning_daily
ORACLE_SQL_ML["new_vs_returning_daily"] = """
    WITH p AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events),
    f AS (SELECT user_id, MIN(day) AS first_day FROM p GROUP BY user_id)
    SELECT p.day,
           CAST(SUM(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN p.day <> f.first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning
    FROM p JOIN f USING (user_id)
    GROUP BY p.day
"""


def q_conversion_path_length(sf_dir: str):
    """Funnel-depth feature: per converting user, the number of events
    STRICTLY between their first view and their first purchase AFTER that
    view, plus the elapsed time (exact integer us) — how much browsing a
    conversion takes.  All three anchors (first view, first subsequent
    purchase, the between-count via two searchsorteds over the group's
    packed timestamps) come off ONE grouped exchange; users who never
    view or never purchase after viewing emit nothing."""
    from feast_ray.grouped import grouped_map

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {"user_id": u_a.slice(0, 0),
                 "n_between": pa.array([], pa.int64()),
                 "elapsed_us": pa.array([], pa.int64())}
            )
        n = t.num_rows
        sizes = np.diff(starts)
        n_groups = len(sizes)
        gidx = np.repeat(np.arange(n_groups, dtype=np.int64), sizes)
        pos = np.arange(n, dtype=np.int64)
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        codes = t["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        is_view = codes == "view"
        is_purch = codes == "purchase"
        big = np.int64(np.iinfo(np.int64).max)
        # first view position per group (rows sorted by ts, event_id)
        fv = np.full(n_groups, big)
        np.minimum.at(fv, gidx[is_view], pos[is_view])
        # first purchase strictly after the first view: min purchase pos > fv
        fp = np.full(n_groups, big)
        cand = is_purch & (pos > fv[gidx])
        np.minimum.at(fp, gidx[cand], pos[cand])
        ok = (fv < big) & (fp < big)
        gi = np.flatnonzero(ok)
        a, b = fv[gi], fp[gi]
        return pa.table(
            {
                "user_id": pc.take(u_a, pa.array(starts[:-1][gi])),
                "n_between": pa.array((b - a - 1).astype(np.int64)),
                "elapsed_us": pa.array((ts[b] - ts[a]).astype(np.int64)),
            }
        )

    return grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])


QUERIES_ML["conversion_path_length"] = q_conversion_path_length
ORACLE_SQL_ML["conversion_path_length"] = """
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events),
    fv AS (SELECT user_id, MIN(rn) AS v_rn FROM e
           WHERE event_type = 'view' GROUP BY user_id),
    fp AS (SELECT e.user_id, MIN(e.rn) AS p_rn
           FROM e JOIN fv USING (user_id)
           WHERE e.event_type = 'purchase' AND e.rn > fv.v_rn
           GROUP BY e.user_id)
    SELECT fv.user_id,
           CAST(fp.p_rn - fv.v_rn - 1 AS BIGINT) AS n_between,
           CAST((SELECT epoch_us(ts) FROM e
                 WHERE e.user_id = fv.user_id AND e.rn = fp.p_rn)
                - (SELECT epoch_us(ts) FROM e
                   WHERE e.user_id = fv.user_id AND e.rn = fv.v_rn)
                AS BIGINT) AS elapsed_us
    FROM fv JOIN fp USING (user_id)
"""


def q_value_by_session_position(sf_dir: str):
    """Position-in-session value curve (position-bias evidence): mean
    value cents by the event's ordinal within its session (positions 5+
    pooled) — sessionize + within-session rank + map-side-combined sums
    inside ONE exchange kernel, tiny final reduce, one division per
    bucket row."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import sum_by
    from feast_ray.stages.windows import sessionize_ids

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: _with_cents(t).drop_columns(["value"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"position": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "sum_cents": pa.array([], pa.int64())}
            )
        n = t.num_rows
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sess = sessionize_ids(ts, starts, SESSION_GAP_US)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        new_s = np.empty(n, dtype=bool)
        new_s[0] = True
        new_s[1:] = (gidx[1:] != gidx[:-1]) | (sess[1:] != sess[:-1])
        pos_in_sess = np.arange(n, dtype=np.int64) - np.maximum.accumulate(
            np.where(new_s, np.arange(n, dtype=np.int64), 0)
        ) + 1
        position = np.minimum(pos_in_sess, 5)
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        upos, inv = np.unique(position, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(upos), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table(
            {"position": pa.array(upos),
             "n_events": pa.array(cnt),
             "sum_cents": pa.array(s)}
        )

    partials = grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])
    agg = sum_by(partials, ["position"], ["n_events", "sum_cents"])

    def rate(t: pa.Table) -> pa.Table:
        n = t["n_events"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["sum_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "mean_cents", pa.array(s.astype(np.float64) / n.astype(np.float64))
        )

    return agg.map_batches(rate, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["value_by_session_position"] = q_value_by_session_position
ORACLE_SQL_ML["value_by_session_position"] = f"""
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    s AS (
      SELECT user_id, event_id, ts, cents,
             CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                            AND epoch_us(ts) - epoch_us(prev_ts) <= {1800 * 1_000_000}
                           THEN 0 ELSE 1 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM e),
    r AS (
      SELECT cents,
             LEAST(CAST(ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                           ORDER BY ts, event_id) AS BIGINT),
                   5) AS position
      FROM s)
    SELECT position,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_cents
    FROM r GROUP BY position
"""


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) semantic dedup over the embedding
    table: assign each vector to its nearest of k=8 deterministic
    centroids (the k lowest-id embeddings), then within each cluster mark
    a vector duplicate iff a LOWER-id cluster-mate has cosine >= tau.
    Clustering bounds the quadratic verify to per-cluster blocks — the
    100-TB path for semantic dedup (``stages.dedup.semdedup``)."""
    from feast_ray.stages.dedup import semdedup

    vecs = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return semdedup(vecs, id_col="vec_id", k=8, tau=EMB_CLUSTER_TAU)


QUERIES_ML["semdedup_embeddings"] = q_semdedup_embeddings
ORACLE_SQL_ML["semdedup_embeddings"] = """
    WITH cent AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cidx,
             embedding::DOUBLE[] AS cv
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
    asg AS (
      SELECT e.vec_id, c.cidx,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS cs
      FROM embeddings e CROSS JOIN cent c),
    best AS (
      SELECT vec_id, cidx AS cluster_id FROM (
        SELECT vec_id, cidx,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cs DESC, cidx) AS rn
        FROM asg) WHERE rn = 1),
    low AS (
      SELECT b.vec_id,
             MAX(ROUND(list_cosine_similarity(e1.embedding::DOUBLE[],
                                              e2.embedding::DOUBLE[]),
                       6)) AS max_lower_cos
      FROM best b
      JOIN best b2 ON b2.cluster_id = b.cluster_id AND b2.vec_id < b.vec_id
      JOIN embeddings e1 ON e1.vec_id = b.vec_id
      JOIN embeddings e2 ON e2.vec_id = b2.vec_id
      GROUP BY b.vec_id)
    SELECT b.vec_id, b.cluster_id, l.max_lower_cos,
           CAST(CASE WHEN COALESCE(l.max_lower_cos, -2) >= 0.4
                     THEN 1 ELSE 0 END AS BIGINT) AS is_dup
    FROM best b LEFT JOIN low l USING (vec_id)
"""


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means (k=4, 2 update rounds, deterministic
    lowest-id init) over the embedding table — the iterative clustering
    primitive under SemDeDup / topic bucketing, replayed exactly by the
    unrolled SQL twin (``stages.similarity.kmeans``)."""
    from feast_ray.stages.similarity import kmeans

    vecs = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return kmeans(vecs, id_col="vec_id", k=4, n_iter=2)


QUERIES_ML["kmeans_embeddings"] = q_kmeans_embeddings
ORACLE_SQL_ML["kmeans_embeddings"] = """
    WITH ev AS (
      SELECT vec_id, CAST(g.i AS BIGINT) AS i, embedding[g.i]::DOUBLE AS x
      FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) AS g(i)),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
             vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
    cent0 AS (SELECT c0.cid, ev.i, ev.x AS cx FROM c0 JOIN ev USING (vec_id)),
    d1 AS (
      SELECT ev.vec_id, c.cid,
             ROUND(SUM((ev.x - c.cx) * (ev.x - c.cx)), 6) AS d
      FROM ev JOIN cent0 c USING (i) GROUP BY ev.vec_id, c.cid),
    a1 AS (SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d1) WHERE rn = 1),
    m1 AS (SELECT a1.cid, ev.i, AVG(ev.x) AS cx
           FROM a1 JOIN ev USING (vec_id) GROUP BY a1.cid, ev.i),
    cent1 AS (SELECT c.cid, c.i, COALESCE(m1.cx, c.cx) AS cx
              FROM cent0 c LEFT JOIN m1 ON m1.cid = c.cid AND m1.i = c.i),
    d2 AS (
      SELECT ev.vec_id, c.cid,
             ROUND(SUM((ev.x - c.cx) * (ev.x - c.cx)), 6) AS d
      FROM ev JOIN cent1 c USING (i) GROUP BY ev.vec_id, c.cid),
    a2 AS (SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d2) WHERE rn = 1),
    m2 AS (SELECT a2.cid, ev.i, AVG(ev.x) AS cx
           FROM a2 JOIN ev USING (vec_id) GROUP BY a2.cid, ev.i),
    cent2 AS (SELECT c.cid, c.i, COALESCE(m2.cx, c.cx) AS cx
              FROM cent1 c LEFT JOIN m2 ON m2.cid = c.cid AND m2.i = c.i),
    d3 AS (
      SELECT ev.vec_id, c.cid,
             ROUND(SUM((ev.x - c.cx) * (ev.x - c.cx)), 6) AS d
      FROM ev JOIN cent2 c USING (i) GROUP BY ev.vec_id, c.cid)
    SELECT vec_id, cid AS cluster_id, d AS dist FROM (
      SELECT vec_id, cid, d,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM d3) WHERE rn = 1
"""


def q_pq_encode_embeddings(sf_dir: str):
    """Product-quantization encode (the ANN compression step IVF-PQ indexes
    build on): the 64-dim embedding splits into two 32-dim subspaces, each
    sub-quantized by the deterministic Lloyd kernel (k=4, 1 update round,
    lowest-id init — `stages.similarity.kmeans` on the sliced column), and
    every vector becomes (code_lo, code_hi) plus the reconstruction error
    = sum of the two rounded subspace distances.  Distribution: each
    subspace pass is the kmeans broadcast/partial pattern (no shuffle);
    the two code streams meet on one vec_id-keyed equi-join.  The SQL twin
    unrolls both subspace iterations exactly like the kmeans twin."""
    from feast_ray.stages.join import equi_join
    from feast_ray.stages.similarity import kmeans

    vecs = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def sub(lo: int, hi: int):
        def slice_fn(t: pa.Table) -> pa.Table:
            emb = t["embedding"]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            return pa.table(
                {"vec_id": t["vec_id"],
                 "embedding": pc.list_slice(emb, lo, hi)}
            )

        return vecs.map_batches(
            slice_fn, batch_format="pyarrow", zero_copy_batch=True
        )

    lo_assign = kmeans(sub(0, 32), id_col="vec_id", k=4, n_iter=1)
    hi_assign = kmeans(sub(32, 64), id_col="vec_id", k=4, n_iter=1)

    def lo_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": t["vec_id"], "code_lo": t["cluster_id"],
             "d_lo": t["dist"]}
        )

    def hi_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": t["vec_id"], "code_hi": t["cluster_id"],
             "d_hi": t["dist"]}
        )

    j = equi_join(
        lo_assign.map_batches(lo_prep, batch_format="pyarrow", zero_copy_batch=True),
        hi_assign.map_batches(hi_prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["vec_id"],
        how="inner",
    )

    def finish(t: pa.Table) -> pa.Table:
        err = pc.add(t["d_lo"], t["d_hi"])
        return pa.table(
            {"vec_id": t["vec_id"], "code_lo": t["code_lo"],
             "code_hi": t["code_hi"], "recon_err": err}
        )

    return j.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _pq_sub_sql(tag: str, lo: int, hi: int) -> str:
    """One subspace's unrolled 1-iteration kmeans CTE chain ending in
    ``{tag}_final(vec_id, cid, d)`` — dims are 1-based [lo, hi]."""
    return f"""
    {tag}_ev AS (
      SELECT vec_id, CAST(g.i AS BIGINT) AS i, embedding[g.i]::DOUBLE AS x
      FROM embeddings, LATERAL unnest(range({lo}, {hi + 1})) AS g(i)),
    {tag}_c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
             vec_id
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
    {tag}_cent0 AS (SELECT c.cid, ev.i, ev.x AS cx
                    FROM {tag}_c0 c JOIN {tag}_ev ev USING (vec_id)),
    {tag}_d1 AS (
      SELECT ev.vec_id, c.cid,
             ROUND(SUM((ev.x - c.cx) * (ev.x - c.cx)), 6) AS d
      FROM {tag}_ev ev JOIN {tag}_cent0 c USING (i)
      GROUP BY ev.vec_id, c.cid),
    {tag}_a1 AS (SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM {tag}_d1) WHERE rn = 1),
    {tag}_m1 AS (SELECT a.cid, ev.i, AVG(ev.x) AS cx
                 FROM {tag}_a1 a JOIN {tag}_ev ev USING (vec_id)
                 GROUP BY a.cid, ev.i),
    {tag}_cent1 AS (SELECT c.cid, c.i, COALESCE(m.cx, c.cx) AS cx
                    FROM {tag}_cent0 c
                    LEFT JOIN {tag}_m1 m ON m.cid = c.cid AND m.i = c.i),
    {tag}_d2 AS (
      SELECT ev.vec_id, c.cid,
             ROUND(SUM((ev.x - c.cx) * (ev.x - c.cx)), 6) AS d
      FROM {tag}_ev ev JOIN {tag}_cent1 c USING (i)
      GROUP BY ev.vec_id, c.cid),
    {tag}_final AS (SELECT vec_id, cid, d FROM (
        SELECT vec_id, cid, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM {tag}_d2) WHERE rn = 1)"""


QUERIES_ML["pq_encode_embeddings"] = q_pq_encode_embeddings
ORACLE_SQL_ML["pq_encode_embeddings"] = f"""
    WITH {_pq_sub_sql("lo", 1, 32)},
    {_pq_sub_sql("hi", 33, 64)}
    SELECT l.vec_id, l.cid AS code_lo, h.cid AS code_hi,
           l.d + h.d AS recon_err
    FROM lo_final l JOIN hi_final h USING (vec_id)
"""


def q_lift_type_pairs_session(sf_dir: str):
    """Association-rule LIFT over session co-occurrence (the recsys
    evidence-strength normalization of `covisit_types_session`): for every
    unordered event-type pair, lift = P(A,B) / (P(A) P(B)) on the
    (user, session) universe = (N_total * n_ab) / (n_a * n_b) — lift > 1
    means the pair co-occurs more than independence predicts.

    Plan: the pair counts reuse the covisitation pipeline unchanged; the
    per-type session counts and the total session count come from ONE
    additional grouped exchange (distinct (group, session, type) triples
    bincounted per type, plus a sentinel row counting distinct sessions).
    The summed type table is exactly |type domain|+1 rows — materializing
    it on the driver is bounded by the category domain, never by data —
    and is closed over the tiny pair-table map stage.  All factors are
    int64; the single float division matches the twin bit-exactly
    (products < 2^53)."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import sum_by
    from feast_ray.stages.windows import sessionize_ids

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])
    pairs = q_covisit_types_session(sf_dir)

    SENT = "\x00total_sessions"

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        if n_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        enc = t["event_type"].combine_chunks().dictionary_encode()
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sess = sessionize_ids(ts, starts, SESSION_GAP_US)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        smax = int(sess.max()) + 1
        gs = gidx * smax + sess
        n_total = len(np.unique(gs))
        triples = np.unique(gs * k + codes)
        per_type = np.bincount(triples % k, minlength=k).astype(np.int64)
        types = enc.dictionary.cast(pa.string()).to_pylist() + [SENT]
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "n": pa.array(
                    np.concatenate((per_type, [np.int64(n_total)]))
                ),
            }
        )

    partials = grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])
    counts = sum_by(partials, ["event_type"], ["n"])
    # |type domain| + 1 rows — bounded by the category domain, not by data
    rows = counts.take_all()
    per_type = {r["event_type"]: int(r["n"]) for r in rows}
    n_total = per_type.pop(SENT)

    def add_lift(t: pa.Table) -> pa.Table:
        ta = t["type_a"].to_pylist()
        tb = t["type_b"].to_pylist()
        ns = t["n_sess"].to_pylist()
        lift = [
            (n_total * n) / (per_type[a] * per_type[b])
            for a, b, n in zip(ta, tb, ns)
        ]
        return t.append_column("lift", pa.array(lift, pa.float64()))

    return pairs.map_batches(add_lift, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["lift_type_pairs_session"] = q_lift_type_pairs_session
ORACLE_SQL_ML["lift_type_pairs_session"] = f"""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    s AS (
      SELECT user_id, event_type,
             SUM(CASE WHEN prev_ts IS NOT NULL
                       AND epoch_us(ts) - epoch_us(prev_ts) <= {SESSION_GAP_US}
                      THEN 0 ELSE 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e),
    st AS (SELECT DISTINCT user_id, session_id, event_type FROM s),
    tc AS (SELECT event_type, COUNT(*) AS n FROM st GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n
            FROM (SELECT DISTINCT user_id, session_id FROM s)),
    pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                  COUNT(*) AS n_sess
           FROM st a JOIN st b
             ON a.user_id = b.user_id AND a.session_id = b.session_id
                AND a.event_type < b.event_type
           GROUP BY 1, 2)
    SELECT pr.type_a, pr.type_b, CAST(pr.n_sess AS BIGINT) AS n_sess,
           CAST(tot.n * pr.n_sess AS DOUBLE) / (ta.n * tb.n) AS lift
    FROM pr
    CROSS JOIN tot
    JOIN tc ta ON ta.event_type = pr.type_a
    JOIN tc tb ON tb.event_type = pr.type_b
"""


def q_attribution_linear(sf_dir: str):
    """Multi-touch LINEAR attribution at purchase granularity (the
    fractional-credit companion to `attribution_last_touch`): every
    non-purchase event in the 7 days up to and including the purchase
    shares the purchase's revenue equally; the report emits one row per
    (purchase, touching type) with the type's touch count and its credit
    = cents * n_of_type / n_touches.  Touchless purchases emit a 'none'
    row carrying full credit.

    Kernel: ONE grouped exchange on user — trailing [t-7d, t] window
    bounds via the shared `rolling_time_bounds` helper, per-type prefix
    sums (type domain is a dictionary, so the loop is over categories,
    never rows), vectorized nonzero expansion.  All factors int64; the
    single float division per emitted row matches the twin bit-exactly."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.windows import rolling_time_bounds

    WIN_US = 7 * 24 * 3600 * 1_000_000
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type", "value"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        enc = t["event_type"].combine_chunks().dictionary_encode()
        empty = pa.table(
            {
                "user_id": t["user_id"].combine_chunks().slice(0, 0),
                "event_id": t["event_id"].combine_chunks().slice(0, 0),
                "touch_type": pa.array([], pa.string()),
                "n_touches": pa.array([], pa.int64()),
                "n_of_type": pa.array([], pa.int64()),
                "credit_cents": pa.array([], pa.float64()),
            }
        )
        if n_rows == 0:
            return empty
        tarr = t["ts"].combine_chunks()
        if pa.types.is_timestamp(tarr.type):
            tarr = tarr.cast(pa.timestamp("us", tz=tarr.type.tz))
        ts = tarr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        types = enc.dictionary.cast(pa.string()).to_pylist()
        ws, we = rolling_time_bounds(ts, starts, WIN_US)
        try:
            p_code = types.index("purchase")
        except ValueError:
            return empty
        pi = np.flatnonzero(codes == p_code)
        if len(pi) == 0:
            return empty
        touch_codes = [c for c in range(len(types)) if c != p_code]
        cnts = np.empty((len(pi), len(touch_codes)), dtype=np.int64)
        for j, c in enumerate(touch_codes):
            P = np.concatenate(([0], np.cumsum(codes == c)))
            cnts[:, j] = P[we[pi]] - P[ws[pi]]
        n_touch = cnts.sum(axis=1)
        cents = np.round(
            t["value"].combine_chunks().cast(pa.float64()).fill_null(0.0)
            .to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)[pi]
        # rows with at least one touch: one output row per nonzero cell
        ri, ci = np.nonzero(cnts)
        n_of_type = cnts[ri, ci]
        credit = (cents[ri] * n_of_type) / n_touch[ri]
        # touchless purchases: a 'none' row carrying the full cents
        zi = np.flatnonzero(n_touch == 0)
        uid = t["user_id"].combine_chunks()
        eid = t["event_id"].combine_chunks()
        type_strs = [types[touch_codes[c]] for c in ci] + ["none"] * len(zi)
        take = pa.array(np.concatenate((pi[ri], pi[zi])))
        return pa.table(
            {
                "user_id": pc.take(uid, take),
                "event_id": pc.take(eid, take),
                "touch_type": pa.array(type_strs, pa.string()),
                "n_touches": pa.array(
                    np.concatenate((n_touch[ri], np.zeros(len(zi), np.int64)))
                ),
                "n_of_type": pa.array(
                    np.concatenate((n_of_type, np.zeros(len(zi), np.int64)))
                ),
                "credit_cents": pa.array(
                    np.concatenate((credit, cents[zi].astype(np.float64)))
                ),
            }
        )

    return grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])


QUERIES_ML["attribution_linear"] = q_attribution_linear
ORACLE_SQL_ML["attribution_linear"] = """
    WITH p AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT user_id, ts, event_type AS touch_type
      FROM events WHERE event_type <> 'purchase'),
    cnt AS (
      SELECT p.event_id, p.user_id, p.cents, t.touch_type,
             COUNT(*) AS n_of_type
      FROM p JOIN t
        ON t.user_id = p.user_id AND t.ts <= p.ts
       AND epoch_us(p.ts) - epoch_us(t.ts) <= 604800000000
      GROUP BY 1, 2, 3, 4),
    tot AS (SELECT event_id, SUM(n_of_type) AS n_touches FROM cnt GROUP BY 1)
    SELECT c.user_id, c.event_id, c.touch_type,
           CAST(tot.n_touches AS BIGINT) AS n_touches,
           CAST(c.n_of_type AS BIGINT) AS n_of_type,
           CAST(c.cents * c.n_of_type AS DOUBLE) / tot.n_touches
             AS credit_cents
    FROM cnt c JOIN tot USING (event_id)
    UNION ALL
    SELECT p.user_id, p.event_id, 'none', 0, 0, CAST(p.cents AS DOUBLE)
    FROM p
    WHERE NOT EXISTS (
      SELECT 1 FROM t
      WHERE t.user_id = p.user_id AND t.ts <= p.ts
        AND epoch_us(p.ts) - epoch_us(t.ts) <= 604800000000)
"""


def q_survival_km_signup(sf_dir: str):
    """Kaplan-Meier survival of time-to-first-purchase after signup — the
    survival-analysis feature head (churn/conversion curves).  Per user:
    duration = days from first signup to first subsequent purchase (event)
    or to the user's last observed event (right-censored).  Output: one
    row per EVENT day — n_risk, n_events, n_censored, hazard = d/n, and
    the KM survival estimate prod(1 - d_i/n_i) multiplied in ascending
    day order (np.cumprod and the twin's recursive CTE multiply in the
    identical sequence, so the floats are bit-exact).

    Scale: per-user reduction in one grouped exchange; the per-day exit
    table is bounded by the DAY DOMAIN (span/86400), never by user count —
    materializing it on the driver is the documented bounded step (same
    contract as the histogram/profile queries)."""
    import pandas as pd

    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import partial_count_sum

    DAY_US = 86_400_000_000
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        if n_rows == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()), "ev": pa.array([], pa.int64())}
            )
        tarr = t["ts"].combine_chunks()
        if pa.types.is_timestamp(tarr.type):
            tarr = tarr.cast(pa.timestamp("us", tz=tarr.type.tz))
        ts = tarr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = t["event_type"].combine_chunks()
        is_s = pc.equal(et, "signup").to_numpy(zero_copy_only=False)
        is_p = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        n_g = len(sizes)
        BIG = np.iinfo(np.int64).max
        # first signup ts per group (rows are ts-sorted within group)
        s_ts = np.full(n_g, BIG, dtype=np.int64)
        np.minimum.at(s_ts, gidx[is_s], ts[is_s])
        # first purchase AT OR AFTER the group's signup
        p_ok = is_p & (ts >= s_ts[gidx])
        p_ts = np.full(n_g, BIG, dtype=np.int64)
        np.minimum.at(p_ts, gidx[p_ok], ts[p_ok])
        c_ts = ts[starts[1:] - 1] if n_g else np.empty(0, np.int64)
        has_s = s_ts != BIG
        has_p = p_ts != BIG
        end = np.where(has_p, p_ts, c_ts)
        day = (end - s_ts) // DAY_US
        return pa.table(
            {
                "day": pa.array(day[has_s]),
                "ev": pa.array(has_p[has_s].astype(np.int64)),
            }
        )

    per_user = grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])
    exits = partial_count_sum(per_user, ["day", "ev"], count_name="n")
    # bounded by the day domain x 2, not by user count
    rows = exits.take_all()
    cols = ["day", "n_risk", "n_events", "n_censored", "hazard", "survival"]
    if not rows:
        return pd.DataFrame({c: pd.Series(dtype="int64" if i < 4 else "float64")
                             for i, c in enumerate(cols)})
    df = pd.DataFrame(rows).sort_values("day").reset_index(drop=True)
    days = np.sort(df["day"].unique())
    d_ev = np.zeros(len(days), dtype=np.int64)
    d_cen = np.zeros(len(days), dtype=np.int64)
    pos = {d: i for i, d in enumerate(days)}
    for _, r in df.iterrows():
        (d_ev if r["ev"] == 1 else d_cen)[pos[r["day"]]] += r["n"]
    total = int(d_ev.sum() + d_cen.sum())
    exits_per_day = d_ev + d_cen
    n_risk = total - np.concatenate(([0], np.cumsum(exits_per_day)[:-1]))
    mask = d_ev > 0
    hazard = d_ev[mask] / n_risk[mask]
    survival = np.cumprod(1.0 - hazard)
    return pd.DataFrame(
        {
            "day": days[mask],
            "n_risk": n_risk[mask],
            "n_events": d_ev[mask],
            "n_censored": d_cen[mask],
            "hazard": hazard,
            "survival": survival,
        }
    )


QUERIES_ML["survival_km_signup"] = q_survival_km_signup
ORACLE_SQL_ML["survival_km_signup"] = """
    WITH RECURSIVE s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts GROUP BY 1),
    lastev AS (SELECT user_id, MAX(ts) AS c_ts FROM events GROUP BY 1),
    u AS (
      SELECT s.user_id,
             CASE WHEN fp.p_ts IS NOT NULL
                  THEN (epoch_us(fp.p_ts) - epoch_us(s.s_ts)) // 86400000000
                  ELSE (epoch_us(lastev.c_ts) - epoch_us(s.s_ts)) // 86400000000
             END AS day,
             CASE WHEN fp.p_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM s LEFT JOIN fp USING (user_id) JOIN lastev USING (user_id)),
    agg AS (
      SELECT day, SUM(ev) AS d, COUNT(*) - SUM(ev) AS cens, COUNT(*) AS exits
      FROM u GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM u),
    risk AS (
      SELECT day, d, cens,
             tot.n - COALESCE(SUM(exits) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM agg, tot),
    evd AS (
      SELECT day, n_risk, d, cens, CAST(d AS DOUBLE) / n_risk AS hazard,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM risk WHERE d > 0),
    km AS (
      SELECT rn, day, n_risk, d, cens, hazard, 1.0 - hazard AS surv
      FROM evd WHERE rn = 1
      UNION ALL
      SELECT e.rn, e.day, e.n_risk, e.d, e.cens, e.hazard,
             km.surv * (1.0 - e.hazard)
      FROM evd e JOIN km ON e.rn = km.rn + 1)
    SELECT day, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(cens AS BIGINT) AS n_censored,
           hazard, surv AS survival
    FROM km
"""


def q_entropy_type_user(sf_dir: str):
    """Per-user Shannon entropy (bits) of the event-type mix
    (``stages.stats.grouped_entropy``): the behavioral-diversity feature —
    one map-side-combined exchange to (user, type) counts, fixed-point
    micro-bit terms so the cross-type sum is exact int64, final float ops
    in a DuckDB-bit-equal schedule (pc.log2)."""
    from feast_ray.stages.stats import grouped_entropy

    ds = _events(sf_dir, ["user_id", "event_type"])
    return grouped_entropy(ds, "user_id", "event_type",
                           n_name="n", types_name="n_types")


QUERIES_ML["entropy_type_user"] = q_entropy_type_user
ORACLE_SQL_ML["entropy_type_user"] = """
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT user_id, cnt,
             CAST(ROUND(cnt * log2(cnt) * 1000000) AS BIGINT) AS term
      FROM c),
    s AS (
      SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(term) AS BIGINT) AS ts
      FROM t GROUP BY 1)
    SELECT user_id, n, n_types,
           log2(CAST(n AS DOUBLE))
             - (CAST(ts AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE)
             AS entropy_bits
    FROM s
"""


def q_centered_ma_events(sf_dir: str):
    """Centered 5-row moving average of value cents per user
    (``stages.windows.add_group_centered_mean``): the offline smoothing
    window (2 preceding + 2 following, clipped at entity edges) — exact
    int64 prefix-sum window sums, one IEEE divide."""
    from feast_ray.stages.windows import add_group_centered_mean

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return _with_cents(t).drop_columns(["value"])

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = add_group_centered_mean(
        ds, "user_id", "cents", order_cols=["ts", "event_id"],
        before=2, after=2,
    )
    return out.select_columns(["user_id", "event_id", "c_ma", "w_n"])


QUERIES_ML["centered_ma_events"] = q_centered_ma_events
ORACLE_SQL_ML["centered_ma_events"] = """
    WITH e AS (
      SELECT user_id, ts, event_id, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL)
    SELECT user_id, event_id,
           CAST(SUM(c) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE)
             AS c_ma,
           CAST(COUNT(*) OVER w AS BIGINT) AS w_n
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
"""


def q_purged_split_events(sf_dir: str):
    """Chronological train/embargo/test labels over the event stream
    (``stages.sampling.time_split``): 80% of the global time span trains,
    one day after the cutoff is embargoed (purged split) — integer-
    microsecond arithmetic, global extrema from one-row-per-block
    partials, stateless labeling map."""
    from feast_ray.stages.sampling import time_split

    ds = _events(sf_dir, ["event_id", "ts"])
    out = time_split(ds, ts_col="ts", train_frac_pct=80,
                     embargo_us=86_400_000_000)
    return out.select_columns(["event_id", "split"])


QUERIES_ML["purged_split_events"] = q_purged_split_events
ORACLE_SQL_ML["purged_split_events"] = """
    WITH b AS (
      SELECT MIN(epoch_us(ts)) AS tmin, MAX(epoch_us(ts)) AS tmax
      FROM events)
    SELECT event_id,
           CASE
             WHEN epoch_us(ts) <= tmin + ((tmax - tmin) * 80) // 100
               THEN 'train'
             WHEN epoch_us(ts) <= tmin + ((tmax - tmin) * 80) // 100
                                  + 86400000000
               THEN 'embargo'
             ELSE 'test'
           END AS split
    FROM events, b
"""


def q_embedding_moments(sf_dir: str):
    """Per-dimension count/sum/min/max/mean profile of the embedding table
    (``stages.stats.list_col_moments``): fixed-point micro units keep the
    cross-row sums exact; per-block partials reduce each block to d rows
    before the one tiny d-group exchange."""
    from feast_ray.stages.stats import list_col_moments

    ds = read_pq(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return list_col_moments(ds, "embedding")


QUERIES_ML["embedding_moments"] = q_embedding_moments
ORACLE_SQL_ML["embedding_moments"] = """
    WITH x AS (
      SELECT generate_subscripts(embedding, 1) AS dim,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS micro
      FROM embeddings),
    s AS (
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(micro) AS BIGINT) AS s_micro,
             CAST(MIN(micro) AS BIGINT) AS min_micro,
             CAST(MAX(micro) AS BIGINT) AS max_micro
      FROM x GROUP BY dim)
    SELECT CAST(dim AS BIGINT) AS dim, n, s_micro, min_micro, max_micro,
           (CAST(s_micro AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE) AS mean_v
    FROM s
"""


def q_benford_values(sf_dir: str):
    """Benford leading-digit profile of positive value cents — the
    fabricated-data / fraud screen over a monetary column.  Leading digit
    via decimal-string slicing (bit-exact vs SQL substr; no float log10
    edge cases), counts via ONE map-side-combined exchange."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["value"])

    def digit(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        pos = pc.greater(c, 0)
        c = c.filter(pos)
        d = pc.cast(pc.utf8_slice_codeunits(pc.cast(c, pa.string()), 0, 1),
                    pa.int64())
        return pa.table({"digit": d})

    dd = ds.map_batches(digit, batch_format="pyarrow", zero_copy_batch=True)
    return partial_count_sum(dd, ["digit"], count_name="n")


QUERIES_ML["benford_values"] = q_benford_values
ORACLE_SQL_ML["benford_values"] = """
    WITH c AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM c WHERE cents > 0)
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY digit
"""


def q_chisq_type_drift(sf_dir: str):
    """Chi-square independence statistic of the event-type x time-half
    contingency (halves split at the midpoint of the global time span) —
    the categorical drift monitor between two eras of the stream.  Counts
    come from one map-side-combined exchange; the full type x half grid
    (bounded by the categorical domain) folds on the driver with
    fixed-point micro terms so the cell sum is exact and order-free."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["event_type", "ts"]).materialize()

    def extrema(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table({"mn": pa.array([pc.min(us).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(us).as_py()], pa.int64())})

    rows = ds.map_batches(
        extrema, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    tmin = min(int(r["mn"]) for r in rows)
    tmax = max(int(r["mx"]) for r in rows)
    mid = tmin + (tmax - tmin) // 2

    def half(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "half": pa.array((us > mid).astype(np.int64)),
        })

    obs = partial_count_sum(
        ds.map_batches(half, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "half"], count_name="obs",
    ).take_all()  # bounded: |type domain| x 2 rows

    types = sorted({r["event_type"] for r in obs})
    grid = np.zeros((len(types), 2), dtype=np.int64)
    ti = {t: i for i, t in enumerate(types)}
    for r in obs:
        grid[ti[r["event_type"]], int(r["half"])] = int(r["obs"])
    rt = grid.sum(axis=1, dtype=np.int64)
    ct = grid.sum(axis=0, dtype=np.int64)
    n = int(grid.sum())
    # fixed schedule per cell, micro fixed-point, exact int sum (pc.round
    # half-away matches SQL ROUND)
    e = (rt.astype(np.float64)[:, None] * ct.astype(np.float64)[None, :]) / float(n)
    d = grid.astype(np.float64) - e
    term = pc.cast(
        pc.round(pa.array((d * d / e).ravel() * 1_000_000.0),
                 round_mode="half_towards_infinity"),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    chi2 = float(int(term.sum())) / 1_000_000.0
    return pa.table({
        "n_cells": pa.array([grid.size], pa.int64()),
        "dof": pa.array([(len(types) - 1) * 1], pa.int64()),
        "chi2": pa.array([chi2], pa.float64()),
    })


QUERIES_ML["chisq_type_drift"] = q_chisq_type_drift
ORACLE_SQL_ML["chisq_type_drift"] = """
    WITH b AS (
      SELECT MIN(epoch_us(ts)) AS tmin, MAX(epoch_us(ts)) AS tmax
      FROM events),
    e AS (
      SELECT event_type,
             CASE WHEN epoch_us(ts) > tmin + (tmax - tmin) // 2
                  THEN 1 ELSE 0 END AS half
      FROM events, b),
    o AS (
      SELECT event_type, half, CAST(COUNT(*) AS BIGINT) AS obs
      FROM e GROUP BY 1, 2),
    grid AS (
      SELECT t.event_type, h.half, COALESCE(o.obs, 0) AS obs
      FROM (SELECT DISTINCT event_type FROM o) t
      CROSS JOIN (VALUES (0), (1)) h(half)
      LEFT JOIN o ON o.event_type = t.event_type AND o.half = h.half),
    m AS (
      SELECT obs,
             CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
             CAST(SUM(obs) OVER (PARTITION BY half) AS BIGINT) AS ct,
             CAST(SUM(obs) OVER () AS BIGINT) AS n
      FROM grid),
    t2 AS (
      SELECT CAST(ROUND(
               (CAST(obs AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(obs AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000) AS BIGINT) AS term
      FROM m),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                 CAST(SUM(term) AS BIGINT) AS ts FROM t2)
    SELECT n_cells,
           CAST((SELECT COUNT(DISTINCT event_type) FROM o) - 1 AS BIGINT) AS dof,
           CAST(ts AS DOUBLE) / 1000000.0 AS chi2
    FROM s
"""


def q_entity_split_events(sf_dir: str):
    """Group-aware deterministic train/val/test split of the event stream
    (``stages.sampling.entity_split``): all of a user's rows share one
    split (mix64(user_id) % 100 under 80/10/10 thresholds) — the
    entity-leakage-safe complement of the purged time split.  Stateless
    map, no shuffle."""
    from feast_ray.stages.sampling import entity_split

    ds = _events(sf_dir, ["event_id", "user_id"])
    return entity_split(ds, key_col="user_id", train_pct=80, val_pct=10)


QUERIES_ML["entity_split_events"] = q_entity_split_events
ORACLE_SQL_ML["entity_split_events"] = f"""
    WITH h AS (
      SELECT event_id, user_id,
             {_mix64_sql("user_id")} % 100 AS hv
      FROM events)
    SELECT event_id, user_id,
           CASE WHEN hv < 80 THEN 'train'
                WHEN hv < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM h
"""


def q_percent_rank_global(sf_dir: str):
    """Continuous global percent rank of value cents over the whole stream
    (``stages.stats.global_order_index``): rank/(n-1) with a unique
    (cents, event_id) total order — the global normalization feature and
    the continuous sibling of the equal-frequency decile."""
    from feast_ray.stages.stats import global_order_index

    ds = _events(sf_dir, ["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return pa.table({
            "event_id": t["event_id"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).materialize()
    ranked = global_order_index(dv, "cents", tiebreak="event_id", pos_name="r0")
    n = dv.count()

    def fin(t: pa.Table) -> pa.Table:
        pr = pc.divide(
            pc.cast(t["r0"], pa.float64()), float(n - 1)
        )
        return pa.table({
            "event_id": t["event_id"], "cents": t["cents"], "pct_rank": pr,
        })

    return ranked.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["percent_rank_global"] = q_percent_rank_global
ORACLE_SQL_ML["percent_rank_global"] = """
    WITH e AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL)
    SELECT event_id, cents,
           CAST(ROW_NUMBER() OVER (ORDER BY cents, event_id) - 1 AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM e) - 1 AS DOUBLE) AS pct_rank
    FROM e
"""


def q_calendar_events(sf_dir: str):
    """Calendar covariates per event (``stages.normalize.calendar_features``):
    year/month/dow/hour/is_weekend from pure integer epoch arithmetic
    (Hinnant civil-date derivation), bit-equal to SQL date functions.
    Stateless map, zero shuffles."""
    from feast_ray.stages.normalize import calendar_features

    ds = _events(sf_dir, ["event_id", "ts"])
    out = calendar_features(ds, ts_col="ts")
    return out.select_columns(
        ["event_id", "year", "month", "dow", "hour", "is_weekend"]
    )


QUERIES_ML["calendar_events"] = q_calendar_events
ORACLE_SQL_ML["calendar_events"] = """
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS year,
           CAST(month(ts) AS BIGINT) AS month,
           CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                AS BIGINT) AS is_weekend
    FROM events
"""


def q_geomean_value_user(sf_dir: str):
    """Per-user geometric mean of positive value cents
    (``stages.stats.grouped_geomean``): micro-nat fixed-point ln terms on
    the map-side-combined exchange, exp(avg) in a DuckDB-bit-equal
    schedule."""
    from feast_ray.stages.stats import grouped_geomean

    ds = _events(sf_dir, ["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        t = pa.table({"user_id": t["user_id"], "cents": c})
        return t.filter(pc.greater(t["cents"], 0))

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_geomean(dv, "user_id", "cents", out_col="geomean_cents")


QUERIES_ML["geomean_value_user"] = q_geomean_value_user
ORACLE_SQL_ML["geomean_value_user"] = """
    WITH e AS (
      SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    t AS (
      SELECT user_id, CAST(ROUND(ln(c) * 1000000) AS BIGINT) AS term
      FROM e WHERE c > 0),
    s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(term) AS BIGINT) AS ts
      FROM t GROUP BY 1)
    SELECT user_id, n,
           exp((CAST(ts AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE))
             AS geomean_cents
    FROM s
"""


def q_knn_density_embeddings(sf_dir: str):
    """Per-vector density score: cosine similarity to the 3rd-nearest
    neighbor (the LOF-style sparse-region detector — low kth-neighbor
    similarity = isolated point = outlier or novel sample).  Rides the
    exact blockpair kNN graph (``stages.similarity.knn_graph``); output is
    the rank-3 edge per node."""
    from feast_ray.stages.similarity import knn_graph

    ds = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    g = knn_graph(ds, k=3, id_col="vec_id", emb_col="embedding")

    def pick(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["nbr_rank"], 3))
        return pa.table({
            "vec_id": t["vec_id"],
            "kth_cos": t["cos_sim"],
        })

    return g.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["knn_density_embeddings"] = q_knn_density_embeddings
ORACLE_SQL_ML["knn_density_embeddings"] = """
    WITH s AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
    r AS (
      SELECT vec_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cos_sim DESC, nbr_id)
                  AS BIGINT) AS nbr_rank
      FROM s)
    SELECT vec_id, cos_sim AS kth_cos FROM r WHERE nbr_rank = 3
"""


def q_embedding_covariance(sf_dir: str):
    """Upper-triangle covariance matrix of the embedding table
    (``stages.stats.list_col_covariance``): per-block exact int64 Gram
    partials via the augmented-matrix trick, one tiny (d+1)(d+2)/2-group
    exchange — the whitening / PCA-prep summary."""
    from feast_ray.stages.stats import list_col_covariance

    ds = read_pq(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return list_col_covariance(ds, "embedding")


QUERIES_ML["embedding_covariance"] = q_embedding_covariance
ORACLE_SQL_ML["embedding_covariance"] = """
    WITH x AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS v
      FROM embeddings),
    p AS (
      SELECT a.dim AS i, b.dim AS j,
             CAST(SUM(a.v * b.v) AS BIGINT) AS sxy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
      GROUP BY 1, 2),
    m AS (SELECT dim, CAST(SUM(v) AS BIGINT) AS s FROM x GROUP BY 1)
    SELECT CAST(p.i AS BIGINT) AS dim_a, CAST(p.j AS BIGINT) AS dim_b,
           p.n AS n,
           ((CAST(p.sxy AS DOUBLE)
               - CAST(ma.s AS DOUBLE) * CAST(mb.s AS DOUBLE)
                 / CAST(p.n AS DOUBLE))
              / CAST(p.n AS DOUBLE)) / 1000000000000.0 AS cov
    FROM p JOIN m ma ON ma.dim = p.i JOIN m mb ON mb.dim = p.j
"""


def q_transition_entropy_user(sf_dir: str):
    """Per-user Shannon entropy of the event-type TRANSITION distribution
    (how predictable is this user's behavioral grammar): lag pairs form
    inside one grouped exchange, then ``grouped_entropy`` over the pair
    category — low entropy = habitual loops, high = erratic."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import grouped_entropy

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def pair_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        et = t["event_type"].combine_chunks()
        uid = t["user_id"].combine_chunks()
        if n_rows == 0:
            return pa.table({
                "user_id": uid.slice(0, 0),
                "pair": pa.array([], pa.string()),
            })
        mask = np.ones(max(n_rows - 1, 0), dtype=bool)
        last = starts[1:] - 1
        mask[last[last < n_rows - 1]] = False
        idx = np.flatnonzero(mask)
        frm = pc.take(et, pa.array(idx))
        to = pc.take(et, pa.array(idx + 1))
        return pa.table({
            "user_id": pc.take(uid, pa.array(idx)),
            "pair": pc.binary_join_element_wise(frm, to, ">"),
        })

    pairs = grouped_map(
        ds, ["user_id"], pair_kernel, sort_keys=["ts", "event_id"]
    )
    return grouped_entropy(pairs, "user_id", "pair",
                           n_name="n_transitions", types_name="n_pairs")


QUERIES_ML["transition_entropy_user"] = q_transition_entropy_user
ORACLE_SQL_ML["transition_entropy_user"] = """
    WITH seq AS (
      SELECT user_id, event_type || '>' ||
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS pair
      FROM events),
    c AS (
      SELECT user_id, pair, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE pair IS NOT NULL GROUP BY 1, 2),
    t AS (
      SELECT user_id, cnt,
             CAST(ROUND(cnt * log2(cnt) * 1000000) AS BIGINT) AS term
      FROM c),
    s AS (
      SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_transitions,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(term) AS BIGINT) AS ts
      FROM t GROUP BY 1)
    SELECT user_id, n_transitions, n_pairs,
           log2(CAST(n_transitions AS DOUBLE))
             - (CAST(ts AS DOUBLE) / 1000000.0)
               / CAST(n_transitions AS DOUBLE) AS entropy_bits
    FROM s
"""


def q_wilson_ci_types(sf_dir: str):
    """Per-event-type big-purchase rate with 95% Wilson score interval —
    the uncertainty-aware conversion metric (small-n types get wide,
    well-behaved bounds where the normal interval fails).  k and n are
    exact int64 off one map-side-combined exchange; the interval is a
    fixed IEEE float schedule (sqrt is correctly rounded per IEEE-754, so
    pyarrow and DuckDB agree bitwise)."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "big": pc.cast(pc.greater_equal(c, 10_000), pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_count_sum(dv, ["event_type"], "big",
                            count_name="n", sum_name="k")

    def fin(t: pa.Table) -> pa.Table:
        nd = t["n"].combine_chunks().cast(pa.float64())
        kd = t["k"].combine_chunks().cast(pa.float64())
        # NB: DuckDB folds the literal product 1.96*1.96 in exact DECIMAL
        # arithmetic (3.8416) BEFORE casting to double; squaring the double
        # 1.96 lands one ulp away.  Use the decimal-exact constant.
        z, z2 = 1.96, 3.8416
        ph = pc.divide(kd, nd)
        denom = pc.add(1.0, pc.divide(z2, nd))
        center = pc.divide(
            pc.add(ph, pc.divide(z2, pc.multiply(2.0, nd))), denom
        )
        half = pc.divide(
            pc.multiply(
                z,
                pc.sqrt(
                    pc.add(
                        pc.divide(pc.multiply(ph, pc.subtract(1.0, ph)), nd),
                        pc.divide(z2, pc.multiply(pc.multiply(4.0, nd), nd)),
                    )
                ),
            ),
            denom,
        )
        return pa.table({
            "event_type": t["event_type"],
            "n": t["n"].combine_chunks().cast(pa.int64()),
            "k": t["k"].combine_chunks().cast(pa.int64()),
            "rate": ph,
            "wilson_lo": pc.subtract(center, half),
            "wilson_hi": pc.add(center, half),
        })

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["wilson_ci_types"] = q_wilson_ci_types
ORACLE_SQL_ML["wilson_ci_types"] = """
    WITH e AS (
      SELECT event_type,
             CASE WHEN CAST(ROUND(value * 100) AS BIGINT) >= 10000
                  THEN 1 ELSE 0 END AS big
      FROM events WHERE value IS NOT NULL),
    a AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(big) AS BIGINT) AS k
      FROM e GROUP BY 1),
    f AS (
      SELECT event_type, n, k,
             CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
             1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE) AS denom
      FROM a)
    SELECT event_type, n, k, ph AS rate,
           (ph + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))) / denom
             - 1.96 * sqrt(ph * (1.0 - ph) / CAST(n AS DOUBLE)
                           + (1.96 * 1.96)
                             / ((4.0 * CAST(n AS DOUBLE)) * CAST(n AS DOUBLE)))
               / denom AS wilson_lo,
           (ph + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))) / denom
             + 1.96 * sqrt(ph * (1.0 - ph) / CAST(n AS DOUBLE)
                           + (1.96 * 1.96)
                             / ((4.0 * CAST(n AS DOUBLE)) * CAST(n AS DOUBLE)))
               / denom AS wilson_hi
    FROM f
"""


def q_circular_hour_user(sf_dir: str):
    """Per-user circular time-of-day statistics
    (``stages.stats.grouped_circular_time``): resultant length R (activity
    concentration around one time of day) + circular mean angle — the
    cyclically-correct replacement for "average hour"."""
    from feast_ray.stages.stats import grouped_circular_time

    ds = _events(sf_dir, ["user_id", "ts"])
    return grouped_circular_time(ds, "user_id", "ts")


QUERIES_ML["circular_hour_user"] = q_circular_hour_user
ORACLE_SQL_ML["circular_hour_user"] = """
    WITH e AS (
      SELECT user_id,
             (CAST(epoch_us(ts) % 86400000000 AS DOUBLE)
                * 6.283185307179586) / 86400000000.0 AS theta
      FROM events),
    t AS (
      SELECT user_id,
             CAST(ROUND(sin(theta) * 1000000) AS BIGINT) AS s,
             CAST(ROUND(cos(theta) * 1000000) AS BIGINT) AS c
      FROM e),
    a AS (
      SELECT user_id, CAST(SUM(s) AS BIGINT) AS ss,
             CAST(SUM(c) AS BIGINT) AS cc, CAST(COUNT(*) AS BIGINT) AS n
      FROM t GROUP BY 1),
    f AS (
      SELECT user_id, n,
             CAST(ss AS DOUBLE) / 1000000.0 AS sd,
             CAST(cc AS DOUBLE) / 1000000.0 AS cd
      FROM a)
    SELECT user_id, n,
           sqrt(sd * sd + cd * cd) / CAST(n AS DOUBLE) AS resultant_r,
           atan2(sd, cd) AS mean_angle
    FROM f
"""


def q_decayed_count_user(sf_dir: str):
    """Exponential time-decay activity score per user: events weighted
    by exp(-age_days * ln2/7) relative to the stream's max timestamp (a
    7-day half-life recency feature, the freshness signal of ranking
    models).  Per-row micro fixed-point weights (libm exp parity), exact
    int64 sums on the map-side-combined exchange."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["user_id", "ts"]).materialize()

    def extrema(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table({"mx": pa.array([pc.max(us).as_py()], pa.int64())})

    rows = ds.map_batches(
        extrema, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    ref = max(int(r["mx"]) for r in rows)

    def wterm(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        age = pa.array((ref - us).astype(np.float64))
        days = pc.divide(age, 86400000000.0)
        w = pc.exp(pc.multiply(days, -0.0990210257942779))
        wm = pc.cast(
            pc.round(pc.multiply(w, 1_000_000.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table({"user_id": t["user_id"], "_w": wm})

    termed = ds.map_batches(wterm, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_count_sum(termed, ["user_id"], "_w",
                            count_name="n", sum_name="_s")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "n": t["n"].combine_chunks().cast(pa.int64()),
            "decayed_count": pc.divide(
                pc.cast(t["_s"].combine_chunks(), pa.float64(), safe=False),
                1_000_000.0),
        })

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["decayed_count_user"] = q_decayed_count_user
ORACLE_SQL_ML["decayed_count_user"] = """
    WITH b AS (SELECT MAX(epoch_us(ts)) AS ref FROM events),
    t AS (
      SELECT user_id,
             CAST(ROUND(exp((CAST(ref - epoch_us(ts) AS DOUBLE)
                               / 86400000000.0) * -0.0990210257942779)
                        * 1000000) AS BIGINT) AS w
      FROM events, b)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(w) AS DOUBLE) / 1000000.0 AS decayed_count
    FROM t GROUP BY 1
"""


def q_pca_embeddings(sf_dir: str):
    """Top-2 PCA coordinates per embedding (``stages.stats.pca_project``):
    exact distributed covariance -> driver d x d eigh -> broadcast
    projection.  No SQL twin (eigendecomposition); parity pinned by the
    numpy twin in tests/test_wave14_ops.py (rows-only driver check)."""
    from feast_ray.stages.stats import pca_project

    ds = read_pq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out, _evr = pca_project(ds, "embedding", id_col="vec_id", n_components=2)
    return out


QUERIES_ML["pca_embeddings"] = q_pca_embeddings
# no ORACLE_SQL entry: eigendecomposition is not SQL-expressible (rows-only
# driver check; exact numpy parity pinned in tests/test_wave14_ops.py)


def q_type_corr_hourly(sf_dir: str):
    """Cross-series Pearson correlation between the hourly click and
    purchase count series (does browse activity track buying?): counts per
    (hour, type) off one map-side-combined exchange, hour-pivoted in a
    grouped kernel, moments folded as per-block one-row int64 partials —
    the corr itself is five exact integer sums + one fixed float schedule.
    One-row output."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.or_(pc.equal(et, "click"), pc.equal(et, "purchase"))
        t = t.filter(keep)
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "hr": pa.array(us // 3_600_000_000),
            "event_type": t["event_type"],
        })

    counts = partial_count_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["hr", "event_type"], count_name="c",
    )

    def pivot_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        et = t["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes)), sizes)
        x = np.zeros(len(sizes), np.int64)
        y = np.zeros(len(sizes), np.int64)
        isx = et == "click"
        np.add.at(x, gidx[isx], c[isx])
        np.add.at(y, gidx[~isx], c[~isx])
        return pa.table({"x": pa.array(x), "y": pa.array(y)})

    xy = grouped_map(counts, ["hr"], pivot_kernel)

    def moments(t: pa.Table) -> pa.Table:
        cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        x = t["x"].combine_chunks().to_numpy(zero_copy_only=False)
        y = t["y"].combine_chunks().to_numpy(zero_copy_only=False)
        vals = [len(x), x.sum(), y.sum(), (x * x).sum(), (y * y).sum(),
                (x * y).sum()]
        return pa.table({c: pa.array([int(v)], pa.int64())
                         for c, v in zip(cols, vals)})

    rows = xy.map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n = sum(int(r["n"]) for r in rows)
    sx = float(sum(int(r["sx"]) for r in rows))
    sy = float(sum(int(r["sy"]) for r in rows))
    sxx = float(sum(int(r["sxx"]) for r in rows))
    syy = float(sum(int(r["syy"]) for r in rows))
    sxy = float(sum(int(r["sxy"]) for r in rows))
    nd = float(n)
    import math
    r = (nd * sxy - sx * sy) / (
        math.sqrt(nd * sxx - sx * sx) * math.sqrt(nd * syy - sy * sy)
    )
    return pa.table({
        "n_hours": pa.array([n], pa.int64()),
        "corr_xy": pa.array([r], pa.float64()),
    })


QUERIES_ML["type_corr_hourly"] = q_type_corr_hourly
ORACLE_SQL_ML["type_corr_hourly"] = """
    WITH h AS (
      SELECT epoch_us(ts) // 3600000000 AS hr, event_type
      FROM events WHERE event_type IN ('click', 'purchase')),
    g AS (
      SELECT hr,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM h GROUP BY hr),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM g)
    SELECT n AS n_hours,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_xy
    FROM s
"""


def q_overdispersion_type(sf_dir: str):
    """Index of dispersion (variance/mean) of per-user event counts for
    each event type — the burstiness monitor: D >> 1 means activity
    concentrates in few users (Poisson gives D = 1).  Two cascaded
    map-side-combined exchanges, exact int64 moments, one fixed float
    schedule."""
    from feast_ray.stages.stats import partial_count_sum, sum_by

    ds = _events(sf_dir, ["event_type", "user_id"])
    per_user = partial_count_sum(ds, ["event_type", "user_id"], count_name="c")

    def term(t: pa.Table) -> pa.Table:
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "_one": pa.array(np.ones(len(c), np.int64)),
            "c": t["c"],
            "c2": pa.array(c * c),
        })

    termed = per_user.map_batches(term, batch_format="pyarrow", zero_copy_batch=True)
    sums = sum_by(termed, ["event_type"], ["_one", "c", "c2"])

    def fin(t: pa.Table) -> pa.Table:
        nd = pc.cast(t["_one"].combine_chunks(), pa.float64(), safe=False)
        sc = pc.cast(t["c"].combine_chunks(), pa.float64(), safe=False)
        sc2 = pc.cast(t["c2"].combine_chunks(), pa.float64(), safe=False)
        mean = pc.divide(sc, nd)
        var = pc.divide(
            pc.subtract(sc2, pc.divide(pc.multiply(sc, sc), nd)), nd
        )
        return pa.table({
            "event_type": t["event_type"],
            "n_users": t["_one"].combine_chunks().cast(pa.int64()),
            "mean_c": mean,
            "dispersion": pc.divide(var, mean),
        })

    return sums.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["overdispersion_type"] = q_overdispersion_type
ORACLE_SQL_ML["overdispersion_type"] = """
    WITH u AS (
      SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS sc2
      FROM u GROUP BY 1)
    SELECT event_type, n AS n_users,
           CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
           ((CAST(sc2 AS DOUBLE)
               - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n AS DOUBLE))
             / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) AS dispersion
    FROM s
"""


def q_fk_orphans_audit(sf_dir: str):
    """Referential-integrity audit across the star schema's FK edges
    (orders -> customer, lineitem -> orders): orphan counts via the
    co-partitioned anti-join, totals from parquet metadata — the ingest
    data-contract check run before any join is trusted."""
    from feast_ray.stages.join import anti_join

    orders = read_pq(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    cust = read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    li = read_pq(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    okeys = read_pq(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    o2 = orders.map_batches(
        lambda t: pa.table({"k": t["o_custkey"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    c2 = cust.map_batches(
        lambda t: pa.table({"k": t["c_custkey"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    l2 = li.map_batches(
        lambda t: pa.table({"k": t["l_orderkey"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    ok2 = okeys.map_batches(
        lambda t: pa.table({"k": t["o_orderkey"]}),
        batch_format="pyarrow", zero_copy_batch=True)

    n_orders = orders.count()
    n_li = li.count()
    orph_o = anti_join(o2, c2, keys=["k"]).count()
    orph_l = anti_join(l2, ok2, keys=["k"]).count()
    return pa.table({
        "fk": pa.array(["lineitem->orders", "orders->customer"]),
        "n_rows": pa.array([n_li, n_orders], pa.int64()),
        "n_orphans": pa.array([orph_l, orph_o], pa.int64()),
    })


QUERIES_ML["fk_orphans_audit"] = q_fk_orphans_audit
ORACLE_SQL_ML["fk_orphans_audit"] = """
    SELECT 'orders->customer' AS fk,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
"""


RARE_TYPE_MIN = 1000


def q_collapse_rare_types(sf_dir: str):
    """Rare-category collapsing (the 'other' bucket every categorical
    encoder needs before one-hot/target encoding): event types with a
    global count below RARE_TYPE_MIN recode to 'other'; output is the
    recoded count table.  Domain counts come from one map-side-combined
    exchange; the keep-set (bounded by the categorical domain) broadcasts
    into a stateless recode map."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["event_type"]).materialize()
    dom = partial_count_sum(ds, ["event_type"], count_name="n").take_all()
    keep = {r["event_type"] for r in dom if int(r["n"]) >= RARE_TYPE_MIN}

    def recode(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        in_keep = pc.is_in(et, value_set=pa.array(sorted(keep), pa.string()))
        return pa.table({
            "event_type_c": pc.if_else(in_keep, et, "other"),
        })

    rec = ds.map_batches(recode, batch_format="pyarrow", zero_copy_batch=True)
    return partial_count_sum(rec, ["event_type_c"], count_name="n")


QUERIES_ML["collapse_rare_types"] = q_collapse_rare_types
ORACLE_SQL_ML["collapse_rare_types"] = f"""
    WITH d AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
    r AS (
      SELECT CASE WHEN d.n >= {RARE_TYPE_MIN} THEN e.event_type
                  ELSE 'other' END AS event_type_c
      FROM events e JOIN d ON d.event_type = e.event_type)
    SELECT event_type_c, CAST(COUNT(*) AS BIGINT) AS n
    FROM r GROUP BY 1
"""


def q_activity_windows_user(sf_dir: str):
    """Multi-horizon activity snapshot per user AS OF the stream's max
    timestamp: event counts and exact cents sums in the trailing 1d / 7d /
    30d — the point-in-time freshness features an online model reads at
    serving time, computed in ONE scan (conditional map-side-combined
    sums; horizon flags are per-row comparisons against broadcast integer
    cutoffs)."""
    from feast_ray.stages.stats import sum_by

    ds = _events(sf_dir, ["user_id", "ts", "value"]).materialize()

    def extrema(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table({"mx": pa.array([pc.max(us).as_py()], pa.int64())})

    rows = ds.map_batches(
        extrema, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    ref = max(int(r["mx"]) for r in rows)
    day = 86_400_000_000
    cuts = {"1d": ref - day, "7d": ref - 7 * day, "30d": ref - 30 * day}

    def flags(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].combine_chunks()
        cents = pc.cast(
            pc.round(pc.multiply(v, 100.0)), pa.int64()
        ).fill_null(0).to_numpy(zero_copy_only=False)
        cols = {"user_id": t["user_id"]}
        for name, lo in cuts.items():
            inw = (us > lo).astype(np.int64)
            cols[f"n_{name}"] = pa.array(inw)
            cols[f"cents_{name}"] = pa.array(inw * cents)
        return pa.table(cols)

    flagged = ds.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)
    return sum_by(
        flagged, ["user_id"],
        [f"{p}_{h}" for h in ("1d", "7d", "30d") for p in ("n", "cents")],
    )


QUERIES_ML["activity_windows_user"] = q_activity_windows_user
ORACLE_SQL_ML["activity_windows_user"] = """
    WITH b AS (SELECT MAX(epoch_us(ts)) AS ref FROM events),
    e AS (
      SELECT user_id, epoch_us(ts) AS us,
             COALESCE(CAST(ROUND(value * 100) AS BIGINT), 0) AS c
      FROM events)
    SELECT user_id,
           CAST(SUM(CASE WHEN us > ref - 86400000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_1d,
           CAST(SUM(CASE WHEN us > ref - 86400000000 THEN c ELSE 0 END)
                AS BIGINT) AS cents_1d,
           CAST(SUM(CASE WHEN us > ref - 7 * 86400000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_7d,
           CAST(SUM(CASE WHEN us > ref - 7 * 86400000000 THEN c ELSE 0 END)
                AS BIGINT) AS cents_7d,
           CAST(SUM(CASE WHEN us > ref - 30 * 86400000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_30d,
           CAST(SUM(CASE WHEN us > ref - 30 * 86400000000 THEN c ELSE 0 END)
                AS BIGINT) AS cents_30d
    FROM e, b GROUP BY user_id
"""


def q_user_overlap_types(sf_dir: str):
    """Audience overlap between event types: exact Jaccard of the USER
    SETS of every type pair (do buyers also click?) — the segment-overlap
    matrix of a growth dashboard.  Distinct (user, type) pairs off one
    map-side-combined exchange; a per-user kernel expands the (tiny,
    domain-bounded) sorted type list into pairs + diagonal set-size rows;
    a second exchange counts them.  The final |domain|^2-bounded fold
    computes inter/(n_a + n_b - inter)."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["user_id", "event_type"])
    dist = partial_count_sum(ds, ["user_id", "event_type"], count_name="_c")

    def pair_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"ta": pa.array([], pa.string()),
                             "tb": pa.array([], pa.string())})
        et = t["event_type"].combine_chunks()
        sizes = np.diff(starts)
        firsts = starts[:-1]
        # bucket sorted by (user, type): each group is a sorted type list.
        # Vectorized pair expansion: one numpy pass per DISTINCT group size
        # (bounded by the categorical domain, e.g. <= 5), never per group.
        chunks_a, chunks_b = [], []
        for z in np.unique(sizes):
            gi, gj = np.triu_indices(int(z))
            offs = firsts[sizes == z]
            chunks_a.append((offs[:, None] + gi[None, :]).ravel())
            chunks_b.append((offs[:, None] + gj[None, :]).ravel())
        take_a = pa.array(np.concatenate(chunks_a) if chunks_a
                          else np.zeros(0, np.int64))
        take_b = pa.array(np.concatenate(chunks_b) if chunks_b
                          else np.zeros(0, np.int64))
        return pa.table({"ta": pc.take(et, take_a), "tb": pc.take(et, take_b)})

    pairs = grouped_map(dist, ["user_id"], pair_kernel, sort_keys=["event_type"])
    counts = partial_count_sum(pairs, ["ta", "tb"], count_name="inter").take_all()
    sizes = {r["ta"]: int(r["inter"]) for r in counts if r["ta"] == r["tb"]}
    off = sorted(
        (r["ta"], r["tb"], int(r["inter"]))
        for r in counts if r["ta"] != r["tb"]
    )
    ta = [a for a, _, _ in off]
    tb = [b for _, b, _ in off]
    inter = np.array([i for _, _, i in off], np.int64)
    na = np.array([sizes[a] for a in ta], np.int64)
    nb = np.array([sizes[b] for b in tb], np.int64)
    return pa.table({
        "ta": pa.array(ta, pa.string()),
        "tb": pa.array(tb, pa.string()),
        "inter": pa.array(inter),
        "n_a": pa.array(na),
        "n_b": pa.array(nb),
        "jaccard": pa.array(
            inter.astype(np.float64) / (na + nb - inter).astype(np.float64)
        ),
    })


QUERIES_ML["user_overlap_types"] = q_user_overlap_types
ORACLE_SQL_ML["user_overlap_types"] = """
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
    p AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM d a JOIN d b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1)
    SELECT p.ta, p.tb, p.inter, sa.n AS n_a, sb.n AS n_b,
           CAST(p.inter AS DOUBLE)
             / CAST(sa.n + sb.n - p.inter AS DOUBLE) AS jaccard
    FROM p JOIN s sa ON sa.event_type = p.ta
           JOIN s sb ON sb.event_type = p.tb
"""


def q_psi_value_type(sf_dir: str):
    """Population Stability Index per event_type between the stream's time
    halves — THE train/serve drift score monitoring teams alarm on.  Value
    cents bucket into 10 equal-width bands over the global [min, max]
    (`value_drift_halves`'s banding), counts come from ONE map-side-combined
    exchange, and the PSI log terms run over the bounded (type x band)
    contingency with Laplace +1 smoothing (zero bands included): the
    driver-side finalize touches <= 10 x |types| rows no matter the corpus
    size.  Fixed float schedule: micro-nat ROUND(half-away) terms, exact
    int64 sum, one final division."""
    from feast_ray.stages.stats import global_order_index, partial_count_sum

    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return pa.table({
            "ts_us": t["ts"].combine_chunks().cast(pa.int64()),
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def extrema(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({"mn": pa.array([pc.min(t["cents"]).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(t["cents"]).as_py()], pa.int64())})

    ex = dv.map_batches(extrema, batch_format="pyarrow", zero_copy_batch=True).take_all()
    mn = min(int(r["mn"]) for r in ex)
    mx = max(int(r["mx"]) for r in ex)
    span = mx - mn + 1

    ranked = global_order_index(
        dv.map_batches(
            lambda t: pa.table({"ts_us": t["ts_us"], "rid": pc.add(t["ts_us"], 0)}),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        "ts_us", tiebreak="rid", pos_name="grank",
    ).materialize()
    n_all = ranked.count()
    med_rank = (n_all + 1) // 2 - 1

    def pick(t: pa.Table) -> pa.Table:
        g = t["grank"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(g == med_rank)).select(["ts_us"])

    med_ts = int(
        ranked.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()[0]["ts_us"]
    )

    def band(t: pa.Table) -> pa.Table:
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        us = t["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "band": pa.array(((c - mn) * 10) // span),
            "half": pa.array(np.where(us <= med_ts, 1, 2).astype(np.int64)),
        })

    cnt = partial_count_sum(
        dv.map_batches(band, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "band", "half"], count_name="n",
    ).take_all()  # bounded: <= |types| * 10 * 2 rows

    import pandas as pd

    cdf = pd.DataFrame(cnt)
    types = sorted(cdf["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, range(10)], names=["event_type", "band"]
    ).to_frame(index=False)
    piv = (cdf.pivot_table(index=["event_type", "band"], columns="half",
                           values="n", aggfunc="sum", fill_value=0)
           .reindex(columns=[1, 2], fill_value=0).reset_index())
    piv.columns = ["event_type", "band", "n1", "n2"]
    dens = grid.merge(piv, on=["event_type", "band"], how="left").fillna(0)
    dens["n1"] = dens["n1"].astype("int64")
    dens["n2"] = dens["n2"].astype("int64")
    tot = dens.groupby("event_type", as_index=False).agg(na=("n1", "sum"),
                                                         nb=("n2", "sum"))
    m = dens.merge(tot, on="event_type")
    p_a = pa.array((m["n1"].to_numpy() + 1.0) / (m["na"].to_numpy() + 10.0))
    p_b = pa.array((m["n2"].to_numpy() + 1.0) / (m["nb"].to_numpy() + 10.0))
    term = pc.cast(
        pc.round(pc.multiply(
            pc.multiply(pc.subtract(p_a, p_b), pc.ln(pc.divide(p_a, p_b))),
            1_000_000.0), round_mode="half_towards_infinity"),
        pa.int64()).to_numpy(zero_copy_only=False)
    m["tm"] = term
    out = m.groupby("event_type", as_index=False).agg(
        n_first=("n1", "sum"), n_second=("n2", "sum"), tmsum=("tm", "sum"))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_first": pa.array(out["n_first"].to_numpy(), pa.int64()),
        "n_second": pa.array(out["n_second"].to_numpy(), pa.int64()),
        "psi": pc.divide(pc.cast(pa.array(out["tmsum"].to_numpy()), pa.float64()),
                         1_000_000.0),
    })


QUERIES_ML["psi_value_type"] = q_psi_value_type
ORACLE_SQL_ML["psi_value_type"] = """
    WITH e AS (
      SELECT epoch_us(ts) AS us, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    g AS (SELECT MIN(c) AS mn, MAX(c) AS mx, quantile_disc(us, 0.5) AS med
          FROM e),
    b AS (SELECT event_type, ((e.c - g.mn) * 10) // (g.mx - g.mn + 1) AS band,
                 CASE WHEN e.us <= g.med THEN 1 ELSE 2 END AS half
          FROM e CROSS JOIN g),
    cnt AS (SELECT event_type, band,
                   CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
            FROM b GROUP BY 1, 2),
    grid AS (SELECT d.event_type, r.range AS band
             FROM (SELECT DISTINCT event_type FROM e) d CROSS JOIN range(10) r),
    dens AS (SELECT grid.event_type, grid.band,
                    COALESCE(cnt.n1, 0) AS n1, COALESCE(cnt.n2, 0) AS n2
             FROM grid LEFT JOIN cnt
               ON cnt.event_type = grid.event_type AND cnt.band = grid.band),
    tot AS (SELECT event_type, CAST(SUM(n1) AS BIGINT) AS na,
                   CAST(SUM(n2) AS BIGINT) AS nb
            FROM dens GROUP BY 1),
    term AS (SELECT dens.event_type,
                    CAST(ROUND(((dens.n1 + 1.0) / (tot.na + 10.0)
                                - (dens.n2 + 1.0) / (tot.nb + 10.0))
                               * ln(((dens.n1 + 1.0) / (tot.na + 10.0))
                                    / ((dens.n2 + 1.0) / (tot.nb + 10.0)))
                               * 1000000.0) AS BIGINT) AS tm
             FROM dens JOIN tot USING (event_type))
    SELECT tot.event_type, tot.na AS n_first, tot.nb AS n_second,
           CAST(s.tmsum AS DOUBLE) / 1000000.0 AS psi
    FROM tot JOIN (SELECT event_type, CAST(SUM(tm) AS BIGINT) AS tmsum
                   FROM term GROUP BY 1) s USING (event_type)
"""


def _label_counts_by_type(sf_dir: str):
    """Shared scaffolding for the supervised encoders: binary label
    y = (value cents strictly above the global mean), derived EXACTLY —
    c > floor(S / N) is equivalent to c * N > S for N > 0 (number theory:
    floor-division equivalence), so no int64 overflow at any corpus size
    and no float mean ever exists.  Returns (per-(type, y) count rows,
    n_nonnull) with counts from one map-side-combined exchange."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return pa.table({
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([pc.sum(t["cents"]).as_py()], pa.int64())})

    mom = dv.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n_tot = sum(int(r["n"]) for r in mom)
    s_tot = sum(int(r["s"]) for r in mom)
    thr = s_tot // n_tot  # exact floor; y := cents > thr  <=>  cents * N > S

    def label(t: pa.Table) -> pa.Table:
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "y": pa.array((c > thr).astype(np.int64)),
        })

    cnt = partial_count_sum(
        dv.map_batches(label, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "y"], count_name="n",
    ).take_all()  # bounded: <= 2 x |types| rows
    return cnt, n_tot


_LABEL_SQL = """
    e AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
          FROM events WHERE value IS NOT NULL),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
          FROM e),
    l AS (SELECT event_type,
                 CASE WHEN CAST(e.c AS HUGEINT) * g.n > CAST(g.s AS HUGEINT)
                      THEN 1 ELSE 0 END AS y
          FROM e CROSS JOIN g),
    c2 AS (SELECT event_type,
                  CAST(SUM(y) AS BIGINT) AS pos,
                  CAST(SUM(1 - y) AS BIGINT) AS neg
           FROM l GROUP BY 1)
"""


def q_woe_iv_types(sf_dir: str):
    """Weight-of-evidence + information-value encoding of event_type
    against the above-global-mean value label — the credit-scoring /
    risk-model categorical encoder.  Per type: pos/neg counts (exact),
    WOE = ln of the 0.5-smoothed odds ratio, and the IV term
    (pos/P - neg/Q) * WOE.  The contingency is bounded by the categorical
    domain, so the finalize never grows with the corpus.  Micro-nat
    ROUND(half-away) fixed-point keeps both floats bit-equal to SQL."""
    cnt, _ = _label_counts_by_type(sf_dir)
    import pandas as pd

    cdf = pd.DataFrame(cnt)
    piv = (cdf.pivot_table(index="event_type", columns="y", values="n",
                           aggfunc="sum", fill_value=0)
           .reindex(columns=[0, 1], fill_value=0).reset_index())
    piv.columns = ["event_type", "neg", "pos"]
    k = len(piv)
    p_tot = int(piv["pos"].sum())
    q_tot = int(piv["neg"].sum())
    pos = piv["pos"].to_numpy()
    neg = piv["neg"].to_numpy()
    woe_f = pc.ln(pa.array(
        ((pos + 0.5) / (p_tot + 0.5 * k)) / ((neg + 0.5) / (q_tot + 0.5 * k))
    ))
    woe_m = pc.cast(pc.round(pc.multiply(woe_f, 1_000_000.0),
                             round_mode="half_towards_infinity"), pa.int64())
    iv_f = pc.multiply(
        pa.array(pos * 1.0 / p_tot - neg * 1.0 / q_tot), woe_f)
    iv_m = pc.cast(pc.round(pc.multiply(iv_f, 1_000_000.0),
                            round_mode="half_towards_infinity"), pa.int64())
    return pa.table({
        "event_type": pa.array(piv["event_type"], pa.string()),
        "n_pos": pa.array(pos, pa.int64()),
        "n_neg": pa.array(neg, pa.int64()),
        "woe": pc.divide(pc.cast(woe_m, pa.float64()), 1_000_000.0),
        "iv_term": pc.divide(pc.cast(iv_m, pa.float64()), 1_000_000.0),
    })


QUERIES_ML["woe_iv_types"] = q_woe_iv_types
ORACLE_SQL_ML["woe_iv_types"] = f"""
    WITH {_LABEL_SQL},
    t AS (SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(neg) AS BIGINT) AS q,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM c2)
    SELECT event_type, pos AS n_pos, neg AS n_neg,
           CAST(CAST(ROUND(ln(((pos + 0.5) / (t.p + 0.5 * t.k))
                              / ((neg + 0.5) / (t.q + 0.5 * t.k)))
                           * 1000000.0) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS woe,
           CAST(CAST(ROUND((pos * 1.0 / t.p - neg * 1.0 / t.q)
                           * ln(((pos + 0.5) / (t.p + 0.5 * t.k))
                                / ((neg + 0.5) / (t.q + 0.5 * t.k)))
                           * 1000000.0) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS iv_term
    FROM c2 CROSS JOIN t
"""


def q_mutual_info_type_label(sf_dir: str):
    """Mutual information (nats) between event_type and the
    above-global-mean value label — the model-free feature-relevance
    score a feature-selection pass ranks candidates by.  MI folds over
    the bounded (type x label) contingency: term = (c/N) ln(cN / (ct*cy)),
    micro-nat fixed point, exact int64 sum, one final division."""
    cnt, n_tot = _label_counts_by_type(sf_dir)
    import pandas as pd

    cdf = pd.DataFrame(cnt)
    ct = cdf.groupby("event_type")["n"].transform("sum").to_numpy()
    cy = cdf.groupby("y")["n"].transform("sum").to_numpy()
    c = cdf["n"].to_numpy()
    ratio = pc.divide(
        pc.cast(pa.array(c * n_tot), pa.float64()),
        pc.cast(pa.array(ct * cy), pa.float64()))
    term = pc.multiply(
        pc.divide(pc.cast(pa.array(c), pa.float64()), float(n_tot)),
        pc.ln(ratio))
    tm = pc.cast(pc.round(pc.multiply(term, 1_000_000.0),
                          round_mode="half_towards_infinity"), pa.int64())
    tmsum = pc.sum(tm).as_py()
    return pa.table({
        "n": pa.array([n_tot], pa.int64()),
        "mi_nats": pa.array([tmsum / 1_000_000.0], pa.float64()),
    })


QUERIES_ML["mutual_info_type_label"] = q_mutual_info_type_label
ORACLE_SQL_ML["mutual_info_type_label"] = f"""
    WITH {_LABEL_SQL},
    cell AS (SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS c
             FROM l GROUP BY 1, 2),
    mt AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS ct FROM cell GROUP BY 1),
    my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM cell GROUP BY 1),
    term AS (SELECT CAST(ROUND((CAST(cell.c AS DOUBLE) / CAST(g.n AS DOUBLE))
                               * ln(CAST(cell.c * g.n AS DOUBLE)
                                    / CAST(mt.ct * my.cy AS DOUBLE))
                               * 1000000.0) AS BIGINT) AS tm
             FROM cell JOIN mt USING (event_type) JOIN my USING (y)
                       CROSS JOIN g)
    SELECT g.n AS n,
           CAST(s.tmsum AS DOUBLE) / 1000000.0 AS mi_nats
    FROM g CROSS JOIN (SELECT CAST(SUM(tm) AS BIGINT) AS tmsum FROM term) s
"""


def q_hashed_cross_user(sf_dir: str):
    """The hashing trick over a crossed categorical — md5(event_type x
    hour-of-day) into 16 buckets, per-user sparse counts (user_id, bucket,
    n).  The vocabulary-free encoder for unbounded categorical crosses:
    each batch hashes only its DISTINCT cross values (md5 over <= |types| x
    24 short strings, never per row) and maps rows through the tiny code
    table; counts ride one map-side-combined exchange.  DuckDB twin hashes
    with the identical md5 prefix."""
    import hashlib

    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": t["user_id"],
                             "bucket": pa.array([], pa.int64())})
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000) % 24  # UTC epoch; ts >= 1970 in this domain
        d = t["event_type"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary.to_pylist()
        cross = codes * 24 + hour
        uniq = np.unique(cross)
        lut = np.empty(len(uniq), dtype=np.int64)
        for i, cv in enumerate(uniq):  # bounded by |types| x 24, not rows
            s = f"{vocab[cv // 24]}_{cv % 24}".encode()
            lut[i] = int(hashlib.md5(s).hexdigest()[:8], 16) % 16
        bucket = lut[np.searchsorted(uniq, cross)]
        return pa.table({"user_id": t["user_id"], "bucket": pa.array(bucket)})

    b = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    return partial_count_sum(b, ["user_id", "bucket"], count_name="n")


QUERIES_ML["hashed_cross_user"] = q_hashed_cross_user
ORACLE_SQL_ML["hashed_cross_user"] = """
    SELECT user_id,
           CAST(('0x' || substr(md5(event_type || '_'
                                     || CAST(hour(ts) AS VARCHAR)), 1, 8)
                )::UBIGINT % 16 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
"""


def q_last_k_types_user(sf_dir: str):
    """Per-user last-5 event-type sequence string (newest first, '>'
    separated) + total count — the sequence feature next-action models
    consume.  One grouped exchange sorted (ts, event_id); the kernel
    gathers each group's <= 5 tail rows (numpy slicing per group boundary)
    and joins the short strings — O(groups), never O(rows) Python work."""
    from feast_ray.grouped import grouped_map

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u_a = t["user_id"].combine_chunks()
        types = t["event_type"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({
                "user_id": u_a.slice(0, 0),
                "n_events": pa.array([], pa.int64()),
                "last5": pa.array([], pa.string()),
            })
        firsts = starts[:-1]
        ends = starts[1:]
        # gather ONLY the <=5 tail rows per group, newest first, then join
        # per group — Python string work is O(tail rows), not O(rows)
        lo = np.maximum(ends - 5, firsts)
        tails = np.concatenate(
            [np.arange(e - 1, l - 1, -1) for l, e in zip(lo, ends)]
        ) if len(firsts) else np.array([], dtype=np.int64)
        tl = pc.take(types, pa.array(tails, pa.int64())).to_pylist()
        sizes = (ends - lo).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(sizes)))
        seqs = [">".join(tl[offs[i]:offs[i + 1]]) for i in range(len(firsts))]
        return pa.table({
            "user_id": pc.take(u_a, pa.array(firsts, pa.int64())),
            "n_events": pa.array((ends - firsts).astype(np.int64)),
            "last5": pa.array(seqs, pa.string()),
        })

    return grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])


QUERIES_ML["last_k_types_user"] = q_last_k_types_user
ORACLE_SQL_ML["last_k_types_user"] = """
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
      FROM events)
    SELECT user_id, n_events,
           STRING_AGG(event_type, '>' ORDER BY rn) AS last5
    FROM r WHERE rn <= 5 GROUP BY user_id, n_events
"""


def q_cramers_v_type_hour(sf_dir: str):
    """Cramer's V association between event_type and hour-of-day — the
    normalized chi-square a feature-redundancy audit uses to drop
    near-duplicate categoricals.  The contingency (|types| x 24, densified
    with zero cells so expected-count terms are complete) comes from one
    map-side-combined exchange; chi-square terms are micro fixed-point,
    V = sqrt(chi2 / (n * min(r-1, k-1))) is the one final float chain."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "hour": pa.array(((us // 3_600_000_000) % 24).astype(np.int64)),
        })

    cnt = partial_count_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour"], count_name="n",
    ).take_all()  # bounded: |types| x 24
    import pandas as pd

    cdf = pd.DataFrame(cnt)
    types = sorted(cdf["event_type"].unique())
    hours = sorted(cdf["hour"].unique())
    grid = pd.MultiIndex.from_product(
        [types, hours], names=["event_type", "hour"]).to_frame(index=False)
    dens = grid.merge(cdf, on=["event_type", "hour"], how="left").fillna(0)
    dens["n"] = dens["n"].astype("int64")
    rt = dens.groupby("event_type")["n"].transform("sum").to_numpy()
    ch = dens.groupby("hour")["n"].transform("sum").to_numpy()
    o = dens["n"].to_numpy()
    n = int(o.sum())
    e = pc.divide(pc.cast(pa.array(rt * ch), pa.float64()), float(n))
    d = pc.subtract(pc.cast(pa.array(o), pa.float64()), e)
    term = pc.divide(pc.multiply(d, d), e)
    tm = pc.cast(pc.round(pc.multiply(term, 1_000_000.0),
                          round_mode="half_towards_infinity"), pa.int64())
    chi2 = pc.sum(tm).as_py() / 1_000_000.0
    dof_scale = n * min(len(types) - 1, len(hours) - 1)
    import math

    v = math.sqrt(chi2 / dof_scale)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "chi2": pa.array([chi2], pa.float64()),
        "cramers_v": pa.array([v], pa.float64()),
    })


QUERIES_ML["cramers_v_type_hour"] = q_cramers_v_type_hour
ORACLE_SQL_ML["cramers_v_type_hour"] = """
    WITH e AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour
               FROM events),
    cnt AS (SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n
            FROM e GROUP BY 1, 2),
    grid AS (SELECT t.event_type, h.hour
             FROM (SELECT DISTINCT event_type FROM e) t
             CROSS JOIN (SELECT DISTINCT hour FROM e) h),
    dens AS (SELECT grid.event_type, grid.hour, COALESCE(cnt.n, 0) AS n
             FROM grid LEFT JOIN cnt
               ON cnt.event_type = grid.event_type AND cnt.hour = grid.hour),
    rt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS r FROM dens GROUP BY 1),
    ch AS (SELECT hour, CAST(SUM(n) AS BIGINT) AS c FROM dens GROUP BY 1),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
                 CAST(COUNT(DISTINCT hour) AS BIGINT) AS nc
          FROM dens),
    term AS (SELECT CAST(ROUND(
                 (dens.n - CAST(rt.r * ch.c AS DOUBLE) / CAST(g.n AS DOUBLE))
                 * (dens.n - CAST(rt.r * ch.c AS DOUBLE) / CAST(g.n AS DOUBLE))
                 / (CAST(rt.r * ch.c AS DOUBLE) / CAST(g.n AS DOUBLE))
                 * 1000000.0) AS BIGINT) AS tm
             FROM dens JOIN rt USING (event_type) JOIN ch USING (hour)
                       CROSS JOIN g)
    SELECT g.n AS n,
           CAST(s.tmsum AS DOUBLE) / 1000000.0 AS chi2,
           sqrt((CAST(s.tmsum AS DOUBLE) / 1000000.0)
                / (g.n * CASE WHEN g.nr - 1 < g.nc - 1
                              THEN g.nr - 1 ELSE g.nc - 1 END)) AS cramers_v
    FROM g CROSS JOIN (SELECT CAST(SUM(tm) AS BIGINT) AS tmsum FROM term) s
"""


def q_oof_target_encode_events(sf_dir: str):
    """Out-of-fold target encoding — the k-fold leakage-safe variant of
    `target_encode_events`: fold = mix64(user_id) % 5 (deterministic on any
    cluster shape), each row's encoding is the mean value cents of its
    event_type computed from the OTHER four folds only, so a model trained
    per fold never sees its own fold's target.  Cell stats are one
    map-side-combined exchange over the bounded (type x fold) grid,
    broadcast back into a stateless map — the raw rows never shuffle."""
    from feast_ray.stages.sampling import mix64
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        u = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "fold": pa.array((mix64(u) % np.uint64(5)).astype(np.int64)),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).materialize()
    cells = partial_count_sum(
        dv, ["event_type", "fold"], "cents", count_name="n", sum_name="s",
    ).take_all()  # bounded: |types| x 5
    import pandas as pd

    cdf = pd.DataFrame(cells)
    tot = cdf.groupby("event_type").agg(nt=("n", "sum"), st=("s", "sum"))
    enc = {}
    for _, row in cdf.iterrows():
        n_o = int(tot.loc[row["event_type"], "nt"]) - int(row["n"])
        s_o = int(tot.loc[row["event_type"], "st"]) - int(row["s"])
        enc[(row["event_type"], int(row["fold"]))] = (
            s_o / n_o if n_o > 0 else None)
    # grid cells a fold never saw: full per-type stats (nothing to exclude)
    for t_, r in tot.iterrows():
        for f in range(5):
            enc.setdefault((t_, f), int(r["st"]) / int(r["nt"]))

    import ray

    enc_ref = ray.put(enc)

    def apply(t: pa.Table) -> pa.Table:
        e = ray.get(enc_ref)
        d = t["event_type"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = d.dictionary.to_pylist()  # bounded by the categorical domain
        lut = np.array(
            [[np.nan if e.get((v, f)) is None else e[(v, f)]
              for f in range(5)] for v in vocab],
            dtype=np.float64,
        ).reshape(len(vocab), 5)
        folds = t["fold"].combine_chunks().to_numpy(zero_copy_only=False)
        vals = lut[codes, folds] if len(vocab) else np.zeros(0)
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "fold": t["fold"],
            "oof_mean_cents": pa.array(vals, pa.float64(), from_pandas=True),
        })

    return dv.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["oof_target_encode_events"] = q_oof_target_encode_events
ORACLE_SQL_ML["oof_target_encode_events"] = f"""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(({_mix64_sql("user_id")}) % 5 AS BIGINT) AS fold,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    cell AS (SELECT event_type, fold, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(c) AS BIGINT) AS s
             FROM e GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(s) AS BIGINT) AS st
            FROM cell GROUP BY 1)
    SELECT e.event_id, e.event_type, e.fold,
           CASE WHEN tot.nt - cell.n > 0
                THEN CAST(tot.st - cell.s AS DOUBLE)
                     / CAST(tot.nt - cell.n AS DOUBLE) END AS oof_mean_cents
    FROM e JOIN cell USING (event_type, fold) JOIN tot USING (event_type)
"""


_CORR_FEATS = ["n_events", "sum_cents", "n_types", "n_active_days"]


def q_feature_corr_matrix_user(sf_dir: str):
    """Feature-redundancy audit: the Pearson correlation matrix (upper
    triangle) between four per-user features — event count, spend cents,
    distinct types, distinct active days.  Per-user rows come from one
    grouped exchange; the 4x4 Gram folds from one-row-per-block int64
    partials summed EXACTLY as Python ints on the driver (a dozen numbers
    per block, immune to int64 overflow at any corpus size); corr is the
    engine's fixed float schedule.  Value-domain note: per-block int64
    partials bound |feature| * sqrt(block_rows) < 2^31.5 — holds for count
    -like features by construction."""
    from feast_ray.grouped import grouped_map

    ds = _events(sf_dir, ["user_id", "ts", "event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "day": pa.array(us // 86_400_000_000),
            "event_type": t["event_type"],
            "cents": pc.cast(
                pc.round(pc.multiply(pc.coalesce(t["value"], 0.0), 100.0)),
                pa.int64()),
        })

    dv = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        firsts = starts[:-1]
        n = np.diff(starts)
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({
                "n_events": pa.array([], pa.int64()),
                "sum_cents": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "n_active_days": pa.array([], pa.int64()),
            })
        gidx = np.repeat(np.arange(len(n), dtype=np.int64), n)
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        sums = np.add.reduceat(c, firsts)
        d = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        codes = (t["event_type"].combine_chunks().dictionary_encode()
                 .indices.to_numpy(zero_copy_only=False).astype(np.int64))

        def distinct_per_group(vals: np.ndarray) -> np.ndarray:
            order = np.lexsort((vals, gidx))
            gg, vv = gidx[order], vals[order]
            new = np.empty(t.num_rows, dtype=bool)
            new[0] = True
            new[1:] = (gg[1:] != gg[:-1]) | (vv[1:] != vv[:-1])
            return np.bincount(gg[new], minlength=len(n)).astype(np.int64)

        return pa.table({
            "n_events": pa.array(n.astype(np.int64)),
            "sum_cents": pa.array(sums.astype(np.int64)),
            "n_types": pa.array(distinct_per_group(codes)),
            "n_active_days": pa.array(distinct_per_group(d)),
        })

    feats = grouped_map(dv, ["user_id"], kernel, sort_keys=["day"])

    def gram(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vals": pa.array([], pa.list_(pa.int64()))})
        x = np.stack([
            t[f].combine_chunks().to_numpy(zero_copy_only=False)
            for f in _CORR_FEATS
        ])  # 4 x rows int64
        out = [t.num_rows] + [int(v) for v in x.sum(axis=1)]
        for i in range(4):
            for j in range(i, 4):
                out.append(int(np.dot(x[i], x[j])))
        return pa.table({"vals": pa.array([out], pa.list_(pa.int64()))})

    parts = feats.map_batches(gram, batch_format="pyarrow", zero_copy_batch=True).take_all()
    agg = [0] * 15
    for p in parts:  # exact Python-int fold — no overflow at any scale
        for i, v in enumerate(p["vals"]):
            agg[i] += int(v)
    n_u = agg[0]
    s = agg[1:5]
    q = {}
    k = 5
    for i in range(4):
        for j in range(i, 4):
            q[(i, j)] = agg[k]
            k += 1
    import math

    rows = []
    for i in range(4):
        for j in range(i + 1, 4):
            num = n_u * q[(i, j)] - s[i] * s[j]
            va = n_u * q[(i, i)] - s[i] * s[i]
            vb = n_u * q[(j, j)] - s[j] * s[j]
            corr = (float(num) / (math.sqrt(float(va)) * math.sqrt(float(vb)))
                    if va > 0 and vb > 0 else None)
            rows.append((_CORR_FEATS[i], _CORR_FEATS[j], corr))
    return pa.table({
        "feat_a": pa.array([r[0] for r in rows], pa.string()),
        "feat_b": pa.array([r[1] for r in rows], pa.string()),
        "n_users": pa.array([n_u] * len(rows), pa.int64()),
        "corr": pa.array([r[2] for r in rows], pa.float64()),
    })


QUERIES_ML["feature_corr_matrix_user"] = q_feature_corr_matrix_user
_CORR_PAIR_SQL = """
      SELECT '{fa}' AS feat_a, '{fb}' AS feat_b,
             (SELECT n FROM mom) AS n_users,
             CASE WHEN (SELECT n * q{ii} - s{i} * s{i} FROM mom) > 0
                   AND (SELECT n * q{jj} - s{j} * s{j} FROM mom) > 0
                  THEN CAST((SELECT n * q{ij} - s{i} * s{j} FROM mom) AS DOUBLE)
                       / (sqrt(CAST((SELECT n * q{ii} - s{i} * s{i} FROM mom)
                                    AS DOUBLE))
                          * sqrt(CAST((SELECT n * q{jj} - s{j} * s{j} FROM mom)
                                      AS DOUBLE)))
             END AS corr"""
ORACLE_SQL_ML["feature_corr_matrix_user"] = """
    WITH u AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS f1,
             CAST(COALESCE(SUM(CAST(ROUND(COALESCE(value, 0) * 100)
                                    AS BIGINT)), 0) AS BIGINT) AS f2,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS f3,
             CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS f4
      FROM events GROUP BY 1),
    mom AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(f1) AS HUGEINT) AS s1, CAST(SUM(f2) AS HUGEINT) AS s2,
             CAST(SUM(f3) AS HUGEINT) AS s3, CAST(SUM(f4) AS HUGEINT) AS s4,
             CAST(SUM(CAST(f1 AS HUGEINT) * f1) AS HUGEINT) AS q11,
             CAST(SUM(CAST(f1 AS HUGEINT) * f2) AS HUGEINT) AS q12,
             CAST(SUM(CAST(f1 AS HUGEINT) * f3) AS HUGEINT) AS q13,
             CAST(SUM(CAST(f1 AS HUGEINT) * f4) AS HUGEINT) AS q14,
             CAST(SUM(CAST(f2 AS HUGEINT) * f2) AS HUGEINT) AS q22,
             CAST(SUM(CAST(f2 AS HUGEINT) * f3) AS HUGEINT) AS q23,
             CAST(SUM(CAST(f2 AS HUGEINT) * f4) AS HUGEINT) AS q24,
             CAST(SUM(CAST(f3 AS HUGEINT) * f3) AS HUGEINT) AS q33,
             CAST(SUM(CAST(f3 AS HUGEINT) * f4) AS HUGEINT) AS q34,
             CAST(SUM(CAST(f4 AS HUGEINT) * f4) AS HUGEINT) AS q44
      FROM u)
""" + " UNION ALL ".join(
    _CORR_PAIR_SQL.format(
        fa=_CORR_FEATS[i], fb=_CORR_FEATS[j],
        i=i + 1, j=j + 1, ii=f"{i + 1}{i + 1}",
        jj=f"{j + 1}{j + 1}", ij=f"{i + 1}{j + 1}",
    )
    for i in range(4) for j in range(i + 1, 4)
)


def q_std_outlier_embeddings(sf_dir: str):
    """Per-vector standardized outlier score — the diagonal-covariance
    Mahalanobis distance (sum over dims of z^2 against per-dim population
    moments) that flags corrupt / out-of-distribution embeddings before
    they poison contrastive training.  Pass 1: per-dim (n, sum, sumsq) in
    exact micro fixed point, one-list-per-block partials folded as Python
    ints on the driver (overflow-proof at any corpus size).  Pass 2:
    stateless vectorized z^2; each dim's term is micro-ROUNDed to int64 so
    the per-row sum is ORDER-FREE — bit-equal to the SQL twin regardless
    of either engine's reduction order."""
    from feast_ray.sources.parquet import read_pq

    ds = read_pq(f"{sf_dir}/embeddings.parquet",
                 columns=["vec_id", "embedding"])

    def micro_mat(t: pa.Table) -> np.ndarray:
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().cast(pa.float64())
        m = pc.cast(pc.round(pc.multiply(flat, 1_000_000.0),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        d = len(m) // t.num_rows
        return m.reshape(t.num_rows, d)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vals": pa.array([], pa.list_(pa.int64()))})
        x = micro_mat(t)
        # int64 vectorized sums per 8k-row slab (micro^2 * 8k < 2^63 for
        # |value| < ~100k), slabs folded as exact Python ints
        ssum = [0] * x.shape[1]
        qsum = [0] * x.shape[1]
        for lo in range(0, x.shape[0], 8192):
            sl = x[lo:lo + 8192]
            for d_, v in enumerate(sl.sum(axis=0)):
                ssum[d_] += int(v)
            for d_, v in enumerate(np.einsum("ij,ij->j", sl, sl)):
                qsum[d_] += int(v)
        out = [t.num_rows] + ssum + qsum
        return pa.table({"vals": pa.array([out], pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    dim = (len(parts[0]["vals"]) - 1) // 2
    n_tot = 0
    s = [0] * dim
    q = [0] * dim
    for p in parts:  # exact Python-int fold
        v = [int(x) for x in p["vals"]]
        n_tot += v[0]
        for d_ in range(dim):
            s[d_] += v[1 + d_]
            q[d_] += v[1 + dim + d_]
    # fixed double schedule, mirrored verbatim in the SQL twin:
    # mean = S/N ; var = (Q - S*S/N)/N ; z = (x - mean)/sqrt(var)
    c_n = float(n_tot)
    mean = np.array([float(s[d_]) / c_n for d_ in range(dim)])
    var = np.array([(float(q[d_]) - float(s[d_]) * float(s[d_]) / c_n) / c_n
                    for d_ in range(dim)])
    sd = np.sqrt(var)

    def score(t: pa.Table) -> pa.Table:
        x = micro_mat(t).astype(np.float64)
        z = (x - mean) / sd
        tm = pc.cast(
            pc.round(pc.multiply(pa.array((z * z).ravel()), 1_000_000.0),
                     round_mode="half_towards_infinity"),
            pa.int64()).to_numpy(zero_copy_only=False).reshape(x.shape)
        ssum = tm.sum(axis=1)
        return pa.table({
            "vec_id": t["vec_id"],
            "std_score": pa.array(ssum.astype(np.float64) / 1_000_000.0),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["std_outlier_embeddings"] = q_std_outlier_embeddings
ORACLE_SQL_ML["std_outlier_embeddings"] = """
    WITH x AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS micro
      FROM embeddings),
    s AS (
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(micro) AS BIGINT) AS sm,
             CAST(SUM(CAST(micro AS HUGEINT) * micro) AS HUGEINT) AS qq
      FROM x GROUP BY dim),
    z AS (
      SELECT x.vec_id,
             CAST(ROUND(
               ((x.micro - CAST(s.sm AS DOUBLE) / CAST(s.n AS DOUBLE))
                / sqrt((CAST(s.qq AS DOUBLE)
                        - CAST(s.sm AS DOUBLE) * CAST(s.sm AS DOUBLE)
                          / CAST(s.n AS DOUBLE)) / CAST(s.n AS DOUBLE)))
               * ((x.micro - CAST(s.sm AS DOUBLE) / CAST(s.n AS DOUBLE))
                  / sqrt((CAST(s.qq AS DOUBLE)
                          - CAST(s.sm AS DOUBLE) * CAST(s.sm AS DOUBLE)
                            / CAST(s.n AS DOUBLE)) / CAST(s.n AS DOUBLE)))
               * 1000000.0) AS BIGINT) AS tm
      FROM x JOIN s USING (dim))
    SELECT vec_id,
           CAST(CAST(SUM(tm) AS BIGINT) AS DOUBLE) / 1000000.0 AS std_score
    FROM z GROUP BY vec_id
"""


# Acklam's rational approximation of the inverse normal CDF (public
# algorithm, max rel. error ~1.15e-9) — the SAME decimal literals feed the
# numpy kernel and the generated SQL so both parse to identical doubles.
_ACK_A = ["-3.969683028665376e+01", "2.209460984245205e+02",
          "-2.759285104469687e+02", "1.383577518672690e+02",
          "-3.066479806614716e+01", "2.506628277459239e+00"]
_ACK_B = ["-5.447609879822406e+01", "1.615858368580409e+02",
          "-1.556989798598866e+02", "6.680131188771972e+01",
          "-1.328068155288572e+01"]
_ACK_C = ["-7.784894002430293e-03", "-3.223964580411365e-01",
          "-2.400758277161838e+00", "-2.549732539343734e+00",
          "4.374664141464968e+00", "2.938163982698783e+00"]
_ACK_D = ["7.784695709041462e-03", "3.224671290700398e-01",
          "2.445134137142996e+00", "3.754408661907416e+00"]
_ACK_PLOW = "0.02425"


def _horner_np(coefs, x):
    acc = np.full_like(x, float(coefs[0]))
    for c in coefs[1:]:
        acc = acc * x + float(c)
    return acc


def _horner_sql(coefs, x: str) -> str:
    acc = coefs[0]
    for c in coefs[1:]:
        acc = f"({acc}) * ({x}) + {c}"
    return acc


def _acklam_np(p: np.ndarray) -> np.ndarray:
    plow = float(_ACK_PLOW)
    with np.errstate(divide="ignore", invalid="ignore"):
        ql = np.sqrt(-2.0 * np.log(p))
        low = _horner_np(_ACK_C, ql) / (_horner_np(_ACK_D, ql) * ql + 1.0)
        qh = np.sqrt(-2.0 * np.log(1.0 - p))
        high = -(_horner_np(_ACK_C, qh) / (_horner_np(_ACK_D, qh) * qh + 1.0))
        qc = p - 0.5
        r = qc * qc
        cen = (_horner_np(_ACK_A, r) * qc
               / (_horner_np(_ACK_B, r) * r + 1.0))
    return np.where(p < plow, low, np.where(p > 1.0 - plow, high, cen))


def _acklam_sql(p: str) -> str:
    ql = f"sqrt(-2.0 * ln({p}))"
    qh = f"sqrt(-2.0 * ln(1.0 - ({p})))"
    qc = f"(({p}) - 0.5)"
    r = f"({qc} * {qc})"
    low = f"(({_horner_sql(_ACK_C, ql)}) / (({_horner_sql(_ACK_D, ql)}) * ({ql}) + 1.0))"
    high = f"(-(({_horner_sql(_ACK_C, qh)}) / (({_horner_sql(_ACK_D, qh)}) * ({qh}) + 1.0)))"
    cen = f"(({_horner_sql(_ACK_A, r)}) * {qc} / (({_horner_sql(_ACK_B, r)}) * {r} + 1.0))"
    return (f"CASE WHEN ({p}) < {_ACK_PLOW} THEN {low} "
            f"WHEN ({p}) > 1.0 - {_ACK_PLOW} THEN {high} "
            f"ELSE {cen} END")


def q_rank_gauss_values(sf_dir: str):
    """Rank-gauss transform of value cents — the quantile-normalizing
    feature map (rank -> uniform -> inverse normal CDF) gradient-boosted
    and neural tabular models train on.  The global dense rank comes from
    the engine's distributed order index (ONE value-sorted exchange, no
    driver materialization); the Acklam inverse-CDF evaluates vectorized
    per batch, its branch polynomials generated from the SAME literals as
    the SQL twin.  Output quantized to micro so the parity is bit-exact."""
    from feast_ray.stages.stats import global_order_index

    ds = _events(sf_dir, ["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return pa.table({
            "event_id": t["event_id"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    ranked = global_order_index(dv, "cents", tiebreak="event_id",
                                pos_name="grank").materialize()
    n = ranked.count()

    def transform(t: pa.Table) -> pa.Table:
        g = t["grank"].combine_chunks().to_numpy(zero_copy_only=False)
        p = (g + 1.0) / float(n + 1)
        x = _acklam_np(p)
        rg = pc.divide(
            pc.cast(pc.round(pc.multiply(pa.array(x), 1_000_000.0),
                             round_mode="half_towards_infinity"), pa.int64())
            .cast(pa.float64()),
            1_000_000.0)
        return pa.table({"event_id": t["event_id"], "rank_gauss": rg})

    return ranked.map_batches(transform, batch_format="pyarrow",
                              zero_copy_batch=True)


QUERIES_ML["rank_gauss_values"] = q_rank_gauss_values
ORACLE_SQL_ML["rank_gauss_values"] = f"""
    WITH e AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT event_id,
             CAST(ROW_NUMBER() OVER (ORDER BY c, event_id) AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM e) + 1 AS DOUBLE) AS p
      FROM e)
    SELECT event_id,
           CAST(CAST(ROUND(({_acklam_sql("p")}) * 1000000.0) AS BIGINT)
                AS DOUBLE) / 1000000.0 AS rank_gauss
    FROM r
"""


def q_label_purchase_7d(sf_dir: str):
    """Training-label generation with class weights — the supervised-learning
    endpoint of the feature pipeline: for EVERY event, label = will this
    user purchase within the next 7 days (half-open (t, t+7d], strictly
    future so the label can never leak into features at t), plus the
    inverse-class-frequency sample weight N / (2 * N_class) a balanced
    trainer multiplies into the loss.  Forward window via
    ``stages.asof.range_agg_forward`` (one exchange, no pair fan-out);
    class counts fold from one-row-per-block partials."""
    from feast_ray.stages.asof import range_agg_forward

    spine = _events(sf_dir, ["event_id", "user_id", "ts"])
    purchases = _events(sf_dir, ["user_id", "ts", "event_type"]).map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase"))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    W = 7 * 86_400_000_000
    lab = range_agg_forward(
        spine, purchases, key="user_id", window_us=W,
        count_name="n_purch",
    ).map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"],
            "label": pc.cast(
                pc.greater(t["n_purch"], 0), pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "n1": pa.array([], pa.int64())})
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "n1": pa.array([pc.sum(t["label"]).as_py() or 0], pa.int64()),
        })

    cc = lab.map_batches(counts, batch_format="pyarrow",
                         zero_copy_batch=True).take_all()
    n = sum(int(r["n"]) for r in cc)
    n1 = sum(int(r["n1"]) for r in cc)
    w1 = float(n) / (2.0 * float(n1)) if n1 else None
    w0 = float(n) / (2.0 * float(n - n1)) if n - n1 else None

    def weight(t: pa.Table) -> pa.Table:
        lb = t["label"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "sample_weight",
            pa.array(np.where(lb == 1, w1, w0), pa.float64()))

    return lab.map_batches(weight, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["label_purchase_7d"] = q_label_purchase_7d
ORACLE_SQL_ML["label_purchase_7d"] = """
    WITH p AS (SELECT user_id, epoch_us(ts) AS pt FROM events
               WHERE event_type = 'purchase'),
    e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
    lab AS (
      SELECT e.event_id,
             CASE WHEN EXISTS (
               SELECT 1 FROM p
               WHERE p.user_id = e.user_id
                 AND p.pt > e.us AND p.pt <= e.us + 604800000000)
                  THEN 1 ELSE 0 END AS label
      FROM e),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(label) AS BIGINT) AS n1
          FROM lab)
    SELECT event_id, CAST(label AS BIGINT) AS label,
           CAST(g.n AS DOUBLE)
             / (2.0 * CAST(CASE WHEN label = 1 THEN g.n1
                                ELSE g.n - g.n1 END AS DOUBLE))
             AS sample_weight
    FROM lab CROSS JOIN g
"""


def q_feature_auc_conversion(sf_dir: str):
    """Univariate feature-screening AUC — the rank-sum (Mann-Whitney U)
    probability that a converting user's total spend exceeds a
    non-converter's, with exact tie handling (average ranks): the one-number
    feature-importance screen run before any model training.  Per-user
    (feature, label) rows from one grouped exchange; global 0-based ranks
    from the engine's distributed order index; tie-group (min, max) ranks
    from a feature-keyed exchange joined back co-partitioned; the integer
    numerator folds from per-block partials as Python ints.  AUC is ONE
    float division of exact integers — bit-equal to the SQL twin."""
    from feast_ray.grouped import grouped_aggregate
    from feast_ray.stages.join import equi_join
    from feast_ray.stages.stats import global_order_index

    ds = _events(sf_dir, ["user_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "cents": pc.cast(
                pc.round(pc.multiply(pc.coalesce(t["value"], 0.0), 100.0)),
                pa.int64()),
            "is_p": pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64()),
        })

    per_user = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        {"feat": ("sum", "cents"), "label": ("max", "is_p")},
    )
    ranked = global_order_index(per_user, "feat", tiebreak="user_id",
                                pos_name="grank").materialize()
    ties = grouped_aggregate(
        ranked, ["feat"],
        {"min_r": ("min", "grank"), "max_r": ("max", "grank")},
    )
    j = equi_join(ranked.select_columns(["feat", "label"]), ties,
                  keys=["feat"], how="inner")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vals": pa.array([], pa.list_(pa.int64()))})
        lb = t["label"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = t["min_r"].combine_chunks().to_numpy(zero_copy_only=False)
        mx = t["max_r"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = lb == 1
        # 2 x average 1-based rank of a tied row = min_r + max_r + 2
        r2 = int((mn[pos] + mx[pos] + 2).sum())
        return pa.table({"vals": pa.array(
            [[t.num_rows, int(pos.sum()), r2]], pa.list_(pa.int64()))})

    parts = j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    n = n1 = r2pos = 0
    for p in parts:
        v = [int(x) for x in p["vals"]]
        n += v[0]
        n1 += v[1]
        r2pos += v[2]
    n0 = n - n1
    auc = (float(r2pos - n1 * (n1 + 1)) / float(2 * n1 * n0)
           if n1 and n0 else None)
    return pa.table({
        "n_pos": pa.array([n1], pa.int64()),
        "n_neg": pa.array([n0], pa.int64()),
        "auc": pa.array([auc], pa.float64()),
    })


QUERIES_ML["feature_auc_conversion"] = q_feature_auc_conversion
ORACLE_SQL_ML["feature_auc_conversion"] = """
    WITH u AS (
      SELECT user_id,
             CAST(COALESCE(SUM(CAST(ROUND(COALESCE(value, 0) * 100)
                                    AS BIGINT)), 0) AS BIGINT) AS feat,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS label
      FROM events GROUP BY 1),
    r AS (
      SELECT label,
             CAST(RANK() OVER (ORDER BY feat) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY feat) AS BIGINT) AS cnt
      FROM u),
    s AS (
      SELECT CAST(SUM(CASE WHEN label = 1 THEN 2 * rk + cnt - 1
                           ELSE 0 END) AS BIGINT) AS r2pos,
             CAST(SUM(label) AS BIGINT) AS n1,
             CAST(SUM(1 - label) AS BIGINT) AS n0
      FROM r)
    SELECT n1 AS n_pos, n0 AS n_neg,
           CASE WHEN n1 > 0 AND n0 > 0
                THEN CAST(r2pos - n1 * (n1 + 1) AS DOUBLE)
                     / CAST(2 * n1 * n0 AS DOUBLE) END AS auc
    FROM s
"""


def q_next_item_training_pairs(sf_dir: str):
    """Sequence-model training-pair emission — for every event, the three
    preceding event types WITHIN THE SAME 30-minute session as features and
    the current type as the label (the (context, next-item) rows a
    session-based recommender trains on).  One grouped exchange per user;
    session ids + session-masked lags all inside the kernel (shifted
    gathers, no second exchange for the composite (user, session) key)."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.windows import sessionize_ids, starts_to_row_gstart

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        types = t["event_type"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": t["user_id"].combine_chunks().slice(0, 0),
                "session_id": pa.array([], pa.int64()),
                "prev1": types.slice(0, 0),
                "prev2": types.slice(0, 0),
                "prev3": types.slice(0, 0),
                "label_type": types.slice(0, 0),
            })
        n = t.num_rows
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sess = sessionize_ids(ts, starts, SESSION_GAP_US)
        gstart = starts_to_row_gstart(starts)
        ar = np.arange(n, dtype=np.int64)
        cols = {"event_id": t["event_id"], "user_id": t["user_id"],
                "session_id": pa.array(sess)}
        for k in (1, 2, 3):
            src = ar - k
            # valid lag: stays inside the entity AND the same session
            ok = (src >= gstart) & (ar - k >= 0)
            ok &= np.where(ok, sess[np.maximum(src, 0)] == sess, False)
            idx = pa.array(np.where(ok, src, -1), pa.int64())
            # take with null for -1: mask via if_else on validity
            gathered = pc.take(types, pa.array(np.maximum(src, 0), pa.int64()))
            cols[f"prev{k}"] = pc.if_else(pa.array(ok), gathered,
                                          pa.scalar(None, pa.string()))
            del idx
        cols["label_type"] = types
        return pa.table(cols)

    return grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])


QUERIES_ML["next_item_training_pairs"] = q_next_item_training_pairs
ORACLE_SQL_ML["next_item_training_pairs"] = f"""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(ts) OVER w AS prev_ts
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                            AND epoch_us(ts) - epoch_us(prev_ts)
                                <= {1800 * 1_000_000}
                           THEN 0 ELSE 1 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
      FROM e)
    SELECT event_id, user_id, session_id,
           LAG(event_type, 1) OVER w2 AS prev1,
           LAG(event_type, 2) OVER w2 AS prev2,
           LAG(event_type, 3) OVER w2 AS prev3,
           event_type AS label_type
    FROM s WINDOW w2 AS (PARTITION BY user_id, session_id
                         ORDER BY ts, event_id)
"""


def q_psi_weekly_type(sf_dir: str):
    """Drift time series: weekly PSI of the value distribution vs the
    corpus's FIRST week, per event_type — the monitoring dashboard's
    trend line (psi_value_type gives one number; this says WHEN the drift
    arrived).  Same equal-width global bands + Laplace smoothing; the
    contingency is bounded by types x weeks x 10, the finalize never
    scales with rows.  Week-0 rows pin the methodology (PSI vs itself = 0)."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table({
            "week": pc.divide(us, 604_800_000_000),
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    def extrema(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({"mn": pa.array([pc.min(t["cents"]).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(t["cents"]).as_py()], pa.int64())})

    ex = dv.map_batches(extrema, batch_format="pyarrow",
                        zero_copy_batch=True).take_all()
    mn = min(int(r["mn"]) for r in ex)
    mx = max(int(r["mx"]) for r in ex)
    span = mx - mn + 1

    def band(t: pa.Table) -> pa.Table:
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "week": t["week"],
            "band": pa.array(((c - mn) * 10) // span),
        })

    cnt = partial_count_sum(
        dv.map_batches(band, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "week", "band"], count_name="n",
    ).take_all()  # bounded: |types| x |weeks| x 10
    import pandas as pd

    cdf = pd.DataFrame(cnt)
    w0 = int(cdf["week"].min())
    types = sorted(cdf["event_type"].unique())
    weeks = sorted(cdf["week"].unique())
    grid = pd.MultiIndex.from_product(
        [types, weeks, range(10)],
        names=["event_type", "week", "band"]).to_frame(index=False)
    dens = grid.merge(cdf, on=["event_type", "week", "band"], how="left").fillna(0)
    dens["n"] = dens["n"].astype("int64")
    tot = (dens.groupby(["event_type", "week"], as_index=False)["n"].sum()
           .rename(columns={"n": "nt"}))
    m = dens.merge(tot, on=["event_type", "week"])
    base = (m[m["week"] == w0][["event_type", "band", "n", "nt"]]
            .rename(columns={"n": "nb", "nt": "ntb"}))
    m = m.merge(base, on=["event_type", "band"])
    p_w = pa.array((m["n"].to_numpy() + 1.0) / (m["nt"].to_numpy() + 10.0))
    p_b = pa.array((m["nb"].to_numpy() + 1.0) / (m["ntb"].to_numpy() + 10.0))
    tm = pc.cast(
        pc.round(pc.multiply(
            pc.multiply(pc.subtract(p_w, p_b), pc.ln(pc.divide(p_w, p_b))),
            1_000_000.0), round_mode="half_towards_infinity"),
        pa.int64()).to_numpy(zero_copy_only=False)
    m["tm"] = tm
    out = (m.groupby(["event_type", "week"], as_index=False)
           .agg(n_week=("n", "sum"), tmsum=("tm", "sum")))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "week": pa.array(out["week"].to_numpy(), pa.int64()),
        "n_week": pa.array(out["n_week"].to_numpy(), pa.int64()),
        "psi": pc.divide(
            pc.cast(pa.array(out["tmsum"].to_numpy()), pa.float64()),
            1_000_000.0),
    })


QUERIES_ML["psi_weekly_type"] = q_psi_weekly_type
ORACLE_SQL_ML["psi_weekly_type"] = """
    WITH e AS (
      SELECT epoch_us(ts) // 604800000000 AS week, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    g AS (SELECT MIN(c) AS mn, MAX(c) AS mx, MIN(week) AS w0 FROM e),
    b AS (SELECT event_type, week, ((e.c - g.mn) * 10) // (g.mx - g.mn + 1)
                   AS band
          FROM e CROSS JOIN g),
    cnt AS (SELECT event_type, week, band, CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY 1, 2, 3),
    grid AS (SELECT tw.event_type, tw.week, r.range AS band
             FROM (SELECT DISTINCT event_type, week FROM e) tw
             CROSS JOIN range(10) r),
    dens AS (SELECT grid.event_type, grid.week, grid.band,
                    COALESCE(cnt.n, 0) AS n
             FROM grid LEFT JOIN cnt
               ON cnt.event_type = grid.event_type
              AND cnt.week = grid.week AND cnt.band = grid.band),
    tot AS (SELECT event_type, week, CAST(SUM(n) AS BIGINT) AS nt
            FROM dens GROUP BY 1, 2),
    base AS (SELECT d.event_type, d.band, d.n AS nb, t.nt AS ntb
             FROM dens d JOIN tot t USING (event_type, week)
             WHERE d.week = (SELECT w0 FROM g)),
    term AS (SELECT d.event_type, d.week,
                    CAST(ROUND(((d.n + 1.0) / (t.nt + 10.0)
                                - (base.nb + 1.0) / (base.ntb + 10.0))
                               * ln(((d.n + 1.0) / (t.nt + 10.0))
                                    / ((base.nb + 1.0) / (base.ntb + 10.0)))
                               * 1000000.0) AS BIGINT) AS tm
             FROM dens d JOIN tot t USING (event_type, week)
                         JOIN base ON base.event_type = d.event_type
                                  AND base.band = d.band)
    SELECT t.event_type, t.week, t.nt AS n_week,
           CAST(s.tmsum AS DOUBLE) / 1000000.0 AS psi
    FROM tot t JOIN (SELECT event_type, week,
                            CAST(SUM(tm) AS BIGINT) AS tmsum
                     FROM term GROUP BY 1, 2) s USING (event_type, week)
"""


_FP_MOD = 2_305_843_009_213_693_952  # 2^61: row hashes fold into BIGINT range


def q_table_fingerprint_events(sf_dir: str):
    """Order-invariant table fingerprint — the data-versioning checksum a
    pipeline records beside each snapshot so replicas / re-runs can prove
    byte-equivalence without sorting or diffing: each row serializes
    canonically ('|'-joined columns, 'N' for null value), hashes via the
    SQL-replayable Horner codepoint polynomial mod 2^61, and the SUM of row
    hashes (mod 2^61) is partition-order independent by construction.
    Fully vectorized: one binary_join concat + the shared codepoint-matrix
    Horner loop per batch; per-block partial sums fold as Python ints."""
    from feast_ray.stages.dedup import GRAM_BASE, _flat_codepoints

    ds = _events(sf_dir,
                 ["event_id", "ts", "user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vals": pa.array([], pa.list_(pa.int64()))})
        us = t["ts"].combine_chunks().cast(pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        row = pc.binary_join_element_wise(
            pc.cast(t["event_id"].combine_chunks(), pa.string()),
            pc.cast(us, pa.string()),
            pc.cast(t["user_id"].combine_chunks(), pa.string()),
            t["event_type"].combine_chunks(),
            pc.coalesce(pc.cast(cents, pa.string()), "N"),
            "|",
        )
        data, offsets = _flat_codepoints(row)
        lens = np.diff(offsets)
        h = np.zeros(len(lens), dtype=np.uint64)
        pos = offsets[:-1]
        d = data.astype(np.uint64)
        for j in range(int(lens.max()) if len(lens) else 0):
            upd = lens > j
            h[upd] = h[upd] * GRAM_BASE + d[(pos + j)[upd]]
        hm = (h % np.uint64(_FP_MOD)).astype(np.int64)
        # per-block exact partial: python-int fold upstream, n + sum
        return pa.table({"vals": pa.array(
            [[t.num_rows, int(hm.sum(dtype=object) % _FP_MOD)]],
            pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    n = 0
    fp = 0
    for p in parts:
        v = [int(x) for x in p["vals"]]
        n += v[0]
        fp = (fp + v[1]) % _FP_MOD
    return pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "fingerprint": pa.array([fp], pa.int64()),
    })


QUERIES_ML["table_fingerprint_events"] = q_table_fingerprint_events
ORACLE_SQL_ML["table_fingerprint_events"] = f"""
    WITH r AS (
      SELECT CAST(event_id AS VARCHAR) || '|' || CAST(epoch_us(ts) AS VARCHAR)
             || '|' || CAST(user_id AS VARCHAR) || '|' || event_type || '|'
             || COALESCE(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR),
                         'N') AS s
      FROM events),
    h AS (
      SELECT CAST(list_reduce(
               list_prepend(CAST(0 AS HUGEINT),
                            list_transform(str_split(s, ''),
                                           c -> CAST(unicode(c) AS HUGEINT))),
               (a, b) -> (a * 1000003 + b)
                         % CAST(18446744073709551616 AS HUGEINT))
                % {_FP_MOD} AS HUGEINT) AS hv
      FROM r)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(hv) AS HUGEINT) % {_FP_MOD} AS BIGINT) AS fingerprint
    FROM h
"""


def q_changepoint_value_user(sf_dir: str):
    """Per-entity single change-point localization — binary segmentation's
    first split: the time-ordered position k that maximizes the two-segment
    fit score sl^2/nl + sr^2/nr of value cents (equivalently minimizes the
    summed SSE), ties broken at the SMALLEST k — the drift localizer that
    says WHERE each entity's behavior shifted.  One grouped exchange; the
    kernel evaluates every split of every entity with two prefix-sum
    gathers (no per-user Python loop); the score schedule (double division
    of exact int64 prefix sums) is written identically in the SQL twin so
    the argmax agrees bit-for-bit."""
    from feast_ray.grouped import grouped_map
    from feast_ray.grouped import starts_to_row_gstart

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts": t["ts"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({
                "user_id": u_a.slice(0, 0),
                "n_obs": pa.array([], pa.int64()),
                "split_k": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        n = t.num_rows
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        gstart = starts_to_row_gstart(starts)
        firsts = starts[:-1]
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        # per-group rebased prefix sums: pre[i] = sum of the group's rows
        # up to and including i
        cs = np.cumsum(c)
        lead = np.zeros(n, dtype=np.int64)
        lead[firsts] = np.concatenate(([0], cs[firsts[1:] - 1])) if len(firsts) else lead[firsts]
        pre = cs - np.repeat(lead[firsts], sizes)
        tot = pre[starts[1:] - 1]  # per-group totals
        # candidate split after local position k (1..size-1): rows with
        # local index >= 1 mark split k = local index
        loc = np.arange(n, dtype=np.int64) - gstart
        valid = loc >= 1
        nl = loc.astype(np.float64)
        nr = (sizes[gidx] - loc).astype(np.float64)
        sl = pre - c  # prefix sum BEFORE this row = left segment sum
        sr = tot[gidx] - sl
        with np.errstate(divide="ignore", invalid="ignore"):
            score = (sl.astype(np.float64) * sl.astype(np.float64) / nl
                     + sr.astype(np.float64) * sr.astype(np.float64) / nr)
        score[~valid] = -np.inf
        # argmax per group with smallest-k tie: scan positions in order,
        # keep strictly-greater updates (vectorized via lexsort)
        order = np.lexsort((loc, -score, gidx))  # by group, score desc, k asc
        best = order[np.searchsorted(gidx[order], np.arange(len(sizes)))]
        multi = sizes >= 2
        out_k = np.where(multi, loc[best], 0)
        out_s = np.where(multi, score[best], np.nan)
        return pa.table({
            "user_id": pc.take(u_a, pa.array(firsts)),
            "n_obs": pa.array(sizes.astype(np.int64)),
            "split_k": pa.array(out_k.astype(np.int64)),
            "score": pa.array(out_s, pa.float64(), from_pandas=True),
        })

    return grouped_map(dv, ["user_id"], kernel, sort_keys=["ts", "event_id"])


QUERIES_ML["changepoint_value_user"] = q_changepoint_value_user
ORACLE_SQL_ML["changepoint_value_user"] = """
    WITH e AS (
      SELECT user_id, event_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    p AS (
      SELECT user_id,
             CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS k,
             CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) - c AS BIGINT)
               AS sl,
             CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS st,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS nt
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sc AS (
      SELECT user_id, k, nt,
             CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(k AS DOUBLE)
             + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
               / CAST(nt - k AS DOUBLE) AS score,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                                           / CAST(k AS DOUBLE)
                                         + CAST(st - sl AS DOUBLE)
                                           * CAST(st - sl AS DOUBLE)
                                           / CAST(nt - k AS DOUBLE) DESC,
                                         k ASC) AS rn
      FROM p WHERE k >= 1)
    SELECT e2.user_id, e2.nt AS n_obs,
           COALESCE(sc.k, 0) AS split_k, sc.score AS score
    FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nt
          FROM e GROUP BY 1) e2
    LEFT JOIN sc ON sc.user_id = e2.user_id AND sc.rn = 1
"""


def q_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value curve — cumulative purchase revenue per
    signup-week cohort by weeks-since-cohort age: the growth-accounting
    matrix a marketing team reads LTV payback off.  Cohort assignment is
    each user's FIRST event week (one grouped exchange); revenue cells are
    one map-side-combined exchange over (cohort, age); the cumulative walk
    runs over the bounded weeks x weeks matrix on the driver."""
    from feast_ray.grouped import grouped_aggregate
    from feast_ray.stages.join import equi_join
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["user_id", "ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "week": pc.divide(us, 604_800_000_000),
            "cents": pc.if_else(
                pc.and_(pc.equal(t["event_type"], "purchase"),
                        pc.is_valid(t["value"])),
                pc.cast(pc.round(pc.multiply(pc.coalesce(t["value"], 0.0),
                                             100.0)), pa.int64()),
                pa.scalar(0, pa.int64())),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    first_w = grouped_aggregate(dv.select_columns(["user_id", "week"]),
                                ["user_id"], {"cohort": ("min", "week")})
    j = equi_join(dv, first_w, keys=["user_id"], how="inner").map_batches(
        lambda t: pa.table({
            "cohort": t["cohort"],
            "age": pc.subtract(t["week"], t["cohort"]),
            "cents": t["cents"],
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cells = partial_count_sum(j, ["cohort", "age"], "cents",
                              count_name="n_events", sum_name="rev")
    import pandas as pd

    cdf = pd.DataFrame(cells.take_all())  # bounded: weeks x weeks
    cdf = cdf.sort_values(["cohort", "age"]).reset_index(drop=True)
    cdf["cum_rev"] = cdf.groupby("cohort")["rev"].cumsum()
    return pa.table({
        "cohort": pa.array(cdf["cohort"].to_numpy(), pa.int64()),
        "age": pa.array(cdf["age"].to_numpy(), pa.int64()),
        "n_events": pa.array(cdf["n_events"].to_numpy(), pa.int64()),
        "rev": pa.array(cdf["rev"].to_numpy(), pa.int64()),
        "cum_rev": pa.array(cdf["cum_rev"].to_numpy(), pa.int64()),
    })


QUERIES_ML["cohort_ltv"] = q_cohort_ltv
ORACLE_SQL_ML["cohort_ltv"] = """
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS week,
             CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END AS cents
      FROM events),
    f AS (SELECT user_id, MIN(week) AS cohort FROM e GROUP BY 1),
    c AS (SELECT f.cohort, e.week - f.cohort AS age,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(e.cents) AS BIGINT) AS rev
          FROM e JOIN f USING (user_id) GROUP BY 1, 2)
    SELECT cohort, age, n_events, rev,
           CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY age
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_rev
    FROM c
"""


def q_spearman_value_time_user(sf_dir: str):
    """Per-user Spearman rank correlation between value and arrival order —
    the outlier-robust monotone-trend detector (is this user's spend
    drifting up?), where the OLS slope (`trend_value_user`) is
    outlier-dominated.  One grouped exchange; tie-averaged value ranks
    (doubled to stay integer) come from one in-kernel lexsort; the Pearson
    moments over (2*rank_value, 2*position) are exact int64 with the
    engine's fixed sqrt schedule.  Value-domain note: per-user moments
    bound n_user < ~50k for int64 rank products; the documented hot-entity
    path (salting) applies beyond that."""
    from feast_ray.grouped import grouped_map, starts_to_row_gstart

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts": t["ts"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({
                "user_id": u_a.slice(0, 0),
                "n_obs": pa.array([], pa.int64()),
                "spearman": pa.array([], pa.float64()),
            })
        n = t.num_rows
        gstart = starts_to_row_gstart(starts)
        firsts = starts[:-1]
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        # tie-averaged value rank x2 = 2*min_rank + tiecount - 1 (1-based)
        order = np.lexsort((c, gidx))
        cg, cs_ = gidx[order], c[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (cg[1:] != cg[:-1]) | (cs_[1:] != cs_[:-1])
        run_id = np.cumsum(new) - 1
        run_start = np.flatnonzero(new)
        run_len = np.diff(np.concatenate((run_start, [n])))
        pos_sorted = np.arange(n, dtype=np.int64) - gstart[order]
        rx2_sorted = (2 * (pos_sorted[run_start] + 1) + run_len - 1)[run_id]
        rx2 = np.empty(n, dtype=np.int64)
        rx2[order] = rx2_sorted
        ry2 = 2 * (np.arange(n, dtype=np.int64) - gstart + 1)
        sx = np.add.reduceat(rx2, firsts)
        sy = np.add.reduceat(ry2, firsts)
        sxx = np.add.reduceat(rx2 * rx2, firsts)
        syy = np.add.reduceat(ry2 * ry2, firsts)
        sxy = np.add.reduceat(rx2 * ry2, firsts)
        nn = sizes.astype(np.int64)
        num = nn * sxy - sx * sy
        va = nn * sxx - sx * sx
        vb = nn * syy - sy * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            rho = num.astype(np.float64) / (
                np.sqrt(va.astype(np.float64)) * np.sqrt(vb.astype(np.float64)))
        rho = np.where((va > 0) & (vb > 0), rho, np.nan)
        return pa.table({
            "user_id": pc.take(u_a, pa.array(firsts)),
            "n_obs": pa.array(nn),
            "spearman": pa.array(rho, pa.float64(), from_pandas=True),
        })

    return grouped_map(dv, ["user_id"], kernel, sort_keys=["ts", "event_id"])


QUERIES_ML["spearman_value_time_user"] = q_spearman_value_time_user
ORACLE_SQL_ML["spearman_value_time_user"] = """
    WITH e AS (
      SELECT user_id, event_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT user_id,
             CAST(2 * RANK() OVER (PARTITION BY user_id ORDER BY c)
                  + COUNT(*) OVER (PARTITION BY user_id, c) - 1
                  AS BIGINT) AS rx,
             CAST(2 * ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                  AS BIGINT) AS ry
      FROM e),
    m AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
             CAST(SUM(rx * rx) AS BIGINT) AS sxx,
             CAST(SUM(ry * ry) AS BIGINT) AS syy,
             CAST(SUM(rx * ry) AS BIGINT) AS sxy
      FROM r GROUP BY 1)
    SELECT user_id, n AS n_obs,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS spearman
    FROM m
"""


def q_harmonic_mean_value_user(sf_dir: str):
    """Per-user harmonic mean of positive value cents — the right average
    for RATES (price per unit, latency throughput): dominated by the
    smallest values where the arithmetic mean is dominated by the largest.
    Fixed-point nano reciprocals (ROUND(1e9 / c)) ride the map-side-
    combined exchange as exact int64; the finalize is one division —
    mirrored bit-for-bit in SQL."""
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        t = pa.table({"user_id": t["user_id"], "c": c})
        t = t.filter(pc.greater(t["c"], 0))
        r = pc.cast(pc.round(pc.divide(1_000_000_000.0,
                                       t["c"].cast(pa.float64())),
                             round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"user_id": t["user_id"], "r": r})

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_count_sum(dv, ["user_id"], "r",
                            count_name="n", sum_name="sr")
    return agg.map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"],
            "n": t["n"].cast(pa.int64()),
            "harmonic_mean_cents": pc.divide(
                t["n"].cast(pa.float64()),
                pc.divide(t["sr"].cast(pa.float64()), 1_000_000_000.0)),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )


QUERIES_ML["harmonic_mean_value_user"] = q_harmonic_mean_value_user
ORACLE_SQL_ML["harmonic_mean_value_user"] = """
    WITH e AS (
      SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT user_id,
             CAST(ROUND(1000000000.0 / CAST(c AS DOUBLE)) AS BIGINT) AS rv
      FROM e WHERE c > 0),
    m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rv) AS BIGINT) AS sr
          FROM r GROUP BY 1)
    SELECT user_id, n,
           CAST(n AS DOUBLE) / (CAST(sr AS DOUBLE) / 1000000000.0)
             AS harmonic_mean_cents
    FROM m
"""


def q_fisher_ratio_embeddings(sf_dir: str):
    """Per-dimension Fisher discriminant ratio of the labeled embeddings —
    between-class variance over mean within-class variance: the
    supervised embedding diagnostic that says WHICH dimensions actually
    separate the classes (feature selection for probes, projection
    pruning).  Per-(label, dim) exact micro moments ride one bounded
    exchange (labels x dims rows); the Fisher schedule runs once on the
    driver, mirrored verbatim in the SQL twin."""
    from feast_ray.sources.parquet import read_pq
    from feast_ray.stages.stats import sum_by

    ds = read_pq(f"{sf_dir}/embeddings.parquet",
                 columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "label": pa.array([], pa.int64()),
            "dim": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
            "q": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().cast(pa.float64())
        m = pc.cast(pc.round(pc.multiply(flat, 1_000_000.0),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        d = len(m) // t.num_rows
        x = m.reshape(t.num_rows, d)
        lab = t["label"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.argsort(lab, kind="stable")
        ls, xs = lab[order], x[order]
        new = np.empty(len(ls), dtype=bool)
        new[0] = True
        new[1:] = ls[1:] != ls[:-1]
        runs = np.flatnonzero(new)
        n_g = np.diff(np.concatenate((runs, [len(ls)]))).astype(np.int64)
        rows = {"label": [], "dim": [], "n": [], "s": [], "q": []}
        s_g = np.add.reduceat(xs, runs, axis=0)
        q_g = np.add.reduceat(xs * xs, runs, axis=0)
        for gi, r0 in enumerate(runs):
            for dd in range(d):
                rows["label"].append(int(ls[r0]))
                rows["dim"].append(dd)
                rows["n"].append(int(n_g[gi]))
                rows["s"].append(int(s_g[gi, dd]))
                rows["q"].append(int(q_g[gi, dd]))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})

    cells = sum_by(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["label", "dim"], ["n", "s", "q"],
    ).take_all()  # bounded: labels x dims
    import pandas as pd

    cdf = pd.DataFrame(cells).sort_values(["dim", "label"])
    out_rows = []
    for dim, g in cdf.groupby("dim"):
        n_t = int(g["n"].sum())
        s_t = int(g["s"].sum())
        mu = (float(s_t) / 1_000_000.0) / float(n_t)
        wb = 0
        ww = 0
        for _, r in g.iterrows():  # micro-fixed-point terms: order-free sums
            nk, sk, qk = int(r["n"]), int(r["s"]), int(r["q"])
            mk = (float(sk) / 1_000_000.0) / float(nk)
            t_wb = float(nk) * (mk - mu) * (mk - mu) * 1_000_000_000.0
            t_ww = (float(qk) / 1_000_000_000_000.0
                    - (float(sk) / 1_000_000.0) * (float(sk) / 1_000_000.0)
                      / float(nk)) * 1_000_000_000.0
            wb += int(pc.round(pa.scalar(t_wb),
                               round_mode="half_towards_infinity").as_py())
            ww += int(pc.round(pa.scalar(t_ww),
                               round_mode="half_towards_infinity").as_py())
        fisher = ((float(wb) / 1_000_000_000.0 / float(n_t))
                  / (float(ww) / 1_000_000_000.0 / float(n_t))
                  if ww > 0 else None)
        out_rows.append((int(dim), n_t, fisher))
    return pa.table({
        "dim": pa.array([r[0] for r in out_rows], pa.int64()),
        "n": pa.array([r[1] for r in out_rows], pa.int64()),
        "fisher_ratio": pa.array([r[2] for r in out_rows], pa.float64()),
    })


QUERIES_ML["fisher_ratio_embeddings"] = q_fisher_ratio_embeddings
ORACLE_SQL_ML["fisher_ratio_embeddings"] = """
    WITH x AS (
      SELECT CAST(label AS BIGINT) AS label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS micro
      FROM embeddings),
    c AS (
      SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(micro) AS BIGINT) AS s,
             CAST(SUM(CAST(micro AS HUGEINT) * micro) AS HUGEINT) AS q
      FROM x GROUP BY 1, 2),
    t AS (SELECT dim, CAST(SUM(n) AS BIGINT) AS nt,
                 CAST(SUM(s) AS BIGINT) AS st
          FROM c GROUP BY 1),
    parts AS (
      SELECT c.dim, t.nt,
             CAST(SUM(CAST(ROUND(CAST(c.n AS DOUBLE)
                 * ((CAST(c.s AS DOUBLE) / 1000000.0) / CAST(c.n AS DOUBLE)
                    - (CAST(t.st AS DOUBLE) / 1000000.0) / CAST(t.nt AS DOUBLE))
                 * ((CAST(c.s AS DOUBLE) / 1000000.0) / CAST(c.n AS DOUBLE)
                    - (CAST(t.st AS DOUBLE) / 1000000.0) / CAST(t.nt AS DOUBLE))
                 * 1000000000.0) AS BIGINT)) AS BIGINT)
               AS wb,
             CAST(SUM(CAST(ROUND((CAST(c.q AS DOUBLE) / 1000000000000.0
                 - (CAST(c.s AS DOUBLE) / 1000000.0)
                   * (CAST(c.s AS DOUBLE) / 1000000.0) / CAST(c.n AS DOUBLE))
                 * 1000000000.0) AS BIGINT)) AS BIGINT)
               AS ww
      FROM c JOIN t USING (dim) GROUP BY c.dim, t.nt)
    SELECT dim, nt AS n,
           CASE WHEN ww > 0
                THEN (CAST(wb AS DOUBLE) / 1000000000.0 / CAST(nt AS DOUBLE))
                     / (CAST(ww AS DOUBLE) / 1000000000.0 / CAST(nt AS DOUBLE))
           END AS fisher_ratio
    FROM parts
"""


def q_conversion_by_entry_type(sf_dir: str):
    """Session conversion rate by ENTRY event type — 'sessions that start
    with X convert at rate Y', the landing-page-effect table.  Sessionize
    (30-min gap) + per-session (entry type, contains-purchase) flags fused
    in ONE grouped kernel; rates divide exact int64 counts over the
    bounded entry-type domain."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import sum_by
    from feast_ray.stages.windows import sessionize_ids

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        types = t["event_type"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({
                "entry_type": types.slice(0, 0),
                "n_sessions": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
            })
        n = t.num_rows
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        sess = sessionize_ids(ts, starts, SESSION_GAP_US)
        new_s = np.empty(n, dtype=bool)
        new_s[0] = True
        new_s[1:] = (gidx[1:] != gidx[:-1]) | (sess[1:] != sess[:-1])
        s_first = np.flatnonzero(new_s)
        sid_of_row = np.cumsum(new_s) - 1
        is_p = pc.equal(types, "purchase").to_numpy(zero_copy_only=False)
        conv = np.zeros(len(s_first), dtype=np.int64)
        np.maximum.at(conv, sid_of_row, is_p.astype(np.int64))
        entry = pc.take(types, pa.array(s_first))
        # combine per entry type within the kernel (bounded domain)
        d = entry.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        cs = codes[order]
        cv = conv[order]
        new2 = np.empty(len(cs), dtype=bool)
        if len(cs):
            new2[0] = True
            new2[1:] = cs[1:] != cs[:-1]
        runs = np.flatnonzero(new2) if len(cs) else np.array([], np.int64)
        ns = np.diff(np.concatenate((runs, [len(cs)]))).astype(np.int64)
        nc = (np.add.reduceat(cv, runs).astype(np.int64)
              if len(runs) else np.array([], np.int64))
        return pa.table({
            "entry_type": pc.take(d.dictionary, pa.array(cs[runs], pa.int64()))
            if len(runs) else types.slice(0, 0),
            "n_sessions": pa.array(ns),
            "n_converted": pa.array(nc),
        })

    per_bucket = grouped_map(ds, ["user_id"], kernel,
                             sort_keys=["ts", "event_id"])
    agg = sum_by(per_bucket, ["entry_type"], ["n_sessions", "n_converted"])
    return agg.map_batches(
        lambda t: pa.table({
            "entry_type": t["entry_type"],
            "n_sessions": t["n_sessions"].cast(pa.int64()),
            "n_converted": t["n_converted"].cast(pa.int64()),
            "conversion_rate": pc.divide(
                t["n_converted"].cast(pa.float64()),
                t["n_sessions"].cast(pa.float64())),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )


QUERIES_ML["conversion_by_entry_type"] = q_conversion_by_entry_type
ORACLE_SQL_ML["conversion_by_entry_type"] = f"""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(ts) OVER w AS prev_ts
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                            AND epoch_us(ts) - epoch_us(prev_ts)
                                <= {1800 * 1_000_000}
                           THEN 0 ELSE 1 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM e),
    per AS (
      SELECT user_id, sid,
             FIRST(event_type ORDER BY ts, event_id) AS entry_type,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM s GROUP BY 1, 2)
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS conversion_rate
    FROM per GROUP BY 1
"""


def q_revenue_concentration_deciles(sf_dir: str):
    """Revenue concentration by user decile — the Lorenz table ('the top
    10% of users drive Z% of revenue') that drives whale-segmentation and
    sampling-bias decisions.  Per-user exact revenue from one grouped
    exchange; decile via the engine's distributed order index + NTILE;
    decile sums + share-of-total divide exact int64s."""
    from feast_ray.grouped import grouped_aggregate
    from feast_ray.stages.stats import global_order_index, partial_count_sum

    ds = _events(sf_dir, ["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "cents": pc.cast(
                pc.round(pc.multiply(pc.coalesce(t["value"], 0.0), 100.0)),
                pa.int64()),
        })

    per_user = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], {"rev": ("sum", "cents")},
    )
    tiled = global_order_index(per_user, "rev", tiebreak="user_id",
                               pos_name="grank", ntile=10,
                               ntile_name="decile")
    cells = partial_count_sum(
        tiled.select_columns(["decile", "rev"]).map_batches(
            lambda t: t, batch_format="pyarrow", zero_copy_batch=True),
        ["decile"], "rev", count_name="n_users", sum_name="rev",
    ).take_all()  # bounded: 10 rows
    import pandas as pd

    cdf = pd.DataFrame(cells).sort_values("decile").reset_index(drop=True)
    tot = int(cdf["rev"].sum())
    return pa.table({
        "decile": pa.array(cdf["decile"].to_numpy(), pa.int64()),
        "n_users": pa.array(cdf["n_users"].to_numpy(), pa.int64()),
        "revenue_cents": pa.array(cdf["rev"].to_numpy(), pa.int64()),
        "share": pc.divide(
            pc.cast(pa.array(cdf["rev"].to_numpy()), pa.float64()),
            float(tot)),
    })


QUERIES_ML["revenue_concentration_deciles"] = q_revenue_concentration_deciles
ORACLE_SQL_ML["revenue_concentration_deciles"] = """
    WITH u AS (
      SELECT user_id,
             CAST(COALESCE(SUM(CAST(ROUND(COALESCE(value, 0) * 100)
                                    AS BIGINT)), 0) AS BIGINT) AS rev
      FROM events GROUP BY 1),
    d AS (
      SELECT rev, CAST(NTILE(10) OVER (ORDER BY rev, user_id) AS BIGINT)
               AS decile
      FROM u),
    c AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(rev) AS BIGINT) AS revenue_cents
          FROM d GROUP BY 1)
    SELECT decile, n_users, revenue_cents,
           CAST(revenue_cents AS DOUBLE)
             / CAST((SELECT SUM(revenue_cents) FROM c) AS DOUBLE) AS share
    FROM c
"""


def q_hard_negatives_embeddings(sf_dir: str):
    """Hard-negative mining for metric learning — for each anchor (the
    first 50 vec_ids), the most-cosine-similar vector with a DIFFERENT
    label: the pairs that actually move a contrastive loss (random
    negatives are trivially easy).  Anchors broadcast once via ray.put;
    every batch scores its vectors against all anchors in one matmul and
    emits at most one candidate per anchor (per-batch argmax under the
    label mask); the driver folds blocks x 50 candidate rows.  Cosines
    round to 6dp (the established `brute_force_topk` parity contract),
    ties break to the smallest negative id."""
    import ray

    from feast_ray.sources.parquet import read_pq
    from feast_ray.stages.similarity import _embedding_matrix, cosine_scores

    N_ANCHORS = 50
    ds = read_pq(f"{sf_dir}/embeddings.parquet",
                 columns=["vec_id", "embedding", "label"])
    head = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], N_ANCHORS)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    head.sort(key=lambda r: int(r["vec_id"]))
    amat = np.array([r["embedding"] for r in head], dtype=np.float64)
    aids = np.array([int(r["vec_id"]) for r in head], dtype=np.int64)
    alab = np.array([int(r["label"]) for r in head], dtype=np.int64)
    anorm = amat / np.linalg.norm(amat, axis=1, keepdims=True)
    a_ref = ray.put((aids, alab, anorm))

    def cands(t: pa.Table) -> pa.Table:
        ids_a, lab_a, an = ray.get(a_ref)
        empty = pa.table({
            "anchor_id": pa.array([], pa.int64()),
            "neg_id": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["label"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        mat = _embedding_matrix(t["embedding"])
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                              1e-300)
        sims = np.round(mn @ an.T, 6)  # (rows, anchors), parity-rounded
        diff = lab[:, None] != lab_a[None, :]
        sims = np.where(diff, sims, -np.inf)
        # per-anchor best in this batch; ties -> smallest vec_id (ids may
        # be unsorted within a batch, so lexsort per column)
        order = np.lexsort((ids,))
        sims_o, ids_o = sims[order], ids[order]
        best = np.argmax(sims_o, axis=0)  # first max = smallest id
        bsim = sims_o[best, np.arange(len(ids_a))]
        ok = np.isfinite(bsim)
        if not ok.any():
            return empty
        return pa.table({
            "anchor_id": pa.array(ids_a[ok]),
            "neg_id": pa.array(ids_o[best[ok]]),
            "cos_sim": pa.array(bsim[ok]),
        })

    parts = ds.map_batches(cands, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    best: dict = {}
    for r in parts:  # blocks x anchors rows — bounded driver fold
        k = int(r["anchor_id"])
        cand = (-float(r["cos_sim"]), int(r["neg_id"]))
        if k not in best or cand < best[k]:
            best[k] = cand
    rows = sorted(best.items())
    return pa.table({
        "anchor_id": pa.array([k for k, _ in rows], pa.int64()),
        "neg_id": pa.array([v[1] for _, v in rows], pa.int64()),
        "cos_sim": pa.array([-v[0] for _, v in rows], pa.float64()),
    })


QUERIES_ML["hard_negatives_embeddings"] = q_hard_negatives_embeddings
ORACLE_SQL_ML["hard_negatives_embeddings"] = """
    WITH a AS (
      SELECT vec_id AS anchor_id, label AS alab,
             embedding::DOUBLE[] AS ae
      FROM embeddings WHERE vec_id < 50),
    s AS (
      SELECT a.anchor_id,
             e.vec_id AS neg_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], a.ae), 6)
               AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY a.anchor_id
               ORDER BY ROUND(list_cosine_similarity(
                          e.embedding::DOUBLE[], a.ae), 6) DESC,
                        e.vec_id) AS rn
      FROM a JOIN embeddings e ON e.label <> a.alab)
    SELECT anchor_id, neg_id, cos_sim FROM s WHERE rn = 1
"""


def q_hard_positives_embeddings(sf_dir: str):
    """Hard-POSITIVE mining — for each anchor (first 50 vec_ids), the
    LEAST-cosine-similar vector sharing its label (excluding itself): the
    other half of a triplet-loss batch (easy positives teach nothing).
    Same broadcast-anchor matmul shape as `hard_negatives_embeddings`,
    argmin under the same-label mask, 6dp parity rounding, ties to the
    smallest positive id."""
    import ray

    from feast_ray.sources.parquet import read_pq
    from feast_ray.stages.similarity import _embedding_matrix

    N_ANCHORS = 50
    ds = read_pq(f"{sf_dir}/embeddings.parquet",
                 columns=["vec_id", "embedding", "label"])
    head = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], N_ANCHORS)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    head.sort(key=lambda r: int(r["vec_id"]))
    amat = np.array([r["embedding"] for r in head], dtype=np.float64)
    aids = np.array([int(r["vec_id"]) for r in head], dtype=np.int64)
    alab = np.array([int(r["label"]) for r in head], dtype=np.int64)
    anorm = amat / np.linalg.norm(amat, axis=1, keepdims=True)
    a_ref = ray.put((aids, alab, anorm))

    def cands(t: pa.Table) -> pa.Table:
        ids_a, lab_a, an = ray.get(a_ref)
        empty = pa.table({
            "anchor_id": pa.array([], pa.int64()),
            "pos_id": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        })
        if t.num_rows == 0:
            return empty
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["label"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        mat = _embedding_matrix(t["embedding"])
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                              1e-300)
        sims = np.round(mn @ an.T, 6)
        same = (lab[:, None] == lab_a[None, :]) & (ids[:, None] != ids_a[None, :])
        sims = np.where(same, sims, np.inf)
        order = np.lexsort((ids,))
        sims_o, ids_o = sims[order], ids[order]
        best = np.argmin(sims_o, axis=0)  # first min = smallest id on ties
        bsim = sims_o[best, np.arange(len(ids_a))]
        ok = np.isfinite(bsim)
        if not ok.any():
            return empty
        return pa.table({
            "anchor_id": pa.array(ids_a[ok]),
            "pos_id": pa.array(ids_o[best[ok]]),
            "cos_sim": pa.array(bsim[ok]),
        })

    parts = ds.map_batches(cands, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    best: dict = {}
    for r in parts:
        k = int(r["anchor_id"])
        cand = (float(r["cos_sim"]), int(r["pos_id"]))
        if k not in best or cand < best[k]:
            best[k] = cand
    rows = sorted(best.items())
    return pa.table({
        "anchor_id": pa.array([k for k, _ in rows], pa.int64()),
        "pos_id": pa.array([v[1] for _, v in rows], pa.int64()),
        "cos_sim": pa.array([v[0] for _, v in rows], pa.float64()),
    })


QUERIES_ML["hard_positives_embeddings"] = q_hard_positives_embeddings
ORACLE_SQL_ML["hard_positives_embeddings"] = """
    WITH a AS (
      SELECT vec_id AS anchor_id, label AS alab,
             embedding::DOUBLE[] AS ae
      FROM embeddings WHERE vec_id < 50),
    s AS (
      SELECT a.anchor_id,
             e.vec_id AS pos_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], a.ae), 6)
               AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY a.anchor_id
               ORDER BY ROUND(list_cosine_similarity(
                          e.embedding::DOUBLE[], a.ae), 6) ASC,
                        e.vec_id) AS rn
      FROM a JOIN embeddings e
        ON e.label = a.alab AND e.vec_id <> a.anchor_id)
    SELECT anchor_id, pos_id, cos_sim FROM s WHERE rn = 1
"""


def q_bowley_moors_type(sf_dir: str):
    """Robust shape diagnostics per event_type — Bowley (quartile) skewness
    and Moors (octile) kurtosis: the moment-free skew/kurtosis that exact
    integer order statistics CAN deliver at any scale (3rd/4th power sums
    overflow int64 and lose exactness in doubles; octiles don't).  One
    value-sorted exchange serves all seven octiles; both shape scores are
    single float divisions of exact int64 quantile gaps."""
    from feast_ray.stages.stats import grouped_quantile

    ds = _events(sf_dir, ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return pa.table({
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    q = grouped_quantile(
        dv, ["event_type"], "cents",
        {f"e{i}": (i / 8.0, "disc") for i in range(1, 8)},
        count_name="n_values",
    )

    def final(t: pa.Table) -> pa.Table:
        e = {i: t[f"e{i}"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False) for i in range(1, 8)}
        iqr = e[6] - e[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            bowley = np.where(
                iqr > 0,
                (e[6] + e[2] - 2 * e[4]).astype(np.float64)
                / iqr.astype(np.float64), np.nan)
            moors = np.where(
                iqr > 0,
                ((e[7] - e[5]) + (e[3] - e[1])).astype(np.float64)
                / iqr.astype(np.float64), np.nan)
        return pa.table({
            "event_type": t["event_type"],
            "n_values": t["n_values"].combine_chunks().cast(pa.int64()),
            "q1_cents": pa.array(e[2]),
            "median_cents": pa.array(e[4]),
            "q3_cents": pa.array(e[6]),
            "bowley_skew": pa.array(bowley, pa.float64(), from_pandas=True),
            "moors_kurtosis": pa.array(moors, pa.float64(), from_pandas=True),
        })

    return q.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


QUERIES_ML["bowley_moors_type"] = q_bowley_moors_type
ORACLE_SQL_ML["bowley_moors_type"] = """
    WITH e AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    q AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(quantile_disc(c, 0.125) AS BIGINT) AS e1,
             CAST(quantile_disc(c, 0.25) AS BIGINT) AS e2,
             CAST(quantile_disc(c, 0.375) AS BIGINT) AS e3,
             CAST(quantile_disc(c, 0.5) AS BIGINT) AS e4,
             CAST(quantile_disc(c, 0.625) AS BIGINT) AS e5,
             CAST(quantile_disc(c, 0.75) AS BIGINT) AS e6,
             CAST(quantile_disc(c, 0.875) AS BIGINT) AS e7
      FROM e GROUP BY 1)
    SELECT event_type, n_values,
           e2 AS q1_cents, e4 AS median_cents, e6 AS q3_cents,
           CASE WHEN e6 - e2 > 0
                THEN CAST(e6 + e2 - 2 * e4 AS DOUBLE)
                     / CAST(e6 - e2 AS DOUBLE) END AS bowley_skew,
           CASE WHEN e6 - e2 > 0
                THEN CAST((e7 - e5) + (e3 - e1) AS DOUBLE)
                     / CAST(e6 - e2 AS DOUBLE) END AS moors_kurtosis
    FROM q
"""


def q_type_trigrams_session(sf_dir: str):
    """Top-20 event-type TRIGRAMS within sessions — the behavioral 3-gram
    patterns (view>click>purchase) that sequence miners and funnel
    designers read; `type_transitions` gives the 2-gram matrix, this goes
    one order deeper with the same one-exchange shape (session ids + two
    session-masked shifted gathers fused in the kernel)."""
    from feast_ray.grouped import grouped_map, sorted_head
    from feast_ray.grouped import starts_to_row_gstart
    from feast_ray.stages.stats import sum_by
    from feast_ray.stages.windows import sessionize_ids

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        types = t["event_type"].combine_chunks()
        empty = pa.table({
            "t1": types.slice(0, 0), "t2": types.slice(0, 0),
            "t3": types.slice(0, 0), "n": pa.array([], pa.int64()),
        })
        if t.num_rows == 0:
            return empty
        n = t.num_rows
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sess = sessionize_ids(ts, starts, SESSION_GAP_US)
        gstart = starts_to_row_gstart(starts)
        ar = np.arange(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        m2 = ar - 2 >= gstart
        ok[m2] = (sess[ar[m2] - 2] == sess[m2]) if m2.any() else False
        if not ok.any():
            return empty
        i3 = np.flatnonzero(ok)
        enc = types.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = enc.dictionary
        vocab = len(d)
        tri = (codes[i3 - 2] * vocab + codes[i3 - 1]) * vocab + codes[i3]
        uniq, cnt = np.unique(tri, return_counts=True)
        c3 = uniq % vocab
        c2 = (uniq // vocab) % vocab
        c1 = uniq // (vocab * vocab)
        return pa.table({
            "t1": pc.take(d, pa.array(c1, pa.int64())),
            "t2": pc.take(d, pa.array(c2, pa.int64())),
            "t3": pc.take(d, pa.array(c3, pa.int64())),
            "n": pa.array(cnt.astype(np.int64)),
        })

    per_bucket = grouped_map(ds, ["user_id"], kernel,
                             sort_keys=["ts", "event_id"])
    agg = sum_by(per_bucket, ["t1", "t2", "t3"], ["n"])
    return sorted_head(agg, ["n", "t1", "t2", "t3"],
                       [True, True, True, True], 20)


QUERIES_ML["type_trigrams_session"] = q_type_trigrams_session
ORACLE_SQL_ML["type_trigrams_session"] = f"""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(ts) OVER w AS prev_ts
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                            AND epoch_us(ts) - epoch_us(prev_ts)
                                <= {1800 * 1_000_000}
                           THEN 0 ELSE 1 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM e),
    tri AS (
      SELECT LAG(event_type, 2) OVER w2 AS t1,
             LAG(event_type, 1) OVER w2 AS t2,
             event_type AS t3
      FROM s WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id))
    SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
    FROM tri WHERE t1 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, t1, t2, t3
    LIMIT 20
"""


def q_conversion_latency_quantiles(sf_dir: str):
    """Signup-to-purchase conversion latency percentiles — p50/p90 of
    (first purchase after first signup) across converting users: the
    funnel-speed summary growth teams pin next to the conversion rate.
    Per-user first-signup / first-following-purchase fold in ONE grouped
    kernel (two searchsorted-free gathers over the sorted group); exact
    global disc quantiles of the integer-microsecond latencies via the
    distributed order index — two rows leave the cluster."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import global_order_index

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({"user_id": u_a.slice(0, 0),
                             "latency_us": pa.array([], pa.int64())})
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = t["event_type"].combine_chunks()
        is_s = pc.equal(types, "signup").to_numpy(zero_copy_only=False)
        is_p = pc.equal(types, "purchase").to_numpy(zero_copy_only=False)
        firsts = starts[:-1]
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        out_u, out_l = [], []
        # first signup per group: min position among signup rows
        pos = np.arange(t.num_rows, dtype=np.int64)
        s_pos = np.where(is_s, pos, np.iinfo(np.int64).max)
        first_s = np.full(len(sizes), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_s, gidx, s_pos)
        # first purchase strictly after the signup position (rows sorted by
        # ts within group, so position order == time order)
        p_pos = np.where(is_p, pos, np.iinfo(np.int64).max)
        # strictly LATER IN TIME than the first signup (a purchase at the
        # same timestamp does not count — matches the SQL p_us > s_us)
        has_s = first_s < np.iinfo(np.int64).max
        ts_s_row = ts[np.minimum(first_s[gidx], t.num_rows - 1)]
        p_after = np.where(
            is_p & has_s[gidx] & (ts > ts_s_row), p_pos,
            np.iinfo(np.int64).max)
        first_p = np.full(len(sizes), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_p, gidx, p_after)
        ok = (first_s < np.iinfo(np.int64).max) & (
            first_p < np.iinfo(np.int64).max)
        gi = np.flatnonzero(ok)
        return pa.table({
            "user_id": pc.take(u_a, pa.array(firsts[gi])),
            "latency_us": pa.array(ts[first_p[gi]] - ts[first_s[gi]]),
        })

    lat = grouped_map(ds, ["user_id"], kernel,
                      sort_keys=["ts", "event_id"]).materialize()
    ranked = global_order_index(lat, "latency_us", tiebreak="user_id",
                                pos_name="grank").materialize()
    n = ranked.count()
    if n == 0:
        return pa.table({"n_converted": pa.array([0], pa.int64()),
                         "p50_us": pa.array([None], pa.int64()),
                         "p90_us": pa.array([None], pa.int64())})
    tgt = {q: (int(q * 100) * n + 99) // 100 - 1 for q in (0.5, 0.9)}
    tv = np.array(sorted(set(tgt.values())), dtype=np.int64)

    def pick(t: pa.Table) -> pa.Table:
        g = t["grank"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(g, tv)))

    rows = ranked.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    by_rank = {int(r["grank"]): int(r["latency_us"]) for r in rows}
    return pa.table({
        "n_converted": pa.array([n], pa.int64()),
        "p50_us": pa.array([by_rank[tgt[0.5]]], pa.int64()),
        "p90_us": pa.array([by_rank[tgt[0.9]]], pa.int64()),
    })


QUERIES_ML["conversion_latency_quantiles"] = q_conversion_latency_quantiles
ORACLE_SQL_ML["conversion_latency_quantiles"] = """
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS s_us
      FROM events WHERE event_type = 'signup' GROUP BY 1),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.s_us
      GROUP BY 1),
    l AS (
      SELECT s.user_id, p.p_us - s.s_us AS latency_us
      FROM s JOIN p USING (user_id))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(quantile_disc(latency_us, 0.5) AS BIGINT) AS p50_us,
           CAST(quantile_disc(latency_us, 0.9) AS BIGINT) AS p90_us
    FROM l
"""


def q_weekly_value_bands_type(sf_dir: str):
    """Weekly p10/p50/p90 value bands per event_type — the percentile
    ribbon a monitoring dashboard draws to catch tail drift that means
    and PSI-on-means both miss.  Exact discrete quantiles off ONE
    value-sorted exchange keyed (type, week); no driver materialization
    beyond the bounded band table."""
    from feast_ray.stages.stats import grouped_quantile

    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table({
            "event_type": t["event_type"],
            "week": pc.divide(us, 604_800_000_000),
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_quantile(
        dv, ["event_type", "week"], "cents",
        {"p10_cents": (0.1, "disc"), "p50_cents": (0.5, "disc"),
         "p90_cents": (0.9, "disc")},
        count_name="n_values",
    )


QUERIES_ML["weekly_value_bands_type"] = q_weekly_value_bands_type
ORACLE_SQL_ML["weekly_value_bands_type"] = """
    WITH e AS (
      SELECT event_type, epoch_us(ts) // 604800000000 AS week,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL)
    SELECT event_type, week,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(quantile_disc(c, 0.1) AS BIGINT) AS p10_cents,
           CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_cents,
           CAST(quantile_disc(c, 0.9) AS BIGINT) AS p90_cents
    FROM e GROUP BY 1, 2
"""


def q_weekly_user_overlap(sf_dir: str):
    """Week-over-week active-user overlap — Jaccard between consecutive
    weeks' active-user sets: the churn/stability pulse (DAU/WAU says how
    many; this says whether they're the SAME people).  Distinct (user,
    week) pairs come from one map-side-combined exchange; the week-pair
    intersection folds over a second exchange keyed by user with
    consecutive-week run detection in the kernel — the bounded week x week
    table never scales with users."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import partial_count_sum, sum_by

    ds = _events(sf_dir, ["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table({
            "user_id": t["user_id"],
            "week": pc.divide(us, 604_800_000_000),
        })

    dw = partial_count_sum(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id", "week"], count_name="_n",
    )  # distinct (user, week)

    def pairs(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"week_a": pa.array([], pa.int64()),
                             "inter": pa.array([], pa.int64())})
        w = t["week"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        order = np.lexsort((w, gidx))
        gg, ww = gidx[order], w[order]
        # consecutive weeks WITHIN a user = one intersection member
        hit = (gg[1:] == gg[:-1]) & (ww[1:] == ww[:-1] + 1)
        wa = ww[:-1][hit]
        if len(wa) == 0:
            return pa.table({"week_a": pa.array([], pa.int64()),
                             "inter": pa.array([], pa.int64())})
        uniq, cnt = np.unique(wa, return_counts=True)
        return pa.table({"week_a": pa.array(uniq),
                         "inter": pa.array(cnt.astype(np.int64))})

    inter = sum_by(
        grouped_map(dw.select_columns(["user_id", "week"]), ["user_id"],
                    pairs, sort_keys=["week"]),
        ["week_a"], ["inter"],
    ).take_all()  # bounded: weeks
    per_week = partial_count_sum(
        dw.select_columns(["week"]), ["week"], count_name="n_users",
    ).take_all()
    import pandas as pd

    pw = {int(r["week"]): int(r["n_users"]) for r in per_week}
    iv = {int(r["week_a"]): int(r["inter"]) for r in inter}
    weeks = sorted(pw)
    rows = []
    for wa in weeks[:-1]:
        wb = wa + 1
        if wb not in pw:
            continue
        i = iv.get(wa, 0)
        union = pw[wa] + pw[wb] - i
        rows.append((wa, wb, pw[wa], pw[wb], i,
                     float(i) / float(union) if union else None))
    return pa.table({
        "week_a": pa.array([r[0] for r in rows], pa.int64()),
        "week_b": pa.array([r[1] for r in rows], pa.int64()),
        "n_users_a": pa.array([r[2] for r in rows], pa.int64()),
        "n_users_b": pa.array([r[3] for r in rows], pa.int64()),
        "inter": pa.array([r[4] for r in rows], pa.int64()),
        "jaccard": pa.array([r[5] for r in rows], pa.float64()),
    })


QUERIES_ML["weekly_user_overlap"] = q_weekly_user_overlap
ORACLE_SQL_ML["weekly_user_overlap"] = """
    WITH d AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      FROM events),
    pw AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
    iv AS (
      SELECT a.week AS week_a, CAST(COUNT(*) AS BIGINT) AS inter
      FROM d a JOIN d b
        ON b.user_id = a.user_id AND b.week = a.week + 1
      GROUP BY 1)
    SELECT pa_.week AS week_a, pb.week AS week_b,
           pa_.n AS n_users_a, pb.n AS n_users_b,
           COALESCE(iv.inter, 0) AS inter,
           CAST(COALESCE(iv.inter, 0) AS DOUBLE)
             / CAST(pa_.n + pb.n - COALESCE(iv.inter, 0) AS DOUBLE)
             AS jaccard
    FROM pw pa_ JOIN pw pb ON pb.week = pa_.week + 1
    LEFT JOIN iv ON iv.week_a = pa_.week
"""


def q_value_share_top1pct(sf_dir: str):
    """Share of total value cents held by the top-1% events per type —
    the whale-concentration number that decides whether mean-based
    features are even meaningful.  Exact disc p99 threshold per type off
    the value-sorted exchange; the conditional sum is one broadcast map
    (c >= thr, exact ints); share is one division."""
    import ray

    from feast_ray.stages.stats import grouped_quantile, partial_count_sum

    ds = _events(sf_dir, ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        return pa.table({
            "event_type": t["event_type"],
            "cents": pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
        })

    dv = ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    q = grouped_quantile(dv, ["event_type"], "cents",
                         {"p99": (0.99, "disc")}).to_pandas()
    thr = {r["event_type"]: int(r["p99"]) for _, r in q.iterrows()}
    t_ref = ray.put(thr)

    def flag(t: pa.Table) -> pa.Table:
        th = ray.get(t_ref)
        d = t["event_type"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lut = np.array([th[v] for v in d.dictionary.to_pylist()],
                       dtype=np.int64)
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        top = c >= lut[codes]
        return pa.table({
            "event_type": t["event_type"],
            "cents": t["cents"],
            "top_cents": pa.array(np.where(top, c, 0).astype(np.int64)),
            "is_top": pa.array(top.astype(np.int64)),
        })

    agg = partial_count_sum(
        dv.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"], "cents", count_name="n_values", sum_name="total")
    agg2 = partial_count_sum(
        dv.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"], "top_cents", count_name="_n", sum_name="top_total")
    a = agg.to_pandas().set_index("event_type")
    b = agg2.to_pandas().set_index("event_type")
    types = sorted(a.index)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_values": pa.array([int(a.loc[t, "n_values"]) for t in types],
                             pa.int64()),
        "p99_cents": pa.array([thr[t] for t in types], pa.int64()),
        "top_cents": pa.array([int(b.loc[t, "top_total"]) for t in types],
                              pa.int64()),
        "total_cents": pa.array([int(a.loc[t, "total"]) for t in types],
                                pa.int64()),
        "top_share": pa.array(
            [float(int(b.loc[t, "top_total"])) / float(int(a.loc[t, "total"]))
             for t in types], pa.float64()),
    })


QUERIES_ML["value_share_top1pct"] = q_value_share_top1pct
ORACLE_SQL_ML["value_share_top1pct"] = """
    WITH e AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL),
    q AS (SELECT event_type, CAST(quantile_disc(c, 0.99) AS BIGINT) AS p99
          FROM e GROUP BY 1)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           q.p99 AS p99_cents,
           CAST(SUM(CASE WHEN e.c >= q.p99 THEN e.c ELSE 0 END) AS BIGINT)
             AS top_cents,
           CAST(SUM(e.c) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN e.c >= q.p99 THEN e.c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(e.c) AS DOUBLE) AS top_share
    FROM e JOIN q USING (event_type)
    GROUP BY 1, 3
"""


def q_hill_tail_index_type(sf_dir: str):
    """Hill tail-index estimator per event_type — alpha-hat over the
    values above the type's own exact p90 threshold: the heavy-tail
    diagnostic that says whether means/variances of a value column are
    even finite-sample-stable (alpha <= 2 means variance-infinite tail
    behavior; feature pipelines should winsorize or log those columns).
    Threshold from the value-sorted exchange; tail terms are micro-nat
    ROUND(half-away) ln(x/thr) fixed point summed exactly; alpha is one
    final division mirrored in SQL."""
    import ray

    from feast_ray.stages.stats import grouped_quantile, partial_count_sum

    ds = _events(sf_dir, ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        c = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        t = pa.table({"event_type": t["event_type"], "cents": c})
        return t.filter(pc.greater(t["cents"], 0))

    dv = ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()
    q = grouped_quantile(dv, ["event_type"], "cents",
                         {"p90": (0.9, "disc")}).to_pandas()
    thr = {r["event_type"]: int(r["p90"]) for _, r in q.iterrows()}
    t_ref = ray.put(thr)

    def terms(t: pa.Table) -> pa.Table:
        th = ray.get(t_ref)
        d = t["event_type"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lut = np.array([th[v] for v in d.dictionary.to_pylist()],
                       dtype=np.int64)
        c = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        tail = c > lut[codes]  # strictly above the threshold
        if not tail.any():
            return pa.table({"event_type": d.dictionary.slice(0, 0),
                             "tm": pa.array([], pa.int64())})
        ratio = c[tail].astype(np.float64) / lut[codes][tail].astype(np.float64)
        tm = pc.cast(pc.round(pc.multiply(pc.ln(pa.array(ratio)),
                                          1_000_000.0),
                              round_mode="half_towards_infinity"), pa.int64())
        return pa.table({
            "event_type": pc.take(t["event_type"].combine_chunks(),
                                  pa.array(np.flatnonzero(tail), pa.int64())),
            "tm": tm,
        })

    agg = partial_count_sum(
        dv.map_batches(terms, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"], "tm", count_name="n_tail", sum_name="s_tm",
    ).to_pandas().set_index("event_type")
    types = sorted(agg.index)
    alphas = []
    for ty in types:
        n, s = int(agg.loc[ty, "n_tail"]), int(agg.loc[ty, "s_tm"])
        mean_ln = (float(s) / 1_000_000.0) / float(n)
        alphas.append(1.0 / mean_ln if mean_ln > 0 else None)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_tail": pa.array([int(agg.loc[t, "n_tail"]) for t in types],
                           pa.int64()),
        "p90_cents": pa.array([thr[t] for t in types], pa.int64()),
        "hill_alpha": pa.array(alphas, pa.float64()),
    })


QUERIES_ML["hill_tail_index_type"] = q_hill_tail_index_type
ORACLE_SQL_ML["hill_tail_index_type"] = """
    WITH e AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
        AND CAST(ROUND(value * 100) AS BIGINT) > 0),
    q AS (SELECT event_type, CAST(quantile_disc(c, 0.9) AS BIGINT) AS p90
          FROM e GROUP BY 1),
    t AS (
      SELECT e.event_type,
             CAST(ROUND(ln(CAST(e.c AS DOUBLE) / CAST(q.p90 AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS tm
      FROM e JOIN q USING (event_type)
      WHERE e.c > q.p90),
    m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_tail,
                 CAST(SUM(tm) AS BIGINT) AS s
          FROM t GROUP BY 1)
    SELECT m.event_type, m.n_tail, q.p90 AS p90_cents,
           CASE WHEN (CAST(m.s AS DOUBLE) / 1000000.0) / CAST(m.n_tail AS DOUBLE)
                     > 0
                THEN 1.0 / ((CAST(m.s AS DOUBLE) / 1000000.0)
                            / CAST(m.n_tail AS DOUBLE))
           END AS hill_alpha
    FROM m JOIN q USING (event_type)
"""


def q_markov_stationary_types(sf_dir: str):
    """Stationary distribution of the event-type Markov chain — the
    long-run behavioral mix implied by the transition matrix (where the
    funnel settles if behavior never changes; compare against today's
    empirical mix to see momentum).  Transition counts fold distributed
    over the bounded type x type grid; 100 power-iteration steps run on
    the driver over that tiny row-stochastic matrix.  An ITERATIVE
    algorithm — no SQL twin (rows-only for the driver); the eigenvector
    is pinned against numpy.linalg.eig in tests/test_wave39_ops.py."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import sum_by

    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        types = t["event_type"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({"t1": types.slice(0, 0), "t2": types.slice(0, 0),
                             "n": pa.array([], pa.int64())})
        from feast_ray.grouped import starts_to_row_gstart

        gstart = starts_to_row_gstart(starts)
        ar = np.arange(t.num_rows, dtype=np.int64)
        ok = ar - 1 >= gstart
        i2 = np.flatnonzero(ok)
        enc = types.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = len(enc.dictionary)
        pair = codes[i2 - 1] * vocab + codes[i2]
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.table({
            "t1": pc.take(enc.dictionary, pa.array(uniq // vocab, pa.int64())),
            "t2": pc.take(enc.dictionary, pa.array(uniq % vocab, pa.int64())),
            "n": pa.array(cnt.astype(np.int64)),
        })

    trans = sum_by(
        grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"]),
        ["t1", "t2"], ["n"],
    ).take_all()  # bounded: types^2
    import pandas as pd

    tdf = pd.DataFrame(trans)
    types = sorted(set(tdf["t1"]) | set(tdf["t2"]))
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    M = np.zeros((k, k), dtype=np.float64)
    for _, r in tdf.iterrows():
        M[idx[r["t1"]], idx[r["t2"]]] = float(r["n"])
    rows = M.sum(axis=1)
    P = M / np.where(rows > 0, rows, 1.0)[:, None]
    # absorbing-safe: rows with no outgoing mass restart uniformly
    P[rows == 0] = 1.0 / k
    pi = np.full(k, 1.0 / k)
    for _ in range(100):
        pi = pi @ P
        pi = pi / pi.sum()
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "stationary_p": pa.array(pi, pa.float64()),
    })


QUERIES_ML["markov_stationary_types"] = q_markov_stationary_types
# no ORACLE_SQL entry: iterative power method — rows-only; numpy-eig pinned


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct users per event_type, audited
    in-row against the exact count — the sketch-vs-truth calibration a
    pipeline runs before trusting HLL on columns too hot for exact
    distinct.  Sketch: `stages.sketch.approx_distinct` (p=12, fixed-size
    register blobs through one exchange; ~1.6% relative error); exact:
    one distinct-pair exchange.  No SQL twin (the register max-merge is
    not SQL-expressible here) — rows-only for the driver; the estimate is
    deterministic and pinned by a pure-python HLL twin in
    tests/test_wave40_ops.py plus the stage's error-bound tests."""
    from feast_ray.stages.sketch import approx_distinct
    from feast_ray.stages.stats import partial_count_sum

    ds = _events(sf_dir, ["event_type", "user_id"])
    est = approx_distinct(ds, "event_type", "user_id", p=12).to_pandas()
    pairs = partial_count_sum(ds, ["event_type", "user_id"],
                              count_name="_n")
    exact = partial_count_sum(pairs.select_columns(["event_type"]),
                              ["event_type"], count_name="n_exact").to_pandas()
    m = est.merge(exact, on="event_type").sort_values("event_type")
    rel = (m["approx_distinct"].to_numpy()
           - m["n_exact"].to_numpy()) / m["n_exact"].to_numpy()
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "n_exact": pa.array(m["n_exact"].to_numpy(), pa.int64()),
        "hll_estimate": pa.array(m["approx_distinct"].to_numpy(),
                                 pa.float64()),
        "rel_error": pa.array(rel, pa.float64()),
    })


QUERIES_ML["approx_distinct_users"] = q_approx_distinct_users
# no ORACLE_SQL entry: HLL register merge — rows-only; python-HLL pinned


def q_embedding_norm_stats(sf_dir: str):
    """Embedding L2-norm distribution audit — n, mean, p50/p99 norms: the
    five numbers that catch an unnormalized or collapsing encoder before
    cosine math silently degrades.  Norms never sort as floats: the disc
    quantiles run over the EXACT int64 micro sum-of-squares via the
    distributed order index (norm is a monotone transform of ssq, so
    quantile(norm) = sqrt(quantile(ssq)) exactly); the mean folds
    micro-quantized per-row norms through exact int64 sums."""
    from feast_ray.sources.parquet import read_pq
    from feast_ray.stages.stats import global_order_index

    ds = read_pq(f"{sf_dir}/embeddings.parquet",
                 columns=["vec_id", "embedding"])

    def prep(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().cast(pa.float64())
        m = pc.cast(pc.round(pc.multiply(flat, 1_000_000.0),
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        d = len(m) // t.num_rows
        x = m.reshape(t.num_rows, d)
        ssq = np.einsum("ij,ij->i", x, x)  # micro^2 units, exact int64
        norm = np.sqrt(ssq.astype(np.float64)) / 1_000_000.0
        nm = pc.cast(pc.round(pc.multiply(pa.array(norm), 1_000_000.0),
                              round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"vec_id": t["vec_id"], "ssq": pa.array(ssq),
                         "norm_micro": nm})

    dv = ds.map_batches(prep, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    def moments(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "s": pa.array([pc.sum(t["norm_micro"]).as_py() or 0], pa.int64()),
        })

    mom = dv.map_batches(moments, batch_format="pyarrow",
                         zero_copy_batch=True).take_all()
    n = sum(int(r["n"]) for r in mom)
    s = sum(int(r["s"]) for r in mom)
    ranked = global_order_index(dv.select_columns(["ssq", "vec_id"]),
                                "ssq", tiebreak="vec_id",
                                pos_name="grank").materialize()
    tgt = {q: (int(q * 100) * n + 99) // 100 - 1 for q in (0.5, 0.99)}
    tv = np.array(sorted(set(tgt.values())), dtype=np.int64)

    def pick(t: pa.Table) -> pa.Table:
        g = t["grank"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(g, tv)))

    rows = ranked.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    by_rank = {int(r["grank"]): int(r["ssq"]) for r in rows}
    import math

    return pa.table({
        "n": pa.array([n], pa.int64()),
        "mean_norm": pa.array([(s / 1_000_000.0) / n], pa.float64()),
        "p50_norm": pa.array([math.sqrt(by_rank[tgt[0.5]]) / 1_000_000.0],
                             pa.float64()),
        "p99_norm": pa.array([math.sqrt(by_rank[tgt[0.99]]) / 1_000_000.0],
                             pa.float64()),
    })


QUERIES_ML["embedding_norm_stats"] = q_embedding_norm_stats
ORACLE_SQL_ML["embedding_norm_stats"] = """
    WITH x AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS micro
      FROM embeddings),
    v AS (
      SELECT vec_id,
             CAST(SUM(CAST(micro AS HUGEINT) * micro) AS HUGEINT) AS ssq
      FROM x GROUP BY 1),
    nm AS (
      SELECT vec_id, ssq,
             CAST(ROUND(sqrt(CAST(ssq AS DOUBLE)) / 1000000.0 * 1000000.0)
                  AS BIGINT) AS norm_micro
      FROM v),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(norm_micro) AS BIGINT) AS s,
                 CAST(quantile_disc(ssq, 0.5) AS HUGEINT) AS q50,
                 CAST(quantile_disc(ssq, 0.99) AS HUGEINT) AS q99
          FROM nm)
    SELECT n,
           (CAST(s AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE) AS mean_norm,
           sqrt(CAST(q50 AS DOUBLE)) / 1000000.0 AS p50_norm,
           sqrt(CAST(q99 AS DOUBLE)) / 1000000.0 AS p99_norm
    FROM g
"""


def q_churn_label_users(sf_dir: str):
    """Churn-label generation — the OTHER supervised endpoint next to
    `label_purchase_7d`: split time at the stream's median timestamp
    (exact disc selection), and for every user active BEFORE the cutoff
    emit churned = (no event in (cutoff, cutoff+14d]), plus their
    pre-cutoff activity count and recency as the features a churn model
    consumes.  Per-user conditional aggregates fuse in ONE grouped
    kernel; the cutoff comes from the thin ranked pass."""
    from feast_ray.grouped import grouped_map
    from feast_ray.stages.stats import global_order_index

    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def thin(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table({"ts_us": us, "rid": t["event_id"]})

    ranked = global_order_index(
        ds.map_batches(thin, batch_format="pyarrow", zero_copy_batch=True),
        "ts_us", tiebreak="rid", pos_name="grank",
    ).materialize()
    n = ranked.count()
    med_rank = (n + 1) // 2 - 1

    def pick(t: pa.Table) -> pa.Table:
        g = t["grank"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(g == med_rank)).select(["ts_us"])

    cutoff = int(
        ranked.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()[0]["ts_us"]
    )
    W = 14 * 86_400_000_000

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        u_a = t["user_id"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({
                "user_id": u_a.slice(0, 0),
                "n_before": pa.array([], pa.int64()),
                "recency_us": pa.array([], pa.int64()),
                "churned": pa.array([], pa.int64()),
            })
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        sizes = np.diff(starts)
        gidx = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        firsts = starts[:-1]
        before = ts <= cutoff
        in_win = (ts > cutoff) & (ts <= cutoff + W)
        n_before = np.zeros(len(sizes), dtype=np.int64)
        np.add.at(n_before, gidx, before.astype(np.int64))
        # last pre-cutoff ts per user (rows sorted by ts: max = last)
        last_b = np.full(len(sizes), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(last_b, gidx, np.where(before, ts,
                                             np.iinfo(np.int64).min))
        act_win = np.zeros(len(sizes), dtype=np.int64)
        np.add.at(act_win, gidx, in_win.astype(np.int64))
        ok = n_before > 0
        gi = np.flatnonzero(ok)
        return pa.table({
            "user_id": pc.take(u_a, pa.array(firsts[gi])),
            "n_before": pa.array(n_before[gi]),
            "recency_us": pa.array(cutoff - last_b[gi]),
            "churned": pa.array((act_win[gi] == 0).astype(np.int64)),
        })

    return grouped_map(ds, ["user_id"], kernel, sort_keys=["ts", "event_id"])


QUERIES_ML["churn_label_users"] = q_churn_label_users
ORACLE_SQL_ML["churn_label_users"] = """
    WITH g AS (
      SELECT quantile_disc(epoch_us(ts), 0.5) AS cutoff FROM events),
    b AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_before,
             CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_b
      FROM events CROSS JOIN g
      WHERE epoch_us(ts) <= g.cutoff GROUP BY 1),
    w AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_win
      FROM events CROSS JOIN g
      WHERE epoch_us(ts) > g.cutoff
        AND epoch_us(ts) <= g.cutoff + 1209600000000
      GROUP BY 1)
    SELECT b.user_id, b.n_before,
           (SELECT cutoff FROM g) - b.last_b AS recency_us,
           CAST(CASE WHEN COALESCE(w.n_win, 0) = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS churned
    FROM b LEFT JOIN w USING (user_id)
"""
