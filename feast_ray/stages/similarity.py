"""Similarity search over embedding columns (``list<float>``).

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix with per-batch partial top-k (only k rows per block
survive to the final tiny sort).  Scale path: :func:`lsh_bucket_topk`
assigns random-hyperplane LSH buckets and searches only the query's bucket
(and optional neighbor probes), turning the scan into a pruned read.

Not present in the Feast reference (its online path does point lookups, not
similarity); required as a first-class training-data operator by the task
brief.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _embedding_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column (zero-copy flat read)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ListArray) or isinstance(arr, pa.LargeListArray):
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if len(widths) and not (widths == widths[0]).all():
            raise ValueError("ragged embedding column; expected fixed dimension")
        flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        d = int(widths[0]) if len(widths) else 0
        # offsets may not start at 0 after slicing
        return flat[offsets[0] : offsets[-1]].reshape(len(widths), d)
    raise TypeError(f"unsupported embedding column type {arr.type}")


def cosine_scores(mat: np.ndarray, qvec: np.ndarray) -> np.ndarray:
    qn = np.linalg.norm(qvec)
    norms = np.linalg.norm(mat, axis=1)
    denom = norms * qn
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = (mat @ qvec) / denom
    return np.where(denom == 0, 0.0, cos)


def brute_force_topk(
    ds,
    qvec: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_ids: Sequence[int] = (),
    round_digits: int = 6,
):
    """Exact cosine top-k.  Each batch emits at most k candidate rows
    (argpartition), so the final sort runs over k x n_blocks rows."""
    q = np.asarray(qvec, dtype=np.float64)
    excl = np.asarray(list(exclude_ids), dtype=np.int64)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()), "cos_sim": pa.array([], type=pa.float64())}
            )
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _embedding_matrix(t[emb_col])
        cos = cosine_scores(mat, q)
        keep = ~np.isin(ids, excl)
        ids, cos = ids[keep], cos[keep]
        if len(cos) > k:
            part = np.argpartition(-cos, k - 1)[:k]
            ids, cos = ids[part], cos[part]
        return pa.table(
            {id_col: pa.array(ids), "cos_sim": pa.array(np.round(cos, round_digits))}
        )

    cands = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return _topk_sort(cands, k, id_col)


def _topk_sort(cands, k: int, id_col: str):
    # deterministic: cos desc, id asc tie-break
    from feast_ray.grouped import sorted_head

    return sorted_head(cands, ["cos_sim", id_col], [True, False], k)


class _HyperplaneHasher:
    """Seeded random-hyperplane signs -> LSH bucket id (stable across runs)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(dim, n_planes))
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        return ((mat @ self.planes) > 0).astype(np.int64) @ self.weights


def lsh_bucket_topk(
    ds,
    qvec: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 7,
    exclude_ids: Sequence[int] = (),
):
    """Approximate top-k: score only rows whose LSH bucket matches the
    query's.  At 100 TB the bucket column is precomputed and used as a
    partition key so the read itself prunes; here the filter is applied
    per batch."""
    q = np.asarray(qvec, dtype=np.float64)
    hasher = _HyperplaneHasher(len(q), n_planes=n_planes, seed=seed)
    qb = int(hasher.bucket(q[None, :])[0])
    excl = np.asarray(list(exclude_ids), dtype=np.int64)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()), "cos_sim": pa.array([], type=pa.float64())}
            )
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _embedding_matrix(t[emb_col])
        b = hasher.bucket(mat)
        keep = (b == qb) & ~np.isin(ids, excl)
        ids, mat = ids[keep], mat[keep]
        cos = cosine_scores(mat, q) if len(ids) else np.zeros(0)
        if len(cos) > k:
            part = np.argpartition(-cos, k - 1)[:k]
            ids, cos = ids[part], cos[part]
        return pa.table({id_col: pa.array(ids), "cos_sim": pa.array(np.round(cos, 6))})

    cands = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return _topk_sort(cands, k, id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the clustered scale path
# ---------------------------------------------------------------------------


class IvfIndex:
    """Seeded mini-kmeans coarse quantizer (IVF).

    ``fit`` runs a few Lloyd iterations over a deterministic sample;
    ``assign`` maps vectors to their nearest centroid (one matmul).  At
    100 TB the assignment is a one-off ``map_batches`` whose output becomes
    the partition key, so a query reads only ``nprobe / nlist`` of the
    corpus; locally the filter is applied per batch.
    """

    def __init__(self, nlist: int = 16, n_iter: int = 8, seed: int = 23):
        self.nlist = nlist
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: Optional[np.ndarray] = None

    def fit(self, sample: np.ndarray) -> "IvfIndex":
        rng = np.random.default_rng(self.seed)
        n = len(sample)
        k = min(self.nlist, n)
        cent = sample[rng.choice(n, size=k, replace=False)].astype(np.float64)
        for _ in range(self.n_iter):
            d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)
            for j in range(k):
                m = a == j
                if m.any():
                    cent[j] = sample[m].mean(axis=0)
        self.centroids = cent
        return self

    def assign(self, mat: np.ndarray) -> np.ndarray:
        c = self.centroids
        d = (mat * mat).sum(1)[:, None] - 2.0 * (mat @ c.T) + (c * c).sum(1)[None, :]
        return np.argmin(d, axis=1)

    def probes(self, qvec: np.ndarray, nprobe: int) -> np.ndarray:
        d = ((self.centroids - qvec[None, :]) ** 2).sum(axis=1)
        return np.argsort(d)[:nprobe]


def ivf_topk(
    ds,
    qvec: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    seed: int = 23,
    exclude_ids: Sequence[int] = (),
    train_table=None,
):
    """Approximate top-k via IVF: score only vectors whose coarse cluster is
    among the query's ``nprobe`` nearest centroids.

    Train sample: the first ``train_sample`` rows in NATURAL READ ORDER
    (deterministic for a fixed file set — block order follows the input
    files), locally re-sorted by id so kmeans sees a stable input.  No
    global sort: an all-to-all exchange to fetch 2k training rows would
    dwarf the query at scale.  Centroids are broadcast via the task
    closure (a few KB)."""
    import ray

    q = np.asarray(qvec, dtype=np.float64)
    if train_table is not None:
        # cancellation-free path: caller hands the head rows as a local
        # Arrow table (e.g. read straight from the first parquet row group
        # with zero Ray tasks) — ds.limit() would early-stop the executor
        # and cancel in-flight read tasks (ray 2.49 fatal-race surface,
        # see feast_ray.grouped._infer_schema_local)
        tt = train_table.slice(0, train_sample)
        order = np.argsort(tt[id_col].to_numpy(zero_copy_only=False))
        sample = _embedding_matrix(tt[emb_col])[order]
    else:
        head = ds.limit(train_sample).take_all()
        head.sort(key=lambda r: r[id_col])
        sample = np.asarray([r[emb_col] for r in head], dtype=np.float64)
    index = IvfIndex(nlist=nlist, n_iter=8, seed=seed).fit(sample)
    probe_set = set(int(x) for x in index.probes(q, nprobe))
    excl = np.asarray(list(exclude_ids), dtype=np.int64)
    idx_ref = ray.put(index.centroids)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()), "cos_sim": pa.array([], type=pa.float64())}
            )
        cents = ray.get(idx_ref)
        local = IvfIndex(nlist=nlist, seed=seed)
        local.centroids = cents
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _embedding_matrix(t[emb_col])
        cl = local.assign(mat)
        keep = np.isin(cl, list(probe_set)) & ~np.isin(ids, excl)
        ids, mat = ids[keep], mat[keep]
        cos = cosine_scores(mat, q) if len(ids) else np.zeros(0)
        if len(cos) > k:
            part = np.argpartition(-cos, k - 1)[:k]
            ids, cos = ids[part], cos[part]
        return pa.table({id_col: pa.array(ids), "cos_sim": pa.array(np.round(cos, 6))})

    cands = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return _topk_sort(cands, k, id_col)


def knn_graph(
    ds,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_chunks: int = 8,
    round_digits: int = 6,
    rank_name: str = "nbr_rank",
    num_buckets=None,
):
    """Exact cosine k-nearest-neighbor GRAPH: for EVERY node its top-k
    neighbors (self excluded) — the ANN-graph construction step of
    embedding-based curation (semantic dedup clustering, kNN
    classification, graph-based diversity sampling).

    Scale shape = the dedup blockpair exchange (``stages.dedup.
    embedding_pair_pipeline``): rows chunk by ``id % n_chunks``, every
    unordered chunk pair is one shuffle group, each reducer matmuls its
    two chunks and emits PER-NODE top-k partials (``argpartition`` per
    row, <= k rows per node per pair group).  A second grouped exchange
    on the node id merges the <= n_chunks * k candidates per node and
    keeps the global top-k.  No driver state, no broadcast; a reducer
    holds 2/n_chunks of the corpus.

    Scores are rounded to ``round_digits`` BEFORE ranking so the
    (cos DESC, nbr_id ASC) order is reproducible against a SQL twin.
    """
    from feast_ray.grouped import grouped_map

    B = int(n_chunks)
    if k < 1 or B < 1:
        raise ValueError("k and n_chunks must be >= 1")

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), emb_col: t[emb_col],
                 "__chunk": pa.array([], pa.int32()), "__pk": pa.array([], pa.int64())}
            )
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        c = (ids % B).astype(np.int64)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), B))
        c_rep = np.repeat(c, B)
        d = np.tile(np.arange(B, dtype=np.int64), n)
        lo = np.minimum(c_rep, d)
        hi = np.maximum(c_rep, d)
        out = t.select([id_col, emb_col]).take(rep)
        out = out.append_column("__chunk", pa.array(c_rep.astype(np.int32)))
        return out.append_column("__pk", pa.array(lo * B + hi))

    expanded = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)

    def _row_topk(cs: np.ndarray, row_ids: np.ndarray, col_ids: np.ndarray):
        """Per-row top-k of a scores matrix -> flat (id, nbr, cos) arrays.

        Scores are rounded BEFORE selection and ties break to the smaller
        neighbor id (stable argsort over ascending-id columns — the
        exchange sorts each chunk by id), so the partial candidate set is
        exactly the prefix of the FINAL (cos DESC, nbr_id ASC) order; a
        raw-score argpartition would pick arbitrarily among rounded ties.
        """
        m = cs.shape[1]
        kk = min(k, m)
        if kk == 0 or cs.shape[0] == 0:
            z = np.zeros(0, np.int64)
            return z, z, np.zeros(0, np.float64)
        cs_r = np.round(cs, round_digits)
        part = np.argsort(-cs_r, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(row_ids, part.shape[1])
        cols = col_ids[part.ravel()]
        vals = np.take_along_axis(cs_r, part, axis=1).ravel()
        keep = ~np.isneginf(vals)
        return rows[keep], cols[keep], vals[keep]

    def kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        outs_i, outs_j, outs_c = [], [], []
        pk_np = t["__pk"].combine_chunks().to_numpy(zero_copy_only=False)
        ch = t["__chunk"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        emb = t[emb_col].combine_chunks()
        for g in range(len(starts) - 1):
            lo_i, hi_i = int(starts[g]), int(starts[g + 1])
            pk = int(pk_np[lo_i])
            a_chunk, b_chunk = pk // B, pk % B
            mat = _embedding_matrix(emb.slice(lo_i, hi_i - lo_i))
            nm = np.linalg.norm(mat, axis=1)
            nm[nm == 0] = 1.0
            mat = mat / nm[:, None]
            gids = ids[lo_i:hi_i]
            if a_chunk == b_chunk:
                cs = mat @ mat.T
                np.fill_diagonal(cs, -np.inf)  # self excluded
                r, c, v = _row_topk(cs, gids, gids)
                outs_i.append(r); outs_j.append(c); outs_c.append(v)
            else:
                am = ch[lo_i:hi_i] == a_chunk
                bm = ~am
                if not am.any() or not bm.any():
                    continue
                cs = mat[am] @ mat[bm].T
                ia, ib = gids[am], gids[bm]
                r, c, v = _row_topk(cs, ia, ib)
                outs_i.append(r); outs_j.append(c); outs_c.append(v)
                r, c, v = _row_topk(np.ascontiguousarray(cs.T), ib, ia)
                outs_i.append(r); outs_j.append(c); outs_c.append(v)
        if not outs_i:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "nbr_id": pa.array([], pa.int64()),
                 "__negcos": pa.array([], pa.float64())}
            )
        cos = np.concatenate(outs_c)  # already rounded in _row_topk
        return pa.table(
            {
                id_col: pa.array(np.concatenate(outs_i)),
                "nbr_id": pa.array(np.concatenate(outs_j)),
                "__negcos": pa.array(-cos),
            }
        )

    cands = grouped_map(
        expanded, ["__pk"], kernel, num_buckets=num_buckets, sort_keys=["__chunk", id_col]
    )

    def reduce_topk(t: pa.Table, starts: np.ndarray) -> pa.Table:
        n_rows = t.num_rows
        if n_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "nbr_id": pa.array([], pa.int64()),
                 "cos_sim": pa.array([], pa.float64()),
                 rank_name: pa.array([], pa.int64())}
            )
        sizes = np.diff(starts)
        take_n = np.minimum(sizes, k)
        rep = np.repeat(take_n, take_n)
        csum = np.concatenate(([0], np.cumsum(take_n)))
        local = np.arange(int(take_n.sum()), dtype=np.int64) - np.repeat(csum[:-1], take_n)
        idx = np.repeat(starts[:-1], take_n) + local
        out = t.take(pa.array(idx))
        neg = out["__negcos"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: out[id_col],
                "nbr_id": out["nbr_id"],
                "cos_sim": pa.array(-neg),
                rank_name: pa.array(local + 1),
            }
        )

    return grouped_map(
        cands, [id_col], reduce_topk, sort_keys=["__negcos", "nbr_id"],
        num_buckets=num_buckets,
    )


def knn_graph_lsh(
    ds,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 7,
    round_digits: int = 6,
    rank_name: str = "nbr_rank",
    num_buckets=None,
):
    """APPROXIMATE cosine kNN graph — the 100-TB path where the exact
    blockpair matmul (:func:`knn_graph`, O(n^2 / n_chunks) per reducer) is
    infeasible: every row hashes into ``n_tables`` independent
    random-hyperplane buckets, each (table, bucket) group computes exact
    per-node top-k WITHIN the bucket, and a final per-node exchange merges
    the multi-table candidates (duplicates collapse) into the global
    top-k.  Recall per true neighbor at cosine angle theta is
    ``1 - (1 - (1 - theta/pi)^n_planes)^n_tables`` — tune planes/tables;
    precision is exact (true cosine, same rounding + tie rule as the
    exact graph).  Fan-out is ``n_tables`` rows per vector; a bucket
    holds ~n / 2^n_planes rows (size planes so a bucket fits a worker).
    Deterministic: plane matrices are seeded per (table, dim).
    """
    from feast_ray.grouped import grouped_map

    if k < 1 or n_tables < 1:
        raise ValueError("k and n_tables must be >= 1")

    def tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), emb_col: t[emb_col],
                 "__tb": pa.array([], pa.int64())}
            )
        mat = _embedding_matrix(t[emb_col])
        dim = mat.shape[1]
        keys = []
        for tb in range(n_tables):
            h = _HyperplaneHasher(dim, n_planes=n_planes, seed=seed + 1000 * tb)
            keys.append(np.int64(tb) << np.int64(32) | h.bucket(mat))
        rep = pa.array(np.tile(np.arange(n, dtype=np.int64), n_tables))
        out = t.select([id_col, emb_col]).take(rep)
        return out.append_column("__tb", pa.array(np.concatenate(keys)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def _row_topk(cs: np.ndarray, row_ids: np.ndarray, col_ids: np.ndarray):
        m = cs.shape[1]
        kk = min(k, m)
        if kk == 0 or cs.shape[0] == 0:
            z = np.zeros(0, np.int64)
            return z, z, np.zeros(0, np.float64)
        cs_r = np.round(cs, round_digits)
        part = np.argsort(-cs_r, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(row_ids, part.shape[1])
        cols = col_ids[part.ravel()]
        vals = np.take_along_axis(cs_r, part, axis=1).ravel()
        keep = ~np.isneginf(vals)
        return rows[keep], cols[keep], vals[keep]

    def bucket_kernel(t: pa.Table, starts: np.ndarray) -> pa.Table:
        outs_i, outs_j, outs_c = [], [], []
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        emb = t[emb_col].combine_chunks()
        for g in range(len(starts) - 1):
            lo_i, hi_i = int(starts[g]), int(starts[g + 1])
            if hi_i - lo_i < 2:
                continue
            mat = _embedding_matrix(emb.slice(lo_i, hi_i - lo_i))
            nm = np.linalg.norm(mat, axis=1)
            nm[nm == 0] = 1.0
            mat = mat / nm[:, None]
            cs = mat @ mat.T
            np.fill_diagonal(cs, -np.inf)
            gids = ids[lo_i:hi_i]
            r, c, v = _row_topk(cs, gids, gids)
            outs_i.append(r); outs_j.append(c); outs_c.append(v)
        if not outs_i:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "nbr_id": pa.array([], pa.int64()),
                 "__negcos": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(outs_i)),
                "nbr_id": pa.array(np.concatenate(outs_j)),
                "__negcos": pa.array(-np.concatenate(outs_c)),
            }
        )

    cands = grouped_map(
        tagged, ["__tb"], bucket_kernel, sort_keys=[id_col], num_buckets=num_buckets
    )

    def reduce_topk(t: pa.Table, starts: np.ndarray) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "nbr_id": pa.array([], pa.int64()),
                 "cos_sim": pa.array([], pa.float64()),
                 rank_name: pa.array([], pa.int64())}
            )
        # multi-table duplicates are adjacent after the (negcos, nbr) sort;
        # keep first-of-run, then the first k survivors per node
        gidx = np.repeat(np.arange(len(starts) - 1, dtype=np.int64), np.diff(starts))
        nbr = t["nbr_id"].combine_chunks().to_numpy(zero_copy_only=False)
        first = np.empty(t.num_rows, dtype=bool)
        first[0] = True
        first[1:] = (gidx[1:] != gidx[:-1]) | (nbr[1:] != nbr[:-1])
        keep_idx = np.flatnonzero(first)
        kg = gidx[keep_idx]
        new_g = np.empty(len(keep_idx), dtype=bool)
        new_g[0] = True
        new_g[1:] = kg[1:] != kg[:-1]
        rank = np.arange(len(keep_idx)) - np.maximum.accumulate(
            np.where(new_g, np.arange(len(keep_idx)), 0)
        )
        sel = rank < k
        out = t.take(pa.array(keep_idx[sel]))
        neg = out["__negcos"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: out[id_col],
                "nbr_id": out["nbr_id"],
                "cos_sim": pa.array(-neg),
                rank_name: pa.array((rank[sel] + 1).astype(np.int64)),
            }
        )

    return grouped_map(
        cands, [id_col], reduce_topk, sort_keys=["__negcos", "nbr_id"],
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means (fixed-iteration, deterministic init)
# ---------------------------------------------------------------------------


def kmeans(
    ds,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 4,
    n_iter: int = 2,
    round_digits: int = 6,
):
    """Distributed Lloyd's k-means over an embedding column — the
    embedding-clustering step corpus curation builds on (SemDeDup's
    clustering stage, topic bucketing, stratified corpus splits).

    Deterministic by construction, so a SQL twin can replay it exactly:
    init centroids are the embeddings of the ``k`` LOWEST ids; assignment
    is argmin squared-L2 rounded to ``round_digits`` with ties to the
    lowest centroid index (numpy argmin == SQL ``ORDER BY d, cid``); the
    update is the float64 member mean; an empty cluster keeps its previous
    centroid; exactly ``n_iter`` update rounds then one final assignment.

    Distribution: centroids broadcast via ``ray.put`` each round; each
    batch computes partial (cluster, count, per-dim sum) — k rows per
    batch — and ONLY those k x n_batches partial rows reach the driver
    (k x dim floats after the local reduce), never the corpus.  The
    final pass is one stateless assignment map.  n_iter more rounds =
    n_iter more linear scans; no shuffle anywhere.
    """
    import ray

    head = (
        ds.map_batches(
            lambda t: t.select([id_col, emb_col]).take(
                pc.select_k_unstable(t, k, sort_keys=[(id_col, "ascending")])
            )
            if t.num_rows > k
            else t.select([id_col, emb_col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort(id_col)
        .limit(k)
        .take_all()
    )
    cent = np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in head])
    kk, dim = cent.shape

    def _assign(mat: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # full (x - c)^2 per dim, summed in dim order — mirrors the SQL
        # SUM((x-c)^2) so rounded distances agree across engines
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        d = np.round(d, round_digits)
        return np.argmin(d, axis=1), d

    for _ in range(n_iter):
        cref = ray.put(cent)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            if t.num_rows == 0:
                return pa.table(
                    {
                        "cid": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "sums": pa.array([], pa.list_(pa.float64())),
                    }
                )
            mat = _embedding_matrix(t[emb_col]).astype(np.float64)
            asg, _ = _assign(mat, c)
            sums = np.zeros((len(c), mat.shape[1]), dtype=np.float64)
            np.add.at(sums, asg, mat)
            cnt = np.bincount(asg, minlength=len(c)).astype(np.int64)
            nz = cnt > 0
            return pa.table(
                {
                    "cid": pa.array(np.flatnonzero(nz).astype(np.int64)),
                    "n": pa.array(cnt[nz]),
                    "sums": pa.array(list(sums[nz])),
                }
            )

        parts = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        tot = np.zeros((kk, dim), dtype=np.float64)
        cnt = np.zeros(kk, dtype=np.int64)
        for r in parts:
            tot[r["cid"]] += np.asarray(r["sums"], dtype=np.float64)
            cnt[r["cid"]] += r["n"]
        nz = cnt > 0
        cent = cent.copy()
        cent[nz] = tot[nz] / cnt[nz, None]

    cref = ray.put(cent)

    def final(t: pa.Table, _cref=cref) -> pa.Table:
        c = ray.get(_cref)
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                }
            )
        mat = _embedding_matrix(t[emb_col]).astype(np.float64)
        asg, d = _assign(mat, c)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster_id": pa.array(asg.astype(np.int64)),
                "dist": pa.array(d[np.arange(len(asg)), asg]),
            }
        )

    return ds.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)
