"""Edit-distance near-duplicate pairs (FastSS deletion-neighborhood
blocking, exact verify) — the typo/OCR-noise dedup family that
shingle-Jaccard and MinHash miss (a one-character edit barely moves a
character-n-gram set but IS the whole difference between two scraped
copies of the same page).

Algorithm (public: FastSS, Bocek et al. 2007): two strings are within
edit distance 1 iff they share a member of their deletion neighborhoods
``{s} ∪ del1(s)`` — substitution at i ⇒ deleting i from both sides
collides; insertion ⇒ deleting the inserted char collides with the
shorter string itself.  The neighborhood is a LOSSLESS blocking key
(every true pair collides; collisions beyond that are killed by the
exact verifier), so the result is exactly ``{(a, b) : ed(key_a, key_b)
<= 1}`` with no similarity-threshold fuzz.

Distribution (all bounded, no driver state):
 1. identical keys collapse first — ONE grouped exchange on the key
    emits (a) one representative row per DISTINCT key and (b) the
    within-key doc pairs (edit distance 0; output-bound quadratic, the
    pairs ARE the answer for exact-dup clusters);
 2. distinct keys fan out ≤ (prefix_len + 1) variant-hash rows each;
    one exchange on the 64-bit variant hash groups candidates, and the
    kernel forms the triangular pairs AND verifies them in place with a
    vectorized distance-1 check (hamming for equal lengths, first-
    mismatch + shifted-suffix equality for a length-1 gap) — hash
    collisions only ever ADD candidates for the verifier to kill;
 3. surviving (key_a, key_b) pairs dedup on one more (tiny) exchange,
    then expand back to doc ids through two co-partitioned equi-joins
    against the (doc_id, key) membership.

Byte-level semantics: keys are the raw UTF-8 bytes of the prefix —
identical to character edit distance on ASCII corpora (asserted nowhere;
for multi-byte text a char-level variant would slice codepoints).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from feast_ray.grouped import grouped_map

_W1 = np.uint64(0x9E3779B97F4A7C15)
_W2 = np.uint64(0xC2B2AE3D27D4EB4F)
_W3 = np.uint64(0x165667B19E3779F9)
_W4 = np.uint64(0x27D4EB2F165667C5)


def _key_matrix(keys: pa.Array, width: int) -> tuple[np.ndarray, np.ndarray]:
    """(n x width) uint8 matrix of zero-padded key bytes + byte lengths."""
    buf = keys.cast(pa.binary()).to_pylist()
    n = len(buf)
    m = np.zeros((n, width), dtype=np.uint8)
    lens = np.empty(n, dtype=np.int64)
    for i, b in enumerate(buf):  # bounded: distinct keys / candidate pairs only
        lens[i] = len(b)
        m[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return m, lens


def _hash_rows(m: np.ndarray) -> np.ndarray:
    """One uint64 per row of a (n x 32) uint8 matrix — wraparound word mix.
    Collisions are harmless (verify is exact)."""
    w = np.ascontiguousarray(m).view(np.uint64).reshape(len(m), 4)
    return (
        (w[:, 0] * _W1) ^ (w[:, 1] * _W2) ^ (w[:, 2] * _W3) ^ (w[:, 3] * _W4)
    ) * _W1


def _verify_dist1(
    am: np.ndarray, al: np.ndarray, bm: np.ndarray, bl: np.ndarray
) -> np.ndarray:
    """Vectorized ``edit_distance(a, b) == 1`` over key pairs (a != b).

    Equal lengths: distance 1 iff exactly a substitution (hamming == 1 —
    a delete+insert pair would cost 2).  Length gap of 1: distance 1 iff
    the longer equals the shorter with one byte inserted — check
    ``longer[fm+1:] == shorter[fm:]`` where fm is the first mismatch
    (shorter-is-a-prefix makes the range empty, i.e. a trailing insert).
    """
    n = len(al)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    width = am.shape[1]
    same = al == bl
    if same.any():
        ham = (am[same] != bm[same]).sum(axis=1)
        out[same] = ham == 1
    gap = np.abs(al - bl) == 1
    if gap.any():
        gi = np.flatnonzero(gap)
        a_long = al[gi] > bl[gi]
        lm = np.where(a_long[:, None], am[gi], bm[gi])
        sm = np.where(a_long[:, None], bm[gi], am[gi])
        sl = np.minimum(al[gi], bl[gi])
        neq = lm[:, : width - 1] != sm[:, : width - 1]
        fm = np.where(neq.any(axis=1), neq.argmax(axis=1), width - 1)
        fm = np.minimum(fm, sl)  # shorter-prefix case: insert at the end
        # suffix check: longer[c+1] == shorter[c] for c in [fm, sl)
        e2 = lm[:, 1:] != sm[:, :-1]
        p = np.cumsum(e2, axis=1)
        hi = np.where(sl > 0, p[np.arange(len(gi)), np.maximum(sl - 1, 0)], 0)
        lo = np.where(fm > 0, p[np.arange(len(gi)), np.maximum(fm - 1, 0)], 0)
        bad = np.where(sl > fm, hi - lo, 0)
        out[gi] = bad == 0
    return out


def _tri_pairs(starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-group index pairs (i < j) for every group at once.

    Pair ordinal ``t`` inside a group maps to ``j = row of the triangular
    number below t`` via one float sqrt plus an integer fix-up (exact for
    t < 2^50), ``i = t - j(j-1)/2``.
    """
    sizes = np.diff(starts)
    npairs = sizes * (sizes - 1) // 2
    tot = int(npairs.sum())
    if tot == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    g = np.repeat(np.arange(len(sizes), dtype=np.int64), npairs)
    p_start = np.concatenate(([0], np.cumsum(npairs)))
    t = np.arange(tot, dtype=np.int64) - p_start[g]
    j = ((1.0 + np.sqrt(8.0 * t + 1.0)) // 2).astype(np.int64)
    j = np.where(t < j * (j - 1) // 2, j - 1, j)
    j = np.where(t >= j * (j + 1) // 2, j + 1, j)
    i = t - j * (j - 1) // 2
    base = starts[:-1][g]
    return base + i, base + j


def editdist_pairs(
    ds,
    *,
    id_col: str,
    text_col: str,
    prefix_len: int = 16,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
    dist_name: str = "edit_dist",
    num_buckets: Optional[int] = None,
):
    """All id pairs whose ``text_col`` prefixes are within edit distance 1
    (see module docstring).  ``prefix_len`` must be <= 31 (variants pad
    into a 32-byte hash word block)."""
    from feast_ray.stages.join import equi_join

    if not (1 <= prefix_len <= 31):
        raise ValueError("prefix_len must be in [1, 31]")

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.binary_slice(
            pc.cast(t[text_col], pa.binary()), start=0, stop=prefix_len
        )
        return pa.table({id_col: t[id_col], "key": key})

    member = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)

    # 1. collapse identical keys: per distinct key one rep row (doc nulls)
    #    + the within-key doc pairs at distance 0
    def collapse(t: pa.Table, starts: np.ndarray) -> pa.Table:
        ids = t[id_col].combine_chunks()
        if t.num_rows == 0:
            return pa.table(
                {
                    "key": t["key"].combine_chunks().slice(0, 0),
                    out_a: ids.slice(0, 0),
                    out_b: ids.slice(0, 0),
                }
            )
        firsts = starts[:-1]
        n_groups = len(firsts)
        ai, bi = _tri_pairs(starts)
        keys_arr = t["key"].combine_chunks()
        return pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        pc.take(keys_arr, pa.array(firsts)),
                        pa.nulls(len(ai), type=keys_arr.type),
                    ]
                ),
                out_a: pa.concat_arrays(
                    [
                        pa.nulls(n_groups, type=pa.int64()),
                        pc.take(ids, pa.array(ai)).cast(pa.int64()),
                    ]
                ),
                out_b: pa.concat_arrays(
                    [
                        pa.nulls(n_groups, type=pa.int64()),
                        pc.take(ids, pa.array(bi)).cast(pa.int64()),
                    ]
                ),
            }
        )

    collapsed = grouped_map(
        member, ["key"], collapse, sort_keys=[id_col], num_buckets=num_buckets
    )
    same_key_pairs = collapsed.map_batches(
        lambda t: pa.table(
            {
                out_a: t.filter(pc.is_valid(t[out_a]))[out_a],
                out_b: t.filter(pc.is_valid(t[out_a]))[out_b],
                dist_name: pa.array(
                    np.zeros(
                        pc.sum(pc.cast(pc.is_valid(t[out_a]), pa.int64())).as_py() or 0,
                        np.int64,
                    )
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    distinct_keys = collapsed.map_batches(
        lambda t: t.filter(pc.is_null(t[out_a])).select(["key"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # 2. deletion-neighborhood fan-out over the DISTINCT keys
    def variants(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"hv": pa.array([], pa.uint64()),
                 "key": t["key"].combine_chunks().slice(0, 0)}
            )
        m, lens = _key_matrix(t["key"].combine_chunks(), 32)
        hv_parts = [_hash_rows(m)]
        key_idx = [np.arange(n, dtype=np.int64)]
        for d in range(prefix_len):
            mask = lens > d
            if not mask.any():
                break
            sub = np.flatnonzero(mask)
            var = np.zeros((len(sub), 32), dtype=np.uint8)
            var[:, :d] = m[sub, :d]
            var[:, d : 31] = m[sub, d + 1 :]
            hv_parts.append(_hash_rows(var))
            key_idx.append(sub)
        hv = np.concatenate(hv_parts)
        idx = np.concatenate(key_idx)
        return pa.table(
            {"hv": pa.array(hv),
             "key": pc.take(t["key"].combine_chunks(), pa.array(idx))}
        )

    var_ds = distinct_keys.map_batches(
        variants, batch_format="pyarrow", zero_copy_batch=True
    )

    # 3. candidate pairs per variant bucket, verified in place
    def cand(t: pa.Table, starts: np.ndarray) -> pa.Table:
        keys_arr = t["key"].combine_chunks()
        if t.num_rows == 0:
            return pa.table({"key_a": keys_arr.slice(0, 0), "key_b": keys_arr.slice(0, 0)})
        ai, bi = _tri_pairs(starts)
        if len(ai) == 0:
            return pa.table({"key_a": keys_arr.slice(0, 0), "key_b": keys_arr.slice(0, 0)})
        # sorted by key within group -> a < b lexically, and a != b (keys
        # are distinct), so every pair is ordered and verify targets d==1
        am, al = _key_matrix(pc.take(keys_arr, pa.array(ai)), 32)
        bm, bl = _key_matrix(pc.take(keys_arr, pa.array(bi)), 32)
        ok = _verify_dist1(am, al, bm, bl)
        keep_a = pa.array(ai[ok])
        keep_b = pa.array(bi[ok])
        return pa.table(
            {"key_a": pc.take(keys_arr, keep_a), "key_b": pc.take(keys_arr, keep_b)}
        )

    cands = grouped_map(var_ds, ["hv"], cand, sort_keys=["key"], num_buckets=num_buckets)

    # 4. dedup (a pair can collide in several variant buckets)
    def first_row(t: pa.Table, starts: np.ndarray) -> pa.Table:
        return t.take(pa.array(starts[:-1]))

    uniq = grouped_map(cands, ["key_a", "key_b"], first_row, num_buckets=num_buckets)

    # 5. expand key pairs back to doc-id pairs through the membership
    mem_a = member.map_batches(
        lambda t: pa.table({"key_a": t["key"], "__ida": t[id_col].cast(pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    mem_b = member.map_batches(
        lambda t: pa.table({"key_b": t["key"], "__idb": t[id_col].cast(pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j1 = equi_join(uniq, mem_a, keys=["key_a"], how="inner")
    j2 = equi_join(j1, mem_b, keys=["key_b"], how="inner")

    def finish(t: pa.Table) -> pa.Table:
        x = t["__ida"].combine_chunks().to_numpy(zero_copy_only=False)
        y = t["__idb"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                out_a: pa.array(np.minimum(x, y)),
                out_b: pa.array(np.maximum(x, y)),
                dist_name: pa.array(np.ones(len(x), np.int64)),
            }
        )

    cross = j2.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    return same_key_pairs.union(cross)
