"""Distributed KMeans (Lloyd's) over the embeddings table —
bit-deterministic under any partitioning.

Floating-point sums are order-dependent, so a naive distributed
centroid update changes with block boundaries and retries. This
implementation quantizes vectors to fixed-point int64 (scale 2^20) and
accumulates INTEGER per-cluster sums — associative and commutative, so
any reduction order yields identical centroids, and a single-process
numpy reference must match the distributed run EXACTLY (the oracle
tests/test_cluster.py pins). The same fixed-point trick the reference
uses for coordinates (int32 ×10^7 latp,
/root/reference/include/coordinates.h:72-99).

Shapes: centroids broadcast via ray.put each round; per-batch partial
= k rows of (int64 sum blob, count) — the driver reduce touches
k × n_blocks tiny rows (bounded like the IVF driver-sampled kmeans in
stages/similarity.py), never the corpus. Assignment ties break to the
lowest cluster index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = np.int64(1) << np.int64(20)


def quantize(V: np.ndarray) -> np.ndarray:
    """float embedding matrix → fixed-point int64 (round half away
    from zero, matching np.rint's even-rounding NOT — use floor(x+0.5)
    so the reference formula is trivially portable)."""
    return np.floor(np.asarray(V, np.float64) * np.float64(SCALE)
                    + 0.5).astype(np.int64)


def _emb_matrix(col: pa.ChunkedArray | pa.Array, dim: int) -> np.ndarray:
    """Arrow list<float> column → (n, dim) float64 via flat buffers."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), dim).astype(np.float64)


def assign_clusters(Q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest centroid per row (squared L2), ties → lowest index.
    Q is the fixed-point int64 matrix viewed as float64 (exact)."""
    Qf = Q.astype(np.float64)
    d2 = (np.sum(Qf * Qf, axis=1, keepdims=True)
          - 2.0 * (Qf @ cent.T) + np.sum(cent * cent, axis=1))
    return np.argmin(d2, axis=1).astype(np.int64)


def kmeans_fixed(emb_ds, k: int = 8, iters: int = 8, dim: int = 64):
    """Lloyd's iterations over a Dataset of (vec_id, embedding).
    Returns (assignments_ds, centroids) where assignments_ds has
    (vec_id, cluster) and centroids is the final (k, dim) float64
    array. Init: quantized vectors of the k smallest vec_ids."""
    import ray

    # deterministic init — k lowest vec_ids (one tiny driver sort over
    # a k-row-per-block partial min, not the corpus)
    def heads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)[:k]
        return batch.take(pa.array(order, pa.int64()))

    seed = (emb_ds.map_batches(heads, batch_format="pyarrow")
            .sort("vec_id").limit(k).to_arrow_refs())
    seed_blocks = [b for b in (ray.get(r) for r in seed) if b.num_rows]
    seed_t = pa.concat_tables(seed_blocks)
    # centroids live in fixed-point units throughout
    cent = quantize(_emb_matrix(seed_t["embedding"], dim)).astype(np.float64)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            Q = quantize(_emb_matrix(batch["embedding"], dim))
            a = assign_clusters(Q, c)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, a, Q)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k), pa.int64()),
                "blob": pa.array([s.tobytes() for s in sums],
                                 pa.binary()),
                "count": pa.array(counts, pa.int64())})

        parts = emb_ds.map_batches(partial,
                                   batch_format="pyarrow").to_arrow_refs()
        # empty input blocks pass through as zero-COLUMN blocks —
        # drop them or concat_tables raises on the schema mismatch
        blocks = [b for b in (ray.get(r) for r in parts) if b.num_rows]
        pt = pa.concat_tables(blocks)
        cl = pt["cluster"].to_numpy(zero_copy_only=False)
        cnt = pt["count"].to_numpy(zero_copy_only=False)
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for i in range(len(cl)):
            sums[cl[i]] += np.frombuffer(pt["blob"][i].as_py(),
                                         dtype=np.int64)
            counts[cl[i]] += cnt[i]
        new = cent.copy()
        nz = counts > 0
        new[nz] = sums[nz].astype(np.float64) / counts[nz, None]
        if np.array_equal(new, cent):
            break
        cent = new

    ref = ray.put(cent)

    def assign(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        Q = quantize(_emb_matrix(batch["embedding"], dim))
        a = assign_clusters(Q, c)
        return pa.table({"vec_id": batch["vec_id"],
                         "cluster": pa.array(a, pa.int64())})

    return (emb_ds.map_batches(assign, batch_format="pyarrow"),
            cent / np.float64(SCALE))


def kmeans_reference(vec_ids: np.ndarray, V: np.ndarray, k: int = 8,
                     iters: int = 8) -> np.ndarray:
    """Single-process oracle: identical fixed-point algorithm, pure
    numpy, no Ray. Must match kmeans_fixed bit-exactly."""
    order = np.argsort(vec_ids)
    Q = quantize(V)
    cent = Q[order[:k]].astype(np.float64)
    for _ in range(iters):
        a = assign_clusters(Q, cent)
        sums = np.zeros((k, Q.shape[1]), dtype=np.int64)
        np.add.at(sums, a, Q)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        new = cent.copy()
        nz = counts > 0
        new[nz] = sums[nz].astype(np.float64) / counts[nz, None]
        if np.array_equal(new, cent):
            break
        cent = new
    return assign_clusters(Q, cent)


# ---------------------------------------------------------------------------
# Integer-centroid Lloyd's — the SQL-certifiable trainer variant
# ---------------------------------------------------------------------------

def _assign_int(Q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest INTEGER centroid per row by exact integer squared L2
    (Σ(q−c)² in int64 — |q|,|c| ≤ ~2²¹ so 64·diff² < 2⁴⁹), ties →
    lowest cluster index."""
    # (n, k) distance matrix in int64 without materializing (n,k,d)
    qq = np.sum(Q * Q, axis=1, keepdims=True)
    cc = np.sum(cent * cent, axis=1)
    d2 = qq - 2 * (Q @ cent.T) + cc
    return np.argmin(d2, axis=1).astype(np.int64)


def kmeans_integer(emb_ds, k: int = 8, iters: int = 8, dim: int = 64):
    """Lloyd's with centroids kept in INTEGER fixed point end to end:
    init = quantized vectors of the k smallest vec_ids, assignment by
    exact integer squared distance (ties → lowest cluster), update =
    per-dimension floor(sum / count) (empty clusters keep their
    centroid). Every quantity is an int64, so the whole trainer — not
    just the assignment — is bit-deterministic under any partitioning
    AND expressible as unrolled SQL (floor-div mirrored as
    floor(CAST(s AS DOUBLE)/c), exact while |s| ≪ 2⁵³ and the s/c gap
    to an integer is ≥ 1/count ≫ ulp). Distributed shape =
    kmeans_fixed: per-batch int64 partial sums (k×dim scalars per
    block), driver folds k×dim ints per iteration. Returns
    (assignments_ds with (vec_id, cluster), centroids int64)."""
    import ray

    def heads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)[:k]
        return batch.take(pa.array(order, pa.int64()))

    seed = (emb_ds.map_batches(heads, batch_format="pyarrow")
            .sort("vec_id").limit(k).to_arrow_refs())
    seed_blocks = [b for b in (ray.get(r) for r in seed) if b.num_rows]
    seed_t = pa.concat_tables(seed_blocks)
    cent = quantize(_emb_matrix(seed_t["embedding"], dim))

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            Q = quantize(_emb_matrix(batch["embedding"], dim))
            a = _assign_int(Q, c)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, a, Q)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k), pa.int64()),
                "blob": pa.array([s.tobytes() for s in sums],
                                 pa.binary()),
                "count": pa.array(counts, pa.int64())})

        parts = emb_ds.map_batches(
            partial, batch_format="pyarrow").to_arrow_refs()
        blocks = [b for b in (ray.get(r) for r in parts) if b.num_rows]
        pt = pa.concat_tables(blocks)
        cl = pt["cluster"].to_numpy(zero_copy_only=False)
        cnt = pt["count"].to_numpy(zero_copy_only=False)
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for i in range(len(cl)):
            sums[cl[i]] += np.frombuffer(pt["blob"][i].as_py(),
                                         dtype=np.int64)
            counts[cl[i]] += cnt[i]
        new = cent.copy()
        nz = counts > 0
        new[nz] = np.floor_divide(sums[nz], counts[nz, None])
        if np.array_equal(new, cent):
            break
        cent = new

    ref = ray.put(cent)

    def assign(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        Q = quantize(_emb_matrix(batch["embedding"], dim))
        a = _assign_int(Q, c)
        return pa.table({"vec_id": batch["vec_id"],
                         "cluster": pa.array(a, pa.int64())})

    return (emb_ds.map_batches(assign, batch_format="pyarrow"), cent)


def kmeans_integer_reference(vec_ids: np.ndarray, V: np.ndarray,
                             k: int = 8, iters: int = 8):
    """Single-process oracle for kmeans_integer — must match the
    distributed trainer bit-exactly under any block layout."""
    order = np.argsort(vec_ids)
    Q = quantize(V)
    cent = Q[order[:k]].copy()
    for _ in range(iters):
        a = _assign_int(Q, cent)
        sums = np.zeros((k, Q.shape[1]), dtype=np.int64)
        np.add.at(sums, a, Q)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        new = cent.copy()
        nz = counts > 0
        new[nz] = np.floor_divide(sums[nz], counts[nz, None])
        if np.array_equal(new, cent):
            break
        cent = new
    return _assign_int(Q, cent), cent
