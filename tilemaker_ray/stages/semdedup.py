"""SemDeDup: semantic deduplication of an embedding corpus
(Abbas et al. 2023, arXiv:2303.09540 — public).

The third leg of the dedup family (exact → lexical MinHash/SimHash →
SEMANTIC): cluster the embeddings with the engine's bit-deterministic
KMeans, compare vectors pairwise ONLY within their cluster (the
paper's tractability trick — intra-cluster search turns the corpus-
quadratic cosine step into k cluster-quadratic ones), connect pairs
above the cosine threshold, and keep the component-minimum vec_id.

Ray shape: one KMeans fit (stages/cluster.py — broadcast centroids,
integer partial sums), then ONE exchange grouping vectors by cluster
id, exact cosine inside each ``map_groups`` call, and the shared
``keep_one_per_component`` CC + anti-join end-game
(stages/dedup.py). Determinism end to end: centroids are fixed-point
(partition-invariant), assignments argmin with lowest-index ties,
pair emission sorted, CC labels are component minima — pinned against
a single-process numpy reference in tests/test_semdedup.py.

Skew guard: a cluster larger than ``max_cluster`` degrades to the
star verify (min-id representative vs all — same policy as the
embedding-LSH path), logged; at real scale raise k so expected
cluster size = n/k stays under it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .cluster import (SCALE, _emb_matrix, assign_clusters,
                      kmeans_fixed, quantize)
from .common import mix_bucket as _mix_bucket
from .dedup import keep_one_per_component


def semantic_pairs(emb_ds, dim: int = 64, k: int = 8, iters: int = 8,
                   threshold: float = 0.95, max_cluster: int = 4000):
    """→ Dataset (doc_a, doc_b, cos) of intra-cluster pairs with
    cosine ≥ threshold (doc_a < doc_b)."""
    import ray

    _assign_ds, cent = kmeans_fixed(emb_ds, k=k, iters=iters, dim=dim)
    # kmeans returns real-unit centroids (internal fixed-point values
    # divided by the power-of-two SCALE — an EXACT float op), so
    # multiplying back restores the trainer's internal centroids
    # bit-for-bit; quantize() would round away the fractional part
    # sums/counts leaves and could flip boundary assignments
    cent_ref = ray.put(cent * np.float64(SCALE))

    def tag_cluster(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        Q = quantize(_emb_matrix(batch["embedding"], dim))
        a = assign_clusters(Q, c)
        return pa.table({
            "vec_id": batch["vec_id"],
            "embedding": batch["embedding"],
            "cluster": pa.array(a, pa.int64()),
            "kbkt": pa.array(_mix_bucket(a, max(k, 1)), pa.int64())})

    def pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        out = [empty]
        cl = g["cluster"].to_numpy(zero_copy_only=False)
        ids_all = g["vec_id"].to_numpy(zero_copy_only=False)
        V_all = _emb_matrix(g["embedding"], dim)
        order = np.lexsort((ids_all, cl))
        cl, ids_all, V_all = cl[order], ids_all[order], V_all[order]
        brk = np.ones(len(cl), dtype=bool)
        brk[1:] = cl[1:] != cl[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(cl)]])
        for s, e in zip(starts, ends):
            n = int(e - s)
            if n < 2:
                continue
            ids = ids_all[s:e]
            V = V_all[s:e]
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            if n > max_cluster:
                import logging
                logging.getLogger("tilemaker_ray.semdedup").warning(
                    "cluster of %d > max_cluster=%d: star verify",
                    n, max_cluster)
                cos = Vn[1:] @ Vn[0]
                keep = cos >= threshold
                out.append(pa.table({
                    "doc_a": pa.array(
                        np.full(int(keep.sum()), ids[0]), pa.int64()),
                    "doc_b": pa.array(ids[1:][keep], pa.int64()),
                    "cos": pa.array(cos[keep], pa.float64())}))
                continue
            S = Vn @ Vn.T
            a, b = np.triu_indices(n, k=1)
            keep = S[a, b] >= threshold
            out.append(pa.table({
                "doc_a": pa.array(ids[a][keep], pa.int64()),
                "doc_b": pa.array(ids[b][keep], pa.int64()),
                "cos": pa.array(S[a, b][keep], pa.float64())}))
        return pa.concat_tables(out)

    return (emb_ds.map_batches(tag_cluster, batch_format="pyarrow")
            .groupby("kbkt").map_groups(pairs, batch_format="pyarrow"))


def semdedup_keep(emb_ds, dim: int = 64, k: int = 8, iters: int = 8,
                  threshold: float = 0.95, max_cluster: int = 4000):
    """→ Dataset (vec_id) of the kept corpus: one representative (the
    component-minimum vec_id) per semantic-duplicate component."""
    pairs = semantic_pairs(emb_ds, dim=dim, k=k, iters=iters,
                           threshold=threshold, max_cluster=max_cluster)
    ids = emb_ds.map_batches(
        lambda b: pa.table({"doc_id": b["vec_id"].cast(pa.int64())}),
        batch_format="pyarrow")
    return keep_one_per_component(ids, pairs) \
        .rename_columns({"doc_id": "vec_id"})


def semdedup_reference(vec_ids: np.ndarray, V: np.ndarray,
                       k: int = 8, iters: int = 8,
                       threshold: float = 0.95) -> list:
    """Single-process oracle: same KMeans (via kmeans_reference-style
    fixed-point units), brute intra-cluster cosine pairs, union-find
    keep. Returns the sorted kept vec_ids."""
    from .cluster import kmeans_reference
    assign = kmeans_reference(vec_ids, V, k=k, iters=iters)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    parent = {int(i): int(i) for i in vec_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in range(k):
        idx = np.flatnonzero(assign == c)
        for ii in range(len(idx)):
            for jj in range(ii + 1, len(idx)):
                a, b = idx[ii], idx[jj]
                if float(Vn[a] @ Vn[b]) >= threshold:
                    ra, rb = find(int(vec_ids[a])), find(int(vec_ids[b]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    return sorted(i for i in parent if find(i) == i)
