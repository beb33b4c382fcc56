"""Grouped embedding aggregation: per-group vector centroids.

The embedding-column reduction a training pipeline runs constantly —
class centroids for nearest-class-mean classification, per-source
embedding drift monitoring, cluster seeding. Naive float summation is
partition-order-dependent; like stages/moments.py, components are
quantized to fixed-point int64 (floor(v·scale)) so the distributed sum
is bit-exact under any partitioning, and the final float division uses
a fixed expression tree mirrored by the SQL oracle:

    centroid[d] = (CAST(Σq AS DOUBLE) / scale) / n

Distributed shape — ONE slim exchange: per-batch Arrow list<float> →
(n, dim) numpy view (zero-copy when the list is non-null and packed),
per-group int64 column sums via np.add.at, emitted LONG (group, dim,
psum, pcnt) — k·dim rows per batch regardless of batch size — then a
(group, dim) groupby-sum. Overflow bound: scale·|v|max·rows_per_group
< 2⁶³ (1e6 × unit-norm × 9e12 rows headroom).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _list_to_matrix(col, dim: int) -> np.ndarray:
    """Arrow list<float> column → (n, dim) float64 matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64).reshape(-1, dim)


def grouped_centroids(ds, group_col: str, vec_col: str, dim: int,
                      scale: float = 1e6):
    """→ Dataset (group, dim, centroid) — per-group per-component
    vector mean, partition-invariant (fixed-point int64 sums)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _list_to_matrix(batch[vec_col], dim)
        q = np.floor(m * scale).astype(np.int64)
        g = batch[group_col].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(g, return_inverse=True)
        k = len(keys)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            group_col: pa.array(np.repeat(keys, dim)),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), k),
                            pa.int64()),
            "psum": pa.array(sums.reshape(-1), pa.int64()),
            "pcnt": pa.array(np.repeat(cnt, dim), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby([group_col, "dim"])
           .aggregate(Sum("psum", alias_name="s"),
                      Sum("pcnt", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = s / scale / n
        return pa.table({
            group_col: batch[group_col],
            "dim": batch["dim"],
            "centroid": pa.array(c, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")
