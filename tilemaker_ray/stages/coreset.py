"""Greedy k-center coreset selection (farthest-point traversal).

The classic 2-approximation for k-center (Gonzalez 1985) used as a
diversity-maximizing data-selection pass in training pipelines: seed
with the largest-norm vector, then repeatedly add the point farthest
from the current selected set. Deterministic end to end — embeddings
are quantized to int64 fixed point so every distance is an EXACT
integer, and every argmax breaks ties by minimum vec_id — which is
what lets a SQL oracle replay the selection verbatim.

Distributed shape: selection is inherently sequential in k, so the
operator runs k passes; each pass is one vectorized map_batches over
the quantized table computing each block's farthest candidate
(int64 matmul against the ≤k broadcast centers), and the driver folds
only n_blocks candidate rows per round. The quantized slim table is
materialized once (object-store resident, spillable) so the k passes
don't re-decode parquet; at the 10^12-row design point k stays small
(8-64) and each pass is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

QUANT_SCALE = 1 << 20


def quantize_fn(batch: pa.Table, dim: int,
                scale: int = QUANT_SCALE) -> pa.Table:
    """float list<float> embedding -> wide int64 q0..q{dim-1} columns.

    np.rint (round-half-even) on value*scale; exactness of the
    DOWNSTREAM selection does not depend on the rounding mode, only on
    both engines reading the same staged integers."""
    emb = batch["embedding"]
    flat = emb.combine_chunks() if hasattr(emb, "combine_chunks") else emb
    arr = np.asarray(flat.flatten(), dtype=np.float64)
    n = len(batch)
    if n * dim != arr.size:
        raise ValueError(f"expected fixed dim {dim}, got "
                         f"{arr.size} values for {n} rows")
    q = np.rint(arr.reshape(n, dim) * scale).astype(np.int64)
    cols = {"vec_id": batch["vec_id"]}
    for j in range(dim):
        cols[f"q{j}"] = pa.array(q[:, j], pa.int64())
    return pa.table(cols)


def _block_candidate(ids: np.ndarray, dm: np.ndarray):
    """(vec_id, dist) of the block's farthest point; ties -> min id."""
    order = np.lexsort((ids, -dm))
    i = order[0]
    return int(ids[i]), int(dm[i])


def kcenter_select(quant_ds, k: int, dim: int):
    """Run the k-round greedy selection over a quantized Dataset.

    Returns a list of (rank, vec_id, dist_fp) where dist_fp is the
    exact integer objective the point was selected on: squared norm
    for the seed, min squared distance to the prior selected set for
    the rest."""
    import ray

    qcols = [f"q{j}" for j in range(dim)]
    ds = quant_ds.materialize()
    selected: list[tuple[int, int, int]] = []
    centers: list[np.ndarray] = []

    for rank in range(1, k + 1):
        centers_ref = ray.put(np.array(centers, dtype=np.int64)
                              if centers else None)

        def score(batch: pa.Table, _ref=centers_ref) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            empty = pa.table({
                "vec_id": pa.array([], pa.int64()),
                "dm": pa.array([], pa.int64()),
                "vec": pa.array([], pa.list_(pa.int64()))})
            if len(ids) == 0:
                return empty
            x = np.stack([batch[c].to_numpy(zero_copy_only=False)
                          .astype(np.int64) for c in qcols], axis=1)
            cs = ray.get(_ref)
            if cs is None:
                dm = (x * x).sum(axis=1)
            else:
                xx = (x * x).sum(axis=1)[:, None]
                cc = (cs * cs).sum(axis=1)[None, :]
                dm = (xx - 2 * (x @ cs.T) + cc).min(axis=1)
            i = int(np.lexsort((ids, -dm))[0])
            # the block winner's vector rides along so the driver
            # never runs a lookup pass for the next broadcast
            return pa.table({
                "vec_id": pa.array([int(ids[i])], pa.int64()),
                "dm": pa.array([int(dm[i])], pa.int64()),
                "vec": pa.array([x[i].tolist()],
                                pa.list_(pa.int64()))})

        parts = ds.map_batches(score, batch_format="pyarrow",
                               batch_size=4096).take_all()
        if not parts:
            break
        ids = np.array([r["vec_id"] for r in parts], np.int64)
        dms = np.array([r["dm"] for r in parts], np.int64)
        vid, dval = _block_candidate(ids, dms)
        selected.append((rank, vid, dval))
        win = next(r for r in parts if r["vec_id"] == vid)
        centers.append(np.array(win["vec"], np.int64))
    return selected
