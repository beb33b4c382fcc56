"""Skyline (Pareto frontier) query — Börzsönyi et al. 2001, public.

2-D skyline (minimize x, maximize y) with EXACT SQL ``NOT EXISTS``
dominance semantics: a row survives iff no row has (x ≤, y ≥) with at
least one strict; duplicate extremal points all survive, with their
multiplicity.

Distributed shape — the standard two-phase skyline: a local skyline
per block (dominated rows can never re-enter the global skyline, so
local filtering is lossless), then one final pass over the union of
local skylines. The candidate set after phase 1 is the skyline of a
sample-of-blocks — O(skyline size × n_blocks) worst case and tiny in
practice (a random 2-D skyline is O(log n) points) — so the final
pass is a single bounded group (documented driver-adjacent step,
same class as the tile_rollup halving).

Kernel: sort by (x asc, y desc); a row is dominated iff the running
max y over STRICTLY smaller x ≥ its y, or a same-x row has strictly
larger y — all vectorized via run boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask implementing NOT EXISTS dominance
    (min x, max y) over the given rows, duplicates preserved."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, x))
    xs, ys = x[order], y[order]
    brk = np.ones(n, dtype=bool)
    brk[1:] = xs[1:] != xs[:-1]
    starts = np.flatnonzero(brk)
    run_id = np.cumsum(brk) - 1
    run_max = ys[starts]                 # y desc within run → first
    # running max of y over strictly earlier (smaller-x) runs
    prev_best = np.full(len(starts), np.iinfo(np.int64).min,
                        dtype=np.float64)
    if len(starts) > 1:
        prev_best[1:] = np.maximum.accumulate(run_max)[:-1]
    keep_sorted = (ys == run_max[run_id]) & \
        (run_max[run_id] > prev_best[run_id])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline_2d(ds, x_col: str, y_col: str):
    """Dataset → Dataset of rows on the (min x_col, max y_col) Pareto
    frontier, multiplicity preserved."""

    def local(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(_skyline_mask(x, y)))
        return t.append_column("one", pa.array([1] * t.num_rows,
                                               pa.int8()))

    def final(g: pa.Table) -> pa.Table:
        x = g[x_col].to_numpy(zero_copy_only=False)
        y = g[y_col].to_numpy(zero_copy_only=False)
        return g.filter(pa.array(_skyline_mask(x, y))) \
            .drop_columns(["one"])

    # phase 1 prunes per block; phase 2 is ONE group over the tiny
    # candidate union (the "one" constant key)
    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("one").map_groups(final, batch_format="pyarrow"))


def skyline_reference(rows: list) -> list:
    """O(n²) NOT EXISTS oracle over (x, y) tuples."""
    out = []
    for xi, yi in rows:
        # the strict clause makes identical rows non-dominating, so
        # no self-exclusion is needed (duplicates all survive)
        dominated = any(
            xj <= xi and yj >= yi and (xj < xi or yj > yi)
            for xj, yj in rows)
        if not dominated:
            out.append((xi, yi))
    return sorted(out)
