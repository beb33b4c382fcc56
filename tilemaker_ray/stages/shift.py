"""Distributed LAG / LEAD: partition-aware row shifts over a total
order, without a groupby and without driver materialization.

Same skeleton as stages/rank.py / cumulative.py (single global sort on
``part_keys + order_keys``, O(n_blocks) driver walk, independent
per-block tasks); the carried state here is the k-row *edge buffer*:
each block's metadata includes its first and last ``min(k, n)`` rows
of the part-key + value columns (a handful of scalars), the driver
folds a rolling k-row tail forward (for LAG) and a rolling k-row head
backward (for LEAD), and each block task prepends/appends its
neighbour rows, shifts locally, and nulls out shifts that cross a
partition boundary.

Scale: driver state is ≤ 2k rows per block of slim key/value columns;
a partition spanning many blocks stays parallel (each block only ever
sees its 2k neighbour rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _edge_meta(block: pa.Table, cols: list, k: int):
    """(n, {col: head min(k,n) values}, {col: tail values}) — value
    lists are tiny (≤ k) python lists for cheap driver folding."""
    n = block.num_rows
    if n == 0:
        return (0, {c: [] for c in cols}, {c: [] for c in cols})
    h = block.slice(0, min(k, n))
    t = block.slice(max(0, n - k))
    return (n,
            {c: h[c].to_pylist() for c in cols},
            {c: t[c].to_pylist() for c in cols})


def _fold(a: dict, b: dict, k: int, keep_tail: bool) -> dict:
    """Concatenate edge dicts and keep the last (tail) or first (head)
    k rows."""
    out = {}
    for c in a:
        v = a[c] + b[c]
        out[c] = v[-k:] if keep_tail else v[:k]
    return out


@ray.remote
def _apply_shift(block: pa.Table, part_keys: list, jobs: list,
                 prev_rows: dict, next_rows: dict):
    """jobs: [(out_col, value_col, periods)] — periods > 0 is LAG,
    < 0 is LEAD. Shifts that land outside the block use the neighbour
    edge rows; shifts that cross a partition boundary become null."""
    n = block.num_rows
    out = block
    t_prev = len(next(iter(prev_rows.values()))) if prev_rows else 0
    t_next = len(next(iter(next_rows.values()))) if next_rows else 0

    def ext(col):
        parts = []
        if t_prev:
            parts.append(np.asarray(prev_rows[col]))
        parts.append(block[col].to_numpy(zero_copy_only=False))
        if t_next:
            parts.append(np.asarray(next_rows[col]))
        return np.concatenate(parts) if len(parts) > 1 else parts[0]

    pcols = {c: ext(c) for c in part_keys}
    idx = t_prev + np.arange(n, dtype=np.int64)
    for name, vcol, periods in jobs:
        src = idx - periods
        valid = (src >= 0) & (src < t_prev + n + t_next)
        safe = np.clip(src, 0, t_prev + n + t_next - 1)
        for c in part_keys:
            valid &= pcols[c][safe] == pcols[c][idx]
        v = ext(vcol)[safe]
        out = out.append_column(
            name, pa.array(v, mask=~valid))
    return out


def shifted(ds, part_keys, order_keys, shifts, descending=False):
    """LAG/LEAD OVER (PARTITION BY part_keys ORDER BY order_keys).

    ``shifts``: list of (out_col, value_col, periods) — periods > 0
    looks back (LAG), < 0 looks ahead (LEAD). Out-of-partition and
    out-of-corpus shifts are null. ``descending`` applies to
    order_keys.
    """
    if isinstance(part_keys, str):
        part_keys = [part_keys]
    if isinstance(order_keys, str):
        order_keys = [order_keys]
    if isinstance(descending, bool):
        descending = [descending] * len(order_keys)
    k = max(abs(p) for _n, _v, p in shifts)
    need = list(dict.fromkeys(
        list(part_keys) + [v for _n, v, _p in shifts]))
    sort_keys = list(part_keys) + list(order_keys)
    sort_desc = [False] * len(part_keys) + list(descending)
    sorted_ds = ds.sort(sort_keys, descending=sort_desc)
    refs = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            refs.append(ref)
    metas = ray.get([_edge_meta.remote(r, need, k) for r in refs])
    keep = [i for i, m in enumerate(metas) if m[0]]
    if not keep:
        return sorted_ds
    empty = {c: [] for c in need}
    # forward walk: rolling k-row tail of everything before block i
    prevs, rolling = [], empty
    for i in keep:
        prevs.append(rolling)
        rolling = _fold(rolling, metas[i][2], k, keep_tail=True)
    # backward walk: rolling k-row head of everything after block i
    nexts, rolling = {}, empty
    for i in reversed(keep):
        nexts[i] = rolling
        rolling = _fold(metas[i][1], rolling, k, keep_tail=False)
    out_refs = [
        _apply_shift.remote(refs[i], list(part_keys), list(shifts),
                            prev_rows, nexts[i])
        for i, prev_rows in zip(keep, prevs)]
    import ray.data as rd
    return rd.from_arrow_refs(out_refs)
