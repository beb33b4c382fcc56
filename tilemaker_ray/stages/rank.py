"""Distributed window ranks: global and per-partition ROW_NUMBER /
RANK / DENSE_RANK over a total order, without materializing the
dataset on the driver.

The reference's analog is its global feature ordering inside tiles
(canonical z-order sort, /root/reference/src/tile_data.cpp:60-103);
here the same need appears corpus-wide (global rank of a page by a
score for curriculum sampling / top-k retention, top-k events per
user).

Shape: ``ds.sort(keys)`` range-partitions and sorts (Ray Data's
distributed sample-based sort — the one all-to-all exchange). The
*driver* then touches ONLY per-block metadata: one row-count and, per
key group, a (first, last, last-run-start, n_runs) tuple per block —
O(n_blocks), not O(rows) — to prefix-sum global offsets and stitch
key runs that span block boundaries. Each block gets its offsets
applied in an independent Ray task; results are re-assembled with
``from_arrow_refs``. This is the documented raw-Ray escape hatch: the
Dataset API cannot express order-aware per-block indexing.

Window algebra on the stitched per-row arrays (all vectorized):

    rn            = global row number (offset + local index)
    start(g)      = global rn of the first row of g's run
    dense(g)      = global index of g's run (cumsative run count)
    ROW_NUMBER() OVER (ORDER BY o)                 = rn
    RANK()       OVER (ORDER BY o)                 = start(o)
    DENSE_RANK() OVER (ORDER BY o)                 = dense(o)
    ROW_NUMBER() OVER (PARTITION BY p ORDER BY o)  = rn - start(p) + 1
    RANK()       OVER (PARTITION BY p ORDER BY o)  = start(p+o) - start(p) + 1
    DENSE_RANK() OVER (PARTITION BY p ORDER BY o)  = dense(p+o)
                                                   - dense(p+o)@start(p) + 1

The last identity needs one extra carried scalar per block: the
``p+o`` dense index at the current partition's start (every partition
start is also a tie-run start, so the driver derives it from run-count
metadata alone).

Scale notes (100 TB): driver state is a handful of scalars per block
(~10^5 blocks → trivial); the boundary walk is a single linear pass;
block tasks are embarrassingly parallel and zero-copy (append int64
columns to an Arrow block read from the object store). Partition skew
does not concentrate work: a giant partition spans many blocks and
each block is still processed independently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _changes(cols, n: int) -> np.ndarray:
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in cols:
        change[1:] |= c[1:] != c[:-1]
    return change


@ray.remote
def _block_meta(block: pa.Table, key_groups: list, cross: list):
    """Per key group: (first_key, last_key, start_of_last_run, n_runs).
    Per cross pair (p, t): count of t-run starts strictly before the
    start of p's last run. Keys compare as tuples."""
    n = block.num_rows
    if n == 0:
        return (0, [(None, None, 0, 0) for _ in key_groups],
                [0 for _ in cross])
    cache = {c: block[c].to_numpy(zero_copy_only=False)
             for g in key_groups for c in g}
    groups, changes = [], []
    for keys in key_groups:
        cols = [cache[c] for c in keys]
        first = tuple(c[0] for c in cols)
        last = tuple(c[-1] for c in cols)
        change = _changes(cols, n)
        changes.append(change)
        eq = np.ones(n, dtype=bool)
        for c in cols:
            eq &= c == c[-1]
        idx = np.flatnonzero(~eq)  # last row not in the tail run
        start_last = int(idx[-1]) + 1 if len(idx) else 0
        groups.append((first, last, start_last, int(change.sum())))
    xmeta = [int(changes[t][:groups[p][2]].sum()) for p, t in cross]
    return (n, groups, xmeta)


@ray.remote
def _apply_rank(block: pa.Table, key_groups: list, cross: list,
                offset: int, incomings: list, carried: list,
                outputs: list):
    """Append window columns to one sorted block.

    ``incomings``: per key group (run_start_global, dense_offset);
    ``carried``: per cross pair, the tie-group dense index at the
    current partition's start (0 if no partition continues into this
    block). ``outputs``: (col_name, kind, i) with kind in ``rn`` /
    ``start`` / ``dense`` / ``rn_in`` / ``rank_in`` / ``dense_in``
    (``*_in`` index key groups i → partition, i+1 → partition+ties;
    ``dense_in`` indexes the cross pair list).
    """
    n = block.num_rows
    rn = offset + 1 + np.arange(n, dtype=np.int64)
    cache = {c: block[c].to_numpy(zero_copy_only=False)
             for g in key_groups for c in g}
    starts, denses, changes = [], [], []
    for g, (inc_start, dense_off) in zip(key_groups, incomings):
        cols = [cache[c] for c in g]
        change = _changes(cols, n)
        rs = np.maximum.accumulate(
            np.where(change, np.arange(n, dtype=np.int64), 0))
        gstart = offset + 1 + rs
        if inc_start > 0:
            gstart = np.where(rs == 0, np.int64(inc_start), gstart)
        starts.append(gstart)
        denses.append(dense_off + np.cumsum(change))
        changes.append(change)
    out = block
    for name, kind, i in outputs:
        if kind == "rn":
            col = rn
        elif kind == "start":
            col = starts[i]
        elif kind == "dense":
            col = denses[i]
        elif kind == "rn_in":
            col = rn - starts[i] + 1
        elif kind == "rank_in":
            col = starts[i + 1] - starts[i] + 1
        else:  # dense_in
            p, t = cross[i]
            tmp = np.where(changes[p], denses[t], 0)
            if incomings[p][0] > 0:
                # row 0 continues a partition from an earlier block:
                # local change[0]=True is positional, not a real start
                tmp[0] = carried[i]
            fill = np.maximum.accumulate(tmp)
            col = denses[t] - fill + 1
        out = out.append_column(name, pa.array(col, pa.int64()))
    return out


def _ranked(ds, sort_keys, descending, key_groups, cross, outputs):
    """Shared driver walk: sort, fetch per-block metadata, stitch runs
    and dense offsets per key group, launch one _apply_rank task per
    block."""
    sorted_ds = ds.sort(sort_keys, descending=descending)
    refs = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            refs.append(ref)
    metas = ray.get([_block_meta.remote(r, key_groups, cross)
                     for r in refs])
    counts = [m[0] for m in metas]
    # drop empty blocks (post-shuffle empties can carry zero-column
    # schemas — see state/checkpoint.py note)
    keep = [i for i, c in enumerate(counts) if c]
    if not keep:
        return sorted_ds
    offsets = np.concatenate(
        [[0], np.cumsum([counts[i] for i in keep])[:-1]])
    # per-group stitch state: (last_key, run_start_of_last_value,
    # dense_index_of_last_row)
    state = [(None, 0, 0) for _ in key_groups]
    xstate = [0 for _ in cross]  # carried tie-dense at partition start
    out_refs = []
    for off, i in zip(offsets, keep):
        incomings, continuing = [], []
        for gi in range(len(key_groups)):
            first, last, start_last, n_runs = metas[i][1][gi]
            cur_last, cur_run_start, total_dense = state[gi]
            cont = cur_last is not None and first == cur_last
            incoming = cur_run_start if cont else 0
            dense_off = total_dense - 1 if cont else total_dense
            if start_last == 0 and cont:
                nxt = incoming  # whole block is one continuing run
            else:
                nxt = int(off) + start_last + 1
            state[gi] = (last, nxt, dense_off + n_runs)
            incomings.append((incoming, dense_off))
            continuing.append(cont)
        carried = list(xstate)
        for xi, (p, t) in enumerate(cross):
            _f, _l, start_last_p, _n = metas[i][1][p]
            if not (start_last_p == 0 and continuing[p]):
                # last partition run starts in THIS block; its start row
                # is also a t-run start, so its t-dense index is the
                # block's t dense offset + (t-runs before it) + 1
                xstate[xi] = incomings[t][1] + metas[i][2][xi] + 1
        out_refs.append(_apply_rank.remote(
            refs[i], key_groups, cross, int(off), incomings, carried,
            outputs))
    import ray.data as rd
    return rd.from_arrow_refs(out_refs)


def global_rank(ds, keys, descending=False, rn_col="row_number",
                rank_col="rank", rank_keys=None, dense_col=None):
    """ROW_NUMBER() (plus RANK() / DENSE_RANK() when ``rank_col`` /
    ``dense_col``) OVER (ORDER BY keys).

    ``keys`` is a list of column names; ``descending`` a bool or
    per-key list. Ties share the run-first rank (ANSI semantics) and
    are detected on ``rank_keys`` (default: all ``keys``) — pass the
    ORDER BY prefix there and a trailing unique id in ``keys`` so
    ROW_NUMBER is deterministic.
    """
    if isinstance(keys, str):
        keys = [keys]
    outputs = [(rn_col, "rn", 0)]
    key_groups = []
    if rank_col is not None or dense_col is not None:
        key_groups = [list(keys) if rank_keys is None else list(rank_keys)]
        if rank_col is not None:
            outputs.append((rank_col, "start", 0))
        if dense_col is not None:
            outputs.append((dense_col, "dense", 0))
    return _ranked(ds, keys, descending, key_groups, [], outputs)


def partitioned_rank(ds, part_keys, order_keys, descending=False,
                     rn_col="row_number", rank_col=None, rank_keys=None,
                     dense_col=None):
    """ROW_NUMBER() / RANK() / DENSE_RANK() OVER (PARTITION BY
    part_keys ORDER BY order_keys) via ONE global sort on
    ``part_keys + order_keys``.

    ``descending`` applies to ``order_keys`` (bool or per-key list);
    partitions always sort ascending. ``rank_keys`` (default
    ``order_keys``) is the tie-detection prefix for RANK/DENSE_RANK;
    include a trailing unique id in ``order_keys`` so ROW_NUMBER is
    deterministic.
    """
    if isinstance(part_keys, str):
        part_keys = [part_keys]
    if isinstance(order_keys, str):
        order_keys = [order_keys]
    if isinstance(descending, bool):
        descending = [descending] * len(order_keys)
    sort_keys = list(part_keys) + list(order_keys)
    sort_desc = [False] * len(part_keys) + list(descending)
    key_groups = [list(part_keys)]
    cross = []
    outputs = [(rn_col, "rn_in", 0)]
    if rank_col is not None or dense_col is not None:
        tie = list(order_keys) if rank_keys is None else list(rank_keys)
        key_groups.append(list(part_keys) + tie)
        if rank_col is not None:
            outputs.append((rank_col, "rank_in", 0))
        if dense_col is not None:
            cross = [(0, 1)]
            outputs.append((dense_col, "dense_in", 0))
    return _ranked(ds, sort_keys, sort_desc, key_groups, cross, outputs)
