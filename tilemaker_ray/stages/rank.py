"""Distributed window ranks: global and per-partition ROW_NUMBER /
RANK over a total order, without materializing the dataset on the
driver.

The reference's analog is its global feature ordering inside tiles
(canonical z-order sort, /root/reference/src/tile_data.cpp:60-103);
here the same need appears corpus-wide (global rank of a page by a
score for curriculum sampling / top-k retention, top-k events per
user).

Shape: ``ds.sort(keys)`` range-partitions and sorts (Ray Data's
distributed sample-based sort — the one all-to-all exchange). The
*driver* then touches ONLY per-block metadata: one row-count and, per
key group, a (first, last, last-run-start) triple per block —
O(n_blocks), not O(rows) — to prefix-sum global offsets and stitch
key runs that span block boundaries. Each block gets its offsets
applied in an independent Ray task; results are re-assembled with
``from_arrow_refs``. This is the documented raw-Ray escape hatch: the
Dataset API cannot express order-aware per-block indexing.

Per-partition windows reuse the same walk: with the sort keyed
``part_keys + order_keys``, the global run-start of the ``part_keys``
run containing a row is the partition's first global row number, so

    ROW_NUMBER() OVER (PARTITION BY p ORDER BY o) = rn - start(p) + 1
    RANK()       OVER (PARTITION BY p ORDER BY o) =
        start(p + o) - start(p) + 1

— two run-start arrays per block, no groupby, no per-group tasks.

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


@ray.remote
def _block_meta(block: pa.Table, key_groups: list):
    """(num_rows, [(first_key, last_key, start_of_last_run)] per key
    group) for the driver's boundary walk. Keys compare as tuples."""
    n = block.num_rows
    if n == 0:
        return (0, [(None, None, 0) for _ in key_groups])
    cache = {c: block[c].to_numpy(zero_copy_only=False)
             for g in key_groups for c in g}
    groups = []
    for keys in key_groups:
        cols = [cache[c] for c in keys]
        first = tuple(c[0] for c in cols)
        last = tuple(c[-1] for c in cols)
        eq = np.ones(n, dtype=bool)
        for c in cols:
            eq &= c == c[-1]
        idx = np.flatnonzero(~eq)  # last row not in the tail run
        groups.append((first, last, int(idx[-1]) + 1 if len(idx) else 0))
    return (n, groups)


def _run_starts(cols, n: int, offset: int, incoming: int) -> np.ndarray:
    """Per-row GLOBAL row number (1-based) of the first row of the key
    run containing it. ``incoming`` > 0 means the block's first run
    continues a run that started at that global row number."""
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in cols:
        change[1:] |= c[1:] != c[:-1]
    rs = np.maximum.accumulate(
        np.where(change, np.arange(n, dtype=np.int64), 0))
    g = offset + 1 + rs
    if incoming > 0:
        g = np.where(rs == 0, np.int64(incoming), g)
    return g


@ray.remote
def _apply_rank(block: pa.Table, key_groups: list, offset: int,
                incomings: list, outputs: list):
    """Append rank columns to one sorted block.

    ``outputs``: list of (col_name, kind, i) with kind one of
    ``rn`` (global row number), ``start`` (global run start of group
    i), ``rn_in`` (rn - start(i) + 1), ``rank_in`` (start(i+1) -
    start(i) + 1, groups i and i+1).
    """
    n = block.num_rows
    rn = offset + 1 + np.arange(n, dtype=np.int64)
    cache = {c: block[c].to_numpy(zero_copy_only=False)
             for g in key_groups for c in g}
    starts = [_run_starts([cache[c] for c in g], n, offset, inc)
              for g, inc in zip(key_groups, incomings)]
    out = block
    for name, kind, i in outputs:
        if kind == "rn":
            col = rn
        elif kind == "start":
            col = starts[i]
        elif kind == "rn_in":
            col = rn - starts[i] + 1
        else:  # rank_in
            col = starts[i + 1] - starts[i] + 1
        out = out.append_column(name, pa.array(col, pa.int64()))
    return out


def _ranked(ds, sort_keys, descending, key_groups, outputs):
    """Shared driver walk: sort, fetch per-block metadata, stitch runs
    per key group, launch one _apply_rank task per block."""
    sorted_ds = ds.sort(sort_keys, descending=descending)
    refs = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            refs.append(ref)
    metas = ray.get([_block_meta.remote(r, key_groups) for r in refs])
    counts = [m[0] for m in metas]
    # drop empty blocks (post-shuffle empties can carry zero-column
    # schemas — see state/checkpoint.py note)
    keep = [i for i, c in enumerate(counts) if c]
    if not keep:
        return sorted_ds
    offsets = np.concatenate(
        [[0], np.cumsum([counts[i] for i in keep])[:-1]])
    # per-group stitch state: (last_key, run_start_of_last_value)
    state = [(None, 0) for _ in key_groups]
    out_refs = []
    for off, i in zip(offsets, keep):
        incomings = []
        for gi in range(len(key_groups)):
            first, last, start_last = metas[i][1][gi]
            cur_last, cur_run_start = state[gi]
            incoming = cur_run_start \
                if (cur_last is not None and first == cur_last) else 0
            if start_last == 0 and incoming:
                nxt = incoming  # whole block is one continuing run
            else:
                nxt = int(off) + start_last + 1
            state[gi] = (last, nxt)
            incomings.append(incoming)
        out_refs.append(_apply_rank.remote(
            refs[i], key_groups, int(off), incomings, outputs))
    import ray.data as rd
    return rd.from_arrow_refs(out_refs)


def global_rank(ds, keys, descending=False, rn_col="row_number",
                rank_col="rank", rank_keys=None):
    """ROW_NUMBER() (and RANK() when ``rank_col``) OVER (ORDER BY keys).

    ``keys`` is a list of column names; ``descending`` a bool or
    per-key list. Ties in RANK share the rank of the run's first row
    (ANSI semantics) and are detected on ``rank_keys`` (default: all
    ``keys``) — pass the ORDER BY prefix there and a trailing unique
    id in ``keys`` so ROW_NUMBER is deterministic.
    """
    if isinstance(keys, str):
        keys = [keys]
    outputs = [(rn_col, "rn", 0)]
    key_groups = []
    if rank_col is not None:
        key_groups = [list(keys) if rank_keys is None else list(rank_keys)]
        outputs.append((rank_col, "start", 0))
    return _ranked(ds, keys, descending, key_groups, outputs)


def partitioned_rank(ds, part_keys, order_keys, descending=False,
                     rn_col="row_number", rank_col=None, rank_keys=None):
    """ROW_NUMBER() / RANK() OVER (PARTITION BY part_keys ORDER BY
    order_keys) via ONE global sort on ``part_keys + order_keys``.

    ``descending`` applies to ``order_keys`` (bool or per-key list);
    partitions always sort ascending. ``rank_keys`` (default
    ``order_keys``) is the tie-detection prefix for RANK; include a
    trailing unique id in ``order_keys`` so ROW_NUMBER is
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
    outputs = [(rn_col, "rn_in", 0)]
    if rank_col is not None:
        tie = list(order_keys) if rank_keys is None else list(rank_keys)
        key_groups.append(list(part_keys) + tie)
        outputs.append((rank_col, "rank_in", 0))
    return _ranked(ds, sort_keys, sort_desc, key_groups, outputs)
