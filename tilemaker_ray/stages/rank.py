"""Distributed global window ranks: ROW_NUMBER / RANK over a total
order, without materializing the dataset on the driver.

The reference's analog is its global feature ordering inside tiles
(canonical z-order sort, /root/reference/src/tile_data.cpp:60-103);
here the same need appears corpus-wide (global rank of a page by a
score for curriculum sampling / top-k retention).

Shape: ``ds.sort(keys)`` range-partitions and sorts (Ray Data's
distributed sample-based sort — the one all-to-all exchange). The
*driver* then touches ONLY per-block metadata: one row-count and one
(first,last) key pair per block — O(n_blocks), not O(rows) — to
prefix-sum global offsets and stitch tie runs that span block
boundaries. Each block gets its offset/run info applied in an
independent Ray task; results are re-assembled with
``from_arrow_refs``. This is the documented raw-Ray escape hatch: the
Dataset API cannot express order-aware per-block indexing.

Scale notes (100 TB): driver state is 3 scalars per block (~10^5
blocks → trivial); the boundary walk is a single linear pass; block
tasks are embarrassingly parallel and zero-copy (append one int64
column to an Arrow block read from the object store).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _block_meta(block: pa.Table, key_cols: list):
    """(num_rows, first_key, last_key, start_idx_of_last_run) for the
    boundary walk. Keys are compared as tuples of column values."""
    n = block.num_rows
    if n == 0:
        return (0, None, None, 0)
    cols = [block[c].to_numpy(zero_copy_only=False) for c in key_cols]
    first = tuple(c[0] for c in cols)
    last = tuple(c[-1] for c in cols)
    # start of the run containing the final row
    eq = np.ones(n, dtype=bool)
    for c in cols:
        eq &= c == c[-1]
    # last False before the tail run of Trues
    idx = np.flatnonzero(~eq)
    start_last_run = int(idx[-1]) + 1 if len(idx) else 0
    return (n, first, last, start_last_run)


@ray.remote
def _apply_rank(block: pa.Table, key_cols: list, offset: int,
                incoming_run_start: int, rn_col: str, rank_col: str):
    """Append global row_number and rank columns to one sorted block."""
    n = block.num_rows
    rn = offset + 1 + np.arange(n, dtype=np.int64)
    if rank_col is None:
        return block.append_column(rn_col, pa.array(rn, pa.int64()))
    cols = [block[c].to_numpy(zero_copy_only=False) for c in key_cols]
    # run starts: index 0 plus every position where any key changes
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in cols:
        change[1:] |= c[1:] != c[:-1]
    run_start_idx = np.maximum.accumulate(
        np.where(change, np.arange(n, dtype=np.int64), 0))
    rank = offset + 1 + run_start_idx
    if incoming_run_start > 0:
        # the block's first run continues a tie from earlier blocks
        first_run = run_start_idx == 0
        rank = np.where(first_run, np.int64(incoming_run_start), rank)
    out = block.append_column(rn_col, pa.array(rn, pa.int64()))
    return out.append_column(rank_col, pa.array(rank, pa.int64()))


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
    rank_keys = list(keys) if rank_keys is None else list(rank_keys)
    sorted_ds = ds.sort(keys, descending=descending)
    refs, counts, metas = [], [], []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            refs.append(ref)
            counts.append(meta.num_rows)
    if any(c is None for c in counts) or rank_col is not None:
        metas = ray.get([_block_meta.remote(r, rank_keys) for r in refs])
        counts = [m[0] for m in metas]
    # drop empty blocks (post-shuffle empties can carry zero-column
    # schemas — see state/checkpoint.py note)
    keep = [i for i, c in enumerate(counts) if c]
    offsets = np.concatenate(
        [[0], np.cumsum([counts[i] for i in keep])[:-1]]) if keep else []
    out_refs = []
    cur_last, cur_run_start = None, 0
    for off, i in zip(offsets, keep):
        incoming = 0
        if rank_col is not None:
            n_i, first, last, start_last = metas[i]
            if cur_last is not None and first == cur_last:
                incoming = cur_run_start
            # run start rn of this block's last value, for the next block
            if start_last == 0 and incoming:
                cur_run_start = incoming
            else:
                cur_run_start = int(off) + start_last + 1
            cur_last = last
        out_refs.append(_apply_rank.remote(
            refs[i], rank_keys, int(off), incoming, rn_col, rank_col))
    import ray.data as rd
    if not out_refs:
        return sorted_ds
    return rd.from_arrow_refs(out_refs)
