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
    """Per key group: (first_key, last_key, start_of_last_run, n_runs,
    start_of_second_run-or-minus-1). Per cross pair (p, t): count of
    t-run starts strictly before the start of p's last run. Keys
    compare as tuples."""
    n = block.num_rows
    if n == 0:
        return (0, [(None, None, 0, 0, -1) for _ in key_groups],
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
        ridx = np.flatnonzero(change)
        second = int(ridx[1]) if len(ridx) > 1 else -1
        groups.append((first, last, start_last, int(change.sum()),
                       second))
    xmeta = [int(changes[t][:groups[p][2]].sum()) for p, t in cross]
    return (n, groups, xmeta)


@ray.remote
def _apply_rank(block: pa.Table, key_groups: list, cross: list,
                offset: int, incomings: list, carried: list,
                outputs: list, nexts: list = None):
    """Append window columns to one sorted block.

    ``incomings``: per key group (run_start_global, dense_offset);
    ``carried``: per cross pair, the tie-group dense index at the
    current partition's start (0 if no partition continues into this
    block). ``nexts``: per key group, the global rn of the first run
    start after this block's tail run (-1 when the caller didn't walk
    backward). ``outputs``: (col_name, kind, i) with kind in ``rn`` /
    ``start`` / ``dense`` / ``rn_in`` / ``rank_in`` / ``dense_in`` /
    ``size`` / ``ntile`` / ``pct`` / ``cume`` (``*_in``/``pct``/
    ``cume`` index key groups i → partition, i+1 → partition+ties;
    ``dense_in`` indexes the cross pair list; ``ntile`` smuggles the
    bucket count B in the i slot and always uses key group 0).
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

    _nstart = {}

    def nstart(gi: int) -> np.ndarray:
        """Global rn of the start of the run FOLLOWING each row's run
        (= exclusive end of the row's run). Local for interior runs;
        the tail run uses the backward-walk carry."""
        if gi not in _nstart:
            change = changes[gi]
            rsg = offset + 1 + np.flatnonzero(change)
            nxt = np.concatenate([rsg[1:],
                                  np.asarray([nexts[gi]], np.int64)])
            _nstart[gi] = nxt[np.cumsum(change) - 1]
        return _nstart[gi]

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
        elif kind == "size":
            col = nstart(i) - starts[i]
        elif kind == "ntile":
            B = i
            size = nstart(0) - starts[0]
            rn_in = rn - starts[0] + 1
            q, r = size // B, size % B
            big = r * (q + 1)
            col = np.where(rn_in <= big,
                           (rn_in - 1) // (q + 1) + 1,
                           r + (rn_in - 1 - big) // np.maximum(q, 1) + 1)
        elif kind == "pct":
            size = nstart(i) - starts[i]
            rank_in = starts[i + 1] - starts[i] + 1
            col = np.where(size > 1,
                           (rank_in - 1) / np.maximum(size - 1, 1), 0.0)
        elif kind == "cume":
            size = nstart(i) - starts[i]
            col = (nstart(i + 1) - starts[i]) / size
        else:  # dense_in
            p, t = cross[i]
            tmp = np.where(changes[p], denses[t], 0)
            if incomings[p][0] > 0:
                # row 0 continues a partition from an earlier block:
                # local change[0]=True is positional, not a real start
                tmp[0] = carried[i]
            fill = np.maximum.accumulate(tmp)
            col = denses[t] - fill + 1
        typ = pa.float64() if kind in ("pct", "cume") else pa.int64()
        out = out.append_column(name, pa.array(col, typ))
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
    # backward walk (only for outputs that need a run's exclusive end:
    # partition sizes, ntile, percent_rank, cume_dist): per key group,
    # the global rn of the first run start after each block's tail run
    need_next = set()
    for _name, kind, i in outputs:
        if kind in ("size", "pct"):
            need_next.add(i)
        elif kind == "ntile":
            need_next.add(0)
        elif kind == "cume":
            need_next.update((i, i + 1))
    nexts_by_block = {}
    if need_next:
        total = int(sum(counts[i] for i in keep))
        for pos in range(len(keep) - 1, -1, -1):
            i = keep[pos]
            if pos == len(keep) - 1:
                nexts_by_block[i] = {gi: total + 1 for gi in need_next}
                continue
            j = keep[pos + 1]
            off_j = int(offsets[pos + 1])
            d = {}
            for gi in need_next:
                first_j, _l, _sl, _n, second_j = metas[j][1][gi]
                last_i = metas[i][1][gi][1]
                if first_j != last_i:
                    d[gi] = off_j + 1        # new run at j's row 0
                elif second_j >= 0:
                    d[gi] = off_j + second_j + 1
                else:
                    # j is one single continuing run: recurse on its
                    # (already computed) tail-run successor
                    d[gi] = nexts_by_block[j][gi]
            nexts_by_block[i] = d
    # per-group stitch state: (last_key, run_start_of_last_value,
    # dense_index_of_last_row)
    state = [(None, 0, 0) for _ in key_groups]
    xstate = [0 for _ in cross]  # carried tie-dense at partition start
    out_refs = []
    for off, i in zip(offsets, keep):
        incomings, continuing = [], []
        for gi in range(len(key_groups)):
            first, last, start_last, n_runs, _second = metas[i][1][gi]
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
            _f, _l, start_last_p, _n, _s = metas[i][1][p]
            if not (start_last_p == 0 and continuing[p]):
                # last partition run starts in THIS block; its start row
                # is also a t-run start, so its t-dense index is the
                # block's t dense offset + (t-runs before it) + 1
                xstate[xi] = incomings[t][1] + metas[i][2][xi] + 1
        nexts = [nexts_by_block.get(i, {}).get(gi, -1)
                 for gi in range(len(key_groups))]
        out_refs.append(_apply_rank.remote(
            refs[i], key_groups, cross, int(off), incomings, carried,
            outputs, nexts))
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


def window_distribution(ds, part_keys, order_keys, descending=False,
                        rank_keys=None, ntile=None, ntile_col="tile",
                        pct_col=None, cume_col=None, size_col=None):
    """NTILE(B) / PERCENT_RANK() / CUME_DIST() / COUNT(*) OVER
    (PARTITION BY part_keys ORDER BY order_keys) via ONE global sort.

    Same exchange as :func:`partitioned_rank`; the partition *size*
    (and each tie run's exclusive end, for CUME_DIST) comes from one
    extra backward O(n_blocks) driver walk that resolves, per block,
    the global row number where the next key run begins.

        size         = next_part_start − part_start
        NTILE(B)     = front-loaded buckets of ⌈n/B⌉ then ⌊n/B⌋ rows
        PERCENT_RANK = (rank − 1) / (size − 1), 0 for size == 1
        CUME_DIST    = (next_tie_start − part_start) / size

    ``ntile`` needs a deterministic ORDER BY (include a unique id);
    ``pct_col``/``cume_col`` detect ties on ``rank_keys`` (default
    ``order_keys``) and are order-stable under ties. The divisions are
    int64/int64 in IEEE doubles — bit-identical to any SQL engine
    computing the same definition.
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
    outputs = []
    if size_col is not None:
        outputs.append((size_col, "size", 0))
    if ntile is not None:
        outputs.append((ntile_col, "ntile", int(ntile)))
    if pct_col is not None or cume_col is not None:
        tie = list(order_keys) if rank_keys is None else list(rank_keys)
        key_groups.append(list(part_keys) + tie)
        if pct_col is not None:
            outputs.append((pct_col, "pct", 0))
        if cume_col is not None:
            outputs.append((cume_col, "cume", 0))
    if not outputs:
        raise ValueError("nothing to compute")
    return _ranked(ds, sort_keys, sort_desc, key_groups, [], outputs)
