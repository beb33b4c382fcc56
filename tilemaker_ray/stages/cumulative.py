"""Distributed cumulative (running) aggregates: ``AGG(v) OVER
(PARTITION BY p ORDER BY o ROWS UNBOUNDED PRECEDING)`` for any
associative op (sum / max / min / count), without a groupby and
without driver materialization.

Same skeleton as stages/rank.py (single global sort on
``part_keys + order_keys``, O(n_blocks) driver walk, independent
per-block tasks), but the carried state is *value-bearing*: each block
reports the aggregate of its LAST partition run; the driver folds
those along the walk and hands each block the incoming aggregate of
the partition that continues into it. Inside a block the per-row
running value is a segmented scan::

    acc   = ufunc.accumulate(v)
    run   = acc ⊖ acc[partition_start] ⊕ v[partition_start]
    row 0's continuing run additionally folds the incoming carry

(for non-invertible ops like max/min the ⊖ form is replaced by
restarting the accumulate at partition starts via the same
maximum.accumulate-over-run-starts indexing trick used in rank.py).

Float caution: a segmented-subtraction scan reorders float additions;
for oracle-exact money math pass integers (the running_total query
uses floor-cents). Scale: driver state is one scalar per block per
aggregate; partition skew stays parallel (a giant partition spans
blocks; each block scans independently).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_OPS = {
    "sum": (np.add, 0),
    "max": (np.maximum, None),   # identity = first value of the run
    "min": (np.minimum, None),
    # running FIRST == SQL FIRST_VALUE under the default window frame
    # (UNBOUNDED PRECEDING .. CURRENT ROW); combine keeps the earlier
    # operand, handled as a special case below
    "first": (None, None),
}


@ray.remote
def _block_meta(block: pa.Table, part_keys: list, value_col: str,
                ops: list):
    """(n, first_key, last_key, start_of_last_run,
    [agg of value over the last run, per op])."""
    n = block.num_rows
    if n == 0:
        return (0, None, None, 0, [None] * len(ops))
    cols = [block[c].to_numpy(zero_copy_only=False) for c in part_keys]
    first = tuple(c[0] for c in cols)
    last = tuple(c[-1] for c in cols)
    eq = np.ones(n, dtype=bool)
    for c in cols:
        eq &= c == c[-1]
    idx = np.flatnonzero(~eq)
    start_last = int(idx[-1]) + 1 if len(idx) else 0
    v = block[value_col].to_numpy(zero_copy_only=False)
    tails = [v[start_last] if op == "first"
             else _OPS[op][0].reduce(v[start_last:]) for op in ops]
    return (n, first, last, start_last, tails)


@ray.remote
def _apply_cum(block: pa.Table, part_keys: list, value_col: str,
               jobs: list, continuing: bool, carries: list):
    """jobs: [(out_col, op)]. ``carries`` aligns with jobs; used for
    the first (continuing) run only."""
    n = block.num_rows
    cols = [block[c].to_numpy(zero_copy_only=False) for c in part_keys]
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in cols:
        change[1:] |= c[1:] != c[:-1]
    run_start = np.maximum.accumulate(
        np.where(change, np.arange(n, dtype=np.int64), 0))
    v = block[value_col].to_numpy(zero_copy_only=False)
    out = block
    first_run = run_start == 0
    for (name, op), carry in zip(jobs, carries):
        ufunc = _OPS[op][0]
        if op == "sum":
            acc = np.cumsum(v)
            run = acc - acc[run_start] + v[run_start]
        elif op == "first":
            run = v[run_start]
        else:
            # segmented running max/min: pandas grouped cummax/cummin
            # (C kernel; run_start labels the segments)
            import pandas as pd
            s = pd.Series(v)
            run = (s.groupby(run_start).cummax() if op == "max"
                   else s.groupby(run_start).cummin()).to_numpy()
        if continuing and carry is not None:
            run = np.where(first_run, carry, run) if op == "first" \
                else np.where(first_run, ufunc(run, carry), run)
        out = out.append_column(name, pa.array(run))
    return out


def cumulative(ds, part_keys, order_keys, value_col, ops=("sum",),
               out_cols=None, descending=False):
    """Append running-aggregate columns (one per op in ``ops``) over
    PARTITION BY part_keys ORDER BY order_keys. One sort exchange;
    driver state is O(n_blocks) scalars."""
    if isinstance(part_keys, str):
        part_keys = [part_keys]
    if isinstance(order_keys, str):
        order_keys = [order_keys]
    if isinstance(descending, bool):
        descending = [descending] * len(order_keys)
    ops = list(ops)
    if out_cols is None:
        out_cols = [f"cum_{op}" for op in ops]
    sort_keys = list(part_keys) + list(order_keys)
    sort_desc = [False] * len(part_keys) + list(descending)
    sorted_ds = ds.sort(sort_keys, descending=sort_desc)
    refs = []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, _meta in bundle.blocks:
            refs.append(ref)
    metas = ray.get([_block_meta.remote(r, part_keys, value_col, ops)
                     for r in refs])
    keep = [i for i, m in enumerate(metas) if m[0]]
    if not keep:
        return sorted_ds
    jobs = list(zip(out_cols, ops))
    out_refs = []
    cur_last = None
    cur_carry = [None] * len(ops)
    for i in keep:
        n, first, last, start_last, tails = metas[i]
        cont = cur_last is not None and first == cur_last
        carries = list(cur_carry) if cont else [None] * len(ops)
        # fold this block's last-run aggregates into the walk state
        for j, op in enumerate(ops):
            if start_last == 0 and cont and carries[j] is not None:
                cur_carry[j] = carries[j] if op == "first" \
                    else _OPS[op][0](carries[j], tails[j])
            else:
                cur_carry[j] = tails[j]
        cur_last = last
        out_refs.append(_apply_cum.remote(
            refs[i], part_keys, value_col, jobs, cont, carries))
    import ray.data as rd
    return rd.from_arrow_refs(out_refs)
