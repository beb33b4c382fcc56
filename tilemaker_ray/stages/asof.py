"""Distributed as-of join — the classic time-series operator Ray Data
lacks (named by the build brief as a custom-operator target; no
tilemaker analog).

Semantics (backward as-of, DuckDB ``ASOF LEFT JOIN`` on
``l.key = r.key AND l.ts >= r.ts``): every left row picks up the
payload of the most recent right row at-or-before its timestamp within
the same key.

Ray-native shape: both sides hash-bucket by key and meet in ONE
union-groupby exchange; inside a bucket the merge is fully vectorized
— one lexsort of (key, ts, side) with right rows ordered before left
on timestamp ties, then a segmented forward-fill (maximum.accumulate
reset at key boundaries) assigns each left row its predecessor right
row. No per-key Python loop, no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import mix_bucket


def asof_join(left_ds, right_ds, key: str, ts: str, value_col: str,
              num_buckets: int = 256):
    """→ Dataset: left columns + ``value_col`` (nullable — null when a
    key has no right row at-or-before the left timestamp). ``ts`` must
    be int64-comparable (cast timestamps upstream)."""

    # the union's schema is fixed up front from the LEFT side: left
    # extra columns ride through (null-filled on right rows), right
    # extras are dropped — so both tagged sides emit IDENTICAL schemas
    # (no reliance on implicit block-schema unification) and the output
    # honors the "left columns + value_col" contract
    left_extras = [(f.name, f.type) for f in left_ds.schema().base_schema
                   if f.name not in (key, ts, value_col)]

    def tag(side: int, keep_value: bool):
        def f(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False)
            t = b[ts].to_numpy(zero_copy_only=False)
            cols = {
                key: pa.array(k, pa.int64()),
                ts: pa.array(t.astype(np.int64), pa.int64()),
                "side": pa.array(np.full(len(k), side, np.int8), pa.int8()),
                value_col: (b[value_col] if keep_value
                            else pa.nulls(len(k), pa.float64())),
                "kbkt": pa.array(mix_bucket(k, num_buckets), pa.int64()),
            }
            for c, typ in left_extras:
                cols[c] = b[c] if side == 1 else pa.nulls(len(k), typ)
            return pa.table(cols)
        return f

    left_tagged = left_ds.map_batches(tag(1, False), batch_format="pyarrow")
    right_tagged = right_ds.map_batches(tag(0, True),
                                        batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        n = g.num_rows
        k = g[key].to_numpy(zero_copy_only=False)
        t = g[ts].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, t, k))  # right (0) before left on ties
        ks, ss = k[order], side[order]
        # forward-fill the latest right ROW POSITION within each key run
        pos = np.where(ss == 0, np.arange(n), -1)
        newkey = np.ones(n, dtype=bool)
        newkey[1:] = ks[1:] != ks[:-1]
        seg = np.cumsum(newkey) - 1
        # reset accumulate at segment starts: offset trick
        base = seg * (n + 1)
        filled = np.maximum.accumulate(np.where(pos >= 0, base + pos, -1))
        match = filled - base
        match = np.where(filled >= 0, match, -1)
        # a fill carried over from the previous key lands below its own
        # segment's base → negative → no match
        match = np.where(match >= 0, match, -1)
        left_pos = np.flatnonzero(ss == 1)
        li = order[left_pos]               # original row of each left row
        mi = match[left_pos]               # sorted position of matched right
        vals = g[value_col].to_numpy(zero_copy_only=False)
        picked = vals[order[np.maximum(mi, 0)]]
        out_vals = np.where(mi >= 0, picked, np.nan)
        out = {key: pa.array(k[li], pa.int64()),
               ts: pa.array(t[li], pa.int64()),
               # from_pandas=True maps the NaN sentinels to real nulls
               value_col: pa.array(out_vals, pa.float64(),
                                   from_pandas=True)}
        for c in g.column_names:
            if c in (key, ts, value_col, "side", "kbkt"):
                continue
            out[c] = g[c].take(pa.array(li))
        return pa.table(out)

    return (left_tagged.union(right_tagged)
            .groupby("kbkt").map_groups(merge, batch_format="pyarrow"))
