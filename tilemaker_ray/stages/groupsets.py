"""GROUP BY ROLLUP — multi-level aggregation in ONE pass over the
data.

Shape: a per-batch combiner groups each block at the FINEST level
(pyarrow ``Table.group_by``, vectorized) so only slim partial rows
enter the one real exchange; every coarser level then re-aggregates
the previous level's (already tiny) result — sum-of-sums is exact for
SUM/COUNT int64 aggregates, so no second pass over the corpus ever
happens.  The grand-total level collapses on the driver, bounded by
the cardinality of the 1-key level (documented bound, same pattern as
tile_rollup's ≤4^10 halving).

Rolled-up key columns come back NULL exactly like SQL's ROLLUP rows;
key columns in the data are assumed non-null (the ambiguity between a
rolled-up NULL and a data NULL is inherent to the SQL output shape).

Scale: one shuffle of pre-combined partials; level k+1 reads level
k's output (distinct-group-count rows), so the added cost beyond a
plain GROUP BY is negligible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rollup_aggregate(ds, keys: list, sum_cols: list,
                     count_col: str = "n"):
    """ROLLUP(keys) with SUM(sum_cols) + COUNT(*) — returns a Dataset
    with columns ``keys + sum_cols + [count_col]``; each coarser level
    has its rolled-up key columns null."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(list(keys) + list(sum_cols))
        gb = t.group_by(list(keys)).aggregate(
            [(c, "sum") for c in sum_cols] + [([], "count_all")])
        cols = {k: gb[k] for k in keys}
        for c in sum_cols:
            cols[c] = gb[f"{c}_sum"]
        cols[count_col] = gb["count_all"]
        return pa.table(cols)

    aggs = [Sum(c, alias_name=c) for c in sum_cols] + \
           [Sum(count_col, alias_name=count_col)]
    finest = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(list(keys)).aggregate(*aggs))

    key_types = {}
    sch = ds.schema()
    for name, typ in zip(sch.names, sch.types):
        if name in keys:
            key_types[name] = typ

    out_cols = list(keys) + list(sum_cols) + [count_col]

    def pad_nulls(missing: list):
        def fn(t: pa.Table) -> pa.Table:
            for k in missing:
                t = t.append_column(
                    k, pa.nulls(t.num_rows, key_types[k]))
            return t.select(out_cols)
        return fn

    levels = [finest.map_batches(pad_nulls([]), batch_format="pyarrow")]
    prev = finest
    for i in range(len(keys) - 1, 0, -1):
        p = list(keys)[:i]
        nxt = prev.groupby(p).aggregate(*aggs)
        levels.append(nxt.map_batches(pad_nulls(list(keys)[i:]),
                                      batch_format="pyarrow"))
        prev = nxt
    # grand total: driver-side fold of the 1-key level (bounded by its
    # distinct-key cardinality — slim aggregate rows only)
    tot = prev.aggregate(*aggs)
    total_tbl = pa.table(
        {**{k: pa.nulls(1, key_types[k]) for k in keys},
         **{c: pa.array([np.int64(tot[c])], pa.int64())
            for c in sum_cols + [count_col]}}).select(out_cols)
    levels.append(rd.from_arrow(total_tbl))
    base = levels[0]
    return base.union(*levels[1:])


def cube_aggregate(ds, keys: list, sum_cols: list,
                   count_col: str = "n"):
    """GROUP BY CUBE(keys): every subset of ``keys``, still ONE pass
    over the data. The finest level is computed exactly as in
    rollup_aggregate (per-batch combiner + one exchange); each of the
    2^k − 1 coarser subsets re-aggregates the FINEST result (slim,
    distinct-group-sized), never the corpus — sum-of-sums exact for
    int64 SUM/COUNT. k is the number of key columns (tiny by
    construction: CUBE output explodes combinatorially in k, which
    bounds sensible use to k ≤ ~4 in any engine)."""
    from itertools import combinations

    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(list(keys) + list(sum_cols))
        gb = t.group_by(list(keys)).aggregate(
            [(c, "sum") for c in sum_cols] + [([], "count_all")])
        cols = {k: gb[k] for k in keys}
        for c in sum_cols:
            cols[c] = gb[f"{c}_sum"]
        cols[count_col] = gb["count_all"]
        return pa.table(cols)

    aggs = [Sum(c, alias_name=c) for c in sum_cols] + \
           [Sum(count_col, alias_name=count_col)]
    finest = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(list(keys)).aggregate(*aggs)).materialize()

    key_types = {}
    sch = ds.schema()
    for name, typ in zip(sch.names, sch.types):
        if name in keys:
            key_types[name] = typ
    out_cols = list(keys) + list(sum_cols) + [count_col]

    def pad_nulls(missing: list):
        def fn(t: pa.Table) -> pa.Table:
            for k in missing:
                t = t.append_column(
                    k, pa.nulls(t.num_rows, key_types[k]))
            return t.select(out_cols)
        return fn

    levels = [finest.map_batches(pad_nulls([]), batch_format="pyarrow")]
    for r in range(len(keys) - 1, 0, -1):
        for subset in combinations(keys, r):
            nxt = finest.groupby(list(subset)).aggregate(*aggs)
            missing = [k for k in keys if k not in subset]
            levels.append(nxt.map_batches(pad_nulls(missing),
                                          batch_format="pyarrow"))
    tot = finest.aggregate(*aggs)
    total_tbl = pa.table(
        {**{k: pa.nulls(1, key_types[k]) for k in keys},
         **{c: pa.array([np.int64(tot[c])], pa.int64())
            for c in sum_cols + [count_col]}}).select(out_cols)
    levels.append(rd.from_arrow(total_tbl))
    return levels[0].union(*levels[1:])
