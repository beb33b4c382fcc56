"""Temporal band self-join: pairs of same-key events within a time
window.

The co-occurrence primitive behind interaction mining ("which events
happened within W of each other for this user") — a self-join with an
inequality predicate that would be a quadratic cross join done
naively. Same filter-and-own design as the spatial kNN self-join
(stages/knn_graph.py) but on the time axis:

 * each event lands in time cell ``c = ts // W`` and is REPLICATED to
   cell ``c+1`` (factor exactly 2 — any pair within W spans at most
   one cell boundary);
 * one exchange bucketed by hash(key, cell); inside a (key, cell) run
   all candidate pairs are generated vectorized (triu over the run,
   runs sorted by ts) and filtered exactly to ``0 ≤ ts_b - ts_a ≤ W``
   with canonical order (ts, id);
 * the OWNERSHIP rule dedupes the replicated views: a pair is emitted
   only by the cell that contains its LATER timestamp
   (``ts_b // W == cell``) — same-cell pairs coexist in cells c and
   c+1 but only c satisfies it; cross-boundary pairs coexist only in
   c+1, which satisfies it. Each pair appears exactly once, no second
   distinct pass.

Per-(key, cell) population bounds the quadratic kernel — W is the
operator's skew knob; a hot key emits O(events_per_window²) pairs,
which is inherent to the JOIN SEMANTICS, not this implementation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import mix_bucket


def _cell_fan(batch: pa.Table, w: np.int64, key_col: str, ts_col: str,
              id_col: str, num_buckets: int, extra: dict | None = None,
              mark_owner: bool = False) -> pa.Table:
    """Shared replication layout for the cell-windowed operators:
    every row lands in cells c = ts//w and c+1, bucketed by
    hash(key, cell). ONE implementation so the two operators'
    co-location semantics cannot drift. ``extra`` maps column name →
    per-row numpy values (duplicated with the replication);
    ``mark_owner`` adds own=1 for the original copy, 0 for the c+1
    replica."""
    key = batch[key_col].to_numpy(zero_copy_only=False)
    ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    cell = ts // w
    n = len(key)
    cell2 = np.concatenate([cell, cell + 1])
    key2 = np.concatenate([key, key])
    cols = {
        "key": pa.array(key2, pa.int64()),
        "cell": pa.array(cell2, pa.int64()),
        "ts_us": pa.array(np.concatenate([ts, ts]), pa.int64()),
        "eid": pa.array(np.concatenate([eid, eid]), pa.int64())}
    for name, arr in (extra or {}).items():
        cols[name] = pa.array(np.concatenate([arr, arr]), pa.int64())
    if mark_owner:
        cols["own"] = pa.array(
            np.concatenate([np.ones(n, dtype=np.int8),
                            np.zeros(n, dtype=np.int8)]), pa.int8())
    cols["bkt"] = pa.array(
        mix_bucket(key2.astype(np.uint64)
                   * np.uint64(0x51_7C_C1_B7_27_22_0A_95)
                   ^ cell2.astype(np.uint64), num_buckets), pa.int64())
    return pa.table(cols)


def band_self_join(events_ds, window_us: int, key_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   num_buckets: int = 64):
    """→ Dataset (key, id_a, id_b, dt_us): same-key event pairs with
    (ts_a, id_a) < (ts_b, id_b) and ts_b - ts_a ≤ window_us."""
    w = np.int64(window_us)

    def fan(batch: pa.Table) -> pa.Table:
        return _cell_fan(batch, w, key_col, ts_col, id_col,
                         num_buckets)

    def pairs(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        cell = g["cell"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, cell, key))
        key, cell, ts, eid = (key[order], cell[order], ts[order],
                              eid[order])
        n = len(key)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (key[1:] != key[:-1]) | (cell[1:] != cell[:-1])
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]])
        oa, ob = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            a, b = np.triu_indices(m, k=1)
            oa.append(s + a)
            ob.append(s + b)
        if not oa:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "dt_us": pa.array([], pa.int64())})
        ia = np.concatenate(oa)
        ib = np.concatenate(ob)
        dt = ts[ib] - ts[ia]
        # rows are (ts, id)-sorted inside each run, so a precedes b
        # canonically; exact band filter + later-event ownership dedup:
        keep = (dt <= w) & (ts[ib] // w == cell[ib])
        ia, ib, dt = ia[keep], ib[keep], dt[keep]
        return pa.table({
            "key": pa.array(key[ia], pa.int64()),
            "id_a": pa.array(eid[ia], pa.int64()),
            "id_b": pa.array(eid[ib], pa.int64()),
            "dt_us": pa.array(dt, pa.int64())})

    return (events_ds.map_batches(fan, batch_format="pyarrow")
            .groupby("bkt").map_groups(pairs, batch_format="pyarrow"))


def trailing_window_sum(events_ds, window_us: int,
                        key_col: str = "user_id", ts_col: str = "ts",
                        id_col: str = "event_id",
                        value_col: str = "value",
                        num_buckets: int = 64):
    """Time-RANGE trailing aggregate: for every event, the SUM (in
    integer cents) and COUNT of same-key events with timestamp in
    [ts - W, ts] — SQL's ``RANGE BETWEEN W PRECEDING AND CURRENT
    ROW`` (peers with equal ts included, per standard RANGE
    semantics). Complements stages/rolling.py, which is ROWS-based
    with fixed k lag columns; a time window holds a VARIABLE number
    of rows, so the edge-buffer trick doesn't apply.

    Same cell-replication layout as band_self_join, opposite roles:
    every event is a CONTRIBUTOR in its own cell c and in c+1 (any
    window [ts-W, ts] spans at most cells c-1, c of its owner), and
    an OWNER only in its own cell. Inside a (key, cell) run the
    kernel is two searchsorted calls against a prefix-sum — O(n log n)
    per run, no pair materialization.
    """
    w = np.int64(window_us)

    def fan(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch[value_col].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return _cell_fan(batch, w, key_col, ts_col, id_col,
                         num_buckets, extra={"cents": cents},
                         mark_owner=True)

    def reduce(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        cell = g["cell"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        own = g["own"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, cell, key))
        key, cell, ts, eid, cents, own = (x[order] for x in
                                          (key, cell, ts, eid, cents,
                                           own))
        n = len(key)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (key[1:] != key[:-1]) | (cell[1:] != cell[:-1])
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]])
        ok, oid, ots, osum, ocnt = [], [], [], [], []
        for s, e in zip(starts, ends):
            t_run = ts[s:e]
            p = np.concatenate([[0], np.cumsum(cents[s:e])])
            owners = np.flatnonzero(own[s:e] == 1)
            if len(owners) == 0:
                continue
            to = t_run[owners]
            lo = np.searchsorted(t_run, to - w, side="left")
            hi = np.searchsorted(t_run, to, side="right")
            ok.append(key[s + owners])
            oid.append(eid[s + owners])
            ots.append(to)
            osum.append(p[hi] - p[lo])
            ocnt.append(hi - lo)
        if not ok:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "trail_cents": pa.array([], pa.int64()),
                "n_window": pa.array([], pa.int64())})
        return pa.table({
            "key": pa.array(np.concatenate(ok), pa.int64()),
            "event_id": pa.array(np.concatenate(oid), pa.int64()),
            "ts_us": pa.array(np.concatenate(ots), pa.int64()),
            "trail_cents": pa.array(np.concatenate(osum), pa.int64()),
            "n_window": pa.array(np.concatenate(ocnt), pa.int64())})

    return (events_ds.map_batches(fan, batch_format="pyarrow")
            .groupby("bkt").map_groups(reduce, batch_format="pyarrow"))
