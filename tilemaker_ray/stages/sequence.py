"""Ordered per-user event-sequence operators: funnel analysis and
ordered collect (string_agg-style sequence assembly).

Training-data pipelines use these for behavioral features (did the
user complete view→click→purchase, in order?) and for serializing a
user's history into one training example. The reference engine's
analog is the per-tile ordered gather + canonical sort
(/root/reference/src/tile_data.cpp:509-538 orders features within a
tile before encoding); here the ordering key is (user, ts) instead of
(tile, z-order).

Distributed shape — ONE exchange each: per-batch rows are slimmed to
the needed columns, bucketed by a hash of the user id (NOT
per-user groups: group explosion at 10^9 users would swamp the
scheduler; a bucket holds many users and the kernel is vectorized
across all of them via lexsort + segment reductions).

Funnel semantics (mirrored exactly by the SQL oracle's min-cascade):
``t1 = min ts of step1; t_k = min ts of step_k with ts > t_{k-1}``.
Strictly-after comparison, so same-timestamp step events do not
satisfy two stages at once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .common import mix_bucket

_NULL_TS = np.int64(np.iinfo(np.int64).min)


def funnel(events_ds, steps: list, user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           num_buckets: int = 64):
    """events → one row per user: ``reached`` (number of funnel steps
    completed in order) and ``ts_final`` (epoch-µs of the last
    completed step; null when reached == 0)."""
    steps = list(steps)

    def slim(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[type_col], value_set=pa.array(steps))
        t = batch.filter(mask)
        uid = t[user_col].to_numpy(zero_copy_only=False)
        # non-step users must still appear in the output (reached=0):
        # keep one sentinel row per user seen in this batch
        all_uid = np.unique(batch[user_col].to_numpy(zero_copy_only=False))
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        step_idx = pc.index_in(
            t[type_col], value_set=pa.array(steps)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uid = np.concatenate([uid, all_uid])
        ts = np.concatenate([ts, np.full(len(all_uid), _NULL_TS)])
        step_idx = np.concatenate(
            [step_idx, np.full(len(all_uid), -1, dtype=np.int64)])
        return pa.table({
            "uid": pa.array(uid, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "step": pa.array(step_idx, pa.int64()),
            "ubkt": pa.array(mix_bucket(uid, num_buckets), pa.int64())})

    n_steps = len(steps)

    def reduce_bucket(g: pa.Table) -> pa.Table:
        uid = g["uid"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        step = g["step"].to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, ts, step = uid[order], ts[order], step[order]
        brk = np.ones(len(uid), dtype=bool)
        brk[1:] = uid[1:] != uid[:-1]
        run_id = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        n_users = len(starts)
        users = uid[starts]
        t_prev = np.full(n_users, _NULL_TS)       # t0 = -inf sentinel
        reached = np.zeros(n_users, dtype=np.int64)
        ts_final = np.full(n_users, _NULL_TS)
        for k in range(n_steps):
            cand = np.where(
                (step == k) & ((t_prev[run_id] != _NULL_TS) | (k == 0))
                & (ts > (t_prev[run_id] if k else _NULL_TS)),
                ts, np.iinfo(np.int64).max)
            # segmented min over each user's run
            tk = np.minimum.reduceat(cand, starts)
            ok = tk != np.iinfo(np.int64).max
            t_prev = np.where(ok, tk, _NULL_TS)
            reached = np.where(ok, k + 1, reached)
            ts_final = np.where(ok, tk, ts_final)
        ts_arr = pc.if_else(pa.array(reached == 0),
                            pa.scalar(None, pa.int64()),
                            pa.array(ts_final, pa.int64()))
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "reached": pa.array(reached, pa.int64()),
            "ts_final": ts_arr})

    return (events_ds.map_batches(slim, batch_format="pyarrow")
            .groupby("ubkt").map_groups(reduce_bucket,
                                        batch_format="pyarrow"))


def collect_ordered(events_ds, value_col: str = "event_type",
                    user_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id", sep: str = ",",
                    num_buckets: int = 64):
    """Per-user ordered sequence string: values joined by ``sep`` in
    (ts, id) order — string_agg(value, sep ORDER BY ts, id) parity.
    Assembly is one ``pc.binary_join`` over a ListArray built from the
    lexsort's segment offsets (no per-user Python join)."""

    def slim(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "uid": pa.array(uid, pa.int64()),
            "ts_us": batch[ts_col].cast(pa.int64()),
            "eid": batch[id_col].cast(pa.int64()),
            "val": batch[value_col].cast(pa.string()),
            "ubkt": pa.array(mix_bucket(uid, num_buckets), pa.int64())})

    def join_bucket(g: pa.Table) -> pa.Table:
        uid = g["uid"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        vals = g["val"].take(pa.array(order, pa.int64()))
        uid = uid[order]
        brk = np.ones(len(uid), dtype=bool)
        brk[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(brk)
        offs = np.concatenate([starts, [len(uid)]]).astype(np.int64)
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int64()).cast(pa.int32()),
            vals.combine_chunks())
        seq = pc.binary_join(lists, sep)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(np.diff(offs), pa.int64()),
            "seq": seq})

    return (events_ds.map_batches(slim, batch_format="pyarrow")
            .groupby("ubkt").map_groups(join_bucket,
                                        batch_format="pyarrow"))
