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


def last_touch_attribution(events_ds, touch_types: list,
                           conversion_type: str = "purchase",
                           user_col: str = "user_id",
                           ts_col: str = "ts",
                           id_col: str = "event_id",
                           type_col: str = "event_type",
                           num_buckets: int = 64):
    """Marketing-style last-touch attribution: for every conversion
    event, find the user's most recent PRIOR touch event (order by
    (ts, event_id), strictly earlier — same-instant rows attribute by
    the id tie-break, mirroring the SQL window frame ``ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING``).

    Output: one row per conversion — (purchase_id, user_id, touch_id,
    touch_type, lag_us), touch columns null when the user has no
    prior touch.

    Distributed shape: one slim exchange bucketed by hashed user id
    (many users per bucket); inside a bucket the kernel is fully
    vectorized across users — global lexsort by (uid, ts, eid), a
    running cummax of touch positions, and a segment-first guard that
    invalidates carries crossing a user boundary."""
    touch_set = list(touch_types)

    def slim(batch: pa.Table) -> pa.Table:
        keep = pc.or_(
            pc.is_in(batch[type_col], value_set=pa.array(touch_set)),
            pc.equal(batch[type_col], conversion_type))
        t = batch.filter(keep)
        uid = t[user_col].to_numpy(zero_copy_only=False)
        code = pc.index_in(
            t[type_col], value_set=pa.array(touch_set)) \
            .fill_null(-1).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "uid": pa.array(uid, pa.int64()),
            "ts_us": t[ts_col].cast(pa.int64()),
            "eid": t[id_col].cast(pa.int64()),
            "code": pa.array(code, pa.int64()),
            "ubkt": pa.array(mix_bucket(uid, num_buckets),
                             pa.int64())})

    def attribute_bucket(g: pa.Table) -> pa.Table:
        uid = g["uid"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        code = g["code"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, code = (uid[order], ts[order], eid[order],
                              code[order])
        n = len(uid)
        idx = np.arange(n, dtype=np.int64)
        is_touch = code >= 0
        carry = np.where(is_touch, idx, np.int64(-1))
        cummax = np.maximum.accumulate(carry)
        prior = np.concatenate([[np.int64(-1)], cummax[:-1]])
        # segment-first guard: a carried index from a previous user
        # is < this segment's first global index
        brk = np.ones(n, dtype=bool)
        brk[1:] = uid[1:] != uid[:-1]
        seg_first = idx[brk][np.cumsum(brk) - 1]
        valid = prior >= seg_first
        conv = ~is_touch
        p_take = np.flatnonzero(conv)
        lt = prior[p_take]
        ok = valid[p_take]
        safe = np.where(ok, lt, 0)
        touch_eid = eid[safe]
        touch_code = code[safe]
        lag = ts[p_take] - ts[safe]
        nulls = ~ok
        types = pa.array([str(t) for t in touch_set], pa.string())
        touch_type = pc.take(
            types, pa.array(np.where(ok, touch_code, 0), pa.int64()))
        touch_type = pc.if_else(pa.array(nulls),
                                pa.scalar(None, pa.string()),
                                touch_type)
        return pa.table({
            "purchase_id": pa.array(eid[p_take], pa.int64()),
            "user_id": pa.array(uid[p_take], pa.int64()),
            "touch_id": pa.array(touch_eid, pa.int64(), mask=nulls),
            "touch_type": touch_type,
            "lag_us": pa.array(lag, pa.int64(), mask=nulls)})

    return (events_ds.map_batches(slim, batch_format="pyarrow")
            .groupby("ubkt").map_groups(attribute_bucket,
                                        batch_format="pyarrow"))


def state_islands(events_ds, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  state_col: str = "event_type",
                  num_buckets: int = 64):
    """Gaps-and-islands compression: collapse each user's run of
    consecutive equal states (ordered by (ts, event_id)) into one
    validity interval — the SCD2 history build (valid_from /
    valid_to, half-open; valid_to NULL for the current state).

    One hashed-user bucket exchange; inside a bucket the kernel is
    vectorized across all users (lexsort + break masks + segment
    reductions). Mirrors the SQL LAG-break + running-SUM island id +
    LEAD(valid_from) pattern exactly."""

    def slim(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "uid": pa.array(uid, pa.int64()),
            "ts_us": batch[ts_col].cast(pa.int64()),
            "eid": batch[id_col].cast(pa.int64()),
            "st": batch[state_col].cast(pa.string()),
            "ubkt": pa.array(mix_bucket(uid, num_buckets),
                             pa.int64())})

    def islands_bucket(g: pa.Table) -> pa.Table:
        uid = g["uid"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        st = np.asarray(g["st"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, st = uid[order], ts[order], eid[order], st[order]
        n = len(uid)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "state": pa.array([], pa.string()),
                "valid_from_us": pa.array([], pa.int64()),
                "valid_to_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())})
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        brk = new_user.copy()
        brk[1:] |= st[1:] != st[:-1]
        gid = np.cumsum(brk) - 1
        n_isl = gid[-1] + 1
        first = np.flatnonzero(brk)
        counts = np.diff(np.concatenate([first, [n]]))
        isl_user = uid[first]
        isl_state = st[first]
        isl_from = ts[first]
        # valid_to = next island's valid_from when same user
        nxt_from = np.empty(n_isl, np.int64)
        nxt_from[:-1] = isl_from[1:]
        nxt_from[-1] = 0
        same_user = np.zeros(n_isl, dtype=bool)
        same_user[:-1] = isl_user[1:] == isl_user[:-1]
        return pa.table({
            "user_id": pa.array(isl_user, pa.int64()),
            "state": pa.array(list(isl_state), pa.string()),
            "valid_from_us": pa.array(isl_from, pa.int64()),
            "valid_to_us": pa.array(nxt_from, pa.int64(),
                                    mask=~same_user),
            "n_events": pa.array(counts.astype(np.int64),
                                 pa.int64())})

    return (events_ds.map_batches(slim, batch_format="pyarrow")
            .groupby("ubkt").map_groups(islands_bucket,
                                        batch_format="pyarrow"))
