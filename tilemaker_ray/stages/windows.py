"""Batch windowing over the events table.

The reference has no streaming/windowing (SURVEY.md §2.10) — these are
the batch-window operators a data-processing engine needs, expressed
the Ray-native way: window keys computed vectorized in map_batches
(tumbling/sliding = integer arithmetic on epoch micros → groupby;
sessions = per-user gaps-and-islands inside map_groups over the sorted
group). All outputs are integers so the DuckDB oracles match exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .common import mix_bucket

US_PER_HOUR = 3_600_000_000


def sliding_window_counts(events_ds, size_us: int = US_PER_HOUR,
                          step_us: int = US_PER_HOUR // 2):
    """Events → (user_id, window_start, n_events) for sliding windows
    [window_start, window_start+size). Each event lands in
    size/step windows — emitted per batch, then one small groupby."""
    n_wins = size_us // step_us

    def explode(batch: pa.Table) -> pa.Table:
        # NOTE on the combiner pattern: pre-aggregating (user, window)
        # partial counts inside the batch was measured and NOT adopted —
        # events per (user, window) per block are ~1-2, so the partial
        # dedup shrinks nothing while the Sum aggregate path is slower
        # than the optimized count(); the shuffle already moves only two
        # slim int64 columns.
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        base = us // step_us
        outs_u, outs_w = [], []
        for k in range(n_wins):
            ws = (base - k) * step_us
            keep = us < ws + size_us  # always true; guard for odd sizes
            outs_u.append(uid[keep])
            outs_w.append(ws[keep])
        return pa.table({"user_id": np.concatenate(outs_u),
                         "window_start": np.concatenate(outs_w)})

    return (events_ds.map_batches(explode, batch_format="pyarrow")
            .groupby(["user_id", "window_start"]).count()
            .rename_columns({"count()": "n_events"}))


def session_windows(events_ds, gap_us: int = US_PER_HOUR,
                    num_buckets: int = 256):
    """Per-user session windows: a new session starts when the gap from
    the previous event exceeds ``gap_us``. Output
    (user_id, session_seq, n_events, start_us, end_us); ordering
    within a user is (ts, event_id) — total, so deterministic.

    Arrow-native bucketed reduce (the repo's standard pattern —
    per-user map_groups costs ~100 µs/group): users hash into
    ``num_buckets`` shuffle buckets, one lexsort + segment masks handle
    ALL users of a bucket in one vectorized pass."""

    def bucket(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("bkt", pa.array(
            mix_bucket(uid, num_buckets), pa.int64()))

    def sessions_bucket(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "session_seq": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64())})
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, us = uid[order], us[order]
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= np.diff(us) > gap_us
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate([starts[1:], [n]])
        su = uid[starts]
        # session_seq = 1-based session index within each user
        user_change = np.ones(len(starts), dtype=bool)
        user_change[1:] = su[1:] != su[:-1]
        idx = np.arange(len(starts))
        last = np.maximum.accumulate(np.where(user_change, idx, -1))
        seq = idx - last + 1
        return pa.table({
            "user_id": pa.array(su, pa.int64()),
            "session_seq": pa.array(seq, pa.int64()),
            "n_events": pa.array(ends - starts, pa.int64()),
            "start_us": pa.array(us[starts], pa.int64()),
            "end_us": pa.array(us[ends - 1], pa.int64()),
        })

    return (events_ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("bkt").map_groups(sessions_bucket,
                                       batch_format="pyarrow"))


def interval_coverage(events_ds, scale_us: int = 1_000_000,
                      num_buckets: int = 256):
    """Per-user union of (possibly overlapping) time intervals
    ``[ts, ts + floor(value·scale_us)]``: merged-island count and total
    covered microseconds. The classic interval-union / gaps-and-islands
    operator (uptime coverage, watch-time, crawl-politeness windows) —
    the geometric analog is the reference's shared-border polygon
    dissolve (tile_worker.cpp:393-405) in one dimension.

    Shape: one map_batches interval pass, ONE bucketed exchange
    (users hash into ``num_buckets``; all users of a bucket resolved in
    one vectorized lexsort + segmented-cummax pass — no per-user
    map_groups, no driver work). Touching intervals (gap 0) merge, like
    the SQL mirror's strict ``s > pmax`` island test.
    """

    def iv(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        s = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        dur = np.floor(b["value"].to_numpy(zero_copy_only=False)
                       * float(scale_us)).astype(np.int64)
        np.maximum(dur, 0, out=dur)
        return pa.table({
            "bkt": pa.array(mix_bucket(uid, num_buckets), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "s": pa.array(s, pa.int64()),
            "e": pa.array(s + dur, pa.int64())})

    def cover(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_islands": pa.array([], pa.int64()),
                          "covered_us": pa.array([], pa.int64())})
        if n == 0:
            return empty
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = g["e"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((e, s, uid))
        uid, s, e = uid[order], s[order], e[order]
        # Shift each user's timeline into a disjoint int64 range so ONE
        # global exclusive cummax implements the per-user running max.
        lo = int(s.min())
        span = int(e.max()) - lo + 1
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        uidx = np.cumsum(new_user) - 1
        # guard in PYTHON ints — numpy int64 would wrap silently and
        # defeat the check
        if int(uidx[-1] + 1) * int(span) >= 2**62:
            raise ValueError(
                "interval_coverage: user-count x time-span exceeds the "
                "int64 shift range; raise num_buckets so each bucket "
                "holds fewer users")
        off = uidx * span
        ss, ee = (s - lo) + off, (e - lo) + off
        prev = np.empty(n, dtype=np.int64)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = np.maximum.accumulate(ee)[:-1]
        head = ss > prev
        heads_idx = np.flatnonzero(head)
        seg_max_e = np.maximum.reduceat(ee, heads_idx)
        isl_len = seg_max_e - ss[heads_idx]  # offsets cancel in-island
        isl_user = uid[heads_idx]
        uh = np.ones(len(heads_idx), dtype=bool)
        uh[1:] = isl_user[1:] != isl_user[:-1]
        uh_idx = np.flatnonzero(uh)
        covered = np.add.reduceat(isl_len, uh_idx)
        n_isl = np.diff(np.append(uh_idx, len(heads_idx)))
        return pa.table({
            "user_id": pa.array(isl_user[uh_idx], pa.int64()),
            "n_islands": pa.array(n_isl, pa.int64()),
            "covered_us": pa.array(covered, pa.int64())})

    return (events_ds.map_batches(iv, batch_format="pyarrow")
            .groupby("bkt").map_groups(cover, batch_format="pyarrow"))
