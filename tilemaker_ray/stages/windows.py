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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

US_PER_HOUR = 3_600_000_000


def sliding_window_counts(events_ds, size_us: int = US_PER_HOUR,
                          step_us: int = US_PER_HOUR // 2):
    """Events → (user_id, window_start, n_events) for sliding windows
    [window_start, window_start+size). Each event lands in
    size/step windows — emitted per batch, then one small groupby."""
    n_wins = size_us // step_us

    def explode(batch: pa.Table) -> pa.Table:
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


def session_windows(events_ds, gap_us: int = US_PER_HOUR):
    """Per-user session windows: a new session starts when the gap from
    the previous event exceeds ``gap_us``. Output
    (user_id, session_seq, n_events, start_us, end_us); ordering
    within a user is (ts, event_id) — total, so deterministic."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        us = g["ts"].astype("int64").to_numpy()
        new = np.ones(len(g), dtype=np.int64)
        new[1:] = (np.diff(us) > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        out = pd.DataFrame({"session_seq": sid, "us": us})
        agg = out.groupby("session_seq").agg(
            n_events=("us", "size"), start_us=("us", "min"),
            end_us=("us", "max")).reset_index()
        agg.insert(0, "user_id", g["user_id"].iloc[0])
        return agg

    return events_ds.groupby("user_id").map_groups(
        sessions, batch_format="pandas")
