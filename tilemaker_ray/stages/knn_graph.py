"""Exact spatial kNN self-join (kNN graph) — filter-and-refine.

KNNJoin (stages/join.py) broadcasts a SMALL center table; this operator
answers the self-join question ("each probe point's k nearest OTHER
points") where both sides are corpus-sized. Shape:

1. **Filter**: points post themselves to their grid cell; probes post
   themselves to the 3×3 cell neighborhood. One bucketed groupby per
   cell computes the probe×home distance matrix vectorized and emits a
   per-probe per-cell partial top-k (plus a sentinel row from the
   probe's home cell so isolated probes still surface downstream).
2. **Refine**: a second groupby per probe merges ≤9 partials into the
   neighborhood top-k and checks the EXACTNESS GUARANTEE inside the
   task: the k-th distance must not exceed the probe's distance to the
   edge of its 3×3 box (any point outside the box is at least that far
   away; grid-boundary sides with no cells beyond count as infinitely
   far). Rows carry a ``resolved`` flag.
3. **Fallback**: only probes that FAIL the guarantee (rare at sane
   cell sizes — the knob is ``n_cells``) are collected (bounded by the
   failure count, not the probe count), broadcast, and resolved by an
   exact full scan: per-block partial top-k + the same distributed
   probe merge — the brute-force ANN shape.

Ties break on (dist2, neighbor_id) — total, so the DuckDB row_number
oracle matches bit-exactly (dist2 is the same IEEE expression on both
sides). Costs: shuffle 1 moves ≤10 slim rows per probe + 1 per point;
shuffle 2 moves ≤9k rows per probe; the fallback moves nothing unless
a guarantee fails.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import mix_bucket

_GRID_MIN = -180.0  # one square cell space over lon AND lat


def _cell_of(x: np.ndarray, span: float, n_cells: int) -> np.ndarray:
    c = np.floor((x - _GRID_MIN) / span).astype(np.int64)
    return np.clip(c, 0, n_cells - 1)


def _guard_dist(px, py, span, n_cells):
    """Distance from each probe to the edge of its 3×3 cell box
    (domain-boundary sides are infinitely far)."""
    cx = _cell_of(px, span, n_cells)
    cy = _cell_of(py, span, n_cells)

    def side(pos, cell):
        lo = (cell - 1) * span + _GRID_MIN
        hi = (cell + 2) * span + _GRID_MIN
        dlo = np.where(cell - 1 < 0, np.inf, pos - lo)
        dhi = np.where(cell + 1 > n_cells - 1, np.inf, hi - pos)
        return np.minimum(dlo, dhi)

    return np.minimum(side(px, cx), side(py, cy))


def knn_graph(points_ds, k: int = 3, n_cells: int = 32,
              probe_mod: int = 20, num_buckets: int = 64,
              id_col: str = "event_id"):
    """points Dataset (id, lon, lat) → (event_id, rank, neighbor_id,
    neighbor_dist2) for probes (id % probe_mod == 0), exact kNN over
    ALL other points, planar lon/lat metric."""
    import ray

    span = 360.0 / n_cells

    def messages(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        x = b["lon"].to_numpy(zero_copy_only=False)
        y = b["lat"].to_numpy(zero_copy_only=False)
        cx = _cell_of(x, span, n_cells)
        cy = _cell_of(y, span, n_cells)
        home = cx * n_cells + cy
        out_cell = [home]
        out_id = [ids]
        out_x, out_y = [x], [y]
        out_probe = [np.zeros(len(ids), dtype=np.int8)]
        is_p = (ids % probe_mod) == 0
        pi = np.flatnonzero(is_p)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = cx[pi] + dx, cy[pi] + dy
                ok = (nx >= 0) & (nx < n_cells) & (ny >= 0) & (ny < n_cells)
                sel = pi[ok]
                out_cell.append(nx[ok] * n_cells + ny[ok])
                out_id.append(ids[sel])
                out_x.append(x[sel])
                out_y.append(y[sel])
                out_probe.append(np.ones(len(sel), dtype=np.int8))
        cell = np.concatenate(out_cell)
        return pa.table({
            "cell": pa.array(cell, pa.int64()),
            "pid": pa.array(np.concatenate(out_id), pa.int64()),
            "x": pa.array(np.concatenate(out_x), pa.float64()),
            "y": pa.array(np.concatenate(out_y), pa.float64()),
            "is_probe": pa.array(np.concatenate(out_probe), pa.int8()),
            "kbkt": pa.array(mix_bucket(cell, num_buckets), pa.int64())})

    def cell_topk(g: pa.Table) -> pa.Table:
        cell = g["cell"].to_numpy(zero_copy_only=False)
        pid = g["pid"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        isp = g["is_probe"].to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        cell, pid, x, y, isp = (cell[order], pid[order], x[order],
                                y[order], isp[order])
        brk = np.ones(len(cell), dtype=bool)
        brk[1:] = cell[1:] != cell[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(cell)]])
        o = {"pid": [], "nb": [], "d2": [], "px": [], "py": []}
        for s, e in zip(starts, ends):
            hm = np.flatnonzero(isp[s:e] == 0) + s
            pr = np.flatnonzero(isp[s:e] == 1) + s
            if len(pr) == 0:
                continue
            # sentinel from the probe's HOME cell: guarantees every
            # probe reaches the merge stage even with zero candidates
            phome = (_cell_of(x[pr], span, n_cells) * n_cells
                     + _cell_of(y[pr], span, n_cells))
            at_home = phome == cell[s]
            o["pid"].append(pid[pr][at_home])
            o["nb"].append(np.full(at_home.sum(), -1, dtype=np.int64))
            o["d2"].append(np.full(at_home.sum(), np.inf))
            o["px"].append(x[pr][at_home])
            o["py"].append(y[pr][at_home])
            if len(hm) == 0:
                continue
            dx = x[pr][:, None] - x[hm][None, :]
            dy = y[pr][:, None] - y[hm][None, :]
            d2 = dx * dx + dy * dy
            d2[pid[pr][:, None] == pid[hm][None, :]] = np.inf  # self
            kk = min(k, d2.shape[1])
            idx = np.lexsort((np.broadcast_to(pid[hm], d2.shape), d2),
                             axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(pr)), kk)
            cols = idx.ravel()
            dd = d2[rows, cols]
            fin = np.isfinite(dd)
            o["pid"].append(np.repeat(pid[pr], kk)[fin])
            o["nb"].append(pid[hm][cols][fin])
            o["d2"].append(dd[fin])
            o["px"].append(np.repeat(x[pr], kk)[fin])
            o["py"].append(np.repeat(y[pr], kk)[fin])
        cat = {kk_: (np.concatenate(v) if v else np.array([]))
               for kk_, v in o.items()}
        return pa.table({
            "pid": pa.array(cat["pid"].astype(np.int64), pa.int64()),
            "nb": pa.array(cat["nb"].astype(np.int64), pa.int64()),
            "d2": pa.array(cat["d2"].astype(np.float64), pa.float64()),
            "px": pa.array(cat["px"].astype(np.float64), pa.float64()),
            "py": pa.array(cat["py"].astype(np.float64), pa.float64())})

    cands = (points_ds.map_batches(messages, batch_format="pyarrow")
             .groupby("kbkt").map_groups(cell_topk,
                                         batch_format="pyarrow"))

    def pbkt(b: pa.Table) -> pa.Table:
        return b.append_column("pb", pa.array(
            mix_bucket(b["pid"].to_numpy(zero_copy_only=False),
                       num_buckets), pa.int64()))

    def make_merge(check_guard: bool):
        def merge_probe(g: pa.Table) -> pa.Table:
            pid = g["pid"].to_numpy(zero_copy_only=False)
            nb = g["nb"].to_numpy(zero_copy_only=False)
            d2 = g["d2"].to_numpy(zero_copy_only=False)
            order = np.lexsort((nb, d2, pid))
            pid, nb, d2 = pid[order], nb[order], d2[order]
            if check_guard:
                px = g["px"].to_numpy(zero_copy_only=False)[order]
                py = g["py"].to_numpy(zero_copy_only=False)[order]
            real = nb >= 0  # sentinels sort last (inf) and are dropped
            brk = np.ones(len(pid), dtype=bool)
            brk[1:] = pid[1:] != pid[:-1]
            idx = np.arange(len(pid))
            start = np.maximum.accumulate(np.where(brk, idx, 0))
            rank = idx - start
            keep = (rank < k) & real
            # a neighbor reaches a probe through ONE cell (its home), so
            # (pid, nb) pairs are unique — rank is dense within a probe
            res = {
                "event_id": pid[keep], "rank": rank[keep] + 1,
                "neighbor_id": nb[keep], "neighbor_dist2": d2[keep]}
            if not check_guard:
                return pa.table({
                    "event_id": pa.array(res["event_id"], pa.int64()),
                    "rank": pa.array(res["rank"], pa.int64()),
                    "neighbor_id": pa.array(res["neighbor_id"],
                                            pa.int64()),
                    "neighbor_dist2": pa.array(res["neighbor_dist2"],
                                               pa.float64())})
            # guarantee per probe: k real hits AND k-th dist ≤ guard²
            ends_ = np.concatenate([np.flatnonzero(brk)[1:], [len(pid)]])
            starts_ = np.flatnonzero(brk)
            n_real = np.add.reduceat(real.astype(np.int64), starts_) \
                if len(starts_) else np.array([], dtype=np.int64)
            guard = _guard_dist(px[starts_], py[starts_], span, n_cells)
            kth = np.full(len(starts_), np.inf)
            for i, (s_, e_) in enumerate(zip(starts_, ends_)):
                if n_real[i] >= k:
                    kth[i] = d2[s_ + k - 1]
            ok_probe = (n_real >= k) & (kth <= guard * guard)
            probe_ok = dict(zip(pid[starts_].tolist(), ok_probe.tolist()))
            flag = np.asarray([probe_ok[p] for p in res["event_id"]],
                              dtype=np.int8)
            # unresolved probes emit ONE row (rank 0) so the driver can
            # find them even when they have <k candidates
            un = pid[starts_][~ok_probe]
            return pa.table({
                "event_id": pa.array(
                    np.concatenate([res["event_id"][flag == 1], un]),
                    pa.int64()),
                "rank": pa.array(np.concatenate(
                    [res["rank"][flag == 1],
                     np.zeros(len(un), dtype=np.int64)]), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(
                    [res["neighbor_id"][flag == 1],
                     np.full(len(un), -1, dtype=np.int64)]), pa.int64()),
                "neighbor_dist2": pa.array(np.concatenate(
                    [res["neighbor_dist2"][flag == 1],
                     np.full(len(un), np.inf)]), pa.float64())})
        return merge_probe

    merged = (cands.map_batches(pbkt, batch_format="pyarrow")
              .groupby("pb").map_groups(make_merge(True),
                                        batch_format="pyarrow")
              .materialize())

    def only_rank0(b: pa.Table) -> pa.Table:
        return b.filter(pa.compute.equal(b["rank"], 0))

    def only_ranked(b: pa.Table) -> pa.Table:
        return b.filter(pa.compute.greater(b["rank"], 0))

    un_blocks = [ray.get(r) for r in merged.map_batches(
        only_rank0, batch_format="pyarrow").to_arrow_refs()]
    # empty shuffle partitions surface as zero-column blocks
    un_blocks = [b for b in un_blocks if b.num_rows]
    un_tbl = pa.concat_tables(un_blocks) if un_blocks else pa.table(
        {"event_id": pa.array([], pa.int64())})
    resolved = merged.map_batches(only_ranked, batch_format="pyarrow")
    if un_tbl.num_rows == 0:
        return resolved

    un_ids = np.sort(un_tbl["event_id"].to_numpy(zero_copy_only=False))

    # broadcast exact pass over the (tiny) unresolved probe set
    def probe_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        sel = np.isin(ids, un_ids)
        return pa.table({
            "pid": pa.array(ids[sel], pa.int64()),
            "x": pa.array(b["lon"].to_numpy(zero_copy_only=False)[sel],
                          pa.float64()),
            "y": pa.array(b["lat"].to_numpy(zero_copy_only=False)[sel],
                          pa.float64())})

    # drop zero-row blocks before concat — empty shuffle/filter blocks
    # can come back zero-COLUMN and poison concat_tables's schema check
    pr_blocks = [ray.get(r) for r in points_ds.map_batches(
        probe_rows, batch_format="pyarrow").to_arrow_refs()]
    pr_blocks = [b for b in pr_blocks if b.num_rows > 0]
    pr_tbl = pa.concat_tables(pr_blocks) if pr_blocks else pa.table({
        "pid": pa.array([], pa.int64()),
        "x": pa.array([], pa.float64()),
        "y": pa.array([], pa.float64())})
    q_ref = ray.put((pr_tbl["pid"].to_numpy(zero_copy_only=False),
                     pr_tbl["x"].to_numpy(zero_copy_only=False),
                     pr_tbl["y"].to_numpy(zero_copy_only=False)))

    def scan_partial(b: pa.Table) -> pa.Table:
        qp, qx, qy = ray.get(q_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        x = b["lon"].to_numpy(zero_copy_only=False)
        y = b["lat"].to_numpy(zero_copy_only=False)
        dx = qx[:, None] - x[None, :]
        dy = qy[:, None] - y[None, :]
        d2 = dx * dx + dy * dy
        d2[qp[:, None] == ids[None, :]] = np.inf
        kk = min(k, d2.shape[1])
        idx = np.lexsort((np.broadcast_to(ids, d2.shape), d2),
                         axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qp)), kk)
        dd = d2[rows, idx.ravel()]
        fin = np.isfinite(dd)
        return pa.table({
            "pid": pa.array(np.repeat(qp, kk)[fin], pa.int64()),
            "nb": pa.array(ids[idx.ravel()][fin], pa.int64()),
            "d2": pa.array(dd[fin], pa.float64())})

    fb = (points_ds.map_batches(scan_partial, batch_format="pyarrow")
          .map_batches(pbkt, batch_format="pyarrow")
          .groupby("pb").map_groups(make_merge(False),
                                    batch_format="pyarrow"))
    return resolved.union(fb)
