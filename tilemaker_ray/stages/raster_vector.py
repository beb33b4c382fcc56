"""Raster↔vector operators over the tile-cell grid.

The vector→raster half of the engine lives in geo/raster.py (supercover
segment traversal + polygon interior fill, the fan-out kernel — the
analog of the reference's insertIntermediateTiles / fillCoveredTiles,
/root/reference/src/coordinates_geom.cpp:111-189,
/root/reference/src/coordinates.cpp:52). This module adds the
raster→vector half the north rule names: a thresholded cell raster is
labeled into connected regions and each region is traced back into a
polygon (outer ring + holes) in cell-grid coordinates.

Distributed shapes (all single-exchange or reusing the CC machinery):

- ``rasterize_points``: per-batch partial cell counts (combiner) →
  one groupby-sum → threshold filter. Shuffle rows = distinct cells
  per block, not points.
- ``raster_boundary``: each present cell sends one presence message to
  each 4-neighbor; one bucketed groupby counts, per cell, how many of
  its neighbors exist. Boundary ⇔ count < 4. No joins, schema-stable
  under empty shuffle partitions (the repo's union-groupby pattern).
- ``polygonize``: adjacency edges between present cells (same message
  trick, right/down only) → distributed connected components
  (stages.dedup.connected_components_min_label — min-label over the
  cell set) → per-region map_groups traces the union-of-unit-squares
  outline. Per-group memory is bounded by the REGION's cell count and
  the trace cost by its boundary length; regions are grouped through a
  hash bucket so one task handles ~regions/num_buckets regions, and a
  giant region costs one task its boundary, never the whole raster.

Cell keys pack as ``(x << 32) | y`` so neighbor arithmetic is +1 /
+2^32 on one int64 column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import mix_bucket

_XS = np.int64(1) << np.int64(32)   # +1 in x
_YS = np.int64(1)                   # +1 in y


def _pack(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return (np.asarray(x, np.int64) << np.int64(32)) | np.asarray(y, np.int64)


def _unpack(k: np.ndarray):
    k = np.asarray(k, np.int64)
    return k >> np.int64(32), k & np.int64((1 << 32) - 1)


def rasterize_points(points_ds, zoom: int, threshold: int = 1):
    """Vector→raster: (lon, lat) points → present cells of the z-grid,
    a cell being present when ≥ ``threshold`` points land in it.
    Returns a Dataset of (cell_x, cell_y, n_points)."""
    from ..geo import tilemath as tm

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        k = _pack(tm.lon2tilex(lon, zoom), tm.lat2tiley(lat, zoom))
        u, c = np.unique(k, return_counts=True)
        return pa.table({"cell": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum
    agg = (points_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("cell").aggregate(Sum("n", alias_name="n_points")))

    def thresh(batch: pa.Table) -> pa.Table:
        n = batch["n_points"].to_numpy(zero_copy_only=False)
        keep = n >= threshold
        x, y = _unpack(batch["cell"].to_numpy(zero_copy_only=False)[keep])
        return pa.table({"cell_x": pa.array(x, pa.int64()),
                         "cell_y": pa.array(y, pa.int64()),
                         "n_points": pa.array(n[keep], pa.int64())})

    return agg.map_batches(thresh, batch_format="pyarrow")


def _neighbor_keys(k: np.ndarray) -> np.ndarray:
    """4-neighborhood of packed keys, shape (4n,). y-underflow at the
    grid edge produces keys outside the grid — harmless, they match no
    present cell."""
    return np.concatenate([k + _XS, k - _XS, k + _YS, k - _YS])


def raster_boundary(cells_ds, num_buckets: int = 64):
    """Raster→vector step 1: boundary cells of the presence mask.
    A present cell is boundary iff fewer than 4 of its 4-neighbors are
    present. One message exchange: every cell posts its presence to its
    neighbors; a bucketed groupby tallies messages per cell. Output:
    (cell_x, cell_y, n_neighbors) for boundary cells only."""

    def messages(b: pa.Table) -> pa.Table:
        k = _pack(b["cell_x"].to_numpy(zero_copy_only=False),
                  b["cell_y"].to_numpy(zero_copy_only=False))
        tgt = np.concatenate([k, _neighbor_keys(k)])
        is_self = np.zeros(len(tgt), dtype=np.int8)
        is_self[:len(k)] = 1
        return pa.table({
            "cell": pa.array(tgt, pa.int64()),
            "is_self": pa.array(is_self, pa.int8()),
            "kbkt": pa.array(mix_bucket(tgt, num_buckets), pa.int64())})

    def tally(g: pa.Table) -> pa.Table:
        cell = g["cell"].to_numpy(zero_copy_only=False)
        is_self = g["is_self"].to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        cell, is_self = cell[order], is_self[order]
        brk = np.ones(len(cell), dtype=bool)
        brk[1:] = cell[1:] != cell[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(cell)]])
        present = np.maximum.reduceat(is_self, starts) == 1
        n_nb = (ends - starts) - np.add.reduceat(
            is_self.astype(np.int64), starts)
        keep = present & (n_nb < 4)
        x, y = _unpack(cell[starts[keep]])
        return pa.table({"cell_x": pa.array(x, pa.int64()),
                         "cell_y": pa.array(y, pa.int64()),
                         "n_neighbors": pa.array(n_nb[keep], pa.int64())})

    return (cells_ds.map_batches(messages, batch_format="pyarrow")
            .groupby("kbkt").map_groups(tally, batch_format="pyarrow"))


def _adjacency_pairs(cells_ds, num_buckets: int = 64):
    """Edges between 4-adjacent present cells as (doc_a, doc_b) — the
    input shape connected_components_min_label expects. Right/down
    messages only (each undirected edge generated once)."""

    def messages(b: pa.Table) -> pa.Table:
        k = _pack(b["cell_x"].to_numpy(zero_copy_only=False),
                  b["cell_y"].to_numpy(zero_copy_only=False))
        tgt = np.concatenate([k, k + _XS, k + _YS])
        src = np.concatenate([k, k, k])
        is_self = np.zeros(len(tgt), dtype=np.int8)
        is_self[:len(k)] = 1
        return pa.table({
            "cell": pa.array(tgt, pa.int64()),
            "src": pa.array(src, pa.int64()),
            "is_self": pa.array(is_self, pa.int8()),
            "kbkt": pa.array(mix_bucket(tgt, num_buckets), pa.int64())})

    def edges(g: pa.Table) -> pa.Table:
        cell = g["cell"].to_numpy(zero_copy_only=False)
        src = g["src"].to_numpy(zero_copy_only=False)
        is_self = g["is_self"].to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        cell, src, is_self = cell[order], src[order], is_self[order]
        brk = np.ones(len(cell), dtype=bool)
        brk[1:] = cell[1:] != cell[:-1]
        starts = np.flatnonzero(brk)
        run_id = np.cumsum(brk) - 1
        present = (np.maximum.reduceat(is_self, starts) == 1)[run_id]
        keep = present & (is_self == 0)
        return pa.table({"doc_a": pa.array(src[keep], pa.int64()),
                         "doc_b": pa.array(cell[keep], pa.int64())})

    return (cells_ds.map_batches(messages, batch_format="pyarrow")
            .groupby("kbkt").map_groups(edges, batch_format="pyarrow"))


def label_regions(cells_ds, num_buckets: int = 64):
    """Raster→vector step 2: connected-component region label per
    present cell (4-connectivity, label = min packed cell key of the
    region). Isolated cells label themselves. Returns a Dataset of
    (cell_x, cell_y, region)."""
    from .dedup import connected_components_min_label

    pairs = _adjacency_pairs(cells_ds, num_buckets)
    comp = connected_components_min_label(pairs, num_buckets=num_buckets)

    # union-groupby lookup: cells pick up their component label, cells
    # without one (isolated) default to themselves
    def cell_rows(b: pa.Table) -> pa.Table:
        k = _pack(b["cell_x"].to_numpy(zero_copy_only=False),
                  b["cell_y"].to_numpy(zero_copy_only=False))
        return pa.table({
            "cell": pa.array(k, pa.int64()),
            "lbl": pa.nulls(len(k), pa.int64()),
            "kbkt": pa.array(mix_bucket(k, num_buckets), pa.int64())})

    def lbl_rows(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cell": pa.array(k, pa.int64()),
            "lbl": b["comp"],
            "kbkt": pa.array(mix_bucket(k, num_buckets), pa.int64())})

    def assign(g: pa.Table) -> pa.Table:
        cell = g["cell"].to_numpy(zero_copy_only=False)
        lbl_col = g["lbl"].combine_chunks()
        has = np.asarray(lbl_col.is_valid())
        lbl = lbl_col.fill_null(-1).to_numpy(zero_copy_only=False)
        order = np.lexsort((~has, cell))  # labeled row first per cell
        cell, lbl, has = cell[order], lbl[order], has[order]
        brk = np.ones(len(cell), dtype=bool)
        brk[1:] = cell[1:] != cell[:-1]
        starts = np.flatnonzero(brk)
        # a cell row exists for every present cell; the label row (if
        # any) sorts first in its run — take it, else self-label
        region = np.where(has[starts], lbl[starts], cell[starts])
        # only emit PRESENT cells (label rows may cover nodes that are
        # not in this bucket's cell set — cells appear once per run)
        is_cell = ~has  # cell rows carry null labels
        n_cellrows = np.add.reduceat(is_cell.astype(np.int64), starts)
        keep = n_cellrows > 0
        x, y = _unpack(cell[starts[keep]])
        return pa.table({"cell_x": pa.array(x, pa.int64()),
                         "cell_y": pa.array(y, pa.int64()),
                         "region": pa.array(region[keep], pa.int64())})

    return (cells_ds.map_batches(cell_rows, batch_format="pyarrow")
            .union(comp.map_batches(lbl_rows, batch_format="pyarrow"))
            .groupby("kbkt").map_groups(assign, batch_format="pyarrow"))


def trace_region_outline(xs: np.ndarray, ys: np.ndarray):
    """Union-of-unit-squares outline of one region's cell set →
    (rings, perimeter). Rings are closed (N,2) float arrays in cell
    coordinates; the first ring is the outer boundary (max |area|).
    Directed boundary edges keep the region to the LEFT in a y-down
    grid (outer rings wind clockwise in screen terms — the same
    orientation the tile pipeline's y-down winding enforcement uses);
    degree-4 pinch vertices resolve by always taking the sharpest left
    turn, which keeps loops simple at diagonal touches."""
    xs = np.asarray(xs, np.int64)
    ys = np.asarray(ys, np.int64)
    k = _pack(xs, ys)
    present = set(k.tolist())
    # directed edges (x0,y0)->(x1,y1), region to the left (y-down)
    edges = []
    for x, y, kk in zip(xs, ys, k):
        if (kk - _YS) not in present:      # open top → edge runs +x
            edges.append(((x, y), (x + 1, y)))
        if (kk + _YS) not in present:      # open bottom → edge runs -x
            edges.append(((x + 1, y + 1), (x, y + 1)))
        if (kk - _XS) not in present:      # open left → edge runs -y
            edges.append(((x, y + 1), (x, y)))
        if (kk + _XS) not in present:      # open right → edge runs +y
            edges.append(((x + 1, y), (x + 1, y + 1)))
    perimeter = len(edges)
    # out-edges per start vertex; sorted for determinism
    out = {}
    for a, b in edges:
        out.setdefault(a, []).append(b)
    for v in out.values():
        v.sort()
    rings = []
    # deterministic loop starts: smallest start vertex first
    for start in sorted(out.keys()):
        if not out[start]:
            continue
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            nxts = out[cur]
            if not nxts:
                break  # consumed by an earlier loop (shouldn't happen)
            if len(nxts) == 1 or prev_dir is None:
                nxt = nxts[0]
            else:
                # sharpest left turn relative to the incoming direction
                def turn(b):
                    d = (b[0] - cur[0], b[1] - cur[1])
                    cross = prev_dir[0] * d[1] - prev_dir[1] * d[0]
                    dot = prev_dir[0] * d[0] + prev_dir[1] * d[1]
                    return (-cross, -dot)
                nxt = min(nxts, key=turn)
            nxts.remove(nxt)
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            if cur == start:
                break
            ring.append(cur)
        if len(ring) >= 4:
            arr = np.asarray(ring + [start], dtype=np.float64)
            # merge collinear runs (axis-aligned): keep direction changes
            d = np.diff(arr, axis=0)
            keep = np.ones(len(arr), dtype=bool)
            keep[1:-1] = (d[1:] != d[:-1]).any(axis=1)
            rings.append(arr[keep])
    # outer ring first (max |shoelace area|)
    def area2(r):
        return abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
    rings.sort(key=area2, reverse=True)
    return rings, perimeter


def polygonize(cells_ds, num_buckets: int = 64):
    """Raster→vector: thresholded cell raster → one polygon per
    4-connected region. Output per region: (region, n_cells,
    perimeter, min_x, min_y, max_x, max_y, geom_wkb) where geom_wkb is
    the traced outline polygon (outer ring + holes) in CELL
    coordinates and area(outline) == n_cells exactly (unit squares) —
    the invariant the tests pin."""
    from ..geo import wkb as _wkb

    labeled = label_regions(cells_ds, num_buckets)

    def bucket(b: pa.Table) -> pa.Table:
        r = b["region"].to_numpy(zero_copy_only=False)
        return b.append_column("kbkt", pa.array(
            mix_bucket(r, num_buckets), pa.int64()))

    def build(g: pa.Table) -> pa.Table:
        x = g["cell_x"].to_numpy(zero_copy_only=False)
        y = g["cell_y"].to_numpy(zero_copy_only=False)
        reg = g["region"].to_numpy(zero_copy_only=False)
        order = np.argsort(reg, kind="stable")
        x, y, reg = x[order], y[order], reg[order]
        brk = np.ones(len(reg), dtype=bool)
        brk[1:] = reg[1:] != reg[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(reg)]])
        rows = {"region": [], "n_cells": [], "perimeter": [],
                "min_x": [], "min_y": [], "max_x": [], "max_y": [],
                "geom_wkb": []}
        for s, e in zip(starts, ends):
            rx, ry = x[s:e], y[s:e]
            rings, perim = trace_region_outline(rx, ry)
            wkb = _wkb.polygon_wkb(rings[0], list(rings[1:])) \
                if rings else b""
            rows["region"].append(int(reg[s]))
            rows["n_cells"].append(int(e - s))
            rows["perimeter"].append(perim)
            rows["min_x"].append(int(rx.min()))
            rows["min_y"].append(int(ry.min()))
            rows["max_x"].append(int(rx.max()))
            rows["max_y"].append(int(ry.max()))
            rows["geom_wkb"].append(wkb)
        return pa.table({
            "region": pa.array(rows["region"], pa.int64()),
            "n_cells": pa.array(rows["n_cells"], pa.int64()),
            "perimeter": pa.array(rows["perimeter"], pa.int64()),
            "min_x": pa.array(rows["min_x"], pa.int64()),
            "min_y": pa.array(rows["min_y"], pa.int64()),
            "max_x": pa.array(rows["max_x"], pa.int64()),
            "max_y": pa.array(rows["max_y"], pa.int64()),
            "geom_wkb": pa.array(rows["geom_wkb"], pa.binary())})

    return (labeled.map_batches(bucket, batch_format="pyarrow")
            .groupby("kbkt").map_groups(build, batch_format="pyarrow"))
