"""Graph statistics: distributed triangle counting.

The classic node-iterator-over-lowest-node algorithm (Schank &
Wagner 2005 / the MapReduce formulation of Cohen 2009 — public):
every triangle x<y<z is counted exactly once — node x generates the
wedge (y, z) from its (low-endpoint-owned) neighbor list, and the
wedge closes iff the edge (y, z) exists.

Three slim exchanges, all on packed int64 keys:
  1. distinct undirected edges (u<v) — bucketed unique;
  2. wedges — edges grouped by LOW endpoint u, pairs within each
     neighbor list (O(d²) per node; kNN graphs have bounded d);
  3. closure — wedges ∪ edges on the packed (x, y) key, per-group
     tally of wedges and closed wedges; the driver sums
     num_buckets×2 ints.

SQL-oracle-exact (the same construction as a three-way self-join) —
the driver checks row/schema/value hash against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import mix_bucket as _mix_bucket

# ids must be < 2^31: the packed key u*2^32+v must fit in int64
# (u = 2^31 would overflow to a negative key and silently corrupt
# counts); use a (u, v) two-column key beyond 31-bit ids
_M = np.int64(1) << np.int64(32)
_MAX_ID = np.int64(1) << np.int64(31)


def _pack(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    return u * _M + v


def triangle_count(edges_ds, num_buckets: int = 64):
    """directed (src, dst) int edge Dataset → Dataset with ONE row
    (n_wedges, n_triangles) over the undirected simple graph.
    n_wedges counts LOW-ANCHORED wedges (pairs within each node's
    higher-id neighbor list) — the algorithm's candidate set, of
    which n_triangles close; every triangle is counted exactly
    once."""

    def undirect(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (s.min() < 0 or d.min() < 0
                       or max(s.max(), d.max()) >= _MAX_ID):
            raise ValueError("triangle_count: node ids must be in "
                             "[0, 2^31)")
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        keep = u != v
        pk = np.unique(_pack(u[keep], v[keep]))
        return pa.table({
            "pk": pa.array(pk, pa.int64()),
            "kbkt": pa.array(_mix_bucket(pk, num_buckets), pa.int64())})

    def distinct_edges(g: pa.Table) -> pa.Table:
        pk = np.unique(g["pk"].to_numpy(zero_copy_only=False))
        u = pk // _M
        return pa.table({
            "u": pa.array(u, pa.int64()),
            "v": pa.array(pk % _M, pa.int64()),
            "ubkt": pa.array(_mix_bucket(u, num_buckets), pa.int64())})

    edges = (edges_ds.map_batches(undirect, batch_format="pyarrow")
             .groupby("kbkt").map_groups(distinct_edges,
                                         batch_format="pyarrow")
             .materialize())      # consumed twice: wedges + closure

    def wedges(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(u)]])
        out = []
        for s, e in zip(starts, ends):
            nb = v[s:e]                      # sorted, distinct
            if len(nb) >= 2:
                a, b = np.triu_indices(len(nb), k=1)
                out.append(_pack(nb[a], nb[b]))
        pk = np.concatenate(out) if out else np.zeros(0, np.int64)
        # pre-aggregate wedge multiplicity per (x, y) key
        uk, cnt = np.unique(pk, return_counts=True)
        return pa.table({
            "pk": pa.array(uk, pa.int64()),
            "w": pa.array(cnt.astype(np.int64), pa.int64()),
            "kbkt": pa.array(_mix_bucket(uk, num_buckets), pa.int64())})

    def edge_markers(b: pa.Table) -> pa.Table:
        pk = _pack(b["u"].to_numpy(zero_copy_only=False),
                   b["v"].to_numpy(zero_copy_only=False))
        return pa.table({
            "pk": pa.array(pk, pa.int64()),
            "w": pa.array(np.full(len(pk), -1, np.int64), pa.int64()),
            "kbkt": pa.array(_mix_bucket(pk, num_buckets), pa.int64())})

    def closure(g: pa.Table) -> pa.Table:
        pk = g["pk"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        is_edge = w < 0
        ek = np.unique(pk[is_edge])
        wk, wc = pk[~is_edge], w[~is_edge]
        n_w = int(wc.sum())
        pos = np.searchsorted(ek, wk)
        ok = pos < len(ek)
        if len(ek):
            ok[ok] = ek[pos[ok]] == wk[ok]
        n_t = int(wc[ok].sum())
        return pa.table({"pw": pa.array([n_w], pa.int64()),
                         "pt": pa.array([n_t], pa.int64())})

    parts = (edges.groupby("ubkt").map_groups(wedges,
                                              batch_format="pyarrow")
             .union(edges.map_batches(edge_markers,
                                      batch_format="pyarrow"))
             .groupby("kbkt").map_groups(closure,
                                         batch_format="pyarrow"))
    import ray.data as rd

    # the per-bucket partials are num_buckets tiny rows; fold to one
    tot = parts.to_pandas()
    return rd.from_arrow(pa.table({
        "n_wedges": pa.array([int(tot["pw"].sum())], pa.int64()),
        "n_triangles": pa.array([int(tot["pt"].sum())], pa.int64())}))


def triangle_count_reference(edge_rows) -> tuple:
    """Single-process oracle: (n_wedges, n_triangles)."""
    und = set()
    for s, d in edge_rows:
        if s != d:
            und.add((min(s, d), max(s, d)))
    nbr: dict = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
    n_w = n_t = 0
    for u, vs in nbr.items():
        vs = sorted(vs)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                n_w += 1
                if (vs[i], vs[j]) in und:
                    n_t += 1
    return n_w, n_t
