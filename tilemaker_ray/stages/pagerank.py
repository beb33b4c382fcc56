"""Distributed PageRank over a site-level link graph.

The classic iterative web-graph algorithm a crawl pipeline runs before
corpus selection (rank-weighted sampling of training documents). Graph
nodes are site prefixes (``host/section``); the synthetic corpus'
HTML carries no anchor tags, so ``page_links`` derives each page's
K outbound site links deterministically from its page index (splitmix
counter hash — same fixture strategy as sources/pages.py). The
link-EXTRACTION stand-in is one vectorized map; everything downstream
(edge aggregation, iteration, convergence) is the real thing.

Distributed shape — the KMeans pattern (stages/cluster.py): the MODEL
(per-node rank vector) is small relative to the EDGE data; each
iteration streams the integer-encoded edge Dataset once with the rank
vector broadcast via ``ray.put``, pre-aggregates (dst, contribution)
per batch with ``np.add.at``, and one tiny groupby-sum produces the
next rank vector. Edge rows never move between iterations; only the
O(nodes) model does. At web scale (10⁷–10⁸ hosts) the broadcast
becomes a sharded rank⋈edge hash join — the documented scale path;
node count, not edge count, bounds driver memory (2 int64 per node).

Determinism: ranks are FIXED-POINT int64 (``scale`` units = mass 1.0
per node at init). contribution(u→v) = rank_u · w_uv // outdeg_u and
rank' = teleport + d_num·Σcontrib // d_den — all integer ops, so the
result is bit-identical under any partitioning (pytest pins the
distributed run against a single-process reference and asserts
partition invariance). Overflow bound: rank_u ≤ total_mass =
n_nodes·scale; rank_u·max_edge_weight must stay < 2⁶³ — with
scale=10⁹, 10³ nodes and edge weights ≤ 10⁶ the headroom is ~10⁴×.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.pages import _splitmix64


def page_links(batch: pa.Table, k: int = 3) -> pa.Table:
    """pages → (src, dsth) link rows, K per page; dsth is a stable
    hash later resolved onto the site universe. One vectorized
    extract_regex splits every url into (site prefix, page id) — no
    Python loop over pages."""
    col = batch["url"].combine_chunks() \
        if isinstance(batch["url"], pa.ChunkedArray) else batch["url"]
    m = pc.extract_regex(col, pattern=r"^(?P<head>.*)/(?P<tail>\d+)$")
    # urls without a numeric tail don't match — drop them rather than
    # let null head/NaN tail corrupt the hash downstream
    m = m.filter(pc.is_valid(m))
    srcs = pc.struct_field(m, "head")
    idxs = pc.cast(pc.struct_field(m, "tail"), pa.int64()) \
        .to_numpy(zero_copy_only=False).astype(np.uint64)
    src_rep = pa.concat_arrays([srcs] * k)
    out_dst = [_splitmix64(idxs ^ np.uint64(0xA5A5 + j))
               for j in range(k)]
    return pa.table({
        "src": src_rep,
        "dsth": pa.array(np.concatenate(out_dst).astype(np.int64),
                         pa.int64())})


def _resolve_fn(sites_ref):
    """(src, dsth) → per-batch pre-aggregated (sd, w) where sd packs
    the (src, dst) SITE INDICES into one int64 — the downstream
    groupby then shuffles a single integer key instead of two string
    columns (measured 13 s → ~2 s for the edge aggregation at 600k
    links). Self-links dropped."""
    import ray

    from .common import mix_bucket

    def fn(batch: pa.Table) -> pa.Table:
        sa, site_idx = ray.get(sites_ref)
        m = len(sa)
        d = (batch["dsth"].to_numpy(zero_copy_only=False)
             .astype(np.uint64) % np.uint64(m)).astype(np.int64)
        enc = pc.dictionary_encode(
            batch["src"].combine_chunks()
            if isinstance(batch["src"], pa.ChunkedArray)
            else batch["src"])
        inv_s = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # dictionary is bounded by sites-per-batch, not rows
        dict_idx = np.fromiter(
            (site_idx[s] for s in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        s_glob = dict_idx[inv_s]
        key = s_glob * m + d
        keep = s_glob != d            # self-links out
        uk, cnt = np.unique(key[keep], return_counts=True)
        return pa.table({
            "sd": pa.array(uk, pa.int64()),
            "w": pa.array(cnt.astype(np.int64), pa.int64()),
            "bkt": pa.array(mix_bucket(uk, 16), pa.int64())})

    return fn


def build_site_edges(pages_ds, k: int = 3):
    """pages → (weighted (src, dst, w) edge Dataset, site list). The
    site universe collection is bounded by #sites, not #pages."""
    import ray

    links = pages_ds.map_batches(
        lambda b: page_links(b, k), batch_format="pyarrow") \
        .materialize()          # consumed twice: site scan + edges
    sites = sorted(set(
        links.map_batches(
            lambda b: pa.table(
                {"src": pc.unique(b["src"].combine_chunks())}),
            batch_format="pyarrow").to_pandas()["src"]))
    site_arr = np.asarray(sites, dtype=object)
    sites_ref = ray.put((site_arr, {s: i for i, s in enumerate(sites)}))

    def sum_bucket(g: pa.Table) -> pa.Table:
        import ray as _ray
        sa, _ = _ray.get(sites_ref)
        mm = len(sa)
        sd = g["sd"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(sd, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, w)
        return pa.table({
            "src": pa.array(sa[uk // mm], pa.string()),
            "dst": pa.array(sa[uk % mm], pa.string()),
            "w": pa.array(acc, pa.int64())})

    # bucketed map_groups (the repo's fast exchange pattern) rather
    # than a hash-shuffle aggregate: one sort exchange of slim
    # pre-combined (sd, w) rows, vectorized sum per bucket
    edges = (links.map_batches(_resolve_fn(sites_ref),
                               batch_format="pyarrow")
             .groupby("bkt").map_groups(sum_bucket,
                                        batch_format="pyarrow"))
    return edges, sites


def pagerank(edges_ds, nodes: list, iters: int = 10,
             d_num: int = 17, d_den: int = 20, scale: int = 10**9):
    """Fixed-point integer PageRank over (src, dst, w) edges.
    Returns a pa.Table (node, rank_fp, rank) in ``nodes`` order."""
    import ray
    from ray.data.aggregate import Sum

    n = len(nodes)
    idx_ref = ray.put({s: i for i, s in enumerate(nodes)})

    def encode(batch: pa.Table) -> pa.Table:
        ni = ray.get(idx_ref)
        s = np.fromiter((ni[x] for x in batch["src"].to_pylist()),
                        dtype=np.int64, count=batch.num_rows)
        t = np.fromiter((ni[x] for x in batch["dst"].to_pylist()),
                        dtype=np.int64, count=batch.num_rows)
        return pa.table({"s": pa.array(s, pa.int64()),
                         "t": pa.array(t, pa.int64()),
                         "w": batch["w"]})

    # integer-encode ONCE; iterations then touch no strings. The
    # aggregated edge table is orders of magnitude smaller than the
    # corpus — coalesce to a few blocks so each iteration schedules
    # a handful of tasks, not one per shuffle partition
    iedges = edges_ds.map_batches(encode, batch_format="pyarrow") \
        .repartition(4).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, batch["s"].to_numpy(zero_copy_only=False),
                  batch["w"].to_numpy(zero_copy_only=False))
        nz = np.flatnonzero(acc)
        return pa.table({"node_i": pa.array(nz, pa.int64()),
                         "dg": pa.array(acc[nz], pa.int64())})

    deg_tbl = (iedges.map_batches(deg_partial, batch_format="pyarrow")
               .groupby("node_i")
               .aggregate(Sum("dg", alias_name="dg"))).to_pandas()
    outdeg = np.zeros(n, dtype=np.int64)
    outdeg[deg_tbl["node_i"].to_numpy()] = deg_tbl["dg"].to_numpy()

    ranks = np.full(n, scale, dtype=np.int64)
    total = n * scale
    teleport = (d_den - d_num) * total // (d_den * n)
    deg_ref = ray.put(outdeg)          # immutable across iterations

    for _ in range(iters):
        ranks_ref = ray.put(ranks)

        def contrib(batch: pa.Table) -> pa.Table:
            r = ray.get(ranks_ref)
            dg = ray.get(deg_ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            t = batch["t"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            c = r[s] * w // np.maximum(dg[s], 1)
            acc = np.zeros(len(r), dtype=np.int64)
            np.add.at(acc, t, c)
            nz = np.flatnonzero(acc)
            return pa.table({"node_i": pa.array(nz, pa.int64()),
                             "c": pa.array(acc[nz], pa.int64())})

        summed = (iedges.map_batches(contrib, batch_format="pyarrow")
                  .groupby("node_i")
                  .aggregate(Sum("c", alias_name="c"))).to_pandas()
        new = np.full(n, teleport, dtype=np.int64)
        new[summed["node_i"].to_numpy()] += \
            d_num * summed["c"].to_numpy() // d_den
        ranks = new

    return pa.table({
        "node": pa.array(nodes, pa.string()),
        "rank_fp": pa.array(ranks, pa.int64()),
        "rank": pa.array(ranks.astype(np.float64) / float(total),
                         pa.float64())})


def pagerank_reference(edge_rows, nodes: list, iters: int = 10,
                       d_num: int = 17, d_den: int = 20,
                       scale: int = 10**9) -> dict:
    """Single-process reference with the IDENTICAL integer arithmetic
    (the pytest oracle)."""
    n = len(nodes)
    ni = {s: i for i, s in enumerate(nodes)}
    outdeg = np.zeros(n, dtype=np.int64)
    for s, t, w in edge_rows:
        outdeg[ni[s]] += w
    ranks = np.full(n, scale, dtype=np.int64)
    total = n * scale
    teleport = (d_den - d_num) * total // (d_den * n)
    for _ in range(iters):
        acc = np.zeros(n, dtype=np.int64)
        for s, t, w in edge_rows:
            si = ni[s]
            acc[ni[t]] += ranks[si] * w // max(outdeg[si], 1)
        ranks = teleport + d_num * acc // d_den
    return {nodes[i]: int(ranks[i]) for i in range(n)}


def bfs_hops(edges_ds, sources: list, max_hops: int = 8):
    """Directed BFS over an integer (src, dst) edge Dataset: minimum
    hop count from any source, up to ``max_hops``. The frontier-join
    pattern: each round streams the edge Dataset once with the current
    frontier broadcast (``pc.is_in`` prefilter, per-batch distinct),
    so edge rows never move; the driver holds the visited map —
    O(reachable nodes), the same model-size bound as the PageRank rank
    vector (sharded frontier⋈edge join is the 10⁷⁺-node path).
    Matches a recursive-CTE oracle exactly (hop = MIN over paths).
    """
    import ray

    dist: dict = {int(s): 0 for s in sources}
    frontier = set(dist)
    edges = edges_ds.materialize()

    for h in range(1, max_hops + 1):
        if not frontier:
            break
        f_arr = pa.array(sorted(frontier), pa.int64())
        f_ref = ray.put(f_arr)

        def step(batch: pa.Table) -> pa.Table:
            fa = ray.get(f_ref)
            src = batch["src"].combine_chunks() \
                if isinstance(batch["src"], pa.ChunkedArray) \
                else batch["src"]
            mask = pc.is_in(src, value_set=fa)
            d = batch["dst"].filter(mask)
            u = np.unique(d.to_numpy(zero_copy_only=False))
            return pa.table({"dst": pa.array(u, pa.int64())})

        cand = edges.map_batches(step,
                                 batch_format="pyarrow").to_pandas()
        # all-empty rounds lose the schema (zero-column DataFrame)
        if "dst" not in cand.columns:
            break
        reached = set(cand["dst"].tolist()) - set(dist)
        for d in reached:
            dist[int(d)] = h
        frontier = reached

    nodes = sorted(dist)
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "hop": pa.array([dist[n] for n in nodes], pa.int64())})
