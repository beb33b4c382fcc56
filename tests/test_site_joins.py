"""Round-5 distributed site-id machinery (the r4 verdict's weak-#1
fix): site_universe's distributed dictionary-encode must reproduce the
old driver-side sorted(set()) id assignment exactly, and the bucketed
join primitives (resolve_links_indexed / resolve_dst_site /
label_site_ids / bucketed_value_join) must match brute-force
references — partition-invariantly, since every exchange is keyed by
content hashes, not block layout."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.pagerank import (bucketed_value_join,
                                           label_site_ids,
                                           resolve_dst_site,
                                           resolve_links_indexed,
                                           site_universe)


def _links_table(rng, n_sites=23, n_links=400):
    sites = [f"s{i:03d}.example" for i in rng.permutation(n_sites)]
    src = [sites[i] for i in rng.randint(0, n_sites, n_links)]
    dsth = rng.randint(0, 1 << 48, n_links).astype(np.int64)
    return pa.table({"src": pa.array(src, pa.string()),
                     "dsth": pa.array(dsth, pa.int64()),
                     "anchor": pa.array(
                         [f"a{i % 7}" for i in range(n_links)],
                         pa.string())})


def test_site_universe_matches_sorted_set(ray_session):
    import ray.data as rd
    t = _links_table(np.random.RandomState(7))
    for n_blocks in (1, 5):
        ds = rd.from_arrow(t).repartition(n_blocks)
        site_ids, m = site_universe(ds)
        got = site_ids.sort("site_id").to_pandas()
        want = sorted(set(t["src"].to_pylist()))
        assert m == len(want)
        assert got["site"].tolist() == want
        assert got["site_id"].tolist() == list(range(len(want)))


def test_resolve_links_indexed_vs_brute(ray_session):
    import ray.data as rd
    t = _links_table(np.random.RandomState(11))
    ds = rd.from_arrow(t).repartition(4)
    site_ids, m = site_universe(ds)
    got = (resolve_links_indexed(ds, site_ids, m).to_pandas()
           .sort_values(["s", "t"]).reset_index(drop=True))
    sites = sorted(set(t["src"].to_pylist()))
    idx = {s: i for i, s in enumerate(sites)}
    brute = {}
    for s, h in zip(t["src"].to_pylist(), t["dsth"].to_pylist()):
        si = idx[s]
        ti = int(np.uint64(h) % np.uint64(m))
        if si != ti:
            brute[(si, ti)] = brute.get((si, ti), 0) + 1
    assert [tuple(r) for r in got[["s", "t", "w"]].to_numpy()] == \
        sorted((s, d, w) for (s, d), w in brute.items())


def test_resolve_dst_site_with_extras_and_dedup(ray_session):
    import ray.data as rd
    t = _links_table(np.random.RandomState(13))
    ds = rd.from_arrow(t).repartition(3)
    site_ids, m = site_universe(ds)
    sites = sorted(set(t["src"].to_pylist()))
    want = sorted(
        (sites[int(np.uint64(h) % np.uint64(m))], a)
        for h, a in zip(t["dsth"].to_pylist(), t["anchor"].to_pylist()))
    got = (resolve_dst_site(ds, site_ids, m,
                            extra_cols=[("anchor", pa.string())])
           .to_pandas())
    assert sorted(zip(got["dst"], got["anchor"])) == want
    # dedup=True: per-batch distinct combiner — global multiset may
    # keep cross-block repeats, but the distinct SET is unchanged
    got2 = (resolve_dst_site(ds, site_ids, m,
                             extra_cols=[("anchor", pa.string())],
                             dedup=True).to_pandas())
    assert set(zip(got2["dst"], got2["anchor"])) == set(want)


def test_label_site_ids_roundtrip(ray_session):
    import ray.data as rd
    t = _links_table(np.random.RandomState(17))
    ds = rd.from_arrow(t).repartition(2)
    site_ids, m = site_universe(ds)
    sites = sorted(set(t["src"].to_pylist()))
    rows = pa.table({
        "node_i": pa.array(list(range(m)), pa.int64()),
        "val": pa.array([i * 10 for i in range(m)], pa.int64())})
    got = (label_site_ids(rd.from_arrow(rows).repartition(3), site_ids,
                          id_col="node_i", out_col="node",
                          extra_cols=[("val", pa.int64())])
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert got["node"].tolist() == sites
    assert got["val"].tolist() == [sites.index(s) * 10 for s in sites]


def test_bucketed_value_join_left_outer(ray_session):
    import ray.data as rd
    left = pa.table({
        "k": pa.array(["a", "b", "c", "a", "zz"], pa.string()),
        "tag": pa.array([1, 2, 3, 4, 5], pa.int64())})
    right = pa.table({
        "k": pa.array(["a", "b", "c", "d"], pa.string()),
        "v": pa.array([10, 20, 30, 40], pa.int64())})
    got = (bucketed_value_join(rd.from_arrow(left).repartition(2),
                               rd.from_arrow(right).repartition(2),
                               key_col="k", val_col="v", default=-1,
                               extra_cols=[("tag", pa.int64())])
           .to_pandas().sort_values("tag").reset_index(drop=True))
    assert got["k"].tolist() == ["a", "b", "c", "a", "zz"]
    assert got["v"].tolist() == [10, 20, 30, 10, -1]
