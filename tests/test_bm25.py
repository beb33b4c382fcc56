"""BM25 top-k vs a brute-force single-process oracle."""

import math

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.bm25 import B, K1, bm25_topk


def _brute(docs, terms, k):
    toks = {d: t.split(" ") for d, t in docs.items()}
    n = len(docs)
    avgdl = float(sum(len(v) for v in toks.values())) / float(n)
    dfs = [sum(1 for v in toks.values() if t in v) for t in terms]
    idfs = [math.log((float(n - df) + 0.5) / (float(df) + 0.5) + 1.0)
            for df in dfs]
    out = []
    for d, v in toks.items():
        s = 0.0
        for j, t in enumerate(terms):
            tf = float(v.count(t))
            s += idfs[j] * (tf * (K1 + 1.0)) \
                / (tf + K1 * (1.0 - B + B * (len(v) / avgdl)))
        out.append((d, s))
    out.sort(key=lambda p: (-p[1], p[0]))
    return dict(out[:k])


def test_bm25_brute(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(11)
    vocab = ["join", "hash", "scan", "dup", "spark", "filter", "sort"]
    docs = {i: " ".join(vocab[j] for j in
                        rng.randint(0, len(vocab), rng.randint(5, 30)))
            for i in range(1, 41)}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    ds = ds.repartition(4)
    out = bm25_topk(ds, ["dup", "spark", "filter"], k=7).to_pandas()
    got = {r.doc_id: r.score for r in out.itertuples()}
    want = _brute(docs, ["dup", "spark", "filter"], 7)
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-12


def test_bm25_absent_term_zero_contribution(ray_session):
    import ray.data as rd
    docs = {1: "a b c", 2: "a zz b", 3: "c c c"}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    out = bm25_topk(ds, ["zz", "missing"], k=3).to_pandas()
    got = {r.doc_id: r.score for r in out.itertuples()}
    assert got[1] == 0.0 and got[3] == 0.0 and got[2] > 0.0
