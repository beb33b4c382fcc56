"""Hybrid retrieval: cosine exactness + RRF fusion semantics."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.hybrid import (cosine_topk_fixed, rrf_fuse,
                                         RRF_K)

DIM = 16


def test_cosine_query_ranks_itself_first(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(3)
    vecs = rng.randn(40, DIM).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    q = vecs[5].astype(np.float64)
    out = cosine_topk_fixed(rd.from_arrow(t).repartition(4), q, DIM,
                            k=5).to_pandas()
    best = out.sort_values(["cos", "doc_id"],
                           ascending=[False, True]).iloc[0]
    assert best["doc_id"] == 5 and best["cos"] > 0.9999
    # brute-force cosine order agrees (fixed-point quantization)
    qi = np.floor(q * 1e6).astype(np.int64)
    mi = np.floor(vecs.astype(np.float64) * 1e6).astype(np.int64)
    cos = (mi @ qi).astype(np.float64) / (
        np.sqrt((mi * mi).sum(axis=1).astype(np.float64))
        * np.sqrt(float((qi * qi).sum())))
    want = set(np.lexsort((np.arange(40), -cos))[:5])
    assert set(out["doc_id"]) == want


def test_rrf_fuse_semantics():
    text = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "score": pa.array([9.0, 5.0, 5.0])})
    vec = pa.table({"doc_id": pa.array([2, 4], pa.int64()),
                    "cos": pa.array([0.9, 0.8])})
    out = rrf_fuse(text, vec, k_out=10).to_pandas().set_index("doc_id")
    # tie in text scores: doc 2 before doc 3 (doc_id asc)
    assert out.loc[2, "r_text"] == 2 and out.loc[3, "r_text"] == 3
    assert out.loc[2, "rrf_score"] == \
        1.0 / (RRF_K + 2) + 1.0 / (RRF_K + 1)
    assert np.isnan(out.loc[4, "r_text"]) and out.loc[4, "r_vec"] == 2
    # doc in both lists outranks single-list docs here
    assert out.index[0] == 2
