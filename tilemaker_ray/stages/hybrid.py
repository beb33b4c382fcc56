"""Hybrid retrieval: BM25 text ranking ⊕ embedding cosine ranking,
fused with Reciprocal Rank Fusion (RRF).

The two-tower search pattern: a lexical ranker and a dense ranker run
independently over the corpus (each with the scale shape it already
has — BM25's slim pass, the ANN family's per-batch partial top-k) and
only their TOP-K LISTS meet, so fusion is O(k) driver work no matter
the corpus size (the same bounded-driver argument as tile_rollup).

Exactness: cosine over floats would differ between engines by
summation order, so embedding components are quantized to fixed-point
int64 (floor(v·1e6)); dot products and squared norms are then exact
integers and the final cosine uses ONE mirrored IEEE tree:

    cos = CAST(dot AS DOUBLE) / (sqrt(CAST(|d|² AS DOUBLE))
                                 · sqrt(CAST(|q|² AS DOUBLE)))

Ranks are row_number by (score DESC, doc_id); RRF with the standard
k=60 constant:  score = Σ_lists 1/(60 + rank)  (term absent → 0).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .vecagg import _list_to_matrix as _to_matrix

RRF_K = 60.0
Q_SCALE = 1e6


def cosine_topk_fixed(emb_ds, query_vec: np.ndarray, dim: int,
                      k: int = 50, id_col: str = "vec_id",
                      vec_col: str = "embedding"):
    """Exact cosine top-k against one query vector with fixed-point
    integer dot/norms (see module doc). Distributed: per-batch
    vectorized int64 matmul + partial top-k via stages/topk.py."""
    from .topk import top_k

    q = np.floor(query_vec.astype(np.float64) * Q_SCALE) \
        .astype(np.int64)
    qq = int((q * q).sum())
    sq_q = math.sqrt(float(qq))

    def score(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[vec_col], dim)
        mi = np.floor(m * Q_SCALE).astype(np.int64)
        dot = mi @ q
        qa = (mi * mi).sum(axis=1)
        cos = dot.astype(np.float64) \
            / (np.sqrt(qa.astype(np.float64)) * sq_q)
        return pa.table({
            "doc_id": batch[id_col].cast(pa.int64()),
            "cos": pa.array(cos, pa.float64())})

    scored = emb_ds.map_batches(score, batch_format="pyarrow")
    return top_k(scored, ["cos", "doc_id"], k,
                 descending=[True, False])


def rrf_fuse(text_topk: pa.Table, vec_topk: pa.Table, k_out: int = 10):
    """Driver-side fusion of two top-k tables (bounded by k, not
    corpus): assign ranks by (score DESC, doc_id), RRF-combine,
    return the global top ``k_out``. Column layout:
    (doc_id, rrf_score, r_text, r_vec) — absent ranks null."""

    def ranks(tbl: pa.Table, score_col: str) -> dict:
        ids = np.asarray(tbl["doc_id"].to_pylist(), dtype=np.int64)
        sc = np.asarray(tbl[score_col].to_pylist(), dtype=np.float64)
        order = np.lexsort((ids, -sc))
        return {int(ids[i]): r + 1 for r, i in enumerate(order)}

    rt = ranks(text_topk, "score")
    rv = ranks(vec_topk, "cos")
    out = []
    for d in sorted(set(rt) | set(rv)):
        s = (1.0 / (RRF_K + rt[d]) if d in rt else 0.0) \
            + (1.0 / (RRF_K + rv[d]) if d in rv else 0.0)
        out.append((d, s, rt.get(d), rv.get(d)))
    out.sort(key=lambda r: (-r[1], r[0]))
    out = out[:k_out]
    return pa.table({
        "doc_id": pa.array([r[0] for r in out], pa.int64()),
        "rrf_score": pa.array([r[1] for r in out], pa.float64()),
        "r_text": pa.array([r[2] for r in out], pa.int64()),
        "r_vec": pa.array([r[3] for r in out], pa.int64())})
