"""BM25 retrieval scoring over the documents corpus.

The search-engine ranking primitive a webtext pipeline needs: given a
small query-term list, score every document with Okapi BM25 and return
the global top-k. Mirrors the retrieval use of the inverted index
(stages/textindex.py) but skips materializing postings — for a FIXED
query only per-doc term frequencies of the query terms matter, so the
corpus pass emits one slim row per document.

Distributed shape:
 1. slim pass (no shuffle): per-batch vectorized token split →
    (doc_id, dl, tf_1..tf_m) for the m query terms; materialized
    (m·8 bytes per doc — ~0.1% of corpus bytes at typical doc sizes).
 2. constants (tiny aggregate): N, Σdl, df_j = #docs with tf_j>0,
    via per-batch partials + a single global sum.
 3. score pass over the slim table with broadcast constants; floats
    follow a FIXED IEEE expression tree, mirrored verbatim by the SQL
    oracle (idf via ln(), both engines call the platform libm):

      avgdl = CAST(Σdl AS DOUBLE) / CAST(N AS DOUBLE)
      idf_j = ln((CAST(N - df_j AS DOUBLE) + 0.5)
                 / (CAST(df_j AS DOUBLE) + 0.5) + 1.0)
      c_j   = idf_j * (tf_j * (1.2 + 1.0))
              / (tf_j + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
      score = ((c_1 + c_2) + c_3) ...   (left-assoc, query order)

 4. global top-k via stages/topk.py (per-batch partial top-k, no full
    sort exchange); ties broken by doc_id ascending.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75


def _slim_pass(batch: pa.Table, terms: list) -> pa.Table:
    """(doc_id, dl, tf_0..tf_{m-1}) for one batch — one
    split_pattern + index_in, no Python loop over tokens."""
    toks = pc.split_pattern(batch["text"], " ")
    dl = pc.list_value_length(toks).cast(pa.int64())
    flat = pc.list_flatten(toks)
    idx = pc.index_in(flat, value_set=pa.array(terms))
    offs = np.zeros(batch.num_rows + 1, dtype=np.int64)
    np.cumsum(dl.to_numpy(zero_copy_only=False), out=offs[1:])
    doc_of_tok = np.repeat(np.arange(batch.num_rows), np.diff(offs))
    cols = {"doc_id": batch["doc_id"], "dl": dl}
    # index_in yields null for misses
    isv = pc.is_valid(idx).to_numpy(zero_copy_only=False)
    iv = np.where(isv, idx.fill_null(0).to_numpy(zero_copy_only=False), -1)
    for j in range(len(terms)):
        hit = (iv == j) & isv
        tf = np.bincount(doc_of_tok[hit], minlength=batch.num_rows)
        cols[f"tf_{j}"] = pa.array(tf.astype(np.int64), pa.int64())
    return pa.table(cols)


def bm25_topk(docs_ds, terms: list, k: int = 10):
    """documents (doc_id, text) → top-k (doc_id, score) by BM25."""
    from ray.data.aggregate import Sum
    from .topk import top_k
    terms = list(terms)
    m = len(terms)

    slim = docs_ds.map_batches(
        lambda b: _slim_pass(b, terms), batch_format="pyarrow") \
        .materialize()          # consumed twice: constants + scoring

    def const_partial(batch: pa.Table) -> pa.Table:
        row = {"n_": pa.array([batch.num_rows], pa.int64()),
               "sumdl_": pa.array(
                   [int(pc.sum(batch["dl"]).as_py() or 0)], pa.int64())}
        for j in range(m):
            row[f"df_{j}"] = pa.array(
                [int(pc.sum(pc.cast(pc.greater(batch[f"tf_{j}"], 0),
                                    pa.int64())).as_py() or 0)],
                pa.int64())
        return pa.table(row)

    aggs = [Sum("n_", alias_name="n"), Sum("sumdl_", alias_name="sumdl")]
    aggs += [Sum(f"df_{j}", alias_name=f"df{j}") for j in range(m)]
    consts = slim.map_batches(const_partial,
                              batch_format="pyarrow").aggregate(*aggs)
    if not consts or consts.get("n") in (None, 0):
        # empty corpus: empty top-k, not a ZeroDivisionError
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    n = int(consts["n"])
    sumdl = int(consts["sumdl"])
    dfs = [int(consts[f"df{j}"]) for j in range(m)]
    avgdl = float(sumdl) / float(n)
    idfs = [math.log((float(n - dfs[j]) + 0.5)
                     / (float(dfs[j]) + 0.5) + 1.0) for j in range(m)]

    def score(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = None
        for j in range(m):
            tf = batch[f"tf_{j}"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            c = idfs[j] * (tf * (K1 + 1.0)) \
                / (tf + K1 * (1.0 - B + B * (dl / avgdl)))
            s = c if s is None else s + c
        return pa.table({"doc_id": batch["doc_id"],
                         "score": pa.array(s, pa.float64())})

    scored = slim.map_batches(score, batch_format="pyarrow")
    return top_k(scored, ["score", "doc_id"], k,
                 descending=[True, False])
