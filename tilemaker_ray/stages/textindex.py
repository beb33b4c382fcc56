"""Inverted-index construction over the documents corpus.

The posting-list builder a retrieval / TF-IDF pipeline needs at corpus
scale: (word → [(doc_id, tf)]) restricted to a document-frequency band
(df_min drops hapax noise, df_max drops stopword-grade terms whose
posting lists would be corpus-sized). Integer-only outputs so the
DuckDB oracle can hash-match exactly.

Distributed shape — ONE exchange: per-batch vectorized (doc, word, tf)
extraction (lexsort + run-length, no Python loop over tokens), then a
bucketed groupby on a stable word hash; each bucket computes df per
word as its run length (rows are distinct (word, doc) pairs by
construction) and filters the band locally. The per-word df never
needs a second shuffle or a join back.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def word_buckets(words, num_buckets: int) -> np.ndarray:
    """Deterministic string→bucket hash (crc32 — stable across runs
    and processes, unlike Python's seeded hash())."""
    return np.asarray([zlib.crc32(w.encode("utf-8")) % num_buckets
                       for w in words], dtype=np.int64)


def doc_term_freqs(batch: pa.Table, ngram: int = 1) -> tuple:
    """(doc_id, term, tf) triples for one batch, vectorized: flatten
    all terms with doc repeats, lexsort by (term, doc), run-length
    count. Tokenization is split(' ') — in lockstep with the
    word_count_topk oracle's string_split(text, ' '); ngram=2 joins
    adjacent tokens with a space (the oracle's list_transform
    formulation)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    lists = [t.split(" ") for t in texts]
    if ngram > 1:
        lists = [[" ".join(l[i:i + ngram])
                  for i in range(len(l) - ngram + 1)] for l in lists]
    lens = np.asarray([len(l) for l in lists], dtype=np.int64)
    if lens.sum() == 0:
        e = np.array([], dtype=np.int64)
        return e, np.array([], dtype="U1"), e
    words = np.asarray([w for l in lists for w in l])
    docs = np.repeat(ids, lens)
    order = np.lexsort((docs, words))
    w, d = words[order], docs[order]
    brk = np.ones(len(w), dtype=bool)
    brk[1:] = (w[1:] != w[:-1]) | (d[1:] != d[:-1])
    starts = np.flatnonzero(brk)
    ends = np.concatenate([starts[1:], [len(w)]])
    return d[starts], w[starts], (ends - starts).astype(np.int64)


def build_inverted_index(docs_ds, df_min: int = 2, df_max: int = 100,
                         num_buckets: int = 64, ngram: int = 1):
    """documents (doc_id, text) → postings (word, doc_id, tf, df) for
    terms whose document frequency lies in [df_min, df_max]."""

    def extract(batch: pa.Table) -> pa.Table:
        d, w, tf = doc_term_freqs(batch, ngram=ngram)
        uw, inv = np.unique(w, return_inverse=True)
        bkt = word_buckets(uw, num_buckets)[inv] if len(uw) else \
            np.array([], dtype=np.int64)
        return pa.table({
            "word": pa.array(w, pa.string()),
            "doc_id": pa.array(d, pa.int64()),
            "tf": pa.array(tf, pa.int64()),
            "kbkt": pa.array(bkt, pa.int64())})

    def index_bucket(g: pa.Table) -> pa.Table:
        w = np.asarray(g["word"].to_pylist())
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        tf = g["tf"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, w))
        w, d, tf = w[order], d[order], tf[order]
        brk = np.ones(len(w), dtype=bool)
        brk[1:] = w[1:] != w[:-1]
        run_id = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(w)]])
        df = (ends - starts)[run_id]          # rows are distinct docs
        keep = (df >= df_min) & (df <= df_max)
        return pa.table({
            "word": pa.array(w[keep], pa.string()),
            "doc_id": pa.array(d[keep], pa.int64()),
            "tf": pa.array(tf[keep], pa.int64()),
            "df": pa.array(df[keep], pa.int64())})

    return (docs_ds.map_batches(extract, batch_format="pyarrow")
            .groupby("kbkt").map_groups(index_bucket,
                                        batch_format="pyarrow"))


def copy_pairs(docs_ds, ngram: int = 5, df_max: int = 50,
               min_shared: int = 3, num_buckets: int = 64):
    """MOSS-style copy detection: document pairs sharing ≥ min_shared
    distinct word n-gram shingles.

    Two slim exchanges: (1) distinct (doc, shingle) rows bucketed by a
    stable shingle hash — each bucket sees every posting of its
    shingles, computes df as run length, skips df > df_max shingles
    (plagiarised boilerplate / stopword-grade n-grams whose pair
    expansion would be quadratic-corpus), and emits triu candidate
    pairs via the shared LSH pairing kernel; (2) pair-count groupby on
    a packed (a,b) key, threshold locally. Shingle STRINGS are the join
    keys (no hashing), so a SQL oracle reproduces the result exactly.
    """
    from .common import mix_bucket
    from .dedup import bucket_pairs_from_runs

    def extract(batch: pa.Table) -> pa.Table:
        d, w, _tf = doc_term_freqs(batch, ngram=ngram)
        if len(w):
            uw, inv = np.unique(w, return_inverse=True)
            bkt = word_buckets(uw, num_buckets)[inv]
        else:
            bkt = np.array([], dtype=np.int64)
        return pa.table({"term": pa.array(w, pa.string()),
                         "doc_id": pa.array(d, pa.int64()),
                         "kbkt": pa.array(bkt, pa.int64())})

    def pairs(g: pa.Table) -> pa.Table:
        return bucket_pairs_from_runs(g, ["term"], "doc_id",
                                      max_bucket=df_max)

    pair_ds = (docs_ds.map_batches(extract, batch_format="pyarrow")
               .groupby("kbkt").map_groups(pairs,
                                           batch_format="pyarrow"))

    def pack(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bb = b["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = (a << np.uint64(32)) | bb
        return pa.table({
            "pkey": pa.array(key.astype(np.int64), pa.int64()),
            "pbkt": pa.array(mix_bucket(key, num_buckets), pa.int64())})

    def count(g: pa.Table) -> pa.Table:
        k = g["pkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        uniq, cnt = np.unique(k, return_counts=True)
        keep = cnt >= min_shared
        uniq, cnt = uniq[keep], cnt[keep]
        return pa.table({
            "doc_a": pa.array((uniq >> np.uint64(32)).astype(np.int64),
                              pa.int64()),
            "doc_b": pa.array(
                (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
                pa.int64()),
            "n_shared": pa.array(cnt.astype(np.int64), pa.int64())})

    return (pair_ds.map_batches(pack, batch_format="pyarrow")
            .groupby("pbkt").map_groups(count, batch_format="pyarrow"))
