"""Deduplication operators over document tables.

No analog exists in the reference (its only dedup is the per-tile
adjacent-unique, /root/reference/src/tile_data.cpp:488, and the
AttributeStore dictionary, src/attribute_store.cpp) — these are the
large-scale training-data operators the engine adds on top, each built
Ray-Data-first:

- exact dedup: content hash in map_batches → groupby(hash) keep-first;
- MinHash + LSH near-dup: shingle → minhash signature (vectorized
  permutation hashing) → band rows → groupby(band, band_hash) buckets
  → candidate pairs → exact Jaccard verify. One shuffle of slim
  (band_hash, doc_id) rows — signatures never re-shuffle;
- SimHash: 64-bit signed-projection fingerprint, hamming-ball pairing
  via 4-way band partitioning (any pair within hamming distance 3
  shares at least one identical 16-bit band);
- n-gram Jaccard verify kernel (shared by the LSH candidates path);
- embedding cosine near-dup: LSH random-hyperplane bucketing over the
  embeddings table, exact cosine verify within buckets.

All per-batch kernels are numpy-vectorized; Python-level loops touch
only per-document token lists (unavoidable for text shingling).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


_WORD_HASH_CACHE: dict = {}


def _word_hash(w: str) -> int:
    """fnv1a64 of a word, memoized (corpora repeat words heavily)."""
    h = _WORD_HASH_CACHE.get(w)
    if h is None:
        h = 0xCBF29CE484222325
        for b in w.encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        if len(_WORD_HASH_CACHE) < 1_000_000:  # bound the memo
            _WORD_HASH_CACHE[w] = h
    return h


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-gram (word-level) hashes: per-word fnv1a64 (memoized)
    combined into gram hashes by a vectorized rolling polynomial —
    ~10× cheaper than hashing each gram's characters."""
    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    wh = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64,
                     count=len(words))
    if len(words) < k:
        k = len(words)
    win = np.lib.stride_tricks.sliding_window_view(wh, k)
    with np.errstate(over="ignore"):
        P = np.uint64(1099511628211)
        gram = np.zeros(len(win), dtype=np.uint64)
        for c in range(k):
            gram = gram * P ^ win[:, c]
    return np.unique(gram)


class MinHasher:
    """n_perm universal-hash minhash; coefficients fixed by seed so
    signatures are reproducible across workers."""

    def __init__(self, n_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.n_perm, np.uint64(_MERSENNE))
        with np.errstate(over="ignore"):
            # (n_sh, n_perm) universal hash, min over shingles
            hv = (shingles[:, None] * self.a[None, :] + self.b[None, :]) \
                % np.uint64(_MERSENNE)
        return hv.min(axis=0)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash sets."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def make_minhash_bands_fn(n_perm: int = 64, n_bands: int = 16,
                          shingle_k: int = 5, id_col: str = "doc_id",
                          text_col: str = "text"):
    """map_batches body: documents → (doc_id, band, band_hash) rows —
    the slim LSH bucket keys that go through the one shuffle."""
    rows_per_band = n_perm // n_bands

    def bands(batch: pa.Table) -> pa.Table:
        hasher = _minhasher_cached(n_perm)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        sigs = np.stack([hasher.signature(_shingle_hashes(t, shingle_k))
                         for t in texts]) if len(texts) else \
            np.empty((0, n_perm), dtype=np.uint64)
        out_ids, out_band, out_hash = [], [], []
        for bi in range(n_bands):
            seg = sigs[:, bi * rows_per_band:(bi + 1) * rows_per_band]
            with np.errstate(over="ignore"):
                bh = np.zeros(len(seg), dtype=np.uint64)
                for c in range(seg.shape[1]):
                    bh = (bh * np.uint64(1099511628211)) ^ seg[:, c]
            out_ids.append(ids)
            out_band.append(np.full(len(ids), bi, dtype=np.int32))
            out_hash.append(bh.astype(np.int64))
        return pa.table({
            id_col: pa.array(np.concatenate(out_ids) if out_ids else [],
                             pa.int64()),
            "band": pa.array(np.concatenate(out_band) if out_band else [],
                             pa.int32()),
            "band_hash": pa.array(np.concatenate(out_hash) if out_hash else [],
                                  pa.int64()),
        })

    return bands


_MINHASHERS: dict = {}


def _minhasher_cached(n_perm: int) -> MinHasher:
    h = _MINHASHERS.get(n_perm)
    if h is None:
        h = _MINHASHERS[n_perm] = MinHasher(n_perm)
    return h


def bucket_pairs_from_runs(g: pa.Table, key_cols: list, id_col: str,
                           max_bucket: int = 200,
                           payload_cols: list | None = None) -> pa.Table:
    """Shared LSH-pairing kernel: one BUCKET of whole hash-buckets →
    candidate (a, b) pairs. lexsort by key_cols, find runs, emit
    triu pairs per run (vectorized per run; runs with ≥2 members are
    the rare case so the Python loop touches few)."""
    n = g.num_rows
    keys = [g[c].to_numpy(zero_copy_only=False) for c in key_cols]
    ids = g[id_col].to_numpy(zero_copy_only=False)
    payloads = {c: g[c].to_numpy(zero_copy_only=False)
                for c in (payload_cols or [])}
    order = np.lexsort(tuple([ids] + keys[::-1]))
    keys = [k[order] for k in keys]
    ids = ids[order]
    payloads = {c: v[order] for c, v in payloads.items()}
    brk = np.ones(n, dtype=bool)
    if n > 1:
        same = np.ones(n - 1, dtype=bool)
        for k in keys:
            same &= k[1:] == k[:-1]
        brk[1:] = ~same
    starts = np.flatnonzero(brk)
    ends = np.concatenate([starts[1:], [n]])
    out_a, out_b = [], []
    pay_a = {c: [] for c in payloads}
    pay_b = {c: [] for c in payloads}
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2 or m > max_bucket:
            continue
        a, b = np.triu_indices(m, k=1)
        out_a.append(ids[s + a])
        out_b.append(ids[s + b])
        for c in payloads:
            pay_a[c].append(payloads[c][s + a])
            pay_b[c].append(payloads[c][s + b])
    if not out_a:
        cols = {"doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64())}
        for c in payloads:
            cols[f"{c}_a"] = pa.array([], pa.int64())
            cols[f"{c}_b"] = pa.array([], pa.int64())
        return pa.table(cols)
    cols = {"doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64())}
    for c in payloads:
        cols[f"{c}_a"] = pa.array(np.concatenate(pay_a[c]), pa.int64())
        cols[f"{c}_b"] = pa.array(np.concatenate(pay_b[c]), pa.int64())
    return pa.table(cols)


def minhash_candidate_pairs(docs_ds, n_perm=64, n_bands=16, shingle_k=5):
    """documents Dataset → Dataset of candidate (doc_a, doc_b) pairs
    (doc_a < doc_b), deduplicated. The shuffle moves only slim
    (doc_id, band, band_hash) rows, grouped by a BUCKET of whole hash
    buckets (per-tiny-group map_groups overhead dominated otherwise)."""
    bands = docs_ds.map_batches(
        make_minhash_bands_fn(n_perm, n_bands, shingle_k),
        batch_format="pyarrow")

    def add_bucket(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (b["band_hash"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 + b["band"].to_numpy().astype(np.uint64))
        return b.append_column("bkt", pa.array(
            (h % np.uint64(256)).astype(np.int64), pa.int64()))

    def pairs(g: pa.Table) -> pa.Table:
        return bucket_pairs_from_runs(g, ["band", "band_hash"], "doc_id")

    cand = (bands.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bkt").map_groups(pairs, batch_format="pyarrow"))
    # distinct pairs (a pair can match in several bands)
    return (cand.groupby(["doc_a", "doc_b"]).count()
            .select_columns(["doc_a", "doc_b"]))


def minhash_near_dups(docs_ds, docs_table: pa.Table, threshold: float = 0.7,
                      n_perm=64, n_bands=16, shingle_k=5):
    """Full near-dup pipeline → pa.Table (doc_a, doc_b, jac ≥ threshold).

    The verify step broadcasts the text of candidate docs only (small
    side at realistic dup rates); at 100 TB the candidate text fetch
    would be a hash-join against the corpus instead — the LSH shuffle
    shape is identical.
    """
    cand = minhash_candidate_pairs(docs_ds, n_perm, n_bands, shingle_k)
    pairs = cand.to_pandas()
    if len(pairs) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jac": pa.array([], pa.float64())})
    texts = dict(zip(docs_table["doc_id"].to_pylist(),
                     docs_table["text"].to_pylist()))
    sh_cache: dict = {}

    def sh(d):
        s = sh_cache.get(d)
        if s is None:
            s = sh_cache[d] = _shingle_hashes(texts[d], shingle_k)
        return s

    keep_a, keep_b, jacs = [], [], []
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        j = jaccard(sh(int(a)), sh(int(b)))
        if j >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
            jacs.append(j)
    order = np.lexsort((keep_b, keep_a))
    return pa.table({"doc_a": pa.array(np.asarray(keep_a)[order], pa.int64()),
                     "doc_b": pa.array(np.asarray(keep_b)[order], pa.int64()),
                     "jac": pa.array(np.asarray(jacs)[order], pa.float64())})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts: list) -> np.ndarray:
    """64-bit simhash per text (word-feature hashing, vectorized
    bit-vote accumulation)."""
    out = np.empty(len(texts), dtype=np.uint64)
    bitpos = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        words = t.split()
        if not words:
            out[i] = 0
            continue
        hs = np.empty(len(words), dtype=np.uint64)
        for j, w in enumerate(words):
            h = np.uint64(0xCBF29CE484222325)
            with np.errstate(over="ignore"):
                for b in w.encode():
                    h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
            hs[j] = h
        bits = ((hs[:, None] >> bitpos[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for bp in np.flatnonzero(votes > 0):
            sig |= np.uint64(1) << np.uint64(bp)
        out[i] = sig
    return out


def make_simhash_fn(id_col: str = "doc_id", text_col: str = "text"):
    def f(batch: pa.Table) -> pa.Table:
        sig = simhash64(batch[text_col].to_pylist())
        return pa.table({id_col: batch[id_col],
                         "simhash": pa.array(sig.astype(np.int64), pa.int64())})
    return f


def simhash_near_dups(docs_ds, max_hamming: int = 3):
    """SimHash near-dup pairs: band each 64-bit signature into four
    16-bit keys (pigeonhole: hamming ≤ 3 ⇒ one band equal), shuffle
    by band key, verify hamming distance within buckets."""
    import pandas as pd
    sigs = docs_ds.map_batches(make_simhash_fn(), batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_i, out_b, out_k, out_s = [], [], [], []
        for bi in range(4):
            key = ((s >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            out_i.append(ids)
            out_b.append(np.full(len(ids), bi, dtype=np.int32))
            out_k.append(key)
            out_s.append(s.astype(np.int64))
        return pa.table({"doc_id": np.concatenate(out_i),
                         "band": np.concatenate(out_b),
                         "key": np.concatenate(out_k),
                         "simhash": np.concatenate(out_s)})

    def add_bucket(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (b["key"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 + b["band"].to_numpy().astype(np.uint64))
        return b.append_column("bkt", pa.array(
            (h % np.uint64(256)).astype(np.int64), pa.int64()))

    def pairs(g: pa.Table) -> pa.Table:
        cand = bucket_pairs_from_runs(g, ["band", "key"], "doc_id",
                                      max_bucket=500,
                                      payload_cols=["simhash"])
        a = cand["doc_a"].to_numpy(zero_copy_only=False)
        b = cand["doc_b"].to_numpy(zero_copy_only=False)
        sa = cand["simhash_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sb = cand["simhash_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = sa ^ sb
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = (ham <= max_hamming) & (a != b)
        return pa.table({"doc_a": pa.array(a[keep], pa.int64()),
                         "doc_b": pa.array(b[keep], pa.int64()),
                         "hamming": pa.array(ham[keep], pa.int64())})

    from ray.data.aggregate import Min
    return (sigs.map_batches(explode, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bkt").map_groups(pairs, batch_format="pyarrow")
            .groupby(["doc_a", "doc_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (random-hyperplane LSH + exact verify)
# ---------------------------------------------------------------------------

def embedding_near_dups(emb_ds, dim: int, threshold: float = 0.9,
                        n_planes: int = 12, seed: int = 42):
    """vectors whose cosine similarity ≥ threshold, via hyperplane-LSH
    buckets (vectors agreeing on all n_planes signs land together) +
    exact cosine verify inside each bucket. Recall is per-bucket (the
    standard LSH trade); raise recall by unioning several plane sets."""
    import pandas as pd
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes))

    def bucket(batch: pa.Table) -> pa.Table:
        V = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch["embedding"].to_pylist()])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        signs = (Vn @ planes) > 0
        key = np.zeros(len(V), dtype=np.int64)
        for p in range(n_planes):
            key |= signs[:, p].astype(np.int64) << p
        return pa.table({"vec_id": batch["vec_id"],
                         "bucket": pa.array(key, pa.int64()),
                         "embedding": batch["embedding"]})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        V = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g["embedding"].to_numpy()[order]])
        if len(ids) < 2 or len(ids) > 2000:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []})
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = S[a, b] >= threshold
        return pd.DataFrame({"vec_a": ids[a][keep], "vec_b": ids[b][keep],
                             "cos": S[a, b][keep]})

    return (emb_ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(pairs, batch_format="pandas"))
