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
        # overflow="drop": df_max is the query's SEMANTIC df filter
        # (the oracle excludes df > df_max shingles), not a perf cap
        return bucket_pairs_from_runs(g, ["term"], "doc_id",
                                      max_bucket=df_max,
                                      overflow="drop")

    pair_ds = (docs_ds.map_batches(extract, batch_format="pyarrow")
               .groupby("kbkt").map_groups(pairs,
                                           batch_format="pyarrow"))

    def pack(b: pa.Table) -> pa.Table:
        a64 = b["doc_a"].to_numpy(zero_copy_only=False)
        b64 = b["doc_b"].to_numpy(zero_copy_only=False)
        # the packed pair key needs both ids in [0, 2^32) — beyond it
        # high bits of doc_b would bleed into doc_a and merge distinct
        # pairs silently; fail loudly instead (use a (a,b) two-column
        # groupby key if a corpus ever exceeds 32-bit ids)
        if len(a64) and (a64.min() < 0 or b64.max() >= (1 << 32)):
            raise ValueError("copy_pairs: doc ids must be in [0, 2^32)")
        a = a64.astype(np.uint64)
        bb = b64.astype(np.uint64)
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


def jaccard_pairs(docs_ds, ngram: int = 3, df_max: int = 50,
                  threshold: float = 0.5, num_buckets: int = 64,
                  emit_sizes: bool = False):
    """Exact n-gram Jaccard near-dup join: document pairs whose
    df-filtered distinct word-``ngram`` shingle sets satisfy
    J(a, b) = |Sa ∩ Sb| / (|Sa| + |Sb| − |Sa ∩ Sb|) ≥ ``threshold``.

    The EXACT member of the near-dup family (MinHash estimates this
    statistic; here it is computed precisely, with the same df_max
    boilerplate-shingle filter mirrored in the SQL oracle so the hot
    keys that would make the join quadratic are excluded on BOTH
    sides — the copy_pairs semantics, extended with set sizes).

    Shape: four slim exchanges, document text rides only the first —
    (1) distinct (doc, shingle) postings bucketed by shingle hash:
    each bucket computes df as run length, drops df > df_max, emits
    triu pair rows AND per-doc size partials; (2) pair counts on a
    packed (a,b) key and sizes on a doc key (in parallel branches);
    (3) sizes attach to pairs on hash(doc_a); (4) on hash(doc_b).
    Jaccard uses the mirrored IEEE tree
    ``CAST(c AS DOUBLE) / (na + nb − c)`` and a float threshold both
    engines evaluate on identical doubles — hash-exact."""
    from .common import mix_bucket
    from .dedup import bucket_pairs_from_runs

    def extract(batch: pa.Table) -> pa.Table:
        d, w, _tf = doc_term_freqs(batch, ngram=ngram)
        # the packed (a, b+1) pair key downstream needs both ids in
        # [0, 2^32 − 1); fail loudly like copy_pairs instead of
        # silently merging distinct pairs
        if len(d) and (d.min() < 0 or d.max() >= (1 << 32) - 1):
            raise ValueError(
                "jaccard_pairs: doc ids must be in [0, 2^32 - 1)")
        if len(w):
            uw, inv = np.unique(w, return_inverse=True)
            bkt = word_buckets(uw, num_buckets)[inv]
        else:
            bkt = np.array([], dtype=np.int64)
        return pa.table({"term": pa.array(w, pa.string()),
                         "doc_id": pa.array(d, pa.int64()),
                         "kbkt": pa.array(bkt, pa.int64())})

    def pairs_and_sizes(g: pa.Table) -> pa.Table:
        # df filter first: runs are this bucket's complete postings
        term = np.asarray(g["term"].to_pylist(), dtype=object)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, term))
        term, ids = term[order], ids[order]
        brk = np.ones(len(term), dtype=bool)
        brk[1:] = term[1:] != term[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(term)]])
        df = ends - starts
        keep_run = df <= df_max
        keep = np.zeros(len(term), dtype=bool)
        for s, e, k in zip(starts, ends, keep_run):
            if k:
                keep[s:e] = True
        kept = pa.table({"term": pa.array(term[keep], pa.string()),
                         "doc_id": pa.array(ids[keep], pa.int64())})
        pr = bucket_pairs_from_runs(kept, ["term"], "doc_id",
                                    max_bucket=df_max, overflow="drop")
        ud, cnt = (np.unique(ids[keep], return_counts=True)
                   if keep.any() else
                   (np.array([], np.int64), np.array([], np.int64)))
        a = np.concatenate([pr["doc_a"].to_numpy(zero_copy_only=False),
                            ud.astype(np.int64)])
        b = np.concatenate([pr["doc_b"].to_numpy(zero_copy_only=False),
                            np.full(len(ud), -1, np.int64)])
        v = np.concatenate([np.ones(pr.num_rows, np.int64),
                            cnt.astype(np.int64)])
        role = np.concatenate([np.zeros(pr.num_rows, np.int8),
                               np.ones(len(ud), np.int8)])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "role": pa.array(role, pa.int8())})

    mixed = (docs_ds.map_batches(extract, batch_format="pyarrow")
             .groupby("kbkt").map_groups(pairs_and_sizes,
                                         batch_format="pyarrow"))

    def _empty_mixed(extra=()):
        # the typed empty MUST carry the stage's full live schema —
        # a zero-column block answered with a narrower schema breaks
        # the downstream sort-groupby concat (the repo's recorded
        # empty-block pitfall)
        cols = {"a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "role": pa.array([], pa.int8())}
        for c in extra:
            cols[c] = pa.array([], pa.int64())
        cols["jbkt"] = pa.array([], pa.int64())
        return pa.table(cols)

    def route(key_of, extra=()):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "a" not in b.column_names:
                return _empty_mixed(extra)
            k = key_of(b)
            return b.append_column("jbkt",
                                   pa.array(mix_bucket(k, num_buckets),
                                            pa.int64()))
        return f

    def fold_counts(g: pa.Table) -> pa.Table:
        # pairs: sum shared-shingle partials on the packed (a,b) key;
        # sizes: sum per-doc partials — both are plain segment sums
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        role = g["role"].to_numpy(zero_copy_only=False)
        out = {"a": [], "b": [], "v": [], "role": []}
        for r in (0, 1):
            m = role == r
            if not m.any():
                continue
            key = a[m].astype(np.uint64) << np.uint64(32)
            key |= (b[m].astype(np.int64) + 1).astype(np.uint64)
            uk, inv = np.unique(key, return_inverse=True)
            sums = np.zeros(len(uk), dtype=np.int64)
            np.add.at(sums, inv, v[m])
            out["a"].extend((uk >> np.uint64(32)).astype(np.int64)
                            .tolist())
            out["b"].extend(((uk & np.uint64(0xFFFFFFFF))
                             .astype(np.int64) - 1).tolist())
            out["v"].extend(sums.tolist())
            out["role"].extend([r] * len(uk))
        return pa.table({"a": pa.array(out["a"], pa.int64()),
                         "b": pa.array(out["b"], pa.int64()),
                         "v": pa.array(out["v"], pa.int64()),
                         "role": pa.array(out["role"], pa.int8())})

    # exchange 2: complete c per pair / n per doc (size rows already
    # carry b = -1 so the same packed key works for both roles)
    totals = (mixed.map_batches(
        route(lambda b: np.where(
            b["role"].to_numpy(zero_copy_only=False) == 0,
            b["a"].to_numpy(zero_copy_only=False)
            * np.int64(1315423911)
            ^ b["b"].to_numpy(zero_copy_only=False),
            b["a"].to_numpy(zero_copy_only=False))),
        batch_format="pyarrow")
        .groupby("jbkt").map_groups(fold_counts, batch_format="pyarrow"))

    def attach(ds, key_col_idx, out_name):
        """exchange: route pair rows by doc key (a or b) together with
        size rows; in-bucket searchsorted join attaches the size."""
        def key_of(b: pa.Table) -> np.ndarray:
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            role = b["role"].to_numpy(zero_copy_only=False)
            k = a if key_col_idx == 0 else np.where(role == 1, a, bb)
            return k

        def join(g: pa.Table) -> pa.Table:
            role = g["role"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False)
            bb = g["b"].to_numpy(zero_copy_only=False)
            v = g["v"].to_numpy(zero_copy_only=False)
            sdoc = a[role == 1]
            sn = v[role == 1]
            so = np.argsort(sdoc, kind="stable")
            sdoc, sn = sdoc[so], sn[so]
            pm = role == 0
            cols = {c: g[c].to_numpy(zero_copy_only=False)[pm]
                    for c in g.column_names if c not in ("jbkt",)}
            key = (cols["a"] if key_col_idx == 0 else cols["b"])
            pos = np.searchsorted(sdoc, key)
            pos = np.minimum(pos, max(len(sdoc) - 1, 0))
            n = sn[pos] if len(sdoc) else np.zeros(len(key), np.int64)
            cols[out_name] = n.astype(np.int64)
            # size rows ride along until the LAST attach
            out = {c: pa.array(vv, pa.int64() if c != "role"
                               else pa.int8())
                   for c, vv in cols.items()}
            t = pa.table(out)
            if key_col_idx == 0:
                sz = pa.table({
                    "a": pa.array(sdoc, pa.int64()),
                    "b": pa.array(np.full(len(sdoc), -1, np.int64),
                                  pa.int64()),
                    "v": pa.array(sn, pa.int64()),
                    "role": pa.array(np.ones(len(sdoc), np.int8),
                                     pa.int8()),
                    out_name: pa.array(np.zeros(len(sdoc), np.int64),
                                       pa.int64())})
                t = pa.concat_tables([t, sz])
            return t

        extra = ("na",) if key_col_idx == 1 else ()
        return (ds.map_batches(route(key_of, extra),
                               batch_format="pyarrow")
                .groupby("jbkt").map_groups(join,
                                            batch_format="pyarrow"))

    with_na = attach(totals, 0, "na")
    with_nb = attach(with_na, 1, "nb")

    def finish(b: pa.Table) -> pa.Table:
        cols = {"doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64())}
        if emit_sizes:
            cols["na"] = pa.array([], pa.int64())
            cols["nb"] = pa.array([], pa.int64())
        empty = pa.table(cols)
        if b.num_rows == 0 or "role" not in b.column_names:
            return empty
        role = b["role"].to_numpy(zero_copy_only=False)
        m = role == 0
        if not m.any():
            return empty
        a = b["a"].to_numpy(zero_copy_only=False)[m]
        bb = b["b"].to_numpy(zero_copy_only=False)[m]
        c = b["v"].to_numpy(zero_copy_only=False)[m]
        na = b["na"].to_numpy(zero_copy_only=False)[m]
        nb = b["nb"].to_numpy(zero_copy_only=False)[m]
        jac = c.astype(np.float64) / (na + nb - c)
        keep = jac >= threshold
        out = {
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(bb[keep], pa.int64()),
            "n_shared": pa.array(c[keep], pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64())}
        if emit_sizes:
            out["na"] = pa.array(na[keep], pa.int64())
            out["nb"] = pa.array(nb[keep], pa.int64())
        return pa.table(out)

    return with_nb.map_batches(finish, batch_format="pyarrow")


def bigram_lm(docs_ds, min_count: int = 2, num_buckets: int = 64,
              emit_n1f: bool = False):
    """Bigram language-model statistics: (w1, w2, c12, c1, logp) with
    c12 = corpus count of the bigram, c1 = total bigrams starting with
    w1, logp = ln(P(w2|w1)) = ln(c12/c1).

    ONE exchange, like build_inverted_index: per-batch vectorized
    bigram counting (dictionary-encode tokens, pack adjacent code
    pairs into one int64, np.unique — no Python loop over tokens),
    bucketed by a stable hash of w1. Because ALL bigrams sharing w1
    land in one bucket, the conditional total c1 is an in-bucket
    segment sum — the count-join a naive formulation would shuffle
    for is free. logp uses libm log (math.log) on the final
    per-bucket rows so the SQL oracle's ln() matches to the ulp.
    """
    import math

    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        enc = pc.dictionary_encode(
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        v = len(vocab)
        if len(codes) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "kbkt": pa.array([], pa.int64())})
        # adjacency mask: drop pairs crossing document boundaries
        ends = np.cumsum(lens)
        mask = np.ones(len(codes) - 1, dtype=bool)
        # last token of each non-final doc; guard for zero-length docs
        # (idx -1 / idx == len(mask) would alias the wrong pair)
        idx = ends[:-1] - 1
        idx = idx[(idx >= 0) & (idx < len(mask))]
        mask[idx] = False
        key = codes[:-1][mask] * v + codes[1:][mask]
        uk, cnt = np.unique(key, return_counts=True)
        w1 = vocab[uk // v]
        w2 = vocab[uk % v]
        bkt = word_buckets(w1, num_buckets)
        return pa.table({
            "w1": pa.array(list(w1), pa.string()),
            "w2": pa.array(list(w2), pa.string()),
            "c": pa.array(cnt.astype(np.int64), pa.int64()),
            "kbkt": pa.array(bkt, pa.int64())})

    def reduce_bucket(g: pa.Table) -> pa.Table:
        w1 = np.asarray(g["w1"].to_pylist(), dtype=object)
        w2 = np.asarray(g["w2"].to_pylist(), dtype=object)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w2, w1))
        w1, w2, c = w1[order], w2[order], c[order]
        n = len(w1)
        if n == 0:
            cols = {"w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "c12": pa.array([], pa.int64()),
                    "c1": pa.array([], pa.int64())}
            if emit_n1f:
                cols["n1f"] = pa.array([], pa.int64())
            else:
                cols["logp"] = pa.array([], pa.float64())
            return pa.table(cols)
        pair_brk = np.ones(n, dtype=bool)
        pair_brk[1:] = (w1[1:] != w1[:-1]) | (w2[1:] != w2[:-1])
        pid = np.cumsum(pair_brk) - 1
        c12 = np.zeros(pid[-1] + 1, dtype=np.int64)
        np.add.at(c12, pid, c)
        pw1 = w1[pair_brk]
        pw2 = w2[pair_brk]
        w1_brk = np.ones(len(pw1), dtype=bool)
        w1_brk[1:] = pw1[1:] != pw1[:-1]
        wid = np.cumsum(w1_brk) - 1
        c1 = np.zeros(wid[-1] + 1, dtype=np.int64)
        np.add.at(c1, wid, c12)
        c1_row = c1[wid]
        n1f_row = (np.bincount(wid).astype(np.int64)[wid]
                   if emit_n1f else None)
        keep = c12 >= min_count
        pw1, pw2, c12, c1_row = (pw1[keep], pw2[keep], c12[keep],
                                 c1_row[keep])
        if emit_n1f:
            n1f_row = n1f_row[keep]
        cols = {
            "w1": pa.array(list(pw1), pa.string()),
            "w2": pa.array(list(pw2), pa.string()),
            "c12": pa.array(c12, pa.int64()),
            "c1": pa.array(c1_row, pa.int64())}
        if emit_n1f:
            # distinct continuations of w1 — the w1 segment is
            # complete inside its hash bucket, so this is free here
            cols["n1f"] = pa.array(n1f_row, pa.int64())
        else:
            logp = np.asarray([math.log(float(a) / float(b))
                               for a, b in zip(c12, c1_row)])
            cols["logp"] = pa.array(logp, pa.float64())
        return pa.table(cols)

    return (docs_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("kbkt").map_groups(reduce_bucket,
                                        batch_format="pyarrow"))


# ln(1e-6) in 1e-9 fixed point — the out-of-vocabulary bigram penalty,
# computed (not hardcoded) so the SQL oracle's identical expression
# FLOOR(ln(0.000001)*1e9) matches bit for bit
def _oov_logp_fp() -> int:
    import math
    return int(np.floor(math.log(0.000001) * 1_000_000_000.0))


def lm_doc_scores(docs_ds, lm_table: pa.Table):
    """CCNet-style LM quality scoring: average bigram log-probability
    of every document under a (small, broadcast) bigram LM — the
    perplexity filter a corpus pipeline runs before training-data
    selection.

    The LM is a MODEL ARTIFACT (vocab² upper bound, pruned by
    min_count) — broadcast once via ``ray.put`` like KMeans centroids;
    the scoring pass streams the corpus with no shuffle. Determinism:
    per-bigram logp is floored to 1e-9 fixed point so the per-doc SUM
    is integer-exact regardless of bigram order; the final average
    uses the mirrored tree (CAST(sum)/1e9)/n. Unseen bigrams take the
    fixed OOV penalty ln(1e-6). Docs with < 2 tokens score NULL.
    """
    import ray
    import pyarrow.compute as pc

    w1 = lm_table["w1"].to_pylist()
    w2 = lm_table["w2"].to_pylist()
    lp = lm_table["logp"].to_numpy(zero_copy_only=False)
    lp_fp = np.floor(lp * 1e9).astype(np.int64)
    lm = {(a, b): int(v) for a, b, v in zip(w1, w2, lp_fp)}
    lm_ref = ray.put(lm)
    oov = _oov_logp_fp()

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(lm_ref)
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_docs = len(ids)
        n_big = np.maximum(lens - 1, 0).astype(np.int64)
        sums = np.zeros(n_docs, dtype=np.int64)
        flat = pc.list_flatten(toks)
        enc = pc.dictionary_encode(
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        v = len(vocab)
        if len(codes) >= 2:
            # same boundary masking as bigram_lm.partial; dict lookup
            # only once per UNIQUE bigram in the batch, then scattered
            # back with np.add.at — no Python loop over tokens
            ends = np.cumsum(lens)
            mask = np.ones(len(codes) - 1, dtype=bool)
            idx = ends[:-1] - 1
            idx = idx[(idx >= 0) & (idx < len(mask))]
            mask[idx] = False
            pair_key = codes[:-1][mask] * v + codes[1:][mask]
            doc_of_tok = np.repeat(np.arange(n_docs), lens)
            doc_of_pair = doc_of_tok[:-1][mask]
            uk, inv = np.unique(pair_key, return_inverse=True)
            lp_uk = np.fromiter(
                (m.get((vocab[k // v], vocab[k % v]), oov)
                 for k in uk), dtype=np.int64, count=len(uk))
            np.add.at(sums, doc_of_pair, lp_uk[inv])
        avg = np.where(n_big > 0,
                       (sums.astype(np.float64) / 1e9)
                       / np.maximum(n_big, 1).astype(np.float64),
                       np.nan)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bigrams": pa.array(n_big, pa.int64()),
            "sum_logp_fp": pa.array(sums, pa.int64()),
            "avg_logp": pa.array(
                [None if n == 0 else float(a)
                 for n, a in zip(n_big, avg)], pa.float64())})

    return docs_ds.map_batches(score, batch_format="pyarrow")


def windowed_cooc_pmi(docs_ds, window: int = 2, min_count: int = 5,
                      k: int = 50, num_buckets: int = 64,
                      text_col: str = "text"):
    """Windowed co-occurrence counts + PMI — the word2vec-era corpus
    statistic: unordered word pairs within ±``window`` positions,
    PMI(x,y) = ln(p(x,y) / (p(x)·p(y))) with p(x,y) = c_xy/n_pairs and
    p(w) = c_w/n_tok. Top-``k`` pairs by (count desc, w1, w2).

    Shape: per-batch vectorized pair counting (dictionary-encode
    tokens once, shift-and-pack for every offset d ≤ window), ONE
    bucketed exchange on hash(w1).  Unigram counts use the SAME
    tokenizer (``pc.split_pattern(text, " ")`` — keeps empty tokens,
    mirroring the oracle's ``string_split``; NOT Python ``str.split``,
    which collapses whitespace runs and would diverge on real web
    text) through their own combiner + slim bucketed exchange.  The
    finish is fully distributed: the distinct-pair table is bounded
    by ``window · n_tok`` rows (each token position opens ≤ window
    pairs) and stays in the object store; min_count filtering happens
    per bucket (complete counts — pairs co-locate on hash(w1)), the
    global top-k uses the partial-top-k merge (stages/topk.py), and
    unigram counts are fetched ONLY for the ≤ 2k surviving words via
    an is_in filter — no O(V) driver dict, no whole-pair-table driver
    concat.  PMI is computed on the final ≤k rows with the IEEE
    expression tree ((c_xy·n_tok)·n_tok) / ((c_x·c_y)·n_pairs)
    mirrored verbatim by the SQL oracle, ln via libm — hash-exact."""
    import math

    import pyarrow.compute as pc

    from .common import mix_bucket
    from .dedup import _word_hash
    from .topk import top_k

    def uni_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ")
        flat = pc.list_flatten(toks)
        enc = pc.dictionary_encode(
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat)
        vocab = enc.dictionary.to_pylist()
        if not vocab:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "bkt": pa.array([], pa.int64())})
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        h = np.fromiter((_word_hash(w) & 0x7FFFFFFF for w in vocab),
                        dtype=np.int64, count=len(vocab))
        return pa.table({
            "word": pa.array(vocab, pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
            "bkt": pa.array(mix_bucket(h, num_buckets), pa.int64())})

    def uni_fold(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("word", as_index=False)["cnt"].sum()
        return pa.Table.from_pandas(df[["word", "cnt"]],
                                    preserve_index=False)

    uni = (docs_ds.map_batches(uni_partial, batch_format="pyarrow")
           .groupby("bkt").map_groups(uni_fold, batch_format="pyarrow")
           .materialize())
    n_tok = int(uni.sum("cnt") or 0)

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        enc = pc.dictionary_encode(
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat)
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        v = np.int64(len(vocab))
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64()),
                          "kbkt": pa.array([], pa.int64())})
        if len(codes) < 2:
            return empty
        ends = np.cumsum(lens)
        packed = []
        for d in range(1, window + 1):
            if len(codes) <= d:
                break
            a, b = codes[:-d], codes[d:]
            # drop pairs crossing document boundaries: position i
            # pairs with i+d only if both are in the same document
            mask = np.ones(len(a), dtype=bool)
            for off in range(d):
                idx = ends[:-1] - 1 - off
                idx = idx[(idx >= 0) & (idx < len(mask))]
                mask[idx] = False
            lo = np.minimum(a[mask], b[mask])
            hi = np.maximum(a[mask], b[mask])
            packed.append(lo * v + hi)
        if not packed:
            return empty
        uk, cnt = np.unique(np.concatenate(packed), return_counts=True)
        w1 = vocab[(uk // v)]
        w2 = vocab[(uk % v)]
        # canonical order is LEXICOGRAPHIC on the strings (matching
        # SQL least/greatest), not code order
        flip = w1 > w2
        w1c = np.where(flip, w2, w1)
        w2c = np.where(flip, w1, w2)
        h = np.fromiter((_word_hash(x) & 0x7FFFFFFF for x in w1c),
                        dtype=np.int64, count=len(w1c))
        return pa.table({
            "w1": pa.array(w1c, pa.string()),
            "w2": pa.array(w2c, pa.string()),
            "c": pa.array(cnt.astype(np.int64), pa.int64()),
            "kbkt": pa.array(mix_bucket(h, num_buckets), pa.int64())})

    def fold(g: pa.Table) -> pa.Table:
        import pandas as pd
        df = g.to_pandas().groupby(["w1", "w2"],
                                   as_index=False)["c"].sum()
        return pa.Table.from_pandas(df[["w1", "w2", "c"]],
                                    preserve_index=False)

    pairs = (docs_ds.map_batches(partial, batch_format="pyarrow")
             .groupby("kbkt").map_groups(fold, batch_format="pyarrow")
             .materialize())
    n_pairs = int(pairs.sum("c") or 0)

    # distributed finish: per-bucket counts are COMPLETE (pairs
    # co-locate on hash(w1)), so min_count filters in-stream, then the
    # partial-top-k merge brings only ≤ k slim rows to the driver
    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "c" not in batch.column_names:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        return batch.select(["w1", "w2", "c"]).filter(
            pc.greater_equal(batch["c"], min_count))

    cand = top_k(pairs.map_batches(keep, batch_format="pyarrow"),
                 ["c", "w1", "w2"], k,
                 descending=[True, False, False])
    df = cand.to_pandas()
    df = df.sort_values(["c", "w1", "w2"],
                        ascending=[False, True, True]).head(k)

    # fetch unigram counts ONLY for the ≤ 2k surviving words
    words = sorted({*df["w1"], *df["w2"]})
    wset = pa.array(words, pa.string())

    def pick(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.column_names:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return batch.select(["word", "cnt"]).filter(
            pc.is_in(batch["word"], value_set=wset))

    cx_df = (uni.map_batches(pick, batch_format="pyarrow").to_pandas()
             if words else None)
    cx = (dict(zip(cx_df["word"], cx_df["cnt"].astype(int)))
          if cx_df is not None else {})
    pmi = [math.log(((float(cxy) * n_tok) * n_tok)
                    / ((float(cx[a]) * cx[b]) * n_pairs))
           for a, b, cxy in zip(df["w1"], df["w2"], df["c"])]
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "w1": pa.array(df["w1"].tolist(), pa.string()),
        "w2": pa.array(df["w2"].tolist(), pa.string()),
        "c_xy": pa.array(df["c"].astype("int64").tolist(), pa.int64()),
        "pmi": pa.array(pmi, pa.float64())}))


# --------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — MOSS)
# --------------------------------------------------------------------

WINNOW_B = 257              # polynomial base
WINNOW_M = 1_000_003        # prime modulus (< 2^20: k-gram sums stay
                            # far inside int64 at B*M + 255)


def winnow_gram_hashes(texts, k: int = 8):
    """All character k-gram hashes for a batch of docs, vectorized
    across ONE flat byte buffer (docs separated by k 0xFF sentinels).
    Returns (owner, rel_pos, hash, valid) — ``valid`` False for grams
    that cross a doc boundary (they contain a sentinel byte)."""
    n_docs = len(texts)
    bs = [t.encode("utf-8") for t in texts]
    e = np.array([], dtype=np.int64)
    if not n_docs:
        return e, e, e, np.array([], dtype=bool)
    sep = b"\xff" * k
    flat = np.frombuffer(sep.join(bs), dtype=np.uint8).astype(np.int64)
    lens = np.array([len(b) for b in bs], dtype=np.int64)
    starts = np.zeros(n_docs, dtype=np.int64)
    starts[1:] = np.cumsum(lens[:-1] + k)
    n = len(flat)
    if n < k:
        return e, e, e, np.array([], dtype=bool)
    pw = np.array([pow(WINNOW_B, k - 1 - j, WINNOW_M)
                   for j in range(k)], dtype=np.int64)
    m = n - k + 1
    acc = np.zeros(m, dtype=np.int64)
    for j in range(k):
        acc = (acc + flat[j:j + m] * pw[j]) % WINNOW_M
    gpos = np.arange(m, dtype=np.int64)
    owner = np.searchsorted(starts, gpos, side="right") - 1
    rel = gpos - starts[owner]
    valid = rel + k <= lens[owner]
    return owner, rel, acc, valid

def winnow_fingerprints(texts, k: int = 8, w: int = 4):
    """Winnowing fingerprint selection over character k-grams: hash
    every k-gram (polynomial rolling hash mod WINNOW_M), then for each
    window of ``w`` consecutive k-gram hashes keep the minimum — on
    ties the RIGHTMOST minimal position (the paper's rule, which makes
    selection self-synchronizing) — and emit the distinct selected
    (doc, pos, hash) triples. Guarantees: any shared substring of
    length >= w + k - 1 yields at least one shared fingerprint, and no
    gap between selected positions exceeds w.

    Vectorized across the whole batch: all docs flatten into ONE byte
    buffer separated by k 0xFF sentinels (no text byte is 0xFF-clean
    ASCII in this corpus and k-grams crossing a boundary contain a
    sentinel, so masking `valid` removes them); the k shifted
    multiply-adds and the sliding-window minima run on the flat
    arrays — no per-doc Python in the hot path.

    Returns (doc_idx, pos, h) int64 numpy arrays; doc_idx indexes into
    ``texts``, pos is the k-gram start offset inside the doc.
    """
    owner, rel, acc, valid = winnow_gram_hashes(texts, k)
    m = len(acc)
    if not m:
        e = np.array([], dtype=np.int64)
        return e, e, e
    if w <= 0:
        raise ValueError("w must be >= 1")
    # sliding windows of w hashes; invalid grams get +inf analog so a
    # window containing any is droppable via its own validity mask
    BIG = np.int64(1) << 60
    hm = np.where(valid, acc, BIG)
    if m < w:
        e = np.array([], dtype=np.int64)
        return e, e, e
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(hm, w)                    # (m-w+1, w)
    wmin = win.min(axis=1)
    # rightmost minimal position: argmax over reversed equality
    rev_eq = (win[:, ::-1] == wmin[:, None])
    sel = (w - 1) - rev_eq.argmax(axis=1)
    ends = np.arange(len(wmin), dtype=np.int64)
    pick = ends + sel                                    # k-gram index
    # fully-valid windows only: a single sentinel gram (BIG) anywhere
    # in the window disqualifies it (min-only would accept partial
    # boundary windows)
    ok = win.max(axis=1) < BIG
    # a window straddling two docs mixes sentinel grams -> already
    # dropped by ok (sentinel grams are BIG); distinct selections only
    pick = pick[ok]
    key = np.unique(pick)
    return owner[key], rel[key], acc[key]


def kneser_ney_bigram(docs_ds, discount: float = 0.75,
                      min_count: int = 2, num_buckets: int = 64):
    """Kneser–Ney smoothed bigram probabilities (Kneser & Ney 1995,
    interpolated form): P(w2|w1) = max(c12-d,0)/c1 +
    d·N1+(w1·)/c1 · N1+(·w2)/B, where N1+(w1·) counts distinct
    continuations of w1, N1+(·w2) distinct left-contexts of w2, and
    B the distinct-bigram total. d = 0.75 is dyadic and every other
    operand an exact int64, so the probability is ONE mirrored IEEE
    tree the SQL oracle replays (probabilities emit directly — no
    log; c12 ≥ 1 keeps the max() from ever binding).

    Distributed shape: the bigram_lm exchange emits (w1,w2,c12,c1,
    n1f) with the forward continuation count free in-bucket
    (emit_n1f); ONE further hash(w2)-bucketed exchange adds the
    backward continuation count as a segment size (rows are unique
    (w1,w2) pairs, so segment length IS the distinct-context
    count); B is one driver scalar off the materialized pair table
    (the model artifact a scorer broadcasts anyway)."""
    lm = bigram_lm(docs_ds, min_count=1, num_buckets=num_buckets,
                   emit_n1f=True)

    def back_bucket(batch: pa.Table) -> pa.Table:
        w2 = np.asarray(batch["w2"].to_pylist(), dtype=object)
        return batch.append_column(
            "bkt2", pa.array(word_buckets(w2, num_buckets),
                             pa.int64()))

    def back(g: pa.Table) -> pa.Table:
        w2 = np.asarray(g["w2"].to_pylist(), dtype=object)
        order = np.lexsort((np.arange(len(w2)), w2))
        inv = np.empty(len(w2), np.int64)
        inv[order] = np.arange(len(w2))
        w2s = w2[order]
        brk = np.ones(len(w2s), dtype=bool)
        brk[1:] = w2s[1:] != w2s[:-1]
        sid = np.cumsum(brk) - 1
        seg_n = np.bincount(sid).astype(np.int64)
        n1b = seg_n[sid][inv]
        return g.append_column("n1b", pa.array(n1b, pa.int64()))

    pairs = (lm.map_batches(back_bucket, batch_format="pyarrow")
             .groupby("bkt2").map_groups(back,
                                         batch_format="pyarrow")
             .materialize())
    b_total = pairs.count()

    def finish(batch: pa.Table) -> pa.Table:
        c12 = batch["c12"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c1 = batch["c1"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n1f = batch["n1f"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n1b = batch["n1b"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = c12 >= min_count
        # mirrored IEEE tree — keep operand order
        p = (c12 - discount) / c1 \
            + discount * n1f / c1 * (n1b / b_total)
        t = pa.table({
            "w1": batch["w1"], "w2": batch["w2"],
            "c12": pa.array(c12, pa.int64()),
            "c1": pa.array(c1, pa.int64()),
            "n1f": pa.array(n1f, pa.int64()),
            "n1b": pa.array(n1b, pa.int64()),
            "p_kn": pa.array(p, pa.float64())})
        return t.filter(pa.array(keep))

    return pairs.map_batches(finish, batch_format="pyarrow")
