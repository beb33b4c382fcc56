"""Fuzzy string similarity join: word pairs at edit distance exactly 1.

FastSS-style deletion-neighborhood join (Bocek et al. 2007, public):
two words within edit distance 1 share at least one string in their
deletion neighborhood (the word itself + every single-character
deletion), so hashing the neighborhood turns the quadratic
all-pairs-levenshtein into bucketed candidate generation + exact
verify — the standard scalable shape for typo clustering / vocabulary
normalization in a web-text pipeline.

Ray shape: per-batch distinct words → one bucketed exchange on the
deletion-variant hash (runs = candidate groups, pairs via the shared
run kernel) → exact distance-1 verify per pair → distinct via a
(w1, w2) groupby. SQL-oracle-exact: DuckDB's levenshtein() over the
same vocabulary self-join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import mix_bucket as _mix_bucket
from .dedup import _word_hash


def edit_distance_is_1(a: str, b: str) -> bool:
    """Exact edit-distance == 1 test (specialized two-pointer scan —
    equivalent to the DP levenshtein thresholded at 1)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    skipped = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif skipped:
            return False
        else:
            skipped = True
            j += 1
    return True


def _variants(w: str) -> list:
    """Deletion neighborhood: the word + every single deletion."""
    return [w] + [w[:i] + w[i + 1:] for i in range(len(w))]


def fuzzy_word_pairs(docs_ds, max_doc_id: int = 50,
                     num_buckets: int = 64, id_col: str = "doc_id",
                     text_col: str = "text"):
    """→ Dataset (w1, w2) of distinct vocabulary words at edit
    distance exactly 1 (w1 < w2), over the vocabulary of documents
    with ``doc_id < max_doc_id``."""

    def words(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized tokenize: C++ whitespace split + dictionary
        # encode; dropping "" reproduces str.split() exactly (Arrow
        # emits empty tokens only at string boundaries). The only
        # per-word Python is the fnv hash over the batch-distinct
        # vocabulary — bounded by vocab, not corpus bytes.
        kept = batch.filter(pc.less(batch[id_col], max_doc_id))
        flat = pc.list_flatten(
            pc.utf8_split_whitespace(kept[text_col]))
        enc = pc.dictionary_encode(
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat)
        ws = sorted(w for w in enc.dictionary.to_pylist() if w != "")
        h = np.fromiter((_word_hash(w) & 0x7FFFFFFF for w in ws),
                        dtype=np.int64, count=len(ws))
        return pa.table({
            "word": pa.array(ws, pa.string()),
            "wbkt": pa.array(_mix_bucket(h, num_buckets), pa.int64())})

    def distinct_words(g: pa.Table) -> pa.Table:
        ws = sorted(set(g["word"].to_pylist()))
        return pa.table({"word": pa.array(ws, pa.string())})

    vocab = (docs_ds.map_batches(words, batch_format="pyarrow")
             .groupby("wbkt").map_groups(distinct_words,
                                         batch_format="pyarrow"))

    def variant_rows(b: pa.Table) -> pa.Table:
        vs, ws = [], []
        for w in b["word"].to_pylist():
            for v in _variants(w):
                vs.append(v)
                ws.append(w)
        h = np.fromiter((_word_hash(v) for v in vs), dtype=np.uint64,
                        count=len(vs)).astype(np.int64)
        return pa.table({
            "vh": pa.array(h, pa.int64()),
            "variant": pa.array(vs, pa.string()),
            "word": pa.array(ws, pa.string()),
            "kbkt": pa.array(
                _mix_bucket(h.astype(np.int64), num_buckets),
                pa.int64())})

    def pairs(g: pa.Table) -> pa.Table:
        # runs on the variant STRING (hash only buckets — collisions
        # are resolved by the string key), candidate pairs per run,
        # exact distance-1 verify
        var = np.asarray(g["variant"].to_pylist(), dtype=object)
        wrd = np.asarray(g["word"].to_pylist(), dtype=object)
        order = np.lexsort((wrd, var))
        var, wrd = var[order], wrd[order]
        n = len(var)
        brk = np.ones(n, dtype=bool)
        brk[1:] = var[1:] != var[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]])
        o1, o2 = [], []
        for s, e in zip(starts, ends):
            members = sorted(set(wrd[s:e]))
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    if edit_distance_is_1(members[i], members[j]):
                        o1.append(members[i])
                        o2.append(members[j])
        ph = np.fromiter(
            (_word_hash(a + "\x00" + b) & 0x7FFFFFFF
             for a, b in zip(o1, o2)), dtype=np.int64, count=len(o1))
        return pa.table({"w1": pa.array(o1, pa.string()),
                         "w2": pa.array(o2, pa.string()),
                         "pbkt": pa.array(
                             _mix_bucket(ph, num_buckets), pa.int64())})

    def distinct_pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(["w1", "w2"])
        return pa.Table.from_pandas(df[["w1", "w2"]],
                                    preserve_index=False)

    cand = (vocab.map_batches(variant_rows, batch_format="pyarrow")
            .groupby("kbkt").map_groups(pairs, batch_format="pyarrow"))
    # a pair can surface from several shared variants — distinct via
    # ONE slim packed-int bucketed exchange (the repo's cheap-groupby
    # pattern; a two-string-key hash aggregate has multi-second fixed
    # cost in Ray 2.49)
    return (cand.groupby("pbkt")
            .map_groups(distinct_pairs, batch_format="pyarrow"))


def fuzzy_word_pairs_reference(texts_by_id: dict,
                               max_doc_id: int = 50) -> set:
    """Brute-force oracle: all-pairs levenshtein==1 over the same
    vocabulary."""
    vocab = sorted({w for d, t in texts_by_id.items()
                    if d < max_doc_id for w in t.split()})
    out = set()
    for i in range(len(vocab)):
        for j in range(i + 1, len(vocab)):
            if edit_distance_is_1(vocab[i], vocab[j]):
                out.add((vocab[i], vocab[j]))
    return out
