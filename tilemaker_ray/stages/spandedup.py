"""Duplicated-span removal (ExactSubstr-style dedup within documents).

The span-level member of the dedup family: wherever a k-word span is
duplicated ANYWHERE in the corpus, every occurrence except the
globally first (minimum ``(doc_id, pos)``) has its tokens cut from
the text — the data-cleaning operator of Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499, public), approximated at k-gram granularity
instead of a corpus suffix array (a duplicated run of length L ≥ k is
covered by its L−k+1 overlapping k-grams, so full duplicated runs are
removed exactly; runs shorter than k are below the dedup threshold by
construction).

Ray shape — two slim exchanges, corpus text rides only the second:

  1. docs → (gram_hash, doc_id, pos) rows, bucketed by gram hash so
     one ``map_groups`` call sees EVERY occurrence of its grams:
     per gram, the min (doc_id, pos) occurrence survives, the rest
     emit (doc_id, pos) removal markers;
  2. removal markers ∪ full docs, bucketed by doc_id: per doc, mark
     tokens [pos, pos+k) of every marker, rebuild the text from
     unmarked tokens.

Determinism: the keep rule is a global minimum over an exactly
partitioned key space — independent of block layout (pinned against
the single-process reference in tests/test_spandedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import mix_bucket as _mix_bucket
from .dedup import _word_hash


def _gram_hashes(words: list, k: int) -> np.ndarray:
    """Rolling polynomial k-gram hashes over per-word fnv1a64 (the
    same kernel family as dedup shingling); one hash per position
    0..len(words)-k."""
    if len(words) < k:
        return np.empty(0, dtype=np.uint64)
    wh = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64,
                     count=len(words))
    win = np.lib.stride_tricks.sliding_window_view(wh, k)
    with np.errstate(over="ignore"):
        P = np.uint64(1099511628211)
        gram = np.zeros(len(win), dtype=np.uint64)
        for c in range(k):
            gram = gram * P ^ win[:, c]
    return gram


def dedup_spans(docs_ds, k: int = 8, num_buckets: int = 128,
                id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset (doc_id, text, n_removed_tokens): the corpus with
    every non-first occurrence of a duplicated k-word span removed."""

    def grams(batch: pa.Table) -> pa.Table:
        ids_out, gh_out, pos_out = [], [], []
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        for i, t in enumerate(batch[text_col].to_pylist()):
            g = _gram_hashes(t.split(), k)
            if len(g):
                gh_out.append(g.astype(np.int64))
                pos_out.append(np.arange(len(g), dtype=np.int64))
                ids_out.append(np.full(len(g), ids[i], np.int64))
        z = np.zeros(0, dtype=np.int64)
        gh = np.concatenate(gh_out) if gh_out else z
        return pa.table({
            "gram": pa.array(gh, pa.int64()),
            "doc_id": pa.array(
                np.concatenate(ids_out) if ids_out else z, pa.int64()),
            "pos": pa.array(
                np.concatenate(pos_out) if pos_out else z, pa.int64()),
            "kbkt": pa.array(_mix_bucket(gh, num_buckets), pa.int64())})

    def removals(g: pa.Table) -> pa.Table:
        gr = g["gram"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        p = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d, gr))
        gr, d, p = gr[order], d[order], p[order]
        first = np.ones(len(gr), dtype=bool)
        first[1:] = gr[1:] != gr[:-1]     # run head = global min (d,p)
        cut = ~first
        return pa.table({
            "doc_id": pa.array(d[cut], pa.int64()),
            "pos": pa.array(p[cut], pa.int64()),
            "dbkt": pa.array(_mix_bucket(d[cut], num_buckets),
                             pa.int64())})

    marks = (docs_ds.map_batches(grams, batch_format="pyarrow")
             .groupby("kbkt").map_groups(removals,
                                         batch_format="pyarrow"))

    # exchange 2: markers ∪ docs, keyed by doc bucket. Marker rows
    # carry pos ≥ 0 and a null text; doc rows carry pos = -1 + text.
    def doc_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "pos": pa.array(np.full(len(ids), -1, np.int64),
                            pa.int64()),
            "text": b[text_col],
            "dbkt": pa.array(_mix_bucket(ids, num_buckets),
                             pa.int64())})

    def mark_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "pos": b["pos"],
            "text": pa.array([None] * b.num_rows, pa.string()),
            "dbkt": b["dbkt"]})

    def rebuild(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        p = g["pos"].to_numpy(zero_copy_only=False)
        texts = g["text"].to_pylist()
        order = np.lexsort((p, d))        # doc row (pos -1) leads
        d, p = d[order], p[order]
        texts = [texts[i] for i in order]
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(d)]])
        out_id, out_tx, out_rm = [], [], []
        for s, e in zip(starts, ends):
            assert p[s] == -1 and texts[s] is not None, \
                "removal marker for a doc_id absent from the corpus"
            words = texts[s].split()
            cut = np.zeros(len(words), dtype=bool)
            for pos in p[s + 1:e]:
                cut[pos:pos + k] = True
            out_id.append(int(d[s]))
            out_tx.append(" ".join(w for w, c in zip(words, cut)
                                   if not c))
            out_rm.append(int(cut.sum()))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_tx, pa.string()),
            "n_removed_tokens": pa.array(out_rm, pa.int64())})

    return (docs_ds.map_batches(doc_rows, batch_format="pyarrow")
            .union(marks.map_batches(mark_rows, batch_format="pyarrow"))
            .groupby("dbkt").map_groups(rebuild,
                                        batch_format="pyarrow"))


def dedup_spans_reference(docs: dict, k: int = 8) -> dict:
    """Single-process oracle with the identical keep rule. Returns
    {doc_id: (text, n_removed)}."""
    first: dict = {}
    for d in sorted(docs):
        g = _gram_hashes(docs[d].split(), k)
        for pos, h in enumerate(g.tolist()):
            if h not in first:
                first[h] = (d, pos)
    out = {}
    for d in sorted(docs):
        words = docs[d].split()
        g = _gram_hashes(words, k)
        cut = np.zeros(len(words), dtype=bool)
        for pos, h in enumerate(g.tolist()):
            if first[h] != (d, pos):
                cut[pos:pos + k] = True
        out[d] = (" ".join(w for w, c in zip(words, cut) if not c),
                  int(cut.sum()))
    return out
