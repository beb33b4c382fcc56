"""Aho–Corasick multi-pattern lexicon tagging (Aho & Corasick 1975,
public) — the badword/topic-lexicon scan of a C4/Gopher-style curation
run: count occurrences of every keyword of every category in one pass
over the raw text bytes, instead of one `count_substring` scan per
keyword (L scans lose once the lexicon has hundreds of entries; real
badword lists have thousands).

Ray-Data-first shape: the automaton is built ONCE per actor
(`LexiconTagger.__init__`, the stateful actor-pool pattern), and the
scan is vectorized ACROSS the batch: instead of walking one document's
bytes in Python, a state VECTOR (one lane per doc) steps through the
padded byte matrix column by column — each step is two numpy gathers
(`trans[state, byte]`, `outc[state]`), so the Python-interpreter cost
is O(max_doc_len) per chunk, not O(total_bytes). Matches are counted
at every end position (overlapping included), the textbook AC output
semantics.

Scale notes: the dense byte-level transition table is
(n_states × 256) int32 — ~1 MB per 1k pattern chars, right up to
~10k-entry lexicons; beyond that swap the dense table for goto dict +
fail links (same API). Padding is chunked so the padded matrix stays
under `_PAD_BUDGET` bytes regardless of skewed doc lengths; padding
byte 0 occurs in no pattern, so padded lanes idle at the root state.
UTF-8 safety: ASCII patterns can never match inside a multi-byte
sequence (continuation bytes are >= 0x80), so byte-level matching
equals codepoint-level matching for ASCII lexicons.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pyarrow as pa


def build_automaton(patterns):
    """Build the dense AC automaton.

    ``patterns``: list of (category, keyword). Returns
    (trans, outc, cats): ``trans`` (n_states, 256) int32 dense
    next-state table with failure links folded in (a "DFA-ized" AC —
    no fail-chasing at scan time); ``outc`` (n_states, n_cats) int32
    where entry [s, c] is the number of category-c keywords ending at
    state s INCLUDING suffix matches (fail-path output inherited at
    build time); ``cats`` the sorted category list.
    """
    cats = sorted({c for c, _ in patterns})
    cat_ix = {c: i for i, c in enumerate(cats)}
    # trie of byte strings
    goto = [{}]           # state -> {byte: state}
    out = [np.zeros(len(cats), np.int32)]
    for cat, kw in patterns:
        bs = kw.encode("utf-8")
        if not bs:
            raise ValueError("empty keyword")
        s = 0
        for b in bs:
            if b not in goto[s]:
                goto[s][b] = len(goto)
                goto.append({})
                out.append(np.zeros(len(cats), np.int32))
            s = goto[s][b]
        out[s][cat_ix[cat]] += 1
    n = len(goto)
    trans = np.zeros((n, 256), np.int32)
    fail = np.zeros(n, np.int32)
    # BFS: fold failure links into a dense next-state table and
    # inherit fail-state outputs so one gather per char sees every
    # suffix match
    q = deque()
    for b in range(256):
        s = goto[0].get(b, 0)
        trans[0, b] = s
        if s:
            fail[s] = 0
            q.append(s)
    while q:
        r = q.popleft()
        out[r] = out[r] + out[fail[r]]
        for b in range(256):
            if b in goto[r]:
                s = goto[r][b]
                fail[s] = trans[fail[r], b]
                trans[r, b] = s
                q.append(s)
            else:
                trans[r, b] = trans[fail[r], b]
    outc = np.stack(out).astype(np.int64)
    return trans, outc, cats


_PAD_BUDGET = 64 << 20          # max padded-matrix bytes per chunk


def _flat_bytes(arr: pa.Array):
    """(flat uint8 buffer slice, per-row byte lengths) for a string
    array — zero-copy views over the Arrow buffers."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_string(a.type):
        odt = np.int64
    else:
        odt = np.int32
    offs = np.frombuffer(a.buffers()[1], dtype=odt)[
        a.offset:a.offset + len(a) + 1]
    flat = np.frombuffer(a.buffers()[2], dtype=np.uint8)[
        offs[0]:offs[-1]]
    return flat, np.diff(offs).astype(np.int64)


def scan_counts(trans: np.ndarray, outc: np.ndarray,
                texts: pa.Array) -> np.ndarray:
    """Per-doc per-category occurrence counts, (n_docs, n_cats) int64.

    Vectorized across docs: the state vector steps one byte column at
    a time; every step is trans[state, col] + outc[state] — two numpy
    gathers, no per-doc Python.
    """
    flat, lens = _flat_bytes(texts)
    n = len(lens)
    counts = np.zeros((n, outc.shape[1]), np.int64)
    if n == 0 or len(flat) == 0:
        return counts
    # chunk rows so n_rows * chunk_maxlen stays under the pad budget
    starts = np.concatenate(([0], np.cumsum(lens)))
    i = 0
    while i < n:
        j, width = i, 0
        while j < n:
            width = max(width, int(lens[j]))
            if (j - i + 1) * width > _PAD_BUDGET and j > i:
                break
            j += 1
        m = j - i
        w = max(1, int(lens[i:j].max()))
        mat = np.zeros((m, w), np.uint8)
        mask = np.arange(w) < lens[i:j, None]
        mat[mask] = flat[starts[i]:starts[j]]
        state = np.zeros(m, np.int32)
        sub = counts[i:j]
        for col in range(w):
            state = trans[state, mat[:, col]]
            sub += outc[state]
        i = j
    return counts


class LexiconTagger:
    """Actor-pool stage: automaton built once per actor, batches
    scanned vectorized. Emits per-category partials (category, docs,
    hits) ready for a tiny groupby-sum."""

    def __init__(self, patterns):
        self.trans, self.outc, self.cats = build_automaton(patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = scan_counts(self.trans, self.outc, batch["text"])
        return pa.table({
            "category": pa.array(self.cats, pa.string()),
            "docs": pa.array((counts > 0).sum(axis=0), pa.int64()),
            "hits": pa.array(counts.sum(axis=0), pa.int64())})
