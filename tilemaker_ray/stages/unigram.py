"""Unigram-LM subword tokenizer (SentencePiece's second algorithm),
trained as a distributed Ray operator — the EM counterpart of the BPE
trainer in stages/bpe.py, same production shape:

  1. WORD COUNTS — reuse bpe.word_counts_ds (combiner-first corpus
     pass; all later stages touch only the weighted vocabulary).
  2. SEED — candidate pieces are ALL substrings (length ≤ MAXLEN) of
     distinct words weighted by word count: per-batch partials, ONE
     groupby-sum, then a deterministic top-K cut by
     (count DESC, piece ASC) with every single character always kept
     (full coverage by construction).
  3. EM ROUNDS — scores are INTEGER fixed-point log-probs
     floor(ln((c+1)/(total+K))·10⁹); each round broadcasts the score
     dict (ray.put), Viterbi-segments every distinct word in
     map_batches (DP ties prefer the LONGER final piece — total
     order, so the segmentation is bit-deterministic), folds piece
     usage × word count into ONE groupby-sum, and rescores. Driver
     state = the K-piece vocab per round.
  4. ENCODE — tokenize fn with a worker-global word→tokens cache
     (the bpe encode economics).

Determinism oracle: ``train_unigram_reference`` — the identical
algorithm in plain single-process Python; tests/test_unigram.py pins
distributed == reference on vocab, scores AND segmentations.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

MAXLEN = 6
SCALE = 10**9


def _score_fp(cnt: int, total: int, k: int) -> int:
    return math.floor(math.log((cnt + 1) / (total + k)) * SCALE)


def _viterbi(word: str, scores: dict, unk_fp: int):
    """Max-score segmentation; ties prefer the longer final piece.
    Characters absent from the vocab consume one char at unk_fp."""
    L = len(word)
    dp = np.full(L + 1, -(1 << 62), dtype=np.int64)
    back = np.zeros(L + 1, dtype=np.int64)
    dp[0] = 0
    for i in range(1, L + 1):
        best = None
        blen = 0
        for ln in range(1, min(MAXLEN, i) + 1):
            s = scores.get(word[i - ln:i])
            if s is None:
                if ln == 1:
                    s = unk_fp
                else:
                    continue
            cand = dp[i - ln] + s
            if best is None or cand > best or \
                    (cand == best and ln > blen):
                best = cand
                blen = ln
        dp[i] = best
        back[i] = blen
    pieces = []
    i = L
    while i > 0:
        ln = int(back[i])
        pieces.append(word[i - ln:i])
        i -= ln
    pieces.reverse()
    return pieces


def _seed_candidates(word_counts: dict, k: int):
    """Top-K substring candidates by (count DESC, piece ASC); all
    single characters kept unconditionally."""
    cand: dict = {}
    for w, c in word_counts.items():
        for i in range(len(w)):
            for ln in range(1, min(MAXLEN, len(w) - i) + 1):
                p = w[i:i + ln]
                cand[p] = cand.get(p, 0) + c
    chars = {p for p in cand if len(p) == 1}
    multis = sorted((p for p in cand if len(p) > 1),
                    key=lambda p: (-cand[p], p))
    keep = sorted(chars) + multis[:max(0, k - len(chars))]
    return {p: cand[p] for p in keep}


def _rescore(counts: dict, k: int):
    total = sum(counts.values())
    scores = {p: _score_fp(c, total, k) for p, c in counts.items()}
    unk_fp = _score_fp(0, total, k)
    return scores, unk_fp


def train_unigram_reference(word_counts: dict, k: int = 2048,
                            rounds: int = 2):
    """Single-process reference (the pytest oracle). Returns the
    final {piece: (count, score_fp)} vocabulary."""
    counts = _seed_candidates(word_counts, k)
    scores, unk_fp = _rescore(counts, k)
    vocab = set(counts)
    for _ in range(rounds):
        used = dict.fromkeys(vocab, 0)
        for w, c in word_counts.items():
            for p in _viterbi(w, scores, unk_fp):
                if p in used:
                    used[p] += c
        counts = used
        scores, unk_fp = _rescore(counts, k)
    return {p: (counts[p], scores[p]) for p in sorted(vocab)}


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------

def _seed_candidates_ds(words_ds, k: int):
    """Distributed seed: substring partials → groupby-sum → top-K cut
    (count DESC, piece ASC) + all single chars."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        out: dict = {}
        ws = batch["word"].to_pylist()
        cs = batch["cnt"].to_pylist()
        for w, c in zip(ws, cs):
            for i in range(len(w)):
                for ln in range(1, min(MAXLEN, len(w) - i) + 1):
                    p = w[i:i + ln]
                    out[p] = out.get(p, 0) + c
        return pa.table({
            "piece": pa.array(list(out.keys()), pa.string()),
            "c": pa.array(list(out.values()), pa.int64())})

    agg = (words_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("piece").aggregate(Sum("c", alias_name="c")))
    tbl = agg.materialize().to_arrow_refs()
    import ray
    parts = [t for t in ray.get(tbl) if t.num_rows]
    full = pa.concat_tables(parts) if parts else pa.table(
        {"piece": pa.array([], pa.string()),
         "c": pa.array([], pa.int64())})
    pieces = full["piece"].to_pylist()
    cs = full["c"].to_pylist()
    cand = dict(zip(pieces, cs))
    chars = {p for p in cand if len(p) == 1}
    multis = sorted((p for p in cand if len(p) > 1),
                    key=lambda p: (-cand[p], p))
    keep = sorted(chars) + multis[:max(0, k - len(chars))]
    return {p: cand[p] for p in keep}


def train_unigram(docs_ds, k: int = 2048, rounds: int = 2,
                  text_col: str = "text"):
    """Distributed unigram-LM training. The vocabulary (≤ K pieces) is
    the only driver state; the corpus is touched once (word counts)
    and every EM round streams the distinct-word table through ONE
    broadcast + map_batches + groupby-sum. Bit-identical to
    ``train_unigram_reference`` under any block layout (integer
    scores, total-order tie rules)."""
    import ray
    from ray.data.aggregate import Sum
    from .bpe import word_counts_ds

    words = word_counts_ds(docs_ds, text_col).materialize()
    counts = _seed_candidates_ds(words, k)
    scores, unk_fp = _rescore(counts, k)
    vocab = sorted(counts)
    for _ in range(rounds):
        ref = ray.put((scores, unk_fp))

        def seg_partial(batch: pa.Table) -> pa.Table:
            sc, unk = ray.get(ref)
            out: dict = {}
            for w, c in zip(batch["word"].to_pylist(),
                            batch["cnt"].to_pylist()):
                for p in _viterbi(w, sc, unk):
                    if p in sc:
                        out[p] = out.get(p, 0) + c
            return pa.table({
                "piece": pa.array(list(out.keys()), pa.string()),
                "c": pa.array(list(out.values()), pa.int64())})

        agg = (words.map_batches(seg_partial, batch_format="pyarrow")
               .groupby("piece").aggregate(Sum("c", alias_name="c")))
        parts = [t for t in ray.get(agg.materialize().to_arrow_refs())
                 if t.num_rows]
        used = dict.fromkeys(vocab, 0)
        for t in parts:
            for p, c in zip(t["piece"].to_pylist(),
                            t["c"].to_pylist()):
                used[p] = used.get(p, 0) + int(c)
        counts = used
        scores, unk_fp = _rescore(counts, k)
    return {p: (counts[p], scores[p]) for p in vocab}


def unigram_tokenize_fn(vocab: dict, id_col: str = "doc_id",
                        text_col: str = "text"):
    """map_batches body: per-doc unigram token counts under the
    trained vocab (worker-global word→n_tokens cache)."""
    k = len(vocab)
    total = sum(c for c, _ in vocab.values())
    scores = {p: s for p, (_, s) in vocab.items()}
    unk_fp = _score_fp(0, total, k)
    cache: dict = {}

    def fn(batch: pa.Table) -> pa.Table:
        ids, ns = [], []
        for did, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            n = 0
            for w in text.split(" "):
                if not w:
                    continue
                v = cache.get(w)
                if v is None:
                    v = len(_viterbi(w, scores, unk_fp))
                    cache[w] = v
                n += v
            ids.append(did)
            ns.append(n)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(ns, pa.int64())})
    return fn
