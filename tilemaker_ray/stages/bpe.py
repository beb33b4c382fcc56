"""Learned byte-pair-encoding (BPE) subword tokenizer, trained as a
distributed Ray operator and applied in map_batches.

The LLM-pipeline operator the round-2 verdict asked for: real learned
merges (not the heuristic estimate behind ``subword_count_docs``),
production shape end to end:

  1. WORD COUNTS — one combiner-first pass over the corpus (per-batch
     unique + count), then the repo's bucketed map_groups exchange on
     a hashed key. The word table is orders of magnitude smaller than
     the corpus and is all later stages ever touch (the classic BPE
     trick: train on the weighted vocabulary, not the raw text).
  2. TRAINING — the word table is sharded across P actors
     (``hash(word) % P``); each merge iteration every shard returns
     its locally pre-aggregated (packed pair → weighted count) arrays,
     ONE remote reduce task sums them and returns only the argmax
     (count desc, packed pair asc on ties — total order, so the
     result is bit-identical under any P / block layout), and the
     winning pair is broadcast back for a vectorized greedy
     left-to-right merge apply. Driver state per iteration: one
     (pair, id) tuple. Same superstep economics as
     stages/graph_shards.py.
  3. ENCODE — ``bpe_tokenize_fn(merges)`` is a map_batches body with a
     worker-global word→token-count cache (web text repeats words
     heavily, so the per-distinct-word Python encode amortizes to
     ~zero).

Symbol ids need no global vocabulary exchange: initial symbols are
Unicode codepoints (< 0x110000), learned merges take ids from
0x110000 upward in rank order. Packed pair key = a << 21 | b
(ids < 2²¹ for < 983k merges), one int64.

Determinism oracle: ``train_bpe_reference`` — the identical algorithm
(same greedy overlap parity, same tie order) in plain Python;
tests/test_bpe.py pins distributed == reference on merges AND token
counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MERGE_BASE = 0x110000          # first learned-symbol id
_PACK = 21                      # bits for the right symbol id


def _pack(a: int, b: int) -> int:
    return (int(a) << _PACK) | int(b)


# ---------------------------------------------------------------------------
# single-process reference (the pytest oracle)
# ---------------------------------------------------------------------------

def _greedy_merge_positions(matches: np.ndarray) -> np.ndarray:
    """Greedy left-to-right non-overlap rule over sorted match
    positions: inside each run of CONSECUTIVE positions (only possible
    when a == b, e.g. 'aaaa'), keep every other match."""
    if len(matches) == 0:
        return matches
    runstart = np.zeros(len(matches), dtype=np.int64)
    new_run = np.ones(len(matches), dtype=bool)
    new_run[1:] = matches[1:] != matches[:-1] + 1
    runstart[new_run] = np.flatnonzero(new_run)
    runstart = np.maximum.accumulate(runstart)
    offset = np.arange(len(matches)) - runstart
    return matches[offset % 2 == 0]


def _apply_merge_to_word(sym: list, a: int, b: int, new_id: int) -> list:
    out = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def train_bpe_reference(word_counts: dict, n_merges: int) -> list:
    """Plain-Python BPE trainer over {word: count}. Returns the merge
    list [(a, b, new_id)] in rank order — the bit-exactness oracle for
    the distributed trainer (identical pair counting, identical
    greedy overlap rule, identical count-desc / packed-asc tie
    order)."""
    words = {w: [ord(c) for c in w] for w in word_counts}
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for w, sym in words.items():
            cnt = word_counts[w]
            i = 0
            while i + 1 < len(sym):
                counts[_pack(sym[i], sym[i + 1])] = \
                    counts.get(_pack(sym[i], sym[i + 1]), 0) + cnt
                # overlap-aware counting: 'aaa' counts (a,a) ONCE as
                # mergeable at i=0 then skips — mirror the greedy rule
                # so counts equal the number of merges that would fire
                if sym[i] == sym[i + 1] and i + 2 < len(sym) \
                        and sym[i + 2] == sym[i]:
                    i += 2
                else:
                    i += 1
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
        if best[1] < 2:
            break                 # no pair worth a merge
        pk = best[0]
        a, b = pk >> _PACK, pk & ((1 << _PACK) - 1)
        new_id = _MERGE_BASE + rank
        merges.append((int(a), int(b), int(new_id)))
        words = {w: _apply_merge_to_word(s, a, b, new_id)
                 for w, s in words.items()}
    return merges


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------

class _BpeShardImpl:
    """One vocabulary shard: flat symbol array + word-id array +
    per-word counts. All merge-loop work is vectorized numpy."""

    def __init__(self, block_refs):
        import ray

        words, counts = [], []
        for ref in block_refs:
            tbl = ray.get(ref)
            if tbl.num_rows:
                words.extend(tbl["word"].to_pylist())
                counts.extend(tbl["cnt"].to_pylist())
        self.counts = np.asarray(counts, dtype=np.int64)
        syms = [np.frombuffer(w.encode("utf-32-le"), dtype=np.uint32)
                .astype(np.int64) for w in words]
        lens = np.asarray([len(s) for s in syms], dtype=np.int64)
        self.sym = np.concatenate(syms) if syms \
            else np.zeros(0, dtype=np.int64)
        self.wid = np.repeat(np.arange(len(words), dtype=np.int64),
                             lens)

    def pair_counts(self):
        """Locally aggregated (packed pair, weighted count) — the
        overlap-aware count (number of merges that would fire), same
        rule as the reference trainer."""
        s, w = self.sym, self.wid
        if len(s) < 2:
            return (np.zeros(0, dtype=np.int64),
                    np.zeros(0, dtype=np.int64))
        adj = w[1:] == w[:-1]
        pos = np.flatnonzero(adj)
        # overlap rule: for runs of equal symbols ('aaa'), count
        # every other adjacency — exactly the greedy-fire count
        eq = s[pos] == s[pos + 1]
        runs = pos[eq]
        if len(runs):
            drop = np.zeros(len(s) - 1, dtype=bool)
            new_run = np.ones(len(runs), dtype=bool)
            new_run[1:] = runs[1:] != runs[:-1] + 1
            runstart = np.zeros(len(runs), dtype=np.int64)
            runstart[new_run] = np.flatnonzero(new_run)
            runstart = np.maximum.accumulate(runstart)
            odd = (np.arange(len(runs)) - runstart) % 2 == 1
            drop[runs[odd]] = True
            pos = pos[~drop[pos]]
        pk = (s[pos] << _PACK) | s[pos + 1]
        wt = self.counts[w[pos]]
        uk, inv = np.unique(pk, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, wt)
        return uk, acc

    def apply_merge(self, a: int, b: int, new_id: int) -> None:
        s, w = self.sym, self.wid
        if len(s) < 2:
            return
        m = (s[:-1] == a) & (s[1:] == b) & (w[:-1] == w[1:])
        matches = _greedy_merge_positions(np.flatnonzero(m))
        if len(matches) == 0:
            return
        s = s.copy()
        s[matches] = new_id
        keep = np.ones(len(s), dtype=bool)
        keep[matches + 1] = False
        self.sym = s[keep]
        self.wid = w[keep]


def _reduce_argmax(piece_refs):
    """Remote fold: sum the per-shard (packed pair, count) arrays and
    return only (best packed pair, its count) — count desc, packed
    asc. Runs OFF the driver (refs resolve store→store); the driver
    sees two ints."""
    import ray

    piece_lists = ray.get(list(piece_refs))
    keys = np.concatenate([p[0] for p in piece_lists])
    cnts = np.concatenate([p[1] for p in piece_lists])
    if len(keys) == 0:
        return (-1, 0)
    uk, inv = np.unique(keys, return_inverse=True)
    acc = np.zeros(len(uk), dtype=np.int64)
    np.add.at(acc, inv, cnts)
    top = acc.max()
    best = uk[acc == top].min()
    return (int(best), int(top))


def word_counts_ds(docs_ds, text_col: str = "text"):
    """corpus → (word, cnt) Dataset: per-batch combiner, then ONE slim
    bucketed exchange keyed on a packed int (the repo's standard
    cheap-groupby pattern)."""
    from .common import mix_bucket

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        from .dedup import _word_hash

        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(t.split())
        words = list(c.keys())
        # DETERMINISTIC hash (fnv1a64): Python's built-in str hash is
        # per-process randomized, which would split one word across
        # buckets and leave duplicate rows the fold never sums
        h = np.fromiter((_word_hash(w) & 0x7FFFFFFF for w in words),
                        dtype=np.int64, count=len(words))
        return pa.table({
            "word": pa.array(words, pa.string()),
            "cnt": pa.array([c[w] for w in words], pa.int64()),
            "bkt": pa.array(mix_bucket(h, 64), pa.int64())})

    def fold(g: pa.Table) -> pa.Table:
        import pandas as pd
        df = g.to_pandas().groupby("word", as_index=False)["cnt"].sum()
        return pa.Table.from_pandas(df[["word", "cnt"]],
                                    preserve_index=False)

    return (docs_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bkt").map_groups(fold, batch_format="pyarrow"))


def train_bpe(docs_ds, n_merges: int = 64, text_col: str = "text",
              n_shards: int = 8) -> list:
    """Distributed BPE training; returns [(a, b, new_id)] in rank
    order, bit-identical to ``train_bpe_reference`` on the same
    corpus (pinned by tests/test_bpe.py)."""
    import ray

    wc = word_counts_ds(docs_ds, text_col) \
        .repartition(n_shards).materialize()
    Shard = ray.remote(num_cpus=0, scheduling_strategy="SPREAD")(
        _BpeShardImpl)
    reduce_task = ray.remote(num_cpus=1)(_reduce_argmax)
    all_refs = wc.to_arrow_refs()
    shards = [Shard.remote(list(chunk)) for chunk in
              np.array_split(np.asarray(all_refs, dtype=object),
                             n_shards)]
    merges = []
    try:
        for rank in range(n_merges):
            pieces = [sh.pair_counts.remote() for sh in shards]
            best, top = ray.get(reduce_task.remote(pieces))
            if best < 0 or top < 2:
                break
            a, b = best >> _PACK, best & ((1 << _PACK) - 1)
            new_id = _MERGE_BASE + rank
            merges.append((int(a), int(b), int(new_id)))
            ray.get([sh.apply_merge.remote(int(a), int(b), new_id)
                     for sh in shards])
    finally:
        for sh in shards:
            ray.kill(sh)
    return merges


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: dict) -> list:
    """Encode one word with the learned merges: repeatedly fire the
    lowest-rank pair present, greedy left-to-right."""
    sym = [ord(c) for c in word]
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        sym = _apply_merge_to_word(sym, a, b,
                                   _MERGE_BASE + best_rank)
    return sym


_ENCODE_CACHE: dict = {}
_ENCODE_CACHE_MAX_WORDS = 1_000_000


_ENCODE_CACHE_MAX_LISTS = 4


def _encode_cache_for(key) -> dict:
    """Per-worker word caches keyed by merge-list identity, bounded to
    a few lists (insertion-order eviction). Two encode stages with
    different merges interleaving on one worker (e.g. tokenize + id
    encode over the same corpus) must NOT evict each other per batch;
    the small cap still stops a long-lived worker from leaking every
    vocabulary it ever saw across many BPE jobs."""
    cache = _ENCODE_CACHE.get(key)
    if cache is None:
        while len(_ENCODE_CACHE) >= _ENCODE_CACHE_MAX_LISTS:
            _ENCODE_CACHE.pop(next(iter(_ENCODE_CACHE)))
        cache = _ENCODE_CACHE[key] = {}
    return cache


def bpe_tokenize_fn(merges: list, id_col: str = "doc_id",
                    text_col: str = "text"):
    """map_batches body: (doc_id, text) → (doc_id, n_bpe_tokens).
    Per-worker word→length cache (worker-global, keyed by the merge
    list identity) so repeated words cost a dict hit."""
    ranks = {(a, b): r for r, (a, b, _) in enumerate(merges)}
    key = tuple((a, b) for a, b, _ in merges)

    def fn(batch: pa.Table) -> pa.Table:
        cache = _encode_cache_for(key)
        out = np.zeros(batch.num_rows, dtype=np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            n = 0
            for w in t.split():
                ln = cache.get(w)
                if ln is None:
                    ln = len(encode_word(w, ranks))
                    if len(cache) < _ENCODE_CACHE_MAX_WORDS:
                        cache[w] = ln
                n += ln
            out[i] = n
        return pa.table({id_col: batch[id_col],
                         "n_bpe_tokens": pa.array(out, pa.int64())})

    return fn


def bpe_encode_ids_fn(merges: list, id_col: str = "doc_id",
                      text_col: str = "text"):
    """map_batches body: (doc_id, text) → (doc_id, token_ids
    list<int64>, n_bpe_tokens) — the production tokenization pass.
    Word-level per-worker cache like bpe_tokenize_fn; ids are Unicode
    codepoints (< 0x110000) and merge ids (0x110000 + rank), so
    ``bpe_decode_ids`` can reverse them without a vocabulary table."""
    ranks = {(a, b): r for r, (a, b, _) in enumerate(merges)}
    key = ("ids",) + tuple((a, b) for a, b, _ in merges)

    def fn(batch: pa.Table) -> pa.Table:
        cache = _encode_cache_for(key)
        toks, lens = [], []
        for t in batch[text_col].to_pylist():
            doc = []
            for w in t.split():
                ids = cache.get(w)
                if ids is None:
                    ids = encode_word(w, ranks)
                    if len(cache) < _ENCODE_CACHE_MAX_WORDS:
                        cache[w] = ids
                doc.extend(ids)
            toks.append(doc)
            lens.append(len(doc))
        return pa.table({
            id_col: batch[id_col],
            "token_ids": pa.array(toks, pa.list_(pa.int64())),
            "n_bpe_tokens": pa.array(np.asarray(lens, np.int64),
                                     pa.int64())})

    return fn


def bpe_decode_ids(token_ids: list, merges: list) -> str:
    """Reverse tokenization: expand merge ids recursively back to
    codepoints. Lossy only in word boundaries (tokens within a word
    concatenate; the encoder tokenizes per whitespace-split word, so
    decode returns the concatenated words — callers that need exact
    text keep it alongside)."""
    expand = {nid: (a, b) for a, b, nid in merges}

    def chars(i):
        if i in expand:
            a, b = expand[i]
            return chars(a) + chars(b)
        return chr(i)

    return "".join(chars(int(i)) for i in token_ids)
