"""Unigram-LM trainer oracles: distributed == single-process
reference (vocab, counts, scores), Viterbi tie rule, coverage,
unknown-char handling."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.unigram import (_rescore, _seed_candidates,
                                          _viterbi,
                                          train_unigram_reference,
                                          unigram_tokenize_fn)


def _docs(word_counts):
    """Expand a word-count dict into doc rows (deterministic order)."""
    words = []
    for w in sorted(word_counts):
        words.extend([w] * word_counts[w])
    # split across several docs to exercise block folding
    docs = [" ".join(words[i::7]) for i in range(7)]
    return pa.table({"doc_id": pa.array(range(7), pa.int64()),
                     "text": pa.array(docs, pa.string())})


WC = {"hello": 10, "help": 7, "hell": 4, "low": 9, "lower": 6,
      "lowest": 3, "new": 12, "newer": 5, "newest": 2, "wid": 4,
      "widest": 3, "he": 8, "lo": 5}


def test_viterbi_prefers_longer_final_piece():
    scores = {"a": -10, "b": -10, "ab": -20, "abc": -30, "c": -10}
    # 'abc' as one piece scores -30; 'ab'+'c' = -30; 'a'+'b'+'c' = -30
    # tie -> longer FINAL piece wins at each DP cell: 'abc'
    assert _viterbi("abc", scores, -100) == ["abc"]


def test_viterbi_unknown_char():
    scores = {"a": -10}
    assert _viterbi("axa", scores, -999) == ["a", "x", "a"]


def test_seed_keeps_all_chars():
    seed = _seed_candidates(WC, 8)
    chars = {c for w in WC for c in w}
    assert chars <= set(seed)


def test_reference_coverage_and_scores():
    vocab = train_unigram_reference(WC, k=64, rounds=2)
    chars = {c for w in WC for c in w}
    assert chars <= set(vocab)
    counts = {p: c for p, (c, _) in vocab.items()}
    scores, _ = _rescore(counts, 64)
    for p, (_, s) in vocab.items():
        assert s == scores[p]


def test_distributed_equals_reference(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.unigram import train_unigram
    docs = _docs(WC)
    for nblocks in (1, 4):
        got = train_unigram(rd.from_arrow(docs).repartition(nblocks),
                            k=64, rounds=2)
        want = train_unigram_reference(WC, k=64, rounds=2)
        assert got == want, nblocks


def test_tokenize_fn(ray_session):
    vocab = train_unigram_reference(WC, k=64, rounds=2)
    fn = unigram_tokenize_fn(vocab)
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["hello lowest zzz"],
                                       pa.string())})
    out = fn(batch)
    scores = {p: s for p, (_, s) in vocab.items()}
    from tilemaker_ray.stages.unigram import _score_fp
    total = sum(c for c, _ in vocab.values())
    unk = _score_fp(0, total, len(vocab))
    want = len(_viterbi("hello", scores, unk)) \
        + len(_viterbi("lowest", scores, unk)) \
        + len(_viterbi("zzz", scores, unk))
    assert out["n_tokens"].to_pylist() == [want]
