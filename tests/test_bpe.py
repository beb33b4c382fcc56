"""Learned BPE: distributed trainer vs the identical-arithmetic
single-process reference; shard/partition invariance; encode cache."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.bpe import (bpe_tokenize_fn, encode_word,
                                      train_bpe, train_bpe_reference,
                                      word_counts_ds)

CORPUS = [
    "the cat sat on the mat the cat sat",
    "low lower lowest low low slower slow",
    "aaaa aaa aa aaaa banana bandana",
    "the quick brown fox jumps over the lazy dog",
    "she sells sea shells by the sea shore",
    "bpe merges merge the most frequent pair of symbols",
]


def _docs_ds(texts, n_blocks=3):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return rd.from_arrow(t).repartition(n_blocks)


def _ref_word_counts(texts) -> dict:
    wc: dict = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_word_counts_match_reference(ray_session):
    got = word_counts_ds(_docs_ds(CORPUS)).to_pandas()
    got = dict(zip(got["word"], got["cnt"]))
    assert got == _ref_word_counts(CORPUS)


def test_train_bpe_matches_reference_any_layout(ray_session):
    want = train_bpe_reference(_ref_word_counts(CORPUS), n_merges=24)
    assert len(want) > 5
    for n_blocks, n_shards in ((2, 3), (5, 8)):
        got = train_bpe(_docs_ds(CORPUS, n_blocks), n_merges=24,
                        n_shards=n_shards)
        assert got == want, (n_blocks, n_shards)


def test_train_bpe_learns_frequent_pairs():
    wc = {"the": 50, "then": 10, "cat": 3}
    merges = train_bpe_reference(wc, n_merges=2)
    # (t,h) and (h,e) tie at 60; smallest packed key wins -> 'he',
    # then 't'+'he' (60)
    assert merges[0][:2] == (ord("h"), ord("e"))
    a1, b1, _ = merges[1]
    assert (a1, b1) == (ord("t"), merges[0][2])


def test_encode_word_greedy_and_overlaps():
    # merges: (a,a)->A, (A,A)->B
    A = 0x110000
    merges = [(ord("a"), ord("a"), A), (A, A, A + 1)]
    assert encode_word("aaaa", {(ord("a"), ord("a")): 0, (A, A): 1}) \
        == [A + 1]
    assert encode_word("aaa", {(ord("a"), ord("a")): 0, (A, A): 1}) \
        == [A, ord("a")]
    assert encode_word("b", {}) == [ord("b")]


def test_token_counts_distributed_vs_reference(ray_session):
    wc = _ref_word_counts(CORPUS)
    merges = train_bpe_reference(wc, n_merges=24)
    fn = bpe_tokenize_fn(merges)
    t = pa.table({"doc_id": pa.array(range(len(CORPUS)), pa.int64()),
                  "text": pa.array(CORPUS, pa.string())})
    got = dict(zip(*[fn(t)[c].to_pylist()
                     for c in ("doc_id", "n_bpe_tokens")]))
    # single-process expected counts via encode_word
    ranks = {(a, b): r for r, (a, b, _) in enumerate(merges)}
    for i, text in enumerate(CORPUS):
        want = sum(len(encode_word(w, ranks)) for w in text.split())
        assert got[i] == want, i
    # learned merges COMPRESS: fewer tokens than characters
    assert got[0] < sum(len(w) for w in CORPUS[0].split())


def test_encode_ids_roundtrip_decode(ray_session):
    from tilemaker_ray.stages.bpe import (bpe_decode_ids,
                                          bpe_encode_ids_fn)
    merges = train_bpe_reference(_ref_word_counts(CORPUS), n_merges=24)
    fn = bpe_encode_ids_fn(merges)
    t = pa.table({"doc_id": pa.array(range(len(CORPUS)), pa.int64()),
                  "text": pa.array(CORPUS, pa.string())})
    out = fn(t)
    for i, text in enumerate(CORPUS):
        ids = out["token_ids"][i].as_py()
        assert out["n_bpe_tokens"][i].as_py() == len(ids)
        # decode restores the text modulo whitespace
        assert bpe_decode_ids(ids, merges) == text.replace(" ", "")
        # compression: learned merges shorten the id sequence
        assert len(ids) <= sum(len(w) for w in text.split())
