"""FastSS edit-distance-1 join vs brute-force levenshtein."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.fuzzyjoin import (edit_distance_is_1,
                                            fuzzy_word_pairs,
                                            fuzzy_word_pairs_reference)


def test_edit_distance_is_1_cases():
    yes = [("cat", "bat"), ("cat", "cats"), ("cat", "at"),
           ("ab", "b"), ("a", ""), ("hello", "helo")]
    no = [("cat", "cat"), ("cat", "dog"), ("ab", "ba"),
          ("cat", "catss"), ("abc", "cba"), ("", "")]
    for a, b in yes:
        assert edit_distance_is_1(a, b) and edit_distance_is_1(b, a)
    for a, b in no:
        assert not edit_distance_is_1(a, b), (a, b)


def test_fuzzy_pairs_match_reference(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(8)
    base = ["stream", "shuffle", "tile", "arrow", "batch", "actor"]
    words = set(base)
    for w in base:                      # planted typos
        words.add(w[1:])
        words.add(w + "s")
        words.add("x" + w)
    for _ in range(60):                 # noise words
        words.add("".join(chr(97 + c)
                          for c in rng.randint(0, 26, 6)))
    docs = {}
    ws = sorted(words)
    for i in range(10):
        docs[i] = " ".join(ws[i::10])
    t = pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": pa.array([docs[d] for d in sorted(docs)],
                                   pa.string())})
    want = fuzzy_word_pairs_reference(docs, max_doc_id=50)
    assert len(want) >= len(base) * 2   # the planted typos are found
    for n_blocks in (2, 4):
        got = set(map(tuple, fuzzy_word_pairs(
            rd.from_arrow(t).repartition(n_blocks), max_doc_id=50)
            .to_pandas()[["w1", "w2"]].values))
        assert got == want, n_blocks
