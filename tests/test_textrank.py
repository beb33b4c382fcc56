"""Single-process oracle for the TextRank composition: brute pair
counting + the pagerank_reference arithmetic must reproduce the
distributed cooc→PageRank pipeline end to end."""

import collections

import numpy as np
import pyarrow.parquet as pq

from tilemaker_ray.stages.pagerank import pagerank_reference

SF = "/root/testdata/sf0.001"


def _brute_pairs(texts, window=2, min_count=3, k=2000):
    cnt = collections.Counter()
    for t in texts:
        toks = t.split(" ")
        for d in range(1, window + 1):
            for i in range(len(toks) - d):
                a, b = toks[i], toks[i + d]
                lo, hi = (a, b) if a <= b else (b, a)
                cnt[(lo, hi)] += 1
    items = [(w1, w2, c) for (w1, w2), c in cnt.items()
             if c >= min_count]
    items.sort(key=lambda r: (-r[2], r[0], r[1]))
    return items[:k]


def test_textrank_matches_reference(ray_session):
    from tilemaker_ray.pipelines.queries import q_textrank_keywords

    got = q_textrank_keywords(SF).to_pandas()

    texts = pq.read_table(
        f"{SF}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    pairs = _brute_pairs(texts)
    edges = [(w1, w2, c) for w1, w2, c in pairs] + \
            [(w2, w1, c) for w1, w2, c in pairs]
    nodes = sorted({s for s, _, _ in edges})
    ranks = pagerank_reference(edges, nodes, iters=10)
    rf = np.array([ranks[n] for n in nodes], dtype=np.int64)
    words = np.asarray(nodes, dtype=object)
    order = np.lexsort((words, -rf))[:20]
    exp = [(i + 1, str(words[j]), int(rf[j]))
           for i, j in enumerate(order)]
    assert [(int(r.rank), r.word, int(r.rank_fp))
            for r in got.itertuples()] == exp
