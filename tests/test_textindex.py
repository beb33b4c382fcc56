"""Inverted index: postings + df band vs a brute-force dict oracle."""

from collections import Counter

import pyarrow as pa

from tilemaker_ray.stages.textindex import build_inverted_index


def test_inverted_index_brute(ray_session):
    import ray.data as rd
    docs = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "a cat and a dog",
        4: "unique words only here",
        5: "the the the",
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    out = build_inverted_index(ds, df_min=2, df_max=3).to_pandas()

    tf = {(d, w): c for d, t in docs.items()
          for w, c in Counter(t.split(" ")).items()}
    df = Counter(w for (_, w) in tf)
    want = {(w, d): (c, df[w]) for (d, w), c in tf.items()
            if 2 <= df[w] <= 3}
    got = {(r.word, r.doc_id): (r.tf, r.df) for r in out.itertuples()}
    assert got == want
    # 'the' appears in 3 docs (df=3, kept); 'sat' in 2; 'unique' df=1 dropped
    assert ("the", 5) in got and got[("the", 5)] == (3, 3)
    assert all(w != "unique" for (w, _) in got)


def test_inverted_index_empty_and_spaces(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a  b", "a  b"], pa.string())}))
    # double space yields an empty token in BOTH engines' tokenization
    out = build_inverted_index(ds, df_min=2, df_max=10).to_pandas()
    assert set(out["word"]) == {"a", "b", ""}
    assert (out["df"] == 2).all()


def test_inverted_index_bigrams(ray_session):
    import ray.data as rd
    docs = {1: "a b c a b", 2: "a b x", 3: "c a b"}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    out = build_inverted_index(ds, df_min=2, df_max=10,
                               ngram=2).to_pandas()
    grams = {d: [" ".join(t.split(" ")[i:i + 2])
                 for i in range(len(t.split(" ")) - 1)]
             for d, t in docs.items()}
    tf = {(d, g): c for d, gs in grams.items()
          for g, c in Counter(gs).items()}
    df = Counter(g for (_, g) in tf)
    want = {(g, d): (c, df[g]) for (d, g), c in tf.items()
            if 2 <= df[g] <= 10}
    got = {(r.word, r.doc_id): (r.tf, r.df) for r in out.itertuples()}
    assert got == want
    assert ("a b", 1) in got and got[("a b", 1)] == (2, 3)
